"""foreachBatch MERGE sink: streaming upsert into a keyed target.

The production pattern for maintaining a dimension/state table from a
stream when the sink is not an append log: each micro-batch is reduced
to one row per key, merged with the current target (the same
full-outer-join MERGE d4_merge_upsert grades in batch), and the target
is atomically swapped. Without a table format the swap is a directory
rename; Delta/Iceberg replace exactly this read-merge-write with a
transactional MERGE INTO, keeping the batch body identical.

Correctness hinges on the per-key state being ASSOCIATIVE so that any
micro-batch slicing converges to the batch image: counts add, cent
sums add, and "latest" merges by (ts, event_id) max — all order- and
slicing-independent. The convergence test replays chunked events and
asserts final target == one-shot batch aggregate.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, "
    "last_ts timestamp_ntz, last_event_id bigint, last_value double"
)


def _reduce_batch(df: DataFrame) -> DataFrame:
    """One state row per user from raw events (associative summary)."""
    latest = F.max_by(
        F.struct("event_id", "value"), F.struct("ts", "event_id")
    ).alias("latest")
    return df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        F.max("ts").alias("last_ts"),
        latest,
    ).select(
        "user_id",
        "n_events",
        "total_cents",
        "last_ts",
        F.col("latest.event_id").alias("last_event_id"),
        F.col("latest.value").alias("last_value"),
    )


def _merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Associative merge of two per-user state tables."""
    both = a.unionByName(b)
    return both.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_cents").alias("total_cents"),
        F.max("last_ts").alias("last_ts"),
        F.max_by(
            F.struct("last_event_id", "last_value"),
            F.struct("last_ts", "last_event_id"),
        ).alias("latest"),
    ).select(
        "user_id",
        "n_events",
        "total_cents",
        "last_ts",
        F.col("latest.last_event_id").alias("last_event_id"),
        F.col("latest.last_value").alias("last_value"),
    )


def upsert_sink(spark, target_dir: str):
    """Return a foreachBatch function that MERGEs each micro-batch into
    the parquet target at ``target_dir`` (read current → merge → write
    fresh → atomic directory swap). At 100 TB the swap becomes a
    Delta/Iceberg MERGE INTO with the identical batch body; the
    read-modify-write here is the format-free equivalent, and the swap
    keeps readers from ever seeing a half-written target.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        incoming = _reduce_batch(batch_df)
        if os.path.isdir(target_dir):
            current = batch_df.sparkSession.read.schema(STATE_SCHEMA).parquet(
                target_dir
            )
            merged = _merge_states(current, incoming)
        else:
            merged = incoming
        tmp = f"{target_dir}.batch{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target_dir):
            shutil.rmtree(target_dir)
        os.replace(tmp, target_dir)

    return apply


def read_state(spark, target_dir: str) -> DataFrame:
    return spark.read.schema(STATE_SCHEMA).parquet(target_dir)
