"""Structured Streaming replay harness: re-run any transform from
transforms.py over the events table as a file-source stream.

Replay shape: the static events table is rewritten (time-ordered) into
N parquet chunk files in a scratch dir; `readStream` consumes them
`maxFilesPerTrigger=1`, so the query runs N micro-batches — enough to
exercise incremental state, watermark advancement, and late-data
eviction without any external system. At 100 TB the file source is
swapped for Kafka; every transform and watermark below is unchanged
(both are just `readStream` sources).

ST4 (watermark policy) lives here: `with_watermark` bounds state for
append-mode aggregations; `SENTINEL_USER` events flush final windows in
tests (a watermark only advances when new data arrives, so a replayed
finite stream needs a late sentinel to close its last windows).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)
SENTINEL_USER = -1


def write_ordered_chunks(dfs, out_dir: str) -> None:
    """Write each DataFrame as one parquet chunk into `out_dir`, with
    STRICTLY INCREASING file mtimes. The file source orders discovered
    files by modification time, and sequential writes can land in the
    same mtime tick — which silently shuffles replay order (observed:
    a 'late' chunk processed before the batch that advances the
    watermark). Explicit utime stamps make replay order deterministic.
    """
    import time

    os.makedirs(out_dir, exist_ok=True)
    seen: set[str] = set()
    base = time.time()
    for i, df in enumerate(dfs):
        df.coalesce(1).write.mode("append").parquet(out_dir)
        current = {e.name for e in os.scandir(out_dir)}
        for name in current - seen:
            t = base + i * 10
            os.utime(os.path.join(out_dir, name), (t, t))
        seen = current


def stage_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    sentinel_hours: int | None = None,
) -> str:
    """Rewrite events as `n_chunks` time-ordered parquet files under
    `out_dir` (plus, optionally, one final sentinel chunk placed
    `sentinel_hours` after the max event time — it advances the
    watermark past every real window so append-mode sinks flush).

    Files are written one at a time in time order: the file source
    picks them up in discovery order, so replay preserves event-time
    order across micro-batches.
    """
    events = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    rows = events.count()
    per = (rows + n_chunks - 1) // n_chunks
    ranked = events.withColumn(
        "chunk", ((F.row_number().over(_time_order()) - 1) / per).cast("int")
    )
    chunks = [
        ranked.filter(F.col("chunk") == c).drop("chunk") for c in range(n_chunks)
    ]
    if sentinel_hours is not None:
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        chunks.append(
            spark.createDataFrame(
                [(-(10**9), max_ts, SENTINEL_USER, "sentinel", 0.0, "{}")],
                EVENTS_SCHEMA,
            ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {sentinel_hours} HOURS"))
        )
    write_ordered_chunks(chunks, out_dir)
    return out_dir


def _time_order():
    from pyspark.sql import Window

    return Window.orderBy("ts", "event_id")


def read_event_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir)
    )


def run_to_memory(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink_name: str,
    output_mode: str,
    watermark: str | None = None,
) -> None:
    """Apply a shared transform to the stream, drain it into an
    in-memory sink table, and block until every staged file is
    processed. Returns after the query stops; read results from
    ``spark.table(sink_name)``."""
    src = stream_df
    if watermark is not None:
        # EventTimeWatermark requires TIMESTAMP (not NTZ). Session TZ is
        # pinned to UTC, so the cast preserves wall-clock values and the
        # results stay comparable with the ntz batch forms.
        src = src.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    q = (
        transform(src)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stage_jittered_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 6,
    jitter_secs: int = 900,
    sentinel_hours: int | None = None,
) -> str:
    """Like ``stage_replay_dir`` but chunked by ARRIVAL order: event
    time plus a deterministic 0–jitter_secs transit delay (the same
    Knuth multiplicative hash st4's late-data policy audits), so each
    micro-batch carries event-time disorder bounded by ``jitter_secs``
    — the out-of-order ingestion a watermark must absorb. Convergence
    tests replay through this to prove a streaming operator's result
    is arrival-order independent as long as the watermark horizon
    exceeds the disorder bound.
    """
    events = load_table(spark, sf_dir, "events")
    jitter = (F.col("event_id") * F.lit(2654435761)) % int(jitter_secs)
    staged = events.withColumn(
        "_arrival", F.col("ts") + F.make_dt_interval(secs=jitter.cast("double"))
    )
    rows = staged.count()
    per = (rows + n_chunks - 1) // n_chunks
    from pyspark.sql import Window

    w = Window.orderBy("_arrival", "event_id")
    ranked = staged.withColumn(
        "chunk", ((F.row_number().over(w) - 1) / per).cast("int")
    )
    chunks = [
        ranked.filter(F.col("chunk") == c).select(*events.columns)
        for c in range(n_chunks)
    ]
    if sentinel_hours is not None:
        max_ts = staged.agg(F.max("_arrival")).collect()[0][0]
        chunks.append(
            spark.createDataFrame(
                [(-(10**9), max_ts, SENTINEL_USER, "sentinel", 0.0, "{}")],
                EVENTS_SCHEMA,
            ).withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {sentinel_hours} HOURS")
            )
        )
    write_ordered_chunks(chunks, out_dir)
    return out_dir
