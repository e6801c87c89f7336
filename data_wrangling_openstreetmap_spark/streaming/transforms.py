"""Event-stream transformations, batch/streaming agnostic.

Each function takes the `events` DataFrame (static or streaming — the
expressions are identical; streaming only adds watermarks at the call
site) and returns the transformed DataFrame. Graded batch forms and
readStream demos both call these, so the two paths cannot drift.

Scale notes (100 TB stream): all aggregations key on low-cardinality
(window, type) or hash-partitionable (user_id) columns; state size is
bounded by watermarks (replay.py) and RocksDB state store is the
production state backend. `value` is an exact 2-decimal double →
DECIMAL sums (operators/_helpers.py) keep every total order-independent
and engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators._helpers import dsum

GAP = "30 minutes"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """ST1: 1-hour tumbling windows × event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """ST2: 1-hour windows sliding every 15 minutes (each event lands in
    4 windows; Spark expands them JVM-side, no explode needed)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame) -> DataFrame:
    """ST3: gap-based session windows per user (merge while the gap to
    the previous event is <= GAP — measured Spark semantics; session end
    = last event + GAP)."""
    return (
        events.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_keep_first(events: DataFrame) -> DataFrame:
    """ST5 batch form: first event per (user_id, event_type) by event
    time, deterministically tie-broken by event_id. The streaming form
    is `dropDuplicates` on the same keys (replay.py), whose survivor is
    arrival-order — identical when replay is time-ordered."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """ST6: stream-static join — map the stream's user_id onto the
    customer dimension (fixture ids are 0-based, custkeys 1-based), then
    aggregate per market segment. The static side broadcasts: no stream
    repartitioning at any scale."""
    joined = events.join(
        F.broadcast(customer),
        events.user_id + 1 == customer.c_custkey,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


ATTRIBUTION_WINDOW = "30 minutes"


def purchase_attribution_pairs(events: DataFrame) -> DataFrame:
    """ST6b: stream-STREAM interval join — every purchase matched to
    the same user's clicks in the preceding 30 minutes. Both sides
    derive from the (watermarked) event stream; the event-time interval
    bound in the join condition is what lets Spark evict click state
    once the watermark passes click_ts + 30 min, so state stays
    proportional to the window, not the stream. The identical
    expression runs as a plain interval self-join in batch."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (
            clicks.click_ts
            >= purchases.purchase_ts - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def purchase_attribution_left(events: DataFrame) -> DataFrame:
    """ST6c: LEFT OUTER stream-stream interval join — every purchase
    with its preceding-30-min clicks, and purchases with NO qualifying
    click still emitted (null-padded). In streaming this is the
    semantics that REQUIRES watermarks on both sides: the null row for
    an unmatched purchase can only be emitted once the watermark proves
    no matching click can still arrive, so outer results trail the
    inner ones by the watermark delay — the convergence test drains the
    stream and asserts the final image equals this batch form exactly.
    """
    src = events
    if events.isStreaming:
        # EventTimeWatermark needs TIMESTAMP (not ntz); cast once here —
        # this transform OWNS its watermarks (callers must not add one:
        # Spark forbids redefinition), because an outer stream-stream
        # join needs a watermark attached to EACH side's own event-time
        # column. A single upstream watermark forked into the two
        # filtered branches satisfies the inner join, but the outer
        # join then silently drops MATCHED rows (measured on 4.1: null
        # rows emit, matches vanish). Per-branch watermarks on the
        # renamed columns restore the documented semantics.
        src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (
            clicks.click_ts
            >= purchases.purchase_ts - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
        "left_outer",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def hopping_avg(events: DataFrame) -> DataFrame:
    """ST13: 2-hour windows hopping every 30 minutes with the exact
    order-independent average (integer-unit sum ÷ count)."""
    from ..operators._helpers import davg

    return (
        events.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), davg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def sliding_extrema(events: DataFrame) -> DataFrame:
    """ST2+ST4 (st26's streaming shape): 1-hour windows hopping every
    20 minutes with per-window count and value extrema. Min/max merge
    associatively, so the windowed state stays incremental under
    out-of-order arrival; convergence under a jittered replay with a
    watermark wider than the disorder bound is pinned in
    tests/test_streaming.py."""
    return (
        events.groupBy(F.window("ts", "1 hour", "20 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "min_value",
            "max_value",
        )
    )
