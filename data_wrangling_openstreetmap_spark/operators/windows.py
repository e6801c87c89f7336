"""Window functions and advanced aggregates (SURVEY.md §2.4–2.5).

W1–W5 (ranking, top-k per group, lag/lead, frame aggregates, as-of
fill), A4 (approx distinct), A8 (collect_list re-nesting), A9
(deterministic mode), J7 (as-of join via union + carry-forward window).

The reference's "top N per category" queries are LIMIT-based
exploratory SQL; windows are the Spark-idiomatic generalization and the
building block for sessionization and as-of semantics.

Determinism: every window ORDER BY carries a unique tiebreak key
(SURVEY.md §7 hazard 3), so rank/ntile/frames are reproducible across
partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import cents, ckpt, dsum, money, ntz_epoch_us

# ---------------------------------------------------------------------------
# q3 — top-k per group (W1 + W2). Headline bench query.
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey
         ) AS rk
  FROM customer
)
WHERE rk <= 3
"""


@register("q3_topk_window", oracle=_Q3_ORACLE, tags=("W1", "W2"))
def q3_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment.

    Scale: one shuffle on the partition key; within each partition
    Spark sorts and streams — with AQE, skewed segments split. For
    huge groups a pre-aggregation (local top-k per input partition via
    the same window on mapPartitions order) bounds memory; at this
    schema's cardinalities the plain window is optimal.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# W1 — the four ranking kinds side by side.
# ---------------------------------------------------------------------------

_W1_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("w1_rank_kinds", oracle=_W1_ORACLE, tags=("W1",))
def w1_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile over one window — all four
    share a single sort, Catalyst evaluates them in one Window node."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01 00:00:00"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# W3 — lag/lead event deltas (sessionization precursor).
# ---------------------------------------------------------------------------

_W3_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6 AS avg_gap_s,
       CAST(MAX(gap_us) AS DOUBLE) / 1e6 AS max_gap_s
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("w3_lag_lead", oracle=_W3_ORACLE, tags=("W3",))
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event time deltas per user (lag), aggregated to per-user
    gap statistics. Gap arithmetic stays in integer microseconds until
    the final division, so sums are exact and order-independent."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = ntz_epoch_us("ts")
    return (
        events.select("user_id", "event_id", "ts")
        .withColumn("gap_us", ts_us - F.lag(ts_us).over(w))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count("*") / 1e6).alias("avg_gap_s"),
            (F.max("gap_us").cast("double") / 1e6).alias("max_gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# W4 — frame-spec aggregates: running total per customer.
# ---------------------------------------------------------------------------

_W4_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DECIMAL(38,2)) AS DOUBLE) AS running_spend
FROM orders
"""


@register("w4_running_sum", oracle=_W4_ORACLE, tags=("W4",))
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer (cumulative frame). Decimal input
    keeps every prefix sum exact, so each row is engine-identical; the
    final output re-casts to double (object(Decimal) vs float64 breaks
    the driver's dtype-revealing hash) — the exact decimal maps to the
    same nearest-double on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(money("o_totalprice"))
        .over(w)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# W5 — last(ignorenulls): carry-forward fill.
# ---------------------------------------------------------------------------

_W5_ORACLE = """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
FROM events
"""


@register("w5_last_ignorenulls", oracle=_W5_ORACLE, tags=("W5",))
def w5_last_ignorenulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry the most recent purchase value forward across each user's
    event stream (as-of fill) — NULL until the first purchase."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "event_id",
        "user_id",
        F.last(purchase_value, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# A8 — collect_list / re-nesting (rebuild node_refs-style arrays).
# ---------------------------------------------------------------------------

_A8_ORACLE = """
SELECT n_name,
       array_to_string(list_sort(list(s_name)), '|') AS suppliers,
       COUNT(*) AS n_suppliers
FROM nation
JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("a8_collect_list", oracle=_A8_ORACLE, tags=("A8",))
def a8_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-nest flat rows into per-group arrays (the reference rebuilds a
    way's ordered node_refs from junction rows). sort_array makes the
    collected order deterministic — collect_list order is not. The
    graded output serializes the array with array_join('|') on both
    sides: array-typed output columns crash the driver's pandas
    canonicalizer."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "suppliers"
            ),
            F.count("*").alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# A9 — mode / top-1 per group, deterministically (count + window).
# ---------------------------------------------------------------------------

_A9_ORACLE = """
SELECT o_orderstatus, o_orderpriority AS modal_priority, cnt
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY COUNT(*) DESC, o_orderpriority
         ) AS rk
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
)
WHERE rk = 1
"""


@register("a9_mode", oracle=_A9_ORACLE, tags=("A9", "W2"))
def a9_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common priority per order status. Built as count + window
    rather than mode() because mode's tie-break is engine-arbitrary;
    this formulation pins ties lexicographically (the reference's
    most-common-street-type audit needs the same determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# A4 — approx_count_distinct (the 100 TB stand-in for exact distinct).
# The raw HLL estimate is engine-specific, so the graded output is the
# ACCURACY CONTRACT: exact count + a verdict that the estimate landed
# within the documented error band. The oracle asserts the same exact
# counts and expects the verdict true — if Spark's sketch ever drifted
# outside its rsd the hash would break, which is exactly the check a
# user of approx_count_distinct needs.
# ---------------------------------------------------------------------------

_A4_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       COUNT(*) AS n_events,
       TRUE AS hll_within_5pct
FROM events
GROUP BY event_type
"""


@register("a4_approx_distinct", oracle=_A4_ORACLE, tags=("A4",))
def a4_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per event type, graded as an
    accuracy contract against the exact count (measured error ≤0.4%
    at every fixture scale with rsd=0.02; the 5% bar is 2.5× the
    sketch's 3σ). At 100 TB the estimate replaces q5's exact distinct:
    constant memory per group vs a shuffle of every distinct pair."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("n_exact"),
        F.count("*").alias("n_events"),
    )
    within = (
        F.abs(F.col("approx_users") - F.col("n_exact"))
        <= 0.05 * F.col("n_exact")
    )
    return agg.select(
        "event_type", "n_exact", "n_events", within.alias("hll_within_5pct")
    )


# ---------------------------------------------------------------------------
# J7 — as-of join: most recent click at-or-before each purchase, per user.
# Spark has no native as-of; the union + carry-forward-window formulation
# is the scalable idiom (single shuffle on user_id, no range explosion).
# Oracle: DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------

_J7_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS us_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("j7_asof_join", oracle=_J7_ORACLE, tags=("J7", "W5"))
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (click→purchase attribution): for every purchase, the
    latest click by the same user at or before the purchase time.

    Implementation: union both sides with a kind marker, sort each
    user's timeline once (clicks before purchases on timestamp ties),
    carry the last click id/time forward with last(ignorenulls), keep
    purchase rows. One shuffle on user_id — no per-row range probe, no
    O(clicks × purchases) blow-up; this is the 100 TB-safe as-of plan.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("kind"),  # clicks sort before purchases on ts ties
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("purchase_id"),
    )
    timeline = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = ntz_epoch_us("ts")
    # single-struct carry (round 10, the j17 discipline): the click's
    # (id, ts) travel as ONE value, so a hypothetical NULL click_id
    # yields a NULL FIELD inside the still-carried struct instead of
    # silently carrying an OLDER click's id against this click's ts —
    # the multi-carry desync the static sweep
    # (plans/window_orders.multi_carry_hazards) now flags. Fixture has
    # no NULL event ids, so values are unchanged; the shape is now
    # provably NULL-synced under ANY input.
    click_rec = F.when(
        F.col("kind") == 0,
        F.struct(F.col("click_id").alias("cid"), ts_us.alias("cus")),
    )
    filled = timeline.select(
        "user_id",
        "kind",
        "purchase_id",
        ts_us.alias("ts_us"),
        F.last(click_rec, ignorenulls=True).over(w).alias("crec"),
    )
    return filled.filter(F.col("kind") == 1).select(
        F.col("purchase_id"),
        "user_id",
        F.col("crec.cid").alias("click_id"),
        (F.col("ts_us") - F.col("crec.cus")).alias("us_since_click"),
    )


# ---------------------------------------------------------------------------
# A10 — exact percentiles (median / p90). Both engines linearly
# interpolate ((1-h)·x_lo + h·x_hi); rounding absorbs the last-ulp
# differences of that arithmetic.
# ---------------------------------------------------------------------------

_A10_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("a10_percentiles", oracle=_A10_ORACLE, tags=("A1",))
def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and p90 order value per priority.

    Scale: exact percentiles need the group's values together (Spark
    sorts within the aggregation buffer) — at 100 TB switch to
    approx_percentile (t-digest; bounded memory, one pass) and grade
    rows-only, exactly as a4_approx_distinct does for COUNT DISTINCT.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# A10b — approx_percentile graded as an accuracy contract (the a4
# pattern): exact values + a verdict that the sketch landed inside its
# error band. This is the 100 TB percentile path, value-graded.
# ---------------------------------------------------------------------------

_A10B_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       TRUE AS approx_within_5pct
FROM orders
GROUP BY o_orderpriority
"""


@register("a10b_approx_percentile_contract", oracle=_A10B_ORACLE, tags=("A1", "A4"))
def a10b_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (bounded-memory one-pass sketch) graded as an
    accuracy contract against the exact percentile: measured relative
    error ≤1.1% at the smallest fixture and ≤0.07% at graded scale with
    accuracy=10000; the 5% bar would break the hash only if the sketch
    regressed. At 100 TB the sketch replaces the exact percentile,
    whose buffer holds each group's values.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("a90"),
    )
    within = (
        F.abs(F.col("a50") - F.col("median_price")) <= 0.05 * F.col("median_price")
    ) & (F.abs(F.col("a90") - F.col("p90_price")) <= 0.05 * F.col("p90_price"))
    return agg.select(
        "o_orderpriority",
        "median_price",
        "p90_price",
        within.alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# A11 — statistical aggregates: stddev/variance/correlation.
# ---------------------------------------------------------------------------

_A11_ORACLE = """
SELECT o_orderpriority,
       round(stddev_pop(o_totalprice), 2) AS sd_price,
       round(var_pop(o_totalprice), 0)    AS var_price,
       round(corr(o_totalprice, o_custkey), 6) AS corr_price_cust
FROM orders
GROUP BY o_orderpriority
"""


@register("a11_stats_agg", oracle=_A11_ORACLE, tags=("A11", "A1"))
def a11_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev/variance of order value and its (null)
    correlation with customer key, per priority.

    Determinism: variance accumulations differ across engines (Welford
    vs naive sums) by ~1e-15 relative; the absolute drift scales with
    Σx², so variance rounds to whole units and stddev to 2 dp (√ halves
    the exponent), while corr is normalized to [-1,1] → 6 dp is safe.
    Scale: single-pass partial+final moment aggregation — same shuffle
    shape as any sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.stddev_pop("o_totalprice"), 2).alias("sd_price"),
        F.round(F.var_pop("o_totalprice"), 0).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
    )


# ---------------------------------------------------------------------------
# W1b — fractional rank kinds (percent_rank / cume_dist), completing
# the analytic-rank family next to w1's integer kinds.
# ---------------------------------------------------------------------------

_W6_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("w6_rank_fractions", oracle=_W6_ORACLE, tags=("W1",))
def w6_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank ((rank-1)/(n-1)) and cume_dist (rows≤current / n)
    over the same window as w1 — both are ratios of exact integers, so
    the doubles agree bit-for-bit across engines with no rounding.

    Scale: one partitioned sort shared by both functions (single Window
    node); partitions are the 5 priority values — at 100 TB a
    finer-grained partition key (or pre-bucketed sort) bounds per-task
    sort memory.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01 00:00:00"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# W4b — RANGE-interval frame: trailing-30-day spend per customer. ROWS
# frames (w4) count rows; RANGE frames bound by ORDER-BY value — the
# sliding time-window aggregate of dashboards and feature pipelines.
# ---------------------------------------------------------------------------

_W7_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, day_num,
       SUM(cents) OVER (
         PARTITION BY o_custkey ORDER BY day_num
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
       ) / 100.0 AS trailing_30d_spend
FROM o
"""


@register("w7_range_interval_frame", oracle=_W7_ORACLE, tags=("W4", "F3"))
def w7_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer via a RANGE frame over an
    integer day number (days since 1990-01-01): the frame is bounded by
    ORDER-BY *value*, so same-day orders are peers and a gap of months
    contributes nothing — semantics a ROWS frame cannot express. The
    integer day key keeps the whole query timezone-free (the
    timestamp_ntz column is only ever date-truncated), and cents sums
    make every frame total exact on both engines.

    Scale: one shuffle on o_custkey; within each partition Spark keeps
    a sliding frame pointer over the sorted run — O(n) per partition,
    no per-row rescan. The 100 TB form is identical.
    """
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-29, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day_num.alias("day_num"),
            cents.alias("cents"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "day_num",
            (F.sum("cents").over(w) / 100.0).alias("trailing_30d_spend"),
        )
    )


# ---------------------------------------------------------------------------
# A4b — MERGEABLE sketch rollup: daily HLL sketches unioned into weekly
# estimates. Reaggregatability is the property that makes distinct
# counts tractable at 100 TB; graded (like a4) as an accuracy contract.
# ---------------------------------------------------------------------------

_A4B_ORACLE = """
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
         AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS merged_within_5pct
FROM events
GROUP BY 1
"""


@register("a4b_hll_mergeable_rollup", oracle=_A4B_ORACLE, tags=("A4", "A7"))
def a4b_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-DAY HyperLogLog sketches of user_id
    (Datasketches ``hll_sketch_agg``) are UNIONED per week and only then
    estimated — the pre-aggregation pattern behind every scale distinct
    count: materialize small per-partition sketches once, then answer
    any coarser rollup (week, month, arbitrary range) by merging
    sketches instead of re-shuffling raw IDs. A plain
    approx_count_distinct (a4) cannot do this — its per-group estimate
    is final; the sketch column is what makes the aggregate
    reaggregatable.

    Graded like a4 as an ACCURACY CONTRACT: the output carries the
    exact weekly distinct plus the verdict that the merged-sketch
    estimate landed within 5% (lgConfigK=12 ⇒ ~1.6% rsd); the sketch
    bytes never cross engines. n_days pins that the union really
    merged one sketch per day.

    Scale: two shuffles — (week, day) sketch build with partial
    aggregation map-side (sketch bytes, not IDs, cross the wire), then
    a tiny week-level union of ~7 sketches per group. At 100 TB the
    daily sketches are a persisted rollup table a few KB per key;
    every range query reads sketches, not events.
    """
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    daily = ev.groupBy(week.alias("week"), day.alias("day")).agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    merged = daily.groupBy("week").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est"),
    )
    exact = ev.groupBy(week.alias("week")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return merged.join(exact, "week").select(
        "week",
        "n_days",
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# W9 — linear interpolation over a dense calendar spine: the
# sensor/finance resampling primitive (fill each gap day with the
# value linearly between its surrounding observations). Composes the
# w8 spine-join with IGNORE NULLS carry windows — no Python, no UDF.
# ---------------------------------------------------------------------------

_W9_ORACLE = """
WITH sub AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
         CAST(round(value * 100) AS BIGINT) AS v_units
  FROM events WHERE user_id % 97 = 0
),
obs AS (
  SELECT event_type, day_idx, CAST(SUM(v_units) AS BIGINT) AS day_units
  FROM sub GROUP BY event_type, day_idx
),
spans AS (
  SELECT event_type, MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM obs GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS day_idx FROM spans
),
j AS (
  SELECT spine.event_type, spine.day_idx, obs.day_units,
         last_value(obs.day_units IGNORE NULLS) OVER (
           PARTITION BY spine.event_type ORDER BY spine.day_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN obs.day_units IS NOT NULL THEN spine.day_idx END IGNORE NULLS)
           OVER (PARTITION BY spine.event_type ORDER BY spine.day_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
         first_value(obs.day_units IGNORE NULLS) OVER (
           PARTITION BY spine.event_type ORDER BY spine.day_idx
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN obs.day_units IS NOT NULL THEN spine.day_idx END IGNORE NULLS)
           OVER (PARTITION BY spine.event_type ORDER BY spine.day_idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM spine LEFT JOIN obs
    ON spine.event_type = obs.event_type AND spine.day_idx = obs.day_idx
)
SELECT event_type, day_idx,
       ROUND(CASE WHEN day_units IS NOT NULL THEN day_units / 100.0
             ELSE (prev_v + (next_v - prev_v)
                   * CAST(day_idx - prev_d AS DOUBLE)
                   / CAST(next_d - prev_d AS DOUBLE)) / 100.0
             END, 6) AS day_value,
       (day_units IS NULL) AS interpolated
FROM j
"""


@register("w9_linear_interpolate", oracle=_W9_ORACLE, tags=("W4", "W5", "A7", "J2"))
def w9_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type value series (a deterministic ~1% user slice, so
    real gaps exist), densified to a calendar spine and linearly
    interpolated: each missing day gets prev + (next−prev)·frac from
    its surrounding observed days via IGNORE NULLS carry-forward /
    carry-backward windows. Observed days pass through exactly.

    Determinism: daily totals are exact cents integers; the
    interpolation is one double expression over integers with the SAME
    shape on both engines (identical IEEE bits), rounded at 6 dp.
    Spine endpoints are observed minima/maxima, so every gap has both
    neighbors — no extrapolation branch.

    Scale: the spine generates distributively from per-type (lo, hi);
    both windows and the join partition on event_type — at high
    cardinality (sensor ids) the same plan shards per key with no
    global ordering anywhere.
    """
    events = load_table(spark, sf_dir, "events")
    sub = events.filter(F.col("user_id") % 97 == 0).select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_idx"
        ),
        F.round(F.col("value") * 100).cast("long").alias("v_units"),
    )
    obs = sub.groupBy("event_type", "day_idx").agg(
        F.sum("v_units").alias("day_units")
    )
    spine = (
        obs.groupBy("event_type")
        .agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_idx"),
        )
    )
    j = spine.join(obs, ["event_type", "day_idx"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_units").isNotNull(), F.col("day_idx"))
    j = j.select(
        "event_type",
        "day_idx",
        "day_units",
        F.last("day_units", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_d"),
        F.first("day_units", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_d"),
    )
    interp = (
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * (F.col("day_idx") - F.col("prev_d")).cast("double")
        / (F.col("next_d") - F.col("prev_d")).cast("double")
    ) / 100.0
    return j.select(
        "event_type",
        "day_idx",
        F.round(
            F.when(
                F.col("day_units").isNotNull(), F.col("day_units") / 100.0
            ).otherwise(interp),
            6,
        ).alias("day_value"),
        F.col("day_units").isNull().alias("interpolated"),
    )


# ---------------------------------------------------------------------------
# W10 — trailing rolling correlation between two daily series (count vs
# value), computed from exact INTEGER windowed sums so the closed-form
# correlation is one identical double expression on both engines — the
# repo's integer-unit recipe extended to second moments.
# ---------------------------------------------------------------------------

_W10_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, day_idx
),
s AS (
  SELECT event_type, day_idx,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day_idx,
       ROUND((n * sxy - sx * sy)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rolling_corr
FROM s
WHERE n = 7
  AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


@register("w10_rolling_corr", oracle=_W10_ORACLE, tags=("W4", "A11", "A7"))
def w10_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-OBSERVATION trailing correlation between daily event count and
    daily value total, per event type — a ROWS frame over the daily
    aggregate, so the window spans 7 observed days; if an event_type
    has a calendar gap it covers MORE than 7 calendar days (for strict
    calendar semantics join onto a dense day spine first, as w9 does —
    this operator deliberately keeps the observation-frame form both
    engines express identically). Instead of each engine's streaming
    corr kernel (different accumulation orders ⇒ different low bits),
    the window aggregates SIX exact integer sums (n, Σx, Σy, Σx², Σy²,
    Σxy — counts and cents never overflow bigint here) and the Pearson
    closed form is evaluated once as the same double expression on both
    sides — bit-identical before the 6 dp round. Degenerate windows
    (zero variance, or fewer than 7 days) are excluded on both sides.

    Scale: one partial-aggregated groupBy to daily grain, then a
    per-key ROWS frame — bounded state, no global sort; identical to
    production rolling metrics over per-entity time series.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_idx"),
    ).agg(
        F.count("*").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-6, Window.currentRow)
    )
    s = daily.select(
        "event_type",
        "day_idx",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        var_x.cast("double") * var_y.cast("double")
    )
    return (
        s.filter((F.col("n") == 7) & (var_x > 0) & (var_y > 0))
        .select("event_type", "day_idx", F.round(corr, 6).alias("rolling_corr"))
    )


# ---------------------------------------------------------------------------
# A15 — robust outlier statistics: median + MAD and the count of
# |x − med| > 3·1.4826·MAD points per group — the cleaning gate that
# survives the heavy tails that break mean/stddev z-scores. Two exact
# percentile passes (group medians, then deviation medians) joined
# back; the a10 percentile recipe proves the cross-engine interpolation
# agrees, and the deviation pipeline reuses it verbatim.
# ---------------------------------------------------------------------------

_A15_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type
)
SELECT med.event_type,
       round(med.med, 4) AS median_value,
       round(dev.mad, 4) AS mad_value,
       CAST(SUM(CASE WHEN abs(e.value - med.med) > 3 * 1.4826 * dev.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e
JOIN med USING (event_type)
JOIN dev ON dev.event_type = med.event_type
GROUP BY med.event_type, med.med, dev.mad
"""


@register("a15_robust_outliers", oracle=_A15_ORACLE, tags=("A11", "A1", "J1"))
def a15_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier census per event type: the robust analogue of
    the 3σ rule (1.4826·MAD estimates σ under normality, so the gate
    is familiar but resists the very outliers it hunts). Both medians
    are exact interpolated percentiles — the a10-proven cross-engine
    recipe — and the outlier comparison uses the UNROUNDED statistics
    on both engines, so the census is value-deterministic; outputs
    round at 4 dp like a10.

    Scale: two grouped exact percentiles (same caveat as a10: switch
    to approx_percentile's t-digest at 100 TB) + one broadcast of the
    |groups|-row statistics back across the fact scan — the outlier
    count itself partial-aggregates map-side.
    """
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    gate = 3 * 1.4826 * F.col("mad")
    return (
        events.join(F.broadcast(med), "event_type")
        .join(F.broadcast(dev), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > gate, 1).otherwise(0)
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("median_value"),
            F.round("mad", 4).alias("mad_value"),
            "n_outliers",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# W11 — exponentially weighted moving average (EWMA) over the last 20
# observations per series. Weights are powers of 1/2, which doubles are
# EXACT at (scaling by 2⁻ʲ only shifts the exponent), so both engines
# compute bit-identical products and the 6 dp round is safe — the trick
# that makes a recursive-looking smoother cross-engine gradable.
# ---------------------------------------------------------------------------

_EWMA_SPAN = 20

_W11_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS x
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS rk
  FROM daily
)
SELECT a.event_type AS event_type, a.day_idx AS day_idx,
       ROUND(SUM(b.x * pow(0.5, a.rk - b.rk))
               / SUM(pow(0.5, a.rk - b.rk)), 6) AS ewma20
FROM ranked a JOIN ranked b
  ON a.event_type = b.event_type
 AND b.rk BETWEEN a.rk - {_EWMA_SPAN - 1} AND a.rk
GROUP BY a.event_type, a.day_idx
"""


@register("w11_ewma", oracle=_W11_ORACLE, tags=("W4", "A7", "J6"))
def w11_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized EWMA over the trailing 20 observations of each event
    type's daily value series: y_t = Σⱼ xₜ₋ⱼ·2⁻ʲ / Σⱼ 2⁻ʲ (j < 20) —
    the smoother monitoring dashboards and drift detectors run. Weights
    are halving (α = ½) so every product is exact in IEEE doubles
    (power-of-two scaling shifts the exponent, never the mantissa);
    only the final fold order differs across engines, bounded well
    under the 6 dp round.

    Formulated as a bounded self-join on observation rank (≤20 partners
    per row) rather than a frame trick like Σx·2^rk · 2^(−rk), which
    overflows once a series exceeds ~1000 observations. The rank comes
    from a PARTITIONED window (per event_type), and daily inputs are
    integer-cent sums — the _helpers recipe.

    Scale: daily grain is O(types × days); the rank window
    parallelizes across types and the self-join is an equi-join on
    event_type with a ±20 rank residual — each partition joins
    locally, output 20× the daily rows. No global sort anywhere.
    """
    from ._helpers import cents

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_idx"),
    ).agg((F.sum(cents("value")) / 100.0).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day_idx")
    ranked = daily.withColumn("rk", F.row_number().over(w))
    a, b = ranked.alias("a"), ranked.alias("b")
    wgt = F.pow(F.lit(0.5), F.col("a.rk") - F.col("b.rk"))
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.rk") >= F.col("a.rk") - (_EWMA_SPAN - 1))
        & (F.col("b.rk") <= F.col("a.rk")),
    )
    return (
        pairs.groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day_idx").alias("day_idx"),
        )
        .agg(
            F.round(
                F.sum(F.col("b.x") * wgt) / F.sum(wgt), 6
            ).alias("ewma20")
        )
    )


# ---------------------------------------------------------------------------
# A18 — percentile matrix: one pass, several metrics × several
# quantiles per group, in LONG form (metric, quantile, value). The
# unpivot-then-aggregate composition that powers "distribution
# dashboard" panels without one query per metric.
# ---------------------------------------------------------------------------

_A18_ORACLE = """
WITH long_form AS (
  SELECT event_type, 'value' AS metric, value AS x FROM events
  UNION ALL
  SELECT event_type, 'hour_of_day' AS metric,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x
  FROM events
),
agg AS (
  SELECT event_type, metric,
         ROUND(quantile_cont(x, 0.25), 4) AS q25,
         ROUND(quantile_cont(x, 0.50), 4) AS q50,
         ROUND(quantile_cont(x, 0.75), 4) AS q75,
         ROUND(quantile_cont(x, 0.95), 4) AS q95
  FROM long_form GROUP BY event_type, metric
)
SELECT event_type, metric, CAST(u.q AS DOUBLE) AS quantile,
       CASE u.q WHEN 0.25 THEN q25 WHEN 0.50 THEN q50
                WHEN 0.75 THEN q75 ELSE q95 END AS value
FROM agg, (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q) u
"""


@register("a18_percentile_matrix", oracle=_A18_ORACLE, tags=("A1", "O3", "F3"))
def a18_percentile_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution matrix: p25/p50/p75/p95 of two metrics (event
    value, hour-of-day) per event type in ONE aggregation over the
    unpivoted long form — the composition that turns "a query per
    metric per quantile" into a single shuffle keyed on (type, metric).
    Exact linear-interpolation percentiles round at 4 dp (the proven
    a10 recipe: Spark `percentile` and DuckDB `quantile_cont` share
    the interpolation rule).

    Scale: the unpivot doubles scan output but stays map-side; the
    shuffle carries (type, metric) keys so metrics parallelize instead
    of queueing as separate jobs. At 100 TB swap `percentile` for
    `approx_percentile` per a10's note — the long form is what makes
    that swap a one-line change for every panel at once.
    """
    ev = load_table(spark, sf_dir, "events")
    long_form = ev.select(
        "event_type", F.lit("value").alias("metric"), F.col("value").alias("x")
    ).unionByName(
        ev.select(
            "event_type",
            F.lit("hour_of_day").alias("metric"),
            F.hour("ts").cast("double").alias("x"),
        )
    )
    qs = [0.25, 0.5, 0.75, 0.95]
    agg = long_form.groupBy("event_type", "metric").agg(
        *[
            F.round(F.percentile("x", F.lit(q)), 4).alias(f"q{int(q * 100)}")
            for q in qs
        ]
    )
    melted = agg.unpivot(
        ["event_type", "metric"],
        [f"q{int(q * 100)}" for q in qs],
        "q_label",
        "value",
    )
    q_map = F.create_map(
        *[x for q in qs for x in (F.lit(f"q{int(q * 100)}"), F.lit(q))]
    )
    return melted.select(
        "event_type",
        "metric",
        q_map[F.col("q_label")].alias("quantile"),
        "value",
    )


# ---------------------------------------------------------------------------
# W12 — running DISTINCT count: COUNT(DISTINCT) OVER (... ROWS
# UNBOUNDED PRECEDING) is unsupported in every mainstream engine; the
# standard rewrite is first-occurrence flagging (row_number per
# (group, key) == 1) followed by a running SUM of the flags — exact,
# incremental, and window-frame-free on the distinct side.
# ---------------------------------------------------------------------------

_W12_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         (row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) = 1) AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN first_seen THEN 1 ELSE 0 END) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
"""


@register("w12_running_distinct", oracle=_W12_ORACLE, tags=("W4", "A3", "W1"))
def w12_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT event types per user as of each event —
    the windowed-distinct rewrite: flag each (user, type)'s first
    occurrence with a partitioned row_number, then running-SUM the
    flags over the user's timeline. Exactly COUNT(DISTINCT) semantics
    with only rank + sum windows, both per-user partitioned.

    Scale: two partitioned windows over one shuffle key family
    (user_id[, event_type]) — no global sort, no state explosion; the
    same rewrite is how streaming pipelines maintain per-key distinct
    counters (st5's dedup flag + st7's running sum composed).
    """
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.row_number().over(w_first) == 1).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum(F.when(F.col("first_seen"), 1).otherwise(0))
        .over(w_run)
        .cast("bigint")
        .alias("distinct_types_so_far"),
    )


# ---------------------------------------------------------------------------
# A19 — fixed-width histogram per group: the distribution summary
# behind every dashboard sparkline, as pure integer bin arithmetic.
# ---------------------------------------------------------------------------

_A19_BIN_W = 50.0

_A19_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {_A19_BIN_W}) AS BIGINT) AS bin,
       floor(value / {_A19_BIN_W}) * {_A19_BIN_W} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type, bin, bin_lo
"""


@register("a19_histogram", oracle=_A19_ORACLE, tags=("A1", "F4", "P6"))
def a19_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (bin = ⌊value/50⌋):
    one partial-aggregated groupBy whose key cardinality is
    types × occupied bins — tiny at any input size. floor on a
    non-negative double is engine-identical, so bins need no rounding.

    Scale: map-side combine collapses everything before the shuffle;
    equi-DEPTH alternatives go through a10b's approx_percentile edges
    (one pass) when the value range is unknown or skewed.
    """
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / _A19_BIN_W)
    return ev.groupBy(
        "event_type",
        bin_.alias("bin"),
        (bin_ * _A19_BIN_W).alias("bin_lo"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# W13 — time-weighted average (TWAP): each observation weighted by how
# long it was "current" (gap to the next observation) — the correct
# mean for irregularly sampled values, where the plain AVG over-weights
# bursts.
# ---------------------------------------------------------------------------

_W13_ORACLE = """
WITH seq AS (
  SELECT event_type, value,
         epoch_us(lead(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id)) - epoch_us(ts)
           AS held_us
  FROM events
)
SELECT event_type,
       ROUND(SUM(value * (held_us / 1e6)) / SUM(held_us / 1e6), 6) AS twap,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM seq
WHERE held_us IS NOT NULL
GROUP BY event_type
"""


@register("w13_time_weighted_avg", oracle=_W13_ORACLE, tags=("W4", "W3", "A7"))
def w13_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type: each observation's
    weight is the µs-exact interval until the next observation (lead),
    so a value that held for an hour counts 3600× one that held a
    second — the TWAP/metrics-rollup semantics a plain AVG silently
    gets wrong on irregular series. The last observation (no successor)
    drops on both sides. Weights derive from exact integer µs; the two
    float sums fold-order-agree far inside the 6 dp round.

    Scale: one partitioned lead window + one low-cardinality partial
    agg — no global sort; per-entity TWAPs just add the entity to both
    partition keys.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ts_us = ntz_epoch_us("ts")
    seq = ev.select(
        "event_type",
        "value",
        (F.lead(ts_us).over(w) - ts_us).alias("held_us"),
    ).filter(F.col("held_us").isNotNull())
    held_s = F.col("held_us") / 1e6
    return seq.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value") * held_s) / F.sum(held_s), 6
        ).alias("twap"),
        F.count("*").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# A20 — weighted median: the quantity-weighted price midpoint no engine
# exposes natively (DuckDB's quantile_cont and Spark's percentile are
# both unweighted). Classic rewrite: order by value, take the first row
# whose cumulative weight reaches half the total.
# ---------------------------------------------------------------------------

_A20_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS price,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty
  FROM lineitem
),
tot AS (
  SELECT l_returnflag, SUM(qty) AS total_qty FROM w GROUP BY l_returnflag
),
cum AS (
  SELECT w.l_returnflag, price,
         SUM(qty) OVER (PARTITION BY w.l_returnflag
                        ORDER BY price, qty
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_qty,
         t.total_qty
  FROM w JOIN tot t ON t.l_returnflag = w.l_returnflag
)
SELECT l_returnflag,
       MIN(price) AS weighted_median_price,
       CAST(MAX(total_qty) AS BIGINT) AS total_qty
FROM cum
WHERE cum_qty * 2 >= total_qty
GROUP BY l_returnflag
"""


@register("a20_weighted_median", oracle=_A20_ORACLE, tags=("A1", "W4", "F4"))
def a20_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: order rows by
    price within each group, running-sum the integer quantities, and
    the weighted median is the first price whose cumulative weight
    reaches half the total (2·cum ≥ total in pure integer arithmetic —
    no division, no float threshold). Ties in price break on quantity,
    identically both engines.

    Scale: one partitioned window over a per-group sort — the same
    shape as any frame aggregate; all comparisons are integers, so the
    answer is exact at any partitioning. Approximate counterpart at
    extreme group sizes: weighted t-digests, per the a10b pattern.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w_rows = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )
    tot = w_rows.groupBy("l_returnflag").agg(F.sum("qty").alias("total_qty"))
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w_rows.join(F.broadcast(tot), "l_returnflag").select(
        "l_returnflag",
        "price",
        F.sum("qty").over(win).alias("cum_qty"),
        "total_qty",
    )
    return (
        cum.filter(F.col("cum_qty") * 2 >= F.col("total_qty"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.max("total_qty").cast("bigint").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# A8b — ordered within-group string aggregation (Spark 4 LISTAGG …
# WITHIN GROUP): the deterministic sibling of collect_list (whose
# element order is partition-arrival luck and needs a sort_array fix).
# ---------------------------------------------------------------------------

_A8B_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("a8b_listagg_ordered", oracle=_A8B_ORACLE, tags=("A8", "J5", "F1"))
def a8b_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-joined nation roster per region via ``LISTAGG(...) WITHIN
    GROUP (ORDER BY ...)`` — the SQL-standard ordered string aggregate
    Spark 4 added, graded against DuckDB's ordered string_agg. Unlike
    a8's collect_list (whose order is arrival luck, canonicalized by
    sort_array), the ordering here is part of the AGGREGATE's contract.

    Scale: grouped string concat is partial-aggregated like any agg;
    the output row width is bounded by group membership (25 nations) —
    at 100 TB this stays a dimension-sized rollup, and unbounded-group
    string aggs should switch to a8's array form + explicit truncation.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    joined.createOrReplaceTempView("a8b_nations")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM a8b_nations
        GROUP BY r_name
        """
    )


# ---------------------------------------------------------------------------
# A21 — approx_top_k (Spark 4): the one-pass top-k-frequent sketch.
# Exactness regime graded directly: with #distinct far under the
# sketch's tracked-item capacity the estimates ARE the exact counts,
# so the oracle is a plain top-3 aggregate (no boundary ties in the
# fixture at any sf — checked, and the unique-item tiebreak can't
# straddle equal counts here).
# ---------------------------------------------------------------------------

_A21_ORACLE = """
SELECT lang AS item, CAST(COUNT(*) AS BIGINT) AS n
FROM documents
GROUP BY lang
ORDER BY n DESC, item
LIMIT 3
"""


@register("a21_approx_top_k", oracle=_A21_ORACLE, tags=("A4", "A9"))
def a21_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent languages via the ``approx_top_k`` sketch,
    exploded to long form. In the exact regime (5 distinct values vs
    the default 10k tracked items) the sketch must return true counts —
    any deviation is a regression and flips the hash. At web scale
    (millions of distinct domains) the same call is the one-pass
    approximate answer whose error the a16 freqItems contract bounds
    from the other side.

    Scale: one map-side sketch per partition + a tiny merge — no
    groupBy shuffle of the raw column at all; THE shape for top-domains
    dashboards over 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("a21_docs")
    return spark.sql(
        """
        SELECT t.item, CAST(t.count AS BIGINT) AS n
        FROM (
          SELECT explode(approx_top_k(lang, 3)) AS t FROM a21_docs
        )
        """
    )


# ---------------------------------------------------------------------------
# W14 — distribution window functions: percent_rank / cume_dist /
# nth_value — the remaining SQL-standard window trio (w1 covers the
# rank kinds, w6 the derived fractions).
# ---------------------------------------------------------------------------

_W14_ORACLE = """
SELECT event_id, event_type,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       nth_value(value, 2) OVER (
         PARTITION BY event_type ORDER BY value, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_lowest
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


@register("w14_dist_functions", oracle=_W14_ORACLE, tags=("W1", "W4"))
def w14_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank (rank−1)/(n−1), cume_dist rank_ties/n, and
    nth_value over a full-partition frame (every row sees its
    partition's second-lowest value). The ordering ends with the unique
    event_id, so ranks are tie-free and both fractions reduce to exact
    integer ratios — IEEE-identical doubles on both engines, no
    rounding step.

    Scale: one shuffle on event_type, one sort per partition shared by
    all three functions (a single Window node); the full-partition
    nth_value frame is evaluated as a per-partition constant, not a
    per-row rescan.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("value", 2).over(w_full).alias("second_lowest"),
    )


# ---------------------------------------------------------------------------
# W15 — gaps-and-islands: longest run of CONSECUTIVE purchase days per
# user. The island key is day − dense_rank(day): constant within a
# consecutive run, strictly decreasing across a gap — the classic
# streak/uptime/retention-run idiom.
# ---------------------------------------------------------------------------

_W15_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase'
),
islands AS (
  SELECT user_id, day,
         day - CAST(dense_rank() OVER (
           PARTITION BY user_id ORDER BY day
         ) AS INT) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len,
         MIN(day) AS run_start
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       MAX(run_len) AS longest_streak,
       CAST(MIN(CASE WHEN run_len = m THEN run_start END) AS TIMESTAMP)
         AS streak_start
FROM (SELECT *, MAX(run_len) OVER (PARTITION BY user_id) AS m FROM runs)
GROUP BY user_id
"""


@register("w15_longest_streak", oracle=_W15_ORACLE, tags=("W1", "A9", "F3"))
def w15_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day purchase streak per user, with the
    earliest start date among maximal streaks (deterministic tiebreak).
    Distinct days → island key (day − dense_rank) → per-island run
    lengths → per-user max.

    Scale: every window partitions by user_id, and the run aggregation
    collapses |distinct days| rows before the final per-user rollup —
    three exchanges all keyed on the user, no global sort. At 100 TB
    the distinct-day projection is the only heavy stage and it is a
    partial-aggregated dedup.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island",
        F.col("day") - F.dense_rank().over(w).cast("int"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("run_len"),
        F.min("day").alias("run_start"),
    )
    wmax = Window.partitionBy("user_id")
    flagged = runs.withColumn("m", F.max("run_len").over(wmax))
    return flagged.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.min(F.when(F.col("run_len") == F.col("m"), F.col("run_start")))
        .cast("timestamp_ntz")
        .alias("streak_start"),
    )


# ---------------------------------------------------------------------------
# w16 — OHLC resample: per (event_type, day), the first/highest/lowest/
# last value — the time-series downsampling every monitoring and
# finance pipeline runs. max_by/min_by over the (unique) event-time
# key, so "open" and "close" need no window and no self-join.
# ---------------------------------------------------------------------------

_W16_ORACLE = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       arg_min(CAST(round(value * 100) AS BIGINT), epoch_us(ts)) AS open_cents,
       CAST(MAX(round(value * 100)) AS BIGINT) AS high_cents,
       CAST(MIN(round(value * 100)) AS BIGINT) AS low_cents,
       arg_max(CAST(round(value * 100) AS BIGINT), epoch_us(ts)) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vol_cents
FROM events
GROUP BY 1, 2
"""


@register("w16_ohlc_resample", oracle=_W16_ORACLE, tags=("A7", "A9", "A1"))
def w16_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling of the event stream: per (event_type, day),
    open = value at the earliest timestamp, close = at the latest,
    high/low = extremes, plus count and cents volume. The ordering key
    is epoch-µs of the (fixture-unique — precondition test-pinned in
    tests/test_properties.py) event time, so arg-extrema are
    deterministic without a packed tiebreak; values grade as exact
    integer cents (a23's recipe).

    Scale: ONE partial-aggregated groupBy — max_by/min_by carry a
    single (key, candidate) pair per partition exactly like MAX, so
    the resample is a map-side-combined single shuffle on the
    (type, day) bucket key. The window/self-join formulations carry
    the whole day per task; this shape is how a 100 TB tick store
    rolls up to daily bars. At ns-resolution ties, swap the key for
    the packed (time, sequence-id) BIGINT.
    """
    ev = load_table(spark, sf_dir, "events")
    cents_v = F.round(F.col("value") * 100).cast("long")
    key = ntz_epoch_us("ts")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(
            F.min_by(cents_v, key).alias("open_cents"),
            F.max(cents_v).alias("high_cents"),
            F.min(cents_v).alias("low_cents"),
            F.max_by(cents_v, key).alias("close_cents"),
            F.count("*").alias("n"),
            F.sum(cents_v).alias("vol_cents"),
        )
    )


# ---------------------------------------------------------------------------
# a24 — count–min sketch heavy hitters: a mergeable d×w counter grid
# whose point estimates never undercount. The estimate joins back to
# the exact per-user counts so the overestimate contract (est ≥ true,
# the CMS guarantee) is graded as data.
# ---------------------------------------------------------------------------

_CMS_W = 128
_CMS_MULTS = (2654435761, 2246822519, 3266489917)  # Knuth / xxhash odd primes
_CMS_PREMOD = 1_000_003  # pre-reduce ids so id*mult never overflows BIGINT

_A24_ORACLE = f"""
WITH h(j, m) AS (
  SELECT * FROM (VALUES (0, {_CMS_MULTS[0]}), (1, {_CMS_MULTS[1]}),
                        (2, {_CMS_MULTS[2]})) AS v(j, m)
),
sketch AS (
  SELECT h.j, ((e.user_id % {_CMS_PREMOD}) * h.m) % {_CMS_W} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events e CROSS JOIN h
  GROUP BY 1, 2
),
t AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY user_id
),
est AS (
  SELECT t.user_id, t.true_n, MIN(s.c) AS cms_est
  FROM t CROSS JOIN h
  JOIN sketch s ON s.j = h.j
   AND s.bucket = ((t.user_id % {_CMS_PREMOD}) * h.m) % {_CMS_W}
  GROUP BY 1, 2
)
SELECT user_id, true_n,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - true_n AS BIGINT) AS overestimate
FROM est
ORDER BY true_n DESC, user_id
LIMIT 20
"""


@register("a24_cms_heavy_hitters", oracle=_A24_ORACLE, tags=("A4", "A9", "J5"))
def a24_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch frequency estimates for the top-20 heaviest
    event users, graded against their exact counts: d=3 rows of
    multiplicative hashes into w=128 counters; the point estimate is
    the min over the key's three counters and can only OVERcount
    (collisions add, never subtract) — `overestimate ≥ 0` for every
    row is the CMS guarantee, asserted as a semantics test. All-integer
    → engine-identical; ids pre-reduce mod a prime (1,000,003) so the
    multiply stays inside BIGINT for 64-bit key spaces.

    Scale: the sketch is d·w = 384 counters REGARDLESS of input size,
    built with one map-side-combined groupBy — and it merges by cell-
    wise addition, so per-partition / per-day sketches roll up without
    reprocessing (the same mergeability contract as a4b's HLL). The
    estimate pass broadcasts the tiny grid back onto the keys; on a
    100 TB stream the exact per-key side disappears and the sketch
    alone answers point queries in O(d) — here the exact side stays to
    make the error contract gradeable. Top-20 is TakeOrdered with a
    unique (true_n, user_id) tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    hashes = [
        F.struct(
            F.lit(j).alias("j"),
            (((F.col("user_id") % _CMS_PREMOD) * F.lit(m)) % _CMS_W).alias("bucket"),
        )
        for j, m in enumerate(_CMS_MULTS)
    ]
    sketch = (
        ev.select(F.explode(F.array(*hashes)).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    true_n = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    est = (
        true_n.select("user_id", "true_n", F.explode(F.array(*hashes)).alias("h"))
        .join(
            F.broadcast(sketch),
            (F.col("h.j") == F.col("j")) & (F.col("h.bucket") == F.col("bucket")),
        )
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.select(
            "user_id",
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).alias("overestimate"),
        )
        .orderBy(F.desc("true_n"), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# a25 — per-user Shannon entropy of the event-type mix: the behavioral
# diversity profile (bot detection: near-zero entropy = single-action
# scripts). Engine-exact via the order-pinned fold recipe: per-user
# counts sort into an array and fold SEQUENTIALLY, so the only doubles
# are an identical in-order expression on identical integers.
# ---------------------------------------------------------------------------

_LN2 = 0.6931471805599453  # ln(2), pinned as a literal on BOTH engines

_A25_ORACLE = f"""
WITH tc AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         list_sort(list(c)) AS cs
  FROM tc GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       ROUND((ln(CAST(n_events AS DOUBLE))
              - list_sum(list_transform(cs,
                  c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))))
                / n_events) / {_LN2} + 0, 6) AS entropy_bits
FROM u
"""


@register("a25_entropy_profile", oracle=_A25_ORACLE, tags=("A1", "A8", "F5"))
def a25_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy (bits) of their event-type
    distribution: H = (ln n − Σ c·ln c / n) / ln 2 from exact integer
    counts. Determinism recipe: the per-type counts are SORTED into an
    array and folded in order (Spark ``aggregate`` HOF ↔ DuckDB
    ``list_sum(list_transform(...))`` — both sequential folds, the
    l6_kmeans_step recipe), ln(2) is a pinned literal, and the result
    rounds at 6 dp with the negative-zero guard — no
    partition-order-dependent double sums anywhere.

    Scale: two shuffles (user×type count, then ≤25-element per-user
    collect) — the collected array is bounded by the event-type
    vocabulary, NOT the user's event count, so it cannot blow up. The
    per-element ln differs ≤ 1 ulp across libms; round-6 absorbs it.
    """
    ev = load_table(spark, sf_dir, "events")
    tc = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    u = tc.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_types"),
        F.array_sort(F.collect_list("c")).alias("cs"),
    )
    s = F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    entropy = F.round(
        (F.log(F.col("n_events").cast("double")) - s / F.col("n_events"))
        / F.lit(_LN2)
        + F.lit(0),
        6,
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        entropy.alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# w17 — Holt double-exponential smoothing per event type: level+trend
# recurrence over the ordered daily series, as one in-order fold. The
# classic "forecast next week from a noisy daily metric" operator;
# w11's EWMA is the level-only special case.
# ---------------------------------------------------------------------------

_W17_ALPHA = 0.5
_W17_BETA = 0.25  # exact binary fractions: scale-by-half math stays exact

_W17_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY date_trunc('day', ts)
         ) AS BIGINT) AS rn,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS x
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
),
n AS (SELECT event_type, MAX(rn) AS n_days FROM daily GROUP BY event_type),
hw(event_type, rn, l, b) AS (
  SELECT event_type, rn, x, CAST(0 AS DOUBLE) FROM daily WHERE rn = 1
  UNION ALL
  SELECT d.event_type, d.rn,
         {_W17_ALPHA} * d.x + {1 - _W17_ALPHA} * (h.l + h.b),
         {_W17_BETA} * (({_W17_ALPHA} * d.x + {1 - _W17_ALPHA} * (h.l + h.b)) - h.l)
           + {1 - _W17_BETA} * h.b
  FROM hw h JOIN daily d ON d.event_type = h.event_type AND d.rn = h.rn + 1
)
SELECT h.event_type, n.n_days,
       ROUND(h.l + 0, 6) AS level_cents,
       ROUND(h.b + 0, 6) AS trend_cents,
       ROUND(h.l + 7 * h.b + 0, 6) AS forecast_7d_cents
FROM hw h JOIN n ON n.event_type = h.event_type AND h.rn = n.n_days
"""


@register("w17_holt_linear", oracle=_W17_ORACLE, tags=("W4", "A7", "F5"))
def w17_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear method over each event type's daily cents series:
    level l ← αx + (1−α)(l+b), trend b ← β(l−l_prev) + (1−β)b, folded
    IN ORDER over the date-sorted days (init: l=x₁, b=0), reporting the
    final state and the 7-day-ahead forecast. Engine parity: the Spark
    side is one sequential ``aggregate`` fold with a struct
    accumulator; the oracle replays the IDENTICAL recurrence as a
    recursive CTE — same expressions, same order, same doubles — with
    α, β chosen as exact binary fractions and inputs as exact integer
    cents, so 6-dp rounding has ulps of headroom.

    Scale: the daily pre-aggregate is one low-cardinality shuffle; the
    fold is per-group, over an array bounded by the CALENDAR (365
    entries/year per type), not by event volume — the same bounded-
    collect argument as a25. For per-user (unbounded-key) smoothing,
    the streaming twin is st7's applyInPandasWithState carrying (l, b)
    as state.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("double")
        .alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))), lambda s: s["x"]
        ).alias("xs")
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
    )

    def step(acc, x):
        lvl = F.lit(_W17_ALPHA) * x + F.lit(1 - _W17_ALPHA) * (acc["l"] + acc["b"])
        trd = F.lit(_W17_BETA) * (lvl - acc["l"]) + F.lit(1 - _W17_BETA) * acc["b"]
        return F.when(
            acc["n"] == 0,
            F.struct(
                F.lit(1).cast("long").alias("n"),
                x.alias("l"),
                F.lit(0.0).alias("b"),
            ),
        ).otherwise(
            F.struct(
                (acc["n"] + 1).alias("n"), lvl.alias("l"), trd.alias("b")
            )
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.aggregate(F.col("xs"), acc0, step).alias("hw"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("hw.l") + 0, 6).alias("level_cents"),
        F.round(F.col("hw.b") + 0, 6).alias("trend_cents"),
        F.round(F.col("hw.l") + 7 * F.col("hw.b") + 0, 6).alias("forecast_7d_cents"),
    )


# ---------------------------------------------------------------------------
# a26 — Gini concentration of per-user spend within each event type:
# the inequality coefficient every marketplace/abuse dashboard tracks
# ("is this event type driven by a few whales?"). Exact integer
# accumulation up to one final double expression.
# ---------------------------------------------------------------------------

_A26_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(s) AS BIGINT) AS total_cents,
         list_sort(list(s)) AS xs
  FROM per_user GROUP BY event_type
),
w AS (
  SELECT event_type, n_users, total_cents,
         CAST(list_sum(list_transform(generate_series(1, len(xs)),
                                      i -> i * xs[i])) AS BIGINT) AS wsum
  FROM g
)
SELECT event_type, n_users, total_cents,
       CASE WHEN total_cents = 0 THEN 0.0
            ELSE ROUND(2.0 * wsum / (CAST(n_users AS DOUBLE) * total_cents)
                       - CAST(n_users + 1 AS DOUBLE) / n_users + 0, 6)
       END AS gini
FROM w
"""


@register("a26_gini_concentration", oracle=_A26_ORACLE, tags=("A1", "A8", "F4"))
def a26_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the Gini coefficient of per-user cents totals:
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the ASCENDING-sorted totals.
    Everything through Σ i·xᵢ is exact BIGINT (rank-weighting equal
    values is permutation-invariant, so the integer sort fully pins
    the sum); the single closing double expression is written
    identically on both engines and rounds at 6 dp.

    Scale: the per-user rollup is one hash shuffle; the per-type
    collect is bounded by the USER population of that type, so at
    100 TB the sorted-array form gives way to the equivalent
    rank-decomposed formulation (per-user rank via the two-level
    scalable_row_number, then Σ rank·x as a plain aggregate — same
    integers, no array) — the rewrite is mechanical because the
    statistic is already expressed in rank form.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s")
    )
    g = per_user.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        F.sum("s").alias("total_cents"),
        F.array_sort(F.collect_list("s")).alias("xs"),
    )
    wsum = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1).cast("long"), F.size("xs").cast("long")),
            F.col("xs"),
            lambda i, x: i * x,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    gini = F.when(F.col("total_cents") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(2.0) * F.col("wsum") / (F.col("n_users").cast("double") * F.col("total_cents"))
            - (F.col("n_users") + 1).cast("double") / F.col("n_users")
            + F.lit(0),
            6,
        )
    )
    return (
        g.select(
            "event_type",
            "n_users",
            "total_cents",
            wsum.alias("wsum"),
        )
        .select(
            "event_type",
            "n_users",
            "total_cents",
            gini.alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# j15 — nearest-event join: for every purchase, the click closest in
# time in EITHER direction — the bidirectional generalization of j7's
# backward as-of, still as one timeline pass (carry last-prev and
# first-next, pick the closer), never a per-row range probe.
# ---------------------------------------------------------------------------

_J15_FAR = 1 << 62

_J15_ORACLE = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       b.click_id, b.gap_us
FROM p JOIN LATERAL (
  SELECT c.event_id AS click_id,
         CAST(abs(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS gap_us
  FROM c WHERE c.user_id = p.user_id
  ORDER BY gap_us, click_id LIMIT 1
) b ON true
"""


@register("j15_nearest_event_join", oracle=_J15_ORACLE, tags=("J7", "W5", "W3"))
def j15_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-click attribution: each purchase matches the click by
    the same user with the smallest |Δt| — before OR after — with a
    (gap, click_id) tiebreak when one click precedes and another
    follows at the same distance. The oracle is the quadratic LATERAL
    top-1; the Spark plan is the union-timeline: one window carries
    the latest preceding click, a mirrored frame carries the earliest
    following one, and a struct-least picks the closer — two
    candidates per purchase, by construction the only possible
    minima (event times are fixture-unique; the precondition test
    pins that).

    Scale: identical shape to j7 — one shuffle on user_id, two frame
    aggregates over the same sort, no join at all. The LATERAL form
    the oracle runs is O(purchases × clicks-per-user); this plan is
    O(timeline) and survives any per-user history length.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("kind"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),  # unused on purchase rows
        F.lit(1).alias("kind"),
    )
    # single-struct carry (round 10, the j17 discipline — see j7): the
    # click's (id, us) travel as ONE ignorenulls pick per direction, so
    # the pair can never desync onto different source clicks; the
    # multi-carry static sweep (plans/window_orders.multi_carry_hazards)
    # flags the old two-column form as not provably NULL-synced.
    # Fixture values unchanged (no NULL event ids).
    tl = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "kind",
        ntz_epoch_us("ts").alias("us"),
        F.when(
            F.col("kind") == 0,
            F.struct(
                F.col("click_id").alias("cid"),
                ntz_epoch_us("ts").alias("cus"),
            ),
        ).alias("c_rec"),
        F.when(F.col("kind") == 1, F.col("click_id")).alias("p_id"),
    )
    order = [F.col("us"), F.col("kind")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    enriched = (
        tl.select(
            "user_id",
            "us",
            "kind",
            "p_id",
            F.last("c_rec", ignorenulls=True).over(w_prev).alias("prev_rec"),
            F.first("c_rec", ignorenulls=True).over(w_next).alias("next_rec"),
        )
        .filter(F.col("kind") == 1)
        .select(
            "user_id",
            "us",
            "kind",
            "p_id",
            F.col("prev_rec.cid").alias("prev_id"),
            F.col("prev_rec.cus").alias("prev_us"),
            F.col("next_rec.cid").alias("next_id"),
            F.col("next_rec.cus").alias("next_us"),
        )
    )
    far = F.lit(_J15_FAR)
    prev_cand = F.struct(
        F.coalesce(F.col("us") - F.col("prev_us"), far).alias("gap_us"),
        F.coalesce(F.col("prev_id"), far).alias("click_id"),
    )
    next_cand = F.struct(
        F.coalesce(F.col("next_us") - F.col("us"), far).alias("gap_us"),
        F.coalesce(F.col("next_id"), far).alias("click_id"),
    )
    best = F.least(prev_cand, next_cand)
    return (
        enriched.select(
            F.col("p_id").alias("purchase_id"),
            "user_id",
            best["click_id"].alias("click_id"),
            best["gap_us"].alias("gap_us"),
        )
        .filter(F.col("gap_us") < far)
    )


# ---------------------------------------------------------------------------
# w18 — CUSUM changepoint: per event type, the day where the cumulative
# deviation from the series mean peaks — level-shift detection with
# ZERO floating point: the deviation is scaled by n (Dᵢ = n·Pᵢ − i·T),
# keeping every intermediate an exact integer.
# ---------------------------------------------------------------------------

_W18_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, day, x,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
         CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS p,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS t
  FROM daily
),
d AS (
  SELECT event_type, day, i, n, t,
         n * p - i * t AS dev
  FROM c
)
SELECT event_type, n AS n_days, t AS total_cents,
       abs(dev) AS peak_absdev,
       day AS peak_day,
       CAST(CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END AS INT)
         AS peak_sign
FROM d
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY abs(dev) DESC, i) = 1
"""


@register("w18_cusum_changepoint", oracle=_W18_ORACLE, tags=("W4", "A7", "W1"))
def w18_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detector per event type: with daily cents xᵢ,
    prefix sums Pᵢ, total T and n days, the scaled deviation
    Dᵢ = n·Pᵢ − i·T is n times the classic CUSUM(mean) statistic —
    identical argmax, but pure BIGINT, so the peak day, its magnitude
    and its direction hash-match across engines with no rounding
    anywhere. Peak = max |Dᵢ| with the earliest-day tiebreak (a
    mid-series sign change cannot tie |D| by accident: ties resolve
    to the first index on both sides).

    Scale: the prefix window is partitioned by event_type and the
    series is CALENDAR-bounded per type (w17's argument), so no
    unbounded single-partition sort exists; the argmax is one more
    bounded window over the same partitioning. The daily rollup is
    the only data-sized shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    c = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("x").over(w_ord).alias("p"),
        F.count("*").over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("t"),
    )
    d = c.withColumn("dev", F.col("n") * F.col("p") - F.col("i") * F.col("t"))
    w_peak = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("dev")).desc(), "i"
    )
    return (
        d.withColumn("rk", F.row_number().over(w_peak))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("t").alias("total_cents"),
            F.abs(F.col("dev")).alias("peak_absdev"),
            "day",
            F.when(F.col("dev") > 0, 1)
            .when(F.col("dev") < 0, -1)
            .otherwise(0)
            .cast("int")
            .alias("peak_sign"),
        )
        .withColumnRenamed("day", "peak_day")
    )


# ---------------------------------------------------------------------------
# w19 — Theil–Sen robust trend: the median of all pairwise daily
# slopes per event type — the estimator that shrugs off the outlier
# days that wreck least squares (w17's smoothing reacts to them).
# ---------------------------------------------------------------------------

_W19_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type,
         CAST(b.x - a.x AS DOUBLE) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
g AS (
  SELECT event_type, list_sort(list(slope)) AS ss
  FROM slopes GROUP BY event_type
)
SELECT event_type,
       CAST(len(ss) AS BIGINT) AS n_pairs,
       ROUND(CASE WHEN len(ss) % 2 = 1 THEN ss[(len(ss) + 1) // 2]
                  ELSE (ss[len(ss) // 2] + ss[len(ss) // 2 + 1]) / 2.0
             END + 0, 6) AS ts_slope_cents_per_day
FROM g
"""


@register("w19_theil_sen", oracle=_W19_ORACLE, tags=("W4", "A7", "J8"))
def w19_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen slope per event type: every day-pair's slope
    (Δcents/Δdays — numerator and denominator exact integers, one
    identical double division), median taken by EXPLICIT sorted-array
    indexing — not the engines' median() aggregates, whose even-count
    interpolations are algebraically equal but float-differently
    ((a+b)/2 vs a+(b−a)·0.5) — so both engines round the same double.

    Scale: the pairwise join is per-type and CALENDAR-bounded (w17's
    argument: ~365²/2 pairs/type/year — thousands, not data-sized), so
    "quadratic" here is a constant. For unbounded series the
    estimator degrades gracefully to the repeated-median over a
    day-sampled grid — same plan with a sampled spine.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.x") - F.col("a.x")).cast("double")
            / (F.col("b.d") - F.col("a.d"))
        ).alias("slope"),
    )
    g = slopes.groupBy("event_type").agg(
        F.array_sort(F.collect_list("slope")).alias("ss")
    )
    n = F.size("ss").cast("long")
    median = F.when(
        n % 2 == 1, F.element_at(F.col("ss"), ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(F.col("ss"), (n / 2).cast("int"))
            + F.element_at(F.col("ss"), (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return g.select(
        "event_type",
        n.alias("n_pairs"),
        F.round(median + F.lit(0), 6).alias("ts_slope_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# w21 — irregular-gap EWMA: exponential decay by the ACTUAL elapsed
# time between observations (half-life form), not by row count — the
# estimator event streams need because w11's per-step decay assumes a
# regular cadence.
# ---------------------------------------------------------------------------

_W21_HALF_LIFE_US = 3_600_000_000  # 1 hour

_W21_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS BIGINT) AS rn,
         epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
n AS (SELECT user_id, MAX(rn) AS n_events FROM ev GROUP BY user_id),
w(user_id, rn, us, s, z) AS (
  SELECT user_id, rn, us, CAST(v AS DOUBLE), CAST(1 AS DOUBLE)
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.us,
         e.v + pow(0.5, CAST(e.us - w.us AS DOUBLE) / {_W21_HALF_LIFE_US}) * w.s,
         1 + pow(0.5, CAST(e.us - w.us AS DOUBLE) / {_W21_HALF_LIFE_US}) * w.z
  FROM w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT w.user_id, n.n_events,
       ROUND(w.s / w.z + 0, 6) AS ewma_cents
FROM w JOIN n ON n.user_id = w.user_id AND w.rn = n.n_events
"""


@register("w21_ewma_irregular", oracle=_W21_ORACLE, tags=("W4", "W3", "F3"))
def w21_ewma_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA with a 1-hour HALF-LIFE over irregular event
    times: each step decays the running numerator/normalizer by
    0.5^(Δt/H) for the actual µs gap, so a burst of events and a
    week-old one weigh correctly regardless of cadence. One in-order
    fold per user (struct accumulator carrying prev-time, numerator,
    normalizer) against the oracle's recursive-CTE replay of the
    identical recurrence — pow() differs ≤1 ulp per step across
    libms; ~10³ steps compound far below the 6-dp round.

    Scale: per-user histories are the fold arrays (q30's bounded-
    history argument); for unbounded keys the same recurrence runs
    incrementally as st7-style applyInPandasWithState carrying (t, s,
    z) — the operator is associative-free on purpose, which is WHY
    the streaming form needs state rather than a window rewrite.
    """
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        ntz_epoch_us("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    series = rows.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "eid", "v"))).alias("xs")
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("prev_us"),
        F.lit(0.0).alias("s"),
        F.lit(0.0).alias("z"),
    )

    def step(acc, x):
        decay = F.pow(
            F.lit(0.5),
            (x["us"] - acc["prev_us"]).cast("double") / F.lit(_W21_HALF_LIFE_US),
        )
        return F.when(
            acc["n"] == 0,
            F.struct(
                F.lit(1).cast("long").alias("n"),
                x["us"].alias("prev_us"),
                x["v"].cast("double").alias("s"),
                F.lit(1.0).alias("z"),
            ),
        ).otherwise(
            F.struct(
                (acc["n"] + 1).alias("n"),
                x["us"].alias("prev_us"),
                (x["v"] + decay * acc["s"]).alias("s"),
                (F.lit(1.0) + decay * acc["z"]).alias("z"),
            )
        )

    folded = series.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        F.aggregate(F.col("xs"), acc0, step).alias("w"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round(F.col("w.s") / F.col("w.z") + F.lit(0), 6).alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# w22 — weekly autocorrelation: ACF at lag 7 of the daily cents
# series per event type — the seasonality detector that says whether
# w17/w19's trend models need a weekly term.
# ---------------------------------------------------------------------------

_W22_LAG = 7

_W22_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY date_trunc('day', ts)
         ) AS BIGINT) AS i,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t
  FROM daily GROUP BY event_type
),
-- deviations scaled by n: d_i = n·x_i − T (exact integers)
dev AS (
  SELECT d.event_type, d.i, m.n, d.x * m.n - m.t AS d
  FROM daily d JOIN m ON m.event_type = d.event_type
),
pairs AS (
  SELECT a.event_type, a.n,
         list_sort(list([a.i, a.d, b.d])) AS num_terms
  FROM dev a JOIN dev b
    ON b.event_type = a.event_type AND b.i = a.i + {_W22_LAG}
  GROUP BY a.event_type, a.n
),
den AS (
  SELECT event_type, list_sort(list([i, d])) AS den_terms
  FROM dev GROUP BY event_type
)
SELECT event_type, n_days,
       CASE WHEN den_sum = 0 THEN 0.0
            ELSE ROUND(num_sum / den_sum + 0, 6)
       END AS acf7
FROM (
  SELECT p.event_type, p.n AS n_days,
         list_sum(list_transform(p.num_terms,
           x -> CAST(x[2] AS DOUBLE) * CAST(x[3] AS DOUBLE))) AS num_sum,
         list_sum(list_transform(d.den_terms,
           x -> CAST(x[2] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS den_sum
  FROM pairs p JOIN den d ON d.event_type = p.event_type
)
"""


@register("w22_weekly_autocorr", oracle=_W22_ORACLE, tags=("W4", "W3", "A7"))
def w22_weekly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 autocorrelation per event type: deviations scale by n
    (dᵢ = n·xᵢ − T, exact BIGINT — w18's trick), the lag pairing is a
    self-join on day index i ↔ i+7, and both the numerator Σdᵢdᵢ₊₇
    and denominator Σdᵢ² fold IN INDEX ORDER over sorted term arrays
    (the products exceed BIGINT at scale, so each term casts to
    double INSIDE the pinned fold — identical order, identical
    doubles). One ratio, 6-dp round. |acf7| near 1 = strong weekly
    seasonality.

    Scale: daily rollup is the only data-sized shuffle; everything
    after is calendar-bounded per type (≤365 terms/year). The
    constant-series edge (all dᵢ = 0) returns the documented 0.0
    sentinel on both engines instead of dividing by zero (Spark's
    ANSI mode would throw).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    # localCheckpoint: idx (O(days x types)) feeds the moment aggregate
    # and both sides of the lag self-join — re-derived 3x otherwise.
    idx = daily.select(
        "event_type",
        F.row_number().over(w_ord).cast("long").alias("i"),
        "x",
    ).transform(ckpt)
    m = idx.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("t")
    )
    dev = idx.join(F.broadcast(m), "event_type").select(
        "event_type",
        "i",
        "n",
        (F.col("x") * F.col("n") - F.col("t")).alias("d"),
    )
    a, b = dev.alias("a"), dev.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.i") == F.col("a.i") + _W22_LAG),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), F.col("a.n").alias("n"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.array(F.col("a.i"), F.col("a.d"), F.col("b.d"))
                )
            ).alias("num_terms")
        )
    )
    den = dev.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.array(F.col("i"), F.col("d"), F.col("d")))
        ).alias("den_terms")
    )

    def fsum(col):
        # the d·d products multiply as DOUBLES inside the fold — the
        # BIGINT product would overflow once n·x passes ~3e9 cents.
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x[1].cast("double") * x[2].cast("double"),
        )

    sums = pairs.join(den, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        fsum(F.col("num_terms")).alias("num_sum"),
        fsum(F.col("den_terms")).alias("den_sum"),
    )
    # constant series → Σd² is exactly 0.0 on both engines; sentinel
    # instead of an ANSI divide-by-zero.
    return sums.select(
        "event_type",
        "n_days",
        F.when(F.col("den_sum") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("num_sum") / F.col("den_sum") + F.lit(0), 6))
        .alias("acf7"),
    )


# ---------------------------------------------------------------------------
# w23 — Kendall's τ-b between the daily purchase and click volumes:
# the rank correlation that asks "do busy click days rank as busy
# purchase days?" without assuming linearity (w10's Pearson does).
# Concordant/discordant pair counting is pure integers.
# ---------------------------------------------------------------------------

_W23_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM events GROUP BY 1
),
pairs AS (
  SELECT sign(b.p - a.p) AS dp, sign(b.c - a.c) AS dc
  FROM daily a JOIN daily b ON a.day < b.day
),
m AS (
  SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
         CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN dp * dc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN dp * dc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
         CAST(SUM(CASE WHEN dp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_p,
         CAST(SUM(CASE WHEN dc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tie_c
  FROM pairs
)
SELECT n_days, conc, disc,
       CASE WHEN (n0 - tie_p) * (n0 - tie_c) = 0 THEN 0.0
            ELSE ROUND(CAST(conc - disc AS DOUBLE)
                       / sqrt(CAST((n0 - tie_p) * (n0 - tie_c) AS DOUBLE))
                       + 0, 6)
       END AS tau_b
FROM m
"""


@register("w23_kendall_tau", oracle=_W23_ORACLE, tags=("W4", "A11", "J8"))
def w23_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between daily purchase and click counts: every day
    pair classifies as concordant, discordant, or tied per side by
    integer sign comparison, and τ_b = (C−D)/√((n₀−t_p)(n₀−t_c))
    evaluates once from five exact integers. Complements w10's
    Pearson (linear) and a27's Mann–Whitney (two-sample): this is the
    paired-series monotone-association statistic.

    Scale: the day-pair self-join is calendar-bounded (w19's
    argument — 365²/2 pairs/year, a constant); the daily rollup is
    the only data-sized shuffle. For unbounded series the estimator
    switches to the O(n log n) merge-sort inversion count over the
    scale-safe rank — same integers, no pair join.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.signum(F.col("b.p") - F.col("a.p")).cast("long").alias("dp"),
        F.signum(F.col("b.c") - F.col("a.c")).cast("long").alias("dc"),
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    m = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("dp") * F.col("dc") > 0, 1).otherwise(0)).alias("conc"),
        F.sum(F.when(F.col("dp") * F.col("dc") < 0, 1).otherwise(0)).alias("disc"),
        F.sum(F.when(F.col("dp") == 0, 1).otherwise(0)).alias("tie_p"),
        F.sum(F.when(F.col("dc") == 0, 1).otherwise(0)).alias("tie_c"),
    ).crossJoin(F.broadcast(n_days))
    # all-tied sides (constant series, or n_days < 2 → n0 = 0) zero the
    # denominator; 0.0 sentinel instead of an ANSI divide-by-zero.
    denom = (F.col("n0") - F.col("tie_p")) * (F.col("n0") - F.col("tie_c"))
    tau = F.when(denom == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / F.sqrt(denom.cast("double"))
            + F.lit(0),
            6,
        )
    )
    return m.select("n_days", "conc", "disc", tau.alias("tau_b"))


# ---------------------------------------------------------------------------
# w24 — Wald–Wolfowitz runs test: are daily up/down moves random, or
# do they streak? Counts sign runs with the gaps-and-islands window
# and compares against the exact expected-runs formula — the
# randomness check behind "is this metric trending or just noisy".
# ---------------------------------------------------------------------------

_W24_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
mv AS (
  SELECT event_type, day,
         sign(x - lag(x) OVER (PARTITION BY event_type ORDER BY day)) AS s
  FROM daily
),
nz AS (SELECT event_type, day, s FROM mv WHERE s IS NOT NULL AND s <> 0),
runs AS (
  SELECT event_type, s,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              - row_number() OVER (PARTITION BY event_type, s ORDER BY day)
              AS BIGINT) AS island
  FROM nz
),
g AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT (s, island)) AS BIGINT) AS r,
         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
  FROM runs GROUP BY event_type
)
SELECT event_type, r AS n_runs, n_up, n_down,
       CASE WHEN n_up = 0 OR n_down = 0
                 OR 2 * n_up * n_down - n_up - n_down = 0 THEN 0.0
            ELSE ROUND(
              (r - (2.0 * n_up * n_down / (n_up + n_down) + 1))
              / sqrt(2.0 * n_up * n_down
                     * (2.0 * n_up * n_down - n_up - n_down)
                     / ((CAST(n_up + n_down AS DOUBLE))
                        * (n_up + n_down)
                        * (n_up + n_down - 1))) + 0, 6)
       END AS z_runs
FROM g
"""


@register("w24_runs_test", oracle=_W24_ORACLE, tags=("W1", "W3", "A11"))
def w24_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test per event type over daily up/down moves: lag gives
    each day a sign, zero-moves drop (the standard dichotomized
    form), runs count via the double-row-number island id, and the
    normal-approximation z evaluates one identical double expression
    from three exact integers (guarded 0.0 when a side is empty —
    ANSI would throw on the division). |z| ≫ 2 means streaky
    (trending/autocorrelated); ≈ 0 is coin-flip noise.

    Scale: both windows partition by event_type over calendar-bounded
    series (w17's argument); the daily rollup is the only data-sized
    shuffle — same cost envelope as w18's CUSUM, which answers WHERE
    the shift is while this answers WHETHER the series is random.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    mv = daily.select(
        "event_type",
        "day",
        F.signum(F.col("x") - F.lag("x").over(w_ord)).alias("s"),
    )
    nz = mv.filter(F.col("s").isNotNull() & (F.col("s") != 0))
    w_all = Window.partitionBy("event_type").orderBy("day")
    w_sgn = Window.partitionBy("event_type", "s").orderBy("day")
    runs = nz.select(
        "event_type",
        "s",
        (F.row_number().over(w_all) - F.row_number().over(w_sgn)).alias("island"),
    )
    g = runs.groupBy("event_type").agg(
        F.count_distinct(F.struct("s", "island")).alias("r"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n_down"),
    )
    up, dn, r = F.col("n_up"), F.col("n_down"), F.col("r")
    n = up + dn
    # the variance term 2·u·d·(2·u·d−u−d) is ALSO zero at u=d=1 —
    # guard it alongside the empty sides (ANSI divide).
    z = F.when(
        (up == 0) | (dn == 0) | (2 * up * dn - up - dn == 0), F.lit(0.0)
    ).otherwise(
        F.round(
            (r - (F.lit(2.0) * up * dn / n + 1))
            / F.sqrt(
                F.lit(2.0)
                * up
                * dn
                * (F.lit(2.0) * up * dn - up - dn)
                / (n.cast("double") * n * (n - 1))
            )
            + F.lit(0),
            6,
        )
    )
    return g.select(
        "event_type",
        r.alias("n_runs"),
        "n_up",
        "n_down",
        z.alias("z_runs"),
    )


# ---------------------------------------------------------------------------
# W26 — Bollinger bands (round 4): 7-day trailing mean ± 2σ over daily
# revenue, every statistic derived from exact integer moments.
# ---------------------------------------------------------------------------

_W26_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_units
  FROM orders GROUP BY 1
), m AS (
  SELECT d, rev_units,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(rev_units) OVER w AS BIGINT) AS s1,
         -- HUGEINT: a daily cent total squares past BIGINT around
         -- $10^9/day (the a32/round-4 overflow class; w26 hit it at
         -- sf0.1 in the round-6 sweep)
         SUM(CAST(rev_units AS HUGEINT) * rev_units) OVER w AS s2
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(d AS TIMESTAMP) AS day,
       rev_units / 100.0 AS revenue,
       round(s1 / (100.0 * n), 6) + 0 AS mid_band,
       round(sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) / (100.0 * n), 6) + 0 AS sigma,
       round(s1 / (100.0 * n)
             + 2 * sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) / (100.0 * n), 6) + 0
         AS upper_band,
       round(s1 / (100.0 * n)
             - 2 * sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)) / (100.0 * n), 6) + 0
         AS lower_band
FROM m
"""


@register("w26_bollinger_bands", oracle=_W26_ORACLE, tags=("W4", "F4", "A7"))
def w26_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily order revenue: trailing-7-OBSERVATION
    mean and population σ (partial windows at the head use their actual
    n), bands at ±2σ. Σx stays an exact BIGINT of integer cents; Σx²
    accumulates in DECIMAL(38,0)/HUGEINT (the a32/round-4 recipe —
    a daily cent total squares past BIGINT around $10⁹/day, which the
    round-6 sf0.1 sweep hit under ANSI), so mean and σ are single
    double expressions computed from identical exact integers on both
    engines — then rounded to 6 dp (`+ 0` normalizes -0.0).

    Scale: the frame runs over the O(days) daily aggregate — bounded
    input, the plan sweep's admissible SinglePartition shape.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("rev_units"))
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    m = (
        daily.withColumn("n", F.count("*").over(w))
        .withColumn("s1", F.sum("rev_units").over(w))
        .withColumn(
            "s2",
            F.sum(
                F.col("rev_units").cast("decimal(38,0)") * F.col("rev_units")
            ).over(w),
        )
    )
    var_scaled = (
        F.col("n") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    sigma = F.sqrt(var_scaled.cast("double")) / (100.0 * F.col("n"))
    mid = F.col("s1") / (100.0 * F.col("n"))
    return m.select(
        F.col("d").cast("timestamp").alias("day"),
        (F.col("rev_units") / 100.0).alias("revenue"),
        (F.round(mid, 6) + 0).alias("mid_band"),
        (F.round(sigma, 6) + 0).alias("sigma"),
        (F.round(mid + 2 * sigma, 6) + 0).alias("upper_band"),
        (F.round(mid - 2 * sigma, 6) + 0).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# W27 — top daily movers (round 4): largest absolute day-over-day
# revenue swings per market segment, top-3 per day.
# ---------------------------------------------------------------------------

_W27_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         c_mktsegment,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_units
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), changed AS (
  SELECT d, c_mktsegment, rev_units,
         lag(rev_units) OVER (PARTITION BY c_mktsegment ORDER BY d) AS prev_units
  FROM daily
), pct AS (
  SELECT d, c_mktsegment,
         rev_units / 100.0 AS revenue,
         (rev_units - prev_units) / CAST(prev_units AS DOUBLE) AS chg
  FROM changed
  WHERE prev_units IS NOT NULL AND prev_units <> 0
)
SELECT CAST(d AS TIMESTAMP) AS day, c_mktsegment, revenue,
       round(chg, 6) + 0 AS pct_change,
       CAST(mover_rank AS BIGINT) AS mover_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY d ORDER BY abs(chg) DESC, c_mktsegment
  ) AS mover_rank
  FROM pct
)
WHERE mover_rank <= 3
"""


@register("w27_top_movers", oracle=_W27_ORACLE, tags=("W2", "W3", "A7"))
def w27_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 absolute day-over-day revenue movers per day across market
    segments: partitioned lag for the change, then a per-day top-k.
    The change ratio divides two exact BIGINTs, so the doubles — and
    the |chg| ranking — are engine-identical; segment name breaks
    ranking ties deterministically. First-day rows (no predecessor)
    are excluded on both engines.

    Scale: daily×segment aggregate is the only fact shuffle; both
    windows partition by bounded keys (segment; day) and the top-k
    filter plans as WindowGroupLimit — partial per-day heaps before
    the exchange.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.to_date("o_orderdate").alias("d"), "c_mktsegment")
        .agg(F.sum(cents("o_totalprice")).alias("rev_units"))
    )
    prev = F.lag("rev_units").over(Window.partitionBy("c_mktsegment").orderBy("d"))
    pct = (
        daily.withColumn("prev_units", prev)
        .filter(F.col("prev_units").isNotNull() & (F.col("prev_units") != 0))
        .select(
            "d",
            "c_mktsegment",
            (F.col("rev_units") / 100.0).alias("revenue"),
            (
                (F.col("rev_units") - F.col("prev_units"))
                / F.col("prev_units").cast("double")
            ).alias("chg"),
        )
    )
    rank_w = Window.partitionBy("d").orderBy(F.abs(F.col("chg")).desc(), "c_mktsegment")
    return (
        pct.withColumn("mover_rank", F.row_number().over(rank_w))
        .filter(F.col("mover_rank") <= 3)
        .select(
            F.col("d").cast("timestamp").alias("day"),
            "c_mktsegment",
            "revenue",
            (F.round("chg", 6) + 0).alias("pct_change"),
            F.col("mover_rank").cast("bigint").alias("mover_rank"),
        )
    )


# ---------------------------------------------------------------------------
# W28 — maximum drawdown (round 4): worst peak-to-current decline of
# the daily revenue series, located deterministically.
# ---------------------------------------------------------------------------

_W28_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_units
  FROM orders GROUP BY 1
), dd AS (
  SELECT d, rev_units,
         MAX(rev_units) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev_units
           AS dd_units
  FROM daily
)
SELECT CAST(d AS TIMESTAMP) AS trough_day,
       dd_units / 100.0 AS max_drawdown,
       rev_units / 100.0 AS trough_revenue
FROM (
  SELECT *, row_number() OVER (ORDER BY dd_units DESC, d) AS rn FROM dd
)
WHERE rn = 1
"""


@register("w28_max_drawdown", oracle=_W28_ORACLE, tags=("W4", "O2", "A7"))
def w28_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily revenue series: running peak minus
    current value, maximized — the worst decline-from-peak any
    monitoring window would have seen; earliest day breaks exact-tie
    drawdowns. All-integer cents until the final /100.

    Scale: both the prefix max and the argmax run over the O(days)
    daily aggregate (bounded windows; the top-1 is an orderBy+limit
    TakeOrdered on the same bounded table). On an UNBOUNDED row-level
    series the prefix max would switch to
    _helpers.scalable_running_max — st4/st14 grade exactly that form.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("rev_units"))
    )
    peak_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.withColumn(
        "dd_units", F.max("rev_units").over(peak_w) - F.col("rev_units")
    )
    return (
        dd.orderBy(F.col("dd_units").desc(), "d")
        .limit(1)
        .select(
            F.col("d").cast("timestamp").alias("trough_day"),
            (F.col("dd_units") / 100.0).alias("max_drawdown"),
            (F.col("rev_units") / 100.0).alias("trough_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# W30 — additive seasonal decomposition (round 4): daily revenue =
# trend + weekly seasonal + remainder, STL-lite with a centered 7-day
# moving-average trend — every component an exact integer quotient.
# ---------------------------------------------------------------------------

_W30_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS u
  FROM orders GROUP BY 1
),
ma AS (
  SELECT d, u,
         CAST(SUM(u) OVER w AS BIGINT) AS s7,
         CAST(COUNT(*) OVER w AS BIGINT) AS n7
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_w AS (
  SELECT d, u, s7, 7 * u - s7 AS dtr,
         CAST(isodow(d) AS BIGINT) AS dow
  FROM ma WHERE n7 = 7
),
season AS (
  SELECT dow,
         CAST(SUM(dtr) AS BIGINT) AS sd,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM full_w GROUP BY dow
)
SELECT CAST(f.d AS TIMESTAMP) AS day,
       f.u / 100.0 AS revenue,
       round(f.s7 / 700.0, 6) + 0 AS trend,
       round(s.sd / (700.0 * s.nd), 6) + 0 AS seasonal,
       round((f.dtr * s.nd - s.sd) / (700.0 * s.nd), 6) + 0 AS remainder
FROM full_w f JOIN season s ON f.dow = s.dow
"""


@register("w30_seasonal_decompose", oracle=_W30_ORACLE, tags=("W4", "F3", "A7"))
def w30_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue with a weekly
    period: trend = centered 7-day moving average (full windows only),
    seasonal = per-ISO-weekday mean of the detrended series, remainder
    = the rest; revenue ≡ trend + seasonal + remainder by construction.
    Exactness: the detrended value is kept as the SCALED integer
    7u − Σ₇u (never a float subtraction), the weekday means are
    integer-sum ÷ count, and the remainder's numerator dtr·n − Σdtr is
    pure BIGINT — each output is one exact-integer division rounded to
    6 dp (`+ 0`).

    Scale: both windows run over the O(days) daily aggregate; the
    7-row seasonal table broadcasts back. The period (7) and the MA
    width are constants — at any input scale the only unbounded pass
    is the first daily rollup.
    """
    from ._helpers import cents

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(cents("o_totalprice")).alias("u"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.withColumn("s7", F.sum("u").over(w)).withColumn(
        "n7", F.count("*").over(w)
    )
    full_w = ma.filter(F.col("n7") == 7).select(
        "d",
        "u",
        "s7",
        (7 * F.col("u") - F.col("s7")).alias("dtr"),
        (F.weekday(F.col("d")) + 1).cast("bigint").alias("dow"),
    )
    season = full_w.groupBy("dow").agg(
        F.sum("dtr").alias("sd"), F.count("*").alias("nd")
    )
    j = full_w.join(F.broadcast(season), "dow")
    return j.select(
        F.col("d").cast("timestamp").alias("day"),
        (F.col("u") / 100.0).alias("revenue"),
        (F.round(F.col("s7") / 700.0, 6) + 0).alias("trend"),
        (F.round(F.col("sd") / (700.0 * F.col("nd")), 6) + 0).alias("seasonal"),
        (
            F.round(
                (F.col("dtr") * F.col("nd") - F.col("sd")) / (700.0 * F.col("nd")),
                6,
            )
            + 0
        ).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# W32 — Lorenz curve deciles (round 4): cumulative revenue share by
# customer decile, poorest to richest — the curve a26's Gini scalar
# integrates, published as the 10 dashboard points.
# ---------------------------------------------------------------------------

_W32_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS units
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT units,
         row_number() OVER (ORDER BY units, o_custkey) AS rn,
         COUNT(*) OVER () AS n
  FROM per_cust
),
binned AS (
  SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile, units
  FROM ranked
),
agg AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(units) AS BIGINT) AS du
  FROM binned GROUP BY decile
),
tot AS (SELECT CAST(SUM(du) AS BIGINT) AS total FROM agg)
SELECT decile, n_customers,
       round(du / CAST(total AS DOUBLE), 6) + 0 AS decile_share,
       round(SUM(du) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
             / CAST(total AS DOUBLE), 6) + 0 AS cum_share
FROM agg, tot
"""


@register("w32_lorenz_deciles", oracle=_W32_ORACLE, tags=("W1", "W4", "A11"))
def w32_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue: customers ranked poorest→
    richest, cut into 10 equal-width rank bins by the CLOSED-FORM
    bucket ((rn−1)·10)//n + 1 — written as the same arithmetic on both
    engines, so no ntile edge-case semantics are in play — then each
    decile's share and the running cumulative share from exact integer
    cents. A flat 45° cum_share line is perfect equality.

    Scale: the global customer rank uses _helpers.scalable_row_number
    (two-level bucket rank — no single-partition sort of the customer
    base); the decile table is 10 rows, so its cumulative window is
    trivially bounded. n comes from a broadcast one-row count joined
    cross-style.
    """
    from ._helpers import cents, scalable_row_number

    # localCheckpoint: per_cust (O(customers)) feeds the rank's double
    # scan plus the total count — re-derived 3x otherwise.
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("units"))
    ).transform(ckpt)
    ranked = scalable_row_number(
        per_cust,
        order_cols=[F.col("units"), F.col("o_custkey")],
        bucket=F.floor(F.col("units") / F.lit(1 << 20)).cast("long"),
        out="rn",
    )
    n_tot = per_cust.agg(F.count("*").alias("n"))
    binned = ranked.crossJoin(F.broadcast(n_tot)).select(
        (((F.col("rn") - 1) * 10 - (((F.col("rn") - 1) * 10) % F.col("n")))
         / F.col("n") + 1).cast("bigint").alias("decile"),
        "units",
    )
    agg = binned.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("units").alias("du"),
    )
    tot = agg.agg(F.sum("du").alias("total"))
    cum_w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    # window BEFORE the total crossJoin so its single-partition exchange
    # feeds straight off the decile aggregate (the structural sweep's
    # admissible shape)
    with_cum = agg.withColumn("cum_du", F.sum("du").over(cum_w))
    return (
        with_cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            (F.round(F.col("du") / F.col("total").cast("double"), 6) + 0).alias(
                "decile_share"
            ),
            (F.round(F.col("cum_du") / F.col("total").cast("double"), 6) + 0).alias(
                "cum_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# W4/A11 — CUSUM drift detection over the daily revenue series. The
# recurrence S_t = max(0, S_{t-1} + (x_t - mean)) looks inherently
# sequential, but telescopes to S_t = p_t - min(0, min_{j<=t} p_j) with
# p = prefix-sum(x - mean) — so the whole detector is two scalable
# prefix passes, no per-row loop on EITHER engine.
# ---------------------------------------------------------------------------

_W33_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS tot FROM daily),
p AS (
  SELECT d, c, n, tot,
         SUM(CAST(n AS HUGEINT) * c - tot) OVER (
           ORDER BY d ROWS UNBOUNDED PRECEDING
         ) AS pf
  FROM daily, s
),
m AS (
  SELECT d, c, n, tot, pf,
         LEAST(CAST(0 AS HUGEINT), MIN(pf) OVER (
           ORDER BY d ROWS UNBOUNDED PRECEDING
         )) AS mn
  FROM p
)
SELECT d AS order_date,
       c / 100.0 AS daily_revenue,
       ROUND(CAST(pf - mn AS DOUBLE) / (n * 100.0), 6) AS cusum,
       (2 * (pf - mn) > CAST(tot AS HUGEINT) * n) AS is_drift
FROM m
"""


@register("w33_cusum_drift", oracle=_W33_ORACLE, tags=("W4", "A11", "A7"))
def w33_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector on daily revenue: S_t = max(0,
    S_{t-1} + (x_t - mean)), flagging days where the accumulated
    upward drift exceeds half a mean day's revenue. The sequential
    recurrence telescopes exactly to prefix-sum-minus-running-min
    (induction: S_t = p_t - min(0, min_{j<=t} p_j)), so both engines
    compute it with window primitives — and the Spark side with the
    SCALABLE two-level decomposition, never a global ordered sort.

    Exactness: everything stays integral until the final display
    division — x scaled by n (days) so the mean subtraction n*x - tot
    needs no rational arithmetic; accumulated in DECIMAL(38,0) /
    HUGEINT (the a32 recipe — BIGINT prefix sums of n*cents overflow
    around sf10). The drift test 2*(p-mn) > tot*n is an exact integer
    comparison; only cusum divides, identically on both engines, then
    rounds at 6 dp.

    Scale: one shuffle to the O(days) daily table, which is then
    localCheckpoint'ed — the two stacked prefix decompositions each
    re-read their input twice (documented family trade-off on
    scalable_running_sum), so without the checkpoint the orders scan
    re-derives 8x and the audit blows past 14 exchanges (VERDICT r5
    §Next #7). Checkpointing the O(days) aggregate is O(days) storage
    and truncates every downstream re-scan to a tiny cached relation;
    the remaining global windows run over the O(#months) bucket tables.
    Day count rides a 1-row broadcast.
    """
    from ._helpers import scalable_running_min, scalable_running_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents("o_totalprice")).alias("c")
    ).transform(ckpt)
    s = daily.agg(F.count("*").alias("n"), F.sum("c").alias("tot"))
    j = daily.crossJoin(F.broadcast(s)).withColumn(
        "y",
        (
            F.col("n").cast("decimal(38,0)") * F.col("c") - F.col("tot")
        ).cast("decimal(38,0)"),
    )
    month_bkt = F.year("d") * 12 + F.month("d")
    j = scalable_running_sum(
        j, order_cols=["d"], value="y", bucket=month_bkt, out="pf"
    ).transform(ckpt)  # O(days); running_min re-reads it twice
    j = scalable_running_min(j, order_cols=["d"], value="pf", bucket=month_bkt, out="mn_p")
    mn = F.least(F.lit(0).cast("decimal(38,0)"), F.col("mn_p"))
    s_scaled = (F.col("pf") - mn).cast("decimal(38,0)")
    return j.select(
        F.col("d").alias("order_date"),
        (F.col("c") / 100.0).alias("daily_revenue"),
        F.round(
            s_scaled.cast("double") / (F.col("n").cast("double") * 100.0), 6
        ).alias("cusum"),
        (
            s_scaled * 2 > F.col("tot").cast("decimal(38,0)") * F.col("n")
        ).alias("is_drift"),
    )


# ---------------------------------------------------------------------------
# W4 — exact rolling MEDIAN over a 7-row frame, per customer. Spark has
# no frame-median builtin; the HOF recipe (collect the frame, sort,
# index the middle) reproduces DuckDB's interpolated quantile exactly
# because cents are integers and the even-count midpoint is a half-sum.
# ---------------------------------------------------------------------------

_W35_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       o_totalprice,
       median(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) / 100.0 AS rolling_median
FROM orders
"""


@register("w35_rolling_median", oracle=_W35_ORACLE, tags=("W4", "A11"))
def w35_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling median of order value over the last 7
    orders — the robust spend-trend statistic a mean would let one
    outlier order hijack. Spark has no median-over-frame builtin, so
    the frame's cents collect into an array, array_sort orders it, and
    the middle indexes out (odd count) or half-sums (even count) —
    exactly DuckDB's interpolated median on integer inputs; the
    half-sum is a .5-exact double either way.

    Scale: the window partitions by customer (bounded frames, no
    global sort); the collected frame is ≤7 longs per row — constant
    memory per row, and the whole expression runs in the JVM window
    operator, no Python.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(F.collect_list(cents("o_totalprice")).over(w))
    n = F.size(frame)
    mid_hi = ((n + 1) / 2).cast("int")
    mid_lo = (n / 2).cast("int")
    med_cents = F.when(
        n % 2 == 1, F.element_at(frame, mid_hi).cast("double")
    ).otherwise(
        (
            F.element_at(frame, mid_lo) + F.element_at(frame, mid_lo + 1)
        ).cast("double")
        / 2.0
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        (med_cents / 100.0).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# W4 — anchored VWAP per supplier: the running volume-weighted average
# price over each supplier's shipment history — integer prefix sums of
# (price·qty) and qty, divided only at display time, so the "running
# average" never accumulates float error.
# ---------------------------------------------------------------------------

_W36_ORACLE = """
WITH p AS (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) OVER w AS num,
         SUM(CAST(l_quantity AS BIGINT)) OVER w AS den
  FROM lineitem
  WINDOW w AS (
    PARTITION BY l_suppkey
    -- (shipdate, orderkey, linenumber) is NOT unique in the synthetic
    -- lineitem (duplicate line pairs, the f6d note); appending the two
    -- VALUE columns makes tie order fully deterministic — remaining
    -- ties are identical rows, whose order cannot change a prefix sum.
    -- Found by the round-7 sf0.1 sweep: exactly one differing-value
    -- tie class (suppkey 707), which both engines ordered by luck
    -- until a concurrent-load run flipped Spark's shuffle arrival.
    ORDER BY l_shipdate, l_orderkey, l_linenumber,
             l_quantity, round(l_extendedprice * 100)
    ROWS UNBOUNDED PRECEDING
  )
)
SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
       CAST((num * 100) // den AS BIGINT) / 10000.0 AS vwap
FROM p
"""


@register("w36_anchored_vwap", oracle=_W36_ORACLE, tags=("W4", "F4", "A7"))
def w36_anchored_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running VWAP per supplier over shipment order: numerator
    (Σ price_cents·qty) and denominator (Σ qty) accumulate as exact
    BIGINT prefix sums in ONE window pass, and the price emerges by
    INTEGER floor division at 4-decimal precision ((num·100) div den,
    then /10⁴) — a float quotient of integer ratios lands on exact
    round-half ties often enough that ROUND(…, 6) diverges across
    engines (measured: a tie at sorted row 5060 of the sf0.001 fixture), so no
    float division happens at all. Both operands positive, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree.

    Scale: one shuffle on l_suppkey, per-supplier sorted scan, two
    frame sums sharing a single Window operator. Per-supplier prefix
    products stay < 2⁶³ up to ~10¹² line rows per supplier (cents·qty
    ≤ 5·10⁸ per row); past that the a32 DECIMAL(38,0) recipe applies.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        # value columns appended: see the oracle's WINDOW comment (the
        # key triple is not unique; ties must not reorder under load).
        .orderBy(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * 100),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    num = F.sum(
        cents("l_extendedprice") * F.col("l_quantity").cast("bigint")
    ).over(w)
    den = F.sum(F.col("l_quantity").cast("bigint")).over(w)
    p = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        num.alias("num"),
        den.alias("den"),
    )
    return p.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (F.expr("(num * 100) div den") / 10000.0).alias("vwap"),
    )


# ---------------------------------------------------------------------------
# W4 — linear-weighted moving average over the last 7 orders, spelled
# as SEVEN EXPLICIT LAG TERMS (no frame collect): weights 7..1 with the
# newest order heaviest, partial windows reweighted by the terms that
# exist — the other classical smoother next to w21's EWMA and w35's
# median, and the lag-battery formulation ports to engines without
# frame aggregates at all.
# ---------------------------------------------------------------------------

_W37_TERMS = 7


def _w37_sql_terms() -> str:
    num = " + ".join(
        f"COALESCE(({_W37_TERMS - i}) * lag(c, {i}) OVER w, 0)"
        for i in range(_W37_TERMS)
    )
    den = " + ".join(
        f"CASE WHEN lag(c, {i}) OVER w IS NULL THEN 0 ELSE {_W37_TERMS - i} END"
        for i in range(_W37_TERMS)
    )
    return num, den


_W37_NUM, _W37_DEN = _w37_sql_terms()

_W37_ORACLE = f"""
WITH b AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
t AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         {_W37_NUM} AS num,
         {_W37_DEN} AS den
  FROM b
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST((num * 100) // den AS BIGINT) / 10000.0 AS wma
FROM t
"""


@register("w37_weighted_moving_average", oracle=_W37_ORACLE, tags=("W3", "W4", "F4"))
def w37_weighted_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-order linearly-weighted moving average of customer spend:
    num = Σ (7−i)·lag(cents, i), den = Σ weights of the lags that
    EXIST (partial leading windows reweight instead of padding), and
    the price emerges by the w36 integer micro-unit division — no
    float accumulation, no round-half ties. Seven lag terms share one
    window spec, so Spark evaluates them in a single Window operator
    pass.

    Scale: one shuffle on custkey, per-customer sorted scan; constant
    per-row state (7 longs). The lag-battery form needs no
    collect_list and no frame support — it is the formulation that
    also runs on engines with bare LAG.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    b = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        cents("o_totalprice").alias("c"),
    )
    lags = [F.lag("c", i).over(w) for i in range(_W37_TERMS)]
    num = sum(
        (F.coalesce(lg, F.lit(0)) * F.lit(_W37_TERMS - i) for i, lg in enumerate(lags)),
        F.lit(0),
    )
    den = sum(
        (F.when(lg.isNull(), 0).otherwise(_W37_TERMS - i) for i, lg in enumerate(lags)),
        F.lit(0),
    )
    t = b.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        num.alias("num"), den.alias("den"),
    )
    return t.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (F.expr("(num * 100) div den") / 10000.0).alias("wma"),
    )


# ---------------------------------------------------------------------------
# w38 — rolling OLS trend (round 5+): the least-squares slope of daily
# segment revenue over a trailing 28-day range frame — the trend line
# a demand-planning dashboard draws, computed exactly. All five frame
# sums (n, Σx, Σy, Σxy, Σx²) are BIGINT; the slope numerator/
# denominator cross-products stay integer, and the micro-unit quotient
# uses the split division q*1e6 + (r*1e6 div den) so nothing overflows
# and no float quotient ever hits a ROUND-half tie.
# ---------------------------------------------------------------------------

_W38_ORACLE = """
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
framed AS (
  SELECT segment, x, y,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY segment ORDER BY x
               RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
SELECT segment, x AS day_x, y AS y_cents, n AS n_days,
       CASE WHEN n >= 8 AND n * sxx - sx * sx > 0 THEN
         (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
         * (  (abs(n * sxy - sx * sy) // (n * sxx - sx * sx)) * 1000000
            + (abs(n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000000
              // (n * sxx - sx * sx))
       END AS slope_micro
FROM framed
"""


@register("w38_rolling_ols", oracle=_W38_ORACLE, tags=("W4", "A7", "J1"))
def w38_rolling_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28-day OLS slope of daily revenue per market segment:
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over the RANGE frame
    [x−27, x] with x = days since 1992-01-01 (small, exact) and y =
    exact revenue cents. Emitted in integer micro-units via
    ``sign · (|num| div den · 1e6 + (|num| mod den) · 1e6 div den)`` —
    every operand positive and < 2⁶³, truncating div == DuckDB ``//``,
    so the quotient is exact with no float ROUND tie (CLAUDE.md
    round-5 gotcha). Frames with <8 active days or zero x-variance
    report NULL.

    Scale: the daily rollup collapses orders to O(segments × calendar
    days) rows before any window runs; the window partitions by
    segment over that bounded aggregate (the a33 pattern — partition
    count is fixed by the schema, row count by the calendar, both
    independent of fact volume). One fact-side shuffle for the rollup,
    one broadcast of the customer segment map.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
            )
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("y"))
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("x")
        .rangeBetween(-27, Window.currentRow)
    )
    framed = daily.select(
        "segment",
        "x",
        "y",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        (F.col("n") >= 8) & (den > 0),
        F.when(num < 0, -1)
        .otherwise(1)
        .cast("long")
        * (
            F.expr(
                "abs(n * sxy - sx * sy) div (n * sxx - sx * sx)"
            )
            * 1000000
            + F.expr(
                "(abs(n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000000"
                " div (n * sxx - sx * sx)"
            )
        ),
    )
    return framed.select(
        "segment",
        F.col("x").alias("day_x"),
        F.col("y").alias("y_cents"),
        F.col("n").alias("n_days"),
        slope.alias("slope_micro"),
    )


# ---------------------------------------------------------------------------
# w39 — Hampel filter (round 5+): the outlier REPAIR twin of w35's
# rolling median. Within each trailing-7 frame: flag values beyond
# 3×MAD of the frame median and replace them with it. All arithmetic
# runs in quarter-cents (4× integer units), where both the
# interpolated median (even count → half-sum) and the MAD of even
# deviations are exact BIGINTs — the 3·MAD comparison never touches a
# float.
# ---------------------------------------------------------------------------

_W39_ORACLE = """
WITH f AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         list(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
  FROM orders),
m AS (SELECT *, list_sort(arr) AS sa, len(arr) AS n FROM f),
m2 AS (
  SELECT *, CASE WHEN n % 2 = 1 THEN 4 * sa[(n + 1) // 2]
                 ELSE 2 * (sa[n // 2] + sa[n // 2 + 1]) END AS med4
  FROM m),
d AS (
  SELECT *, list_sort(list_transform(arr, v -> abs(4 * v - med4))) AS sd
  FROM m2),
d2 AS (
  SELECT *, CASE WHEN n % 2 = 1 THEN sd[(n + 1) // 2]
                 ELSE (sd[n // 2] + sd[n // 2 + 1]) // 2 END AS mad4
  FROM d),
flagged AS (
  SELECT o_custkey,
         CASE WHEN abs(4 * c - med4) > 3 * mad4 THEN 1 ELSE 0 END AS outlier,
         CASE WHEN abs(4 * c - med4) > 3 * mad4 THEN med4
              ELSE 4 * c END AS repaired4
  FROM d2)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(outlier) AS BIGINT) AS n_outliers,
       CAST(SUM(repaired4) AS BIGINT) AS repaired_qcents
FROM flagged GROUP BY o_custkey
"""


@register("w39_hampel_repair", oracle=_W39_ORACLE, tags=("W4", "F5", "A1"))
def w39_hampel_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier repair over each customer's trailing-7 order
    values: frame median and MAD come from the frame's collected array
    (sorted, middle-indexed — the w35 recipe), lifted to 4× integer
    units so the even-count interpolations stay exact BIGINTs and the
    ``|4c − med4| > 3·mad4`` flag is pure integer comparison. Repaired
    totals are reported in quarter-cents.

    Scale: the frame array is ≤7 longs per row inside the JVM window
    operator (partitioned by customer — no global sort, no Python);
    median/MAD/flag are per-row HOF arithmetic over that bounded
    array. The per-customer rollup reuses the window's partitioning
    key, so AQE coalesces without a second shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    f = orders.select(
        "o_custkey",
        cents("o_totalprice").alias("c"),
        F.collect_list(cents("o_totalprice")).over(w).alias("arr"),
    )
    m = f.select(
        "o_custkey",
        "c",
        "arr",
        F.array_sort("arr").alias("sa"),
        F.size("arr").alias("n"),
    )
    mid_odd = F.element_at("sa", ((F.col("n") + 1) / 2).cast("int"))
    lo = F.element_at("sa", (F.col("n") / 2).cast("int"))
    hi = F.element_at("sa", (F.col("n") / 2 + 1).cast("int"))
    m2 = m.withColumn(
        "med4",
        F.when(F.col("n") % 2 == 1, 4 * mid_odd).otherwise(2 * (lo + hi)),
    )
    d = m2.withColumn(
        "sd",
        F.array_sort(
            F.transform("arr", lambda v: F.abs(4 * v - F.col("med4")))
        ),
    )
    sd_odd = F.element_at("sd", ((F.col("n") + 1) / 2).cast("int"))
    d2 = d.withColumn(
        "mad4",
        F.when(F.col("n") % 2 == 1, sd_odd).otherwise(
            F.expr("(element_at(sd, cast(n / 2 as int))"
                   " + element_at(sd, cast(n / 2 + 1 as int))) div 2")
        ),
    )
    is_out = F.abs(4 * F.col("c") - F.col("med4")) > 3 * F.col("mad4")
    flagged = d2.select(
        "o_custkey",
        F.when(is_out, 1).otherwise(0).alias("outlier"),
        F.when(is_out, F.col("med4")).otherwise(4 * F.col("c")).alias(
            "repaired4"
        ),
    )
    return flagged.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum("outlier").cast("long").alias("n_outliers"),
        F.sum("repaired4").cast("long").alias("repaired_qcents"),
    )


# ---------------------------------------------------------------------------
# w41 — MASE forecast evaluation (round 5+): is a naive last-month
# forecast actually better than the seasonal-naive baseline? MASE =
# MAE(naive-1) / MAE(seasonal-12) over the months where both are
# defined — the scale-free forecast metric (Hyndman) that q26's
# regression forecast should beat before anyone ships it. Absolute
# errors are exact integer cents; only the final ratio is a double.
# ---------------------------------------------------------------------------

_W41_ORACLE = """
WITH monthly AS (
  SELECT c.c_mktsegment AS segment,
         CAST(date_part('year', o.o_orderdate) * 12
              + date_part('month', o.o_orderdate) AS INT) AS mon,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
lagged AS (
  SELECT segment, mon, r,
         lag(r, 1)  OVER (PARTITION BY segment ORDER BY mon) AS r1,
         lag(r, 12) OVER (PARTITION BY segment ORDER BY mon) AS r12
  FROM monthly)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(SUM(abs(r - r1)) AS BIGINT) AS naive_abs_err,
       CAST(SUM(abs(r - r12)) AS BIGINT) AS seasonal_abs_err,
       ROUND(CAST(SUM(abs(r - r1)) AS DOUBLE)
             / SUM(abs(r - r12)), 6) + 0 AS mase
FROM lagged
WHERE r1 IS NOT NULL AND r12 IS NOT NULL
GROUP BY segment
"""


@register("w41_mase", oracle=_W41_ORACLE, tags=("W3", "A7", "F4"))
def w41_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-absolute-scaled-error of the naive one-month forecast
    against the seasonal-naive (12-month) baseline, per segment, over
    the months where both lags exist (dense TPC-H calendar — no month
    gaps to fabricate). MASE < 1 means last-month beats last-year.
    Both error sums are exact BIGINT cents; one division, round 6,
    ``+ 0``.

    Scale: the monthly rollup collapses facts to O(segments × months);
    both lags share one partitioned window pass (same partition/order
    → a single Window node). The caveat that matters at scale: lag-12
    assumes a DENSE month series — gap-filling (q44's spine) must run
    first on sparse series or the "season" silently shifts.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("int")
            .alias("mon"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("r"))
    )
    w = Window.partitionBy("segment").orderBy("mon")
    lagged = monthly.select(
        "segment",
        "r",
        F.lag("r", 1).over(w).alias("r1"),
        F.lag("r", 12).over(w).alias("r12"),
    ).where(F.col("r1").isNotNull() & F.col("r12").isNotNull())
    naive = F.sum(F.abs(F.col("r") - F.col("r1")))
    seasonal = F.sum(F.abs(F.col("r") - F.col("r12")))
    return lagged.groupBy("segment").agg(
        F.count("*").alias("n_months"),
        naive.cast("long").alias("naive_abs_err"),
        seasonal.cast("long").alias("seasonal_abs_err"),
        (F.round(naive.cast("double") / seasonal, 6) + 0).alias("mase"),
    )


# ---------------------------------------------------------------------------
# w42 — local-peak census (round 5+): strict local maxima of the daily
# revenue series per segment — the signal-processing primitive under
# peak/trough labeling, promo-spike detection, and seasonality eyeball
# checks. A peak is strictly above BOTH neighbors, so ties never
# count and the census is integer-exact.
# ---------------------------------------------------------------------------

_W42_ORACLE = """
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
lagged AS (
  SELECT segment, x, y,
         lag(y)  OVER (PARTITION BY segment ORDER BY x) AS yp,
         lead(y) OVER (PARTITION BY segment ORDER BY x) AS yn
  FROM daily),
peaks AS (
  SELECT segment, x, y
  FROM lagged WHERE yp IS NOT NULL AND yn IS NOT NULL
                AND y > yp AND y > yn),
gaps AS (
  SELECT segment, x,
         x - lag(x) OVER (PARTITION BY segment ORDER BY x) AS gap
  FROM peaks)
SELECT p.segment,
       CAST(COUNT(*) AS BIGINT) AS n_peaks,
       CAST(MAX(p.y) AS BIGINT) AS tallest_cents,
       CAST(MIN(g.min_gap) AS BIGINT) AS min_gap_days,
       CAST(MAX(g.max_gap) AS BIGINT) AS max_gap_days
FROM peaks p
JOIN (SELECT segment, MIN(gap) AS min_gap, MAX(gap) AS max_gap
      FROM gaps GROUP BY segment) g
  ON p.segment = g.segment
GROUP BY p.segment
"""


@register("w42_peak_census", oracle=_W42_ORACLE, tags=("W3", "A1", "F4"))
def w42_peak_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of daily segment revenue (y > both
    neighbors; series endpoints are never peaks) with the peak count,
    the tallest peak, and the min/max spacing between consecutive
    peaks — all integers, both lags in the same partitioned window
    pass.

    Scale: the same bounded (segments × calendar) aggregate grain as
    w38/w41; lag/lead and the inter-peak gaps all partition by
    segment. Peak detection over a 100 TB fact costs exactly one
    rollup plus two O(days) window passes.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("y"))
    )
    w = Window.partitionBy("segment").orderBy("x")
    lagged = daily.select(
        "segment",
        "x",
        "y",
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
    )
    peaks = lagged.where(
        F.col("yp").isNotNull()
        & F.col("yn").isNotNull()
        & (F.col("y") > F.col("yp"))
        & (F.col("y") > F.col("yn"))
    ).select("segment", "x", "y")
    gaps = peaks.select(
        "segment", (F.col("x") - F.lag("x").over(w)).alias("gap")
    )
    g = gaps.groupBy("segment").agg(
        F.min("gap").alias("min_gap"), F.max("gap").alias("max_gap")
    )
    return (
        peaks.groupBy("segment")
        .agg(
            F.count("*").alias("n_peaks"),
            F.max("y").alias("tallest_cents"),
        )
        .join(g, "segment")
        .select(
            "segment",
            "n_peaks",
            "tallest_cents",
            F.col("min_gap").alias("min_gap_days"),
            F.col("max_gap").alias("max_gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# w43 — interval union (round 5+): how many calendar days was each
# segment "busy" (≥1 order open between order date and last ship)?
# Overlapping intervals merge into islands via the classic sweep:
# an interval starts a new island iff its start exceeds the running
# max of all earlier ends. Union length, island count, and the
# longest continuous busy stretch — the utilization numbers a
# capacity planner reads.
# ---------------------------------------------------------------------------

_W43_ORACLE = """
WITH iv AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS s,
         CAST(datediff('day', TIMESTAMP '1992-01-01', ship.last_ship)
              AS BIGINT) AS e
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY 1) ship ON o.o_orderkey = ship.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey),
flagged AS (
  SELECT segment, o_orderkey, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY segment ORDER BY s, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR s > MAX(e) OVER (PARTITION BY segment ORDER BY s, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT segment, s, e,
         SUM(new_island) OVER (PARTITION BY segment ORDER BY s, o_orderkey
           ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged),
merged AS (
  SELECT segment, island_id,
         MIN(s) AS island_start, MAX(e) AS island_end
  FROM islands GROUP BY 1, 2)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(island_end - island_start + 1) AS BIGINT) AS union_days,
       CAST(MAX(island_end - island_start + 1) AS BIGINT) AS longest_days
FROM merged GROUP BY segment
"""


@register("w43_interval_union", oracle=_W43_ORACLE, tags=("W4", "J1", "A1"))
def w43_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged busy-interval statistics per segment: intervals =
    [order date, last lineitem ship date] in integer days; a new
    island starts where the interval's start exceeds the EXCLUSIVE
    prefix max of earlier ends ((start, orderkey)-ordered, so ties are
    deterministic); island ids are the running flag sum; union length
    sums the merged spans. The oracle's flag window orders by the same
    keys but its island sum may order ties by (s, e) — equivalent,
    because tied-start rows share their flag decision.

    Scale: both windows partition by segment (bounded count) over
    O(orders-per-segment) rows — the sweep is one sort per partition,
    no global ordering; the island rollup reuses the partition key.
    Interval-union at 100 TB is exactly this plan over date-bucketed
    sub-partitions when a single segment outgrows one partition.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    base = F.lit("1992-01-01").cast("date")
    iv = (
        orders.join(ship, orders.o_orderkey == ship.l_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.datediff("o_orderdate", base).cast("long").alias("s"),
            F.datediff("last_ship", base).cast("long").alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy("segment")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "segment",
        "o_orderkey",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("segment")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "segment",
        "s",
        "e",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    merged = islands.groupBy("segment", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    span = F.col("island_end") - F.col("island_start") + 1
    return merged.groupBy("segment").agg(
        F.count("*").alias("n_islands"),
        F.sum(span).cast("long").alias("union_days"),
        F.max(span).cast("long").alias("longest_days"),
    )


# ---------------------------------------------------------------------------
# w44 — drawdown duration (round 5+): w28 measures how DEEP cumulative
# revenue falls below its running peak; this measures how LONG. Runs
# of consecutive observed days underwater (cum < peak) are the
# recovery-time statistic risk desks track next to depth.
# ---------------------------------------------------------------------------

_W44_ORACLE = """
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
cum0 AS (
  SELECT segment, x,
         SUM(y) OVER (PARTITION BY segment ORDER BY x
                      ROWS UNBOUNDED PRECEDING) AS c
  FROM daily),
cum AS (
  SELECT segment, x, c,
         MAX(c) OVER (PARTITION BY segment ORDER BY x
                      ROWS UNBOUNDED PRECEDING) AS peak
  FROM cum0),
flags AS (
  SELECT segment, x,
         CASE WHEN c < peak THEN 1 ELSE 0 END AS under,
         peak - c AS depth
  FROM cum),
runs AS (
  SELECT segment, x, under, depth,
         CASE WHEN under = 1
               AND COALESCE(lag(under) OVER (PARTITION BY segment
                                             ORDER BY x), 0) = 0
              THEN 1 ELSE 0 END AS new_run
  FROM flags),
rid AS (
  SELECT segment, under, depth,
         SUM(new_run) OVER (PARTITION BY segment ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs),
per_run AS (
  SELECT segment, run_id, CAST(COUNT(*) AS BIGINT) AS run_days
  FROM rid WHERE under = 1 GROUP BY 1, 2)
SELECT f.segment,
       CAST(SUM(f.under) AS BIGINT) AS underwater_days,
       CAST(COUNT(*) AS BIGINT) AS observed_days,
       CAST(MAX(f.depth) AS BIGINT) AS max_depth_cents,
       COALESCE(MAX(r.max_run), 0) AS longest_run_days
FROM flags f
LEFT JOIN (SELECT segment, CAST(MAX(run_days) AS BIGINT) AS max_run
           FROM per_run GROUP BY segment) r
  ON f.segment = r.segment
GROUP BY f.segment, r.max_run
"""


@register("w44_drawdown_duration", oracle=_W44_ORACLE, tags=("W4", "W3", "A1"))
def w44_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underwater-run statistics per segment: cumulative daily revenue
    vs its running peak (two stacked prefix windows over the same
    partitioned order), runs of consecutive observed underwater days
    via the lag-flag/running-sum recurrence, reporting total days
    underwater, the deepest gap in exact cents, and the longest run.
    Depth is peak − cum with both from the SAME prefix sums — exact
    BIGINTs, never a float.

    Scale: every window partitions by segment over the bounded
    (segments × calendar) aggregate — the w38/w41/w42 grain; the run
    rollup reuses the partition key. Drawdown DURATION needs the
    ordered recurrence, so it rides windows; drawdown DEPTH alone
    (w28) would not.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum(cents("o_totalprice")).alias("y"))
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "segment",
        "x",
        F.sum("y").over(w).alias("c"),
    ).withColumn("peak", F.max("c").over(w))
    flags = cum.select(
        "segment",
        "x",
        F.when(F.col("c") < F.col("peak"), 1).otherwise(0).alias("under"),
        (F.col("peak") - F.col("c")).alias("depth"),
    )
    wl = Window.partitionBy("segment").orderBy("x")
    runs = flags.withColumn(
        "new_run",
        F.when(
            (F.col("under") == 1)
            & (F.coalesce(F.lag("under").over(wl), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    rid = runs.withColumn("run_id", F.sum("new_run").over(w))
    per_run = (
        rid.where(F.col("under") == 1)
        .groupBy("segment", "run_id")
        .agg(F.count("*").alias("run_days"))
        .groupBy("segment")
        .agg(F.max("run_days").cast("long").alias("max_run"))
    )
    return (
        flags.groupBy("segment")
        .agg(
            F.sum("under").cast("long").alias("underwater_days"),
            F.count("*").alias("observed_days"),
            F.max("depth").alias("max_depth_cents"),
        )
        .join(per_run, "segment", "left")
        .select(
            "segment",
            "underwater_days",
            "observed_days",
            "max_depth_cents",
            F.coalesce("max_run", F.lit(0)).alias("longest_run_days"),
        )
    )


# ---------------------------------------------------------------------------
# w45 — burstiness / index of dispersion (round 5+): is order arrival
# Poisson-like or bursty? The Fano factor — variance over mean of
# daily order counts — is 1 for a Poisson process, >1 for bursty
# (campaign-driven) demand, <1 for regularized flow. Computed per
# segment over the observed-day series from exact integer count
# moments.
# ---------------------------------------------------------------------------

_W45_ORACLE = """
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
s AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS days,
         CAST(SUM(n) AS BIGINT) AS sn,
         CAST(SUM(n * n) AS BIGINT) AS snn,
         CAST(MAX(n) AS BIGINT) AS peak
  FROM daily GROUP BY segment)
SELECT segment, days, sn AS total_orders, peak AS peak_day_orders,
       ROUND(((CAST(days AS DOUBLE) * snn - CAST(sn AS DOUBLE) * sn)
              / (CAST(days AS DOUBLE) * (days - 1)))
             / (CAST(sn AS DOUBLE) / days), 6) + 0 AS fano
FROM s
WHERE days >= 2 AND sn > 0
"""


@register("w45_burstiness", oracle=_W45_ORACLE, tags=("A7", "A2", "F4"))
def w45_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor of daily order counts per segment: sample variance
    over mean from exact integer moments (days, Σn, Σn²) — identical
    doubles on both engines before the 6-dp round. Degenerate series
    (<2 observed days or zero orders) drop on both sides. Values ≫1
    flag bursty demand that invalidates Poisson capacity models.

    Scale: one reduction to (segment, day) grain, one O(segments)
    moment rollup — the cheapest possible point-process diagnostic;
    the same two-aggregation shape computes Fano at ANY grain
    (hour × region, minute × endpoint) by swapping the group keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("x"),
        )
        .agg(F.count("*").alias("n"))
    )
    s = daily.groupBy("segment").agg(
        F.count("*").alias("days"),
        F.sum("n").cast("long").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("snn"),
        F.max("n").alias("peak"),
    )
    var = (
        F.col("days").cast("double") * F.col("snn")
        - F.col("sn").cast("double") * F.col("sn")
    ) / (F.col("days").cast("double") * (F.col("days") - 1))
    mean = F.col("sn").cast("double") / F.col("days")
    return s.where((F.col("days") >= 2) & (F.col("sn") > 0)).select(
        "segment",
        "days",
        F.col("sn").alias("total_orders"),
        F.col("peak").alias("peak_day_orders"),
        (F.round(var / mean, 6) + 0).alias("fano"),
    )


# ---------------------------------------------------------------------------
# ROUND-6 TWIN — W5's only carriers (w5_last_ignorenulls forward fill)
# were hard-graded by round 5; this grades the MIRRORED frame.
# ---------------------------------------------------------------------------

_W5B_ORACLE = """
SELECT event_id, user_id,
       first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
         AS next_purchase_value,
       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev_type
FROM events
"""


@register("w5b_next_purchase_backfill", oracle=_W5B_ORACLE, tags=("W5", "W3"))
def w5b_next_purchase_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward fill: for every event, the value of the user's NEXT
    purchase strictly after it (NULL once no purchase remains), plus
    the lag'd previous event type. w5 grades last+IGNORE NULLS over the
    trailing frame (forward fill); this grades first+IGNORE NULLS over
    the LEADING frame starting at 1 FOLLOWING — the frame direction and
    the strict-exclusion-of-current-row boundary are each easy to get
    silently wrong, and label-leakage checks in training pipelines
    depend on exactly this shape.

    Scale: one shuffle on user_id; both window functions share the
    same sort, so Spark evaluates them in a single Window node pass.
    """
    events = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_follow = w_order.rowsBetween(1, Window.unboundedFollowing)
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "event_id",
        "user_id",
        F.first(purchase_value, ignorenulls=True)
        .over(w_follow)
        .alias("next_purchase_value"),
        F.lag("event_type").over(w_order).alias("prev_type"),
    )


# ---------------------------------------------------------------------------
# ROUND-7 W5 twin (w5 forward fill, w5b backward fill from 1 FOLLOWING
# graded): BOTH boundary fills in one pass — the interpolation-endpoint
# bracket around sparse observations, where each row sees its last
# known anchor AND its next one (current row included on the forward
# side, excluded never — the two frames meet at the current row).
# ---------------------------------------------------------------------------

_W5C_ORACLE = """
SELECT l_orderkey, l_linenumber, l_partkey,
       last_value(CASE WHEN l_linenumber = 1
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT) END
                  IGNORE NULLS) OVER (
         PARTITION BY l_partkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                  l_quantity, round(l_extendedprice * 100)
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS anchor_before_cents,
       first_value(CASE WHEN l_linenumber = 1
                        THEN CAST(round(l_extendedprice * 100) AS BIGINT) END
                   IGNORE NULLS) OVER (
         PARTITION BY l_partkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                  l_quantity, round(l_extendedprice * 100)
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
       ) AS anchor_after_cents
FROM lineitem
"""


@register("w5c_anchor_bracket", oracle=_W5C_ORACLE, tags=("W5",))
def w5c_anchor_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part (ordered by shipdate with a unique tiebreak), bracket
    every line between its most recent and next upcoming ANCHOR price
    — the price is observed only on first-line-of-order rows
    (l_linenumber = 1), everything else interpolates between
    last+IGNORE NULLS over the trailing frame and first+IGNORE NULLS
    over the leading frame INCLUDING the current row on both sides (an
    anchor row is its own bracket on both ends — the boundary
    convention w5b's strict 1-FOLLOWING frame deliberately excludes).
    Exact integer cents; NULL edges (before the first / after the last
    anchor) are part of the graded contract.

    Scale: one shuffle on l_partkey; the two fills share a single
    partitioned sort and evaluate in one Window pass each direction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    anchor = F.when(
        F.col("l_linenumber") == 1, cents("l_extendedprice")
    )
    # value columns appended to the order: the key triple is NOT
    # unique in the synthetic lineitem (the w36 sf0.1 lesson) — ties
    # must not reorder the fills under shuffle-arrival nondeterminism.
    w_order = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 100),
    )
    w_back = w_order.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = w_order.rowsBetween(0, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.last(anchor, ignorenulls=True).over(w_back).alias("anchor_before_cents"),
        F.first(anchor, ignorenulls=True).over(w_fwd).alias("anchor_after_cents"),
    )


# ---------------------------------------------------------------------------
# ROUND-8 J4+J7+W5 twin (j4/j16/st22/q21/q22 anti, j7/x1/x1b/x1c/j15/u12
# as-of, w5/w5b/w5c last-ignorenulls — every carrier graded). The
# angle: the three surfaces GATE each other — an anti join prunes the
# probe set BEFORE the as-of timeline is built, and the as-of itself is
# the union + carry-forward (last ignorenulls) formulation, so a wrong
# anti keeps phantom users and a wrong carry mis-attributes every
# downstream purchase.
# ---------------------------------------------------------------------------

_J17_ORACLE = """
WITH clean AS (
  SELECT * FROM events e
  WHERE e.event_type = 'purchase'
    AND NOT EXISTS (
      SELECT 1 FROM events x
      WHERE x.event_type = 'error' AND x.user_id = e.user_id
        AND CAST(x.ts AS DATE) = CAST(e.ts AS DATE)
    )
)
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       v.event_id AS view_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS us_since_view,
       CAST(round(v.value * 100) AS BIGINT) AS view_cents
FROM clean p
ASOF LEFT JOIN (
  -- deterministic tiebreak: DuckDB's ASOF picks an ARBITRARY row among
  -- equal-timestamp views, while the Spark carry always ends on the
  -- max event_id — pre-collapse ties to that same row
  SELECT * FROM events WHERE event_type = 'view'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
) v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register(
    "j17_error_free_attribution",
    oracle=_J17_ORACLE,
    tags=("J4", "J7", "W5"),
)
def j17_error_free_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution restricted to error-free user-days:
    an ANTI join drops every purchase made on a calendar day where the
    same user emitted an 'error' event (J4 — keyed on the composite
    (user, day) so the prune is selective, not user-emptying: the
    fixture's users all error EVENTUALLY, but ~2/3 of purchase days
    are clean), then each surviving purchase is as-of joined
    to the user's latest view at or before it (J7) via the union +
    carry-forward idiom — last(ignorenulls) over the per-user timeline
    (W5) carries ONE struct of (view id, timestamp, value-in-cents)
    forward, with views sorting before purchases on timestamp ties so
    the join bound is inclusive like DuckDB's native ASOF (oracle:
    ASOF LEFT JOIN + NOT EXISTS). The single-struct carry (ADVICE r8
    #2) keeps the three attributes CONSISTENT by construction: three
    independent last() windows would desynchronize on a view row whose
    value is NULL — cents(NULL) is NULL, so only the cents carry would
    skip that view and point at an older one, diverging from the ASOF
    oracle (which emits the new view with NULL cents). The fixture has
    no NULL values today, so this is a latent-bug fix, not a results
    change.

    Scale: the anti join's build side is the distinct error-user set
    (small → broadcast); the as-of is ONE shuffle on user_id with a
    per-user sorted scan — no range explosion, the same 100 TB shape
    as j7. Order (ts, kind, event_id) is unique (event ids are), so
    the carry windows are tie-safe by construction.
    """
    events = load_table(spark, sf_dir, "events")
    err_days = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", F.to_date("ts").alias("err_day"))
        .distinct()
    )
    purch = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    purchases = purch.join(
        F.broadcast(err_days),
        (purch.user_id == err_days.user_id)
        & (F.to_date(purch.ts) == err_days.err_day),
        "left_anti",
    ).select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("double").alias("vvalue"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),  # views sort before purchases on ts ties
        F.col("event_id"),
        F.col("value").alias("vvalue"),
    )
    timeline = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = ntz_epoch_us("ts")
    # single-struct carry: the view's (id, ts, cents) travel as ONE
    # value, so a NULL vvalue yields a NULL cents FIELD inside a
    # non-null struct — the struct itself is still carried, exactly
    # like the oracle's ASOF row with round(NULL*100) = NULL
    view_rec = F.when(
        F.col("kind") == 0,
        F.struct(
            F.col("event_id").alias("vid"),
            ts_us.alias("vus"),
            cents(F.col("vvalue")).alias("vcents"),
        ),
    )
    filled = timeline.select(
        "user_id",
        "kind",
        "event_id",
        ts_us.alias("ts_us"),
        F.last(view_rec, ignorenulls=True).over(w).alias("vrec"),
    )
    return filled.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("vrec.vid").alias("view_id"),
        (F.col("ts_us") - F.col("vrec.vus")).alias("us_since_view"),
        F.col("vrec.vcents").alias("view_cents"),
    )
