"""Data-quality audit operators (expectation suites + anomaly flags).

The checks a production pipeline runs BEFORE publishing a snapshot:
referential integrity, value-range and null-key expectations across the
star schema (dq1), and volume-anomaly detection over the event stream
(dq2). Both are ordinary graded queries — the audit result is a
DataFrame, so it can gate a write, feed a dashboard, or diff between
runs like any other table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import cents, ntz_epoch_us

# ---------------------------------------------------------------------------
# dq1 — expectation suite: one row per named check with its violation
# count. Exhaustive-scan checks are map-side; integrity checks are
# anti-joins that broadcast the key side.
# ---------------------------------------------------------------------------

_DQ1_ORACLE = """
SELECT 'orders_without_customer' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n_violations
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_without_order',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'negative_order_total', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_totalprice < 0
UNION ALL
SELECT 'null_customer_key', CAST(COUNT(*) AS BIGINT)
FROM customer WHERE c_custkey IS NULL
UNION ALL
SELECT 'negative_event_value', CAST(COUNT(*) AS BIGINT)
FROM events WHERE value < 0
UNION ALL
SELECT 'doc_char_count_drift', CAST(COUNT(*) AS BIGINT)
FROM documents WHERE n_chars <> length(text)
"""


@register("dq1_expectations", oracle=_DQ1_ORACLE, tags=("A2", "J4", "P2"))
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over the star schema: referential integrity
    (orphan orders, orphan lineitems), value ranges (negative totals /
    event values), null keys, and catalog consistency (documents whose
    stored n_chars drifts from the text) — each as a named check with
    its violation count, the table a publish gate asserts all-zeros on
    (the fixture IS clean; a violated expectation here means the scan
    or a transform corrupted data).

    Scale: range/null checks are map-side counts; the integrity checks
    are left-anti joins that broadcast the (distinct, projected) key
    side — at 100 TB the dimension keys stay broadcastable and the
    fact sides never shuffle. Each check is an independent jobs-graph
    leaf, so the suite parallelizes trivially.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def count_as(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    orphan_orders = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    orphan_lines = lineitem.join(
        F.broadcast(orders.select("o_orderkey")),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    checks = [
        count_as(orphan_orders, "orders_without_customer"),
        count_as(orphan_lines, "lineitem_without_order"),
        count_as(orders.filter(F.col("o_totalprice") < 0), "negative_order_total"),
        count_as(customer.filter(F.col("c_custkey").isNull()), "null_customer_key"),
        count_as(events.filter(F.col("value") < 0), "negative_event_value"),
        count_as(
            documents.filter(F.col("n_chars") != F.length("text")),
            "doc_char_count_drift",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# dq2 — volume anomaly: daily event counts flagged when they deviate
# more than 3σ from the trailing 14-observation mean. Exact integer
# moments (Σn, Σn²) keep the z-score engine-identical before the 6 dp
# round — the w10 recipe applied to monitoring.
# ---------------------------------------------------------------------------

_DQ2_ORACLE = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, day_idx, n,
         COUNT(*)  OVER w AS m,
         SUM(n)    OVER w AS sx,
         SUM(n*n)  OVER w AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
               ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day_idx, n,
       ROUND((n - CAST(sx AS DOUBLE) / m)
               / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) * m / sqrt(CAST(m AS DOUBLE)), 6)
         AS z_score,
       ABS((n - CAST(sx AS DOUBLE) / m)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) * m / sqrt(CAST(m AS DOUBLE))) > 3.0
         AS is_anomalous
FROM s
WHERE m = 14 AND m * sxx - sx * sx > 0
"""


@register("dq2_volume_anomaly", oracle=_DQ2_ORACLE, tags=("A7", "W4", "A11"))
def dq2_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-volume anomaly detector: each (event type, day)'s
    event count is z-scored against that type's TRAILING 14 observed
    days (excluding the current one — the frame a monitor actually has
    at decision time) and flagged past 3σ. The z-score is assembled from exact integer moments
    (count, Σn, Σn²) so both engines compute the identical double
    before the 6 dp round; degenerate windows (fewer than 14 prior
    days, zero variance) are excluded on both sides.

    Scale: one partial-aggregated groupBy to (type, day) grain, then a
    PARTITIONED per-series ROWS frame — series parallelize across
    types, each holding O(days) rows of bounded state; no global sort
    anywhere (the repo's no-unpartitioned-window sweep stays empty).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day_idx").rowsBetween(-14, -1)
    s = daily.select(
        "event_type",
        "day_idx",
        "n",
        F.count("*").over(w).alias("m"),
        F.sum("n").over(w).alias("sx"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sxx"),
    )
    var_term = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    z = (
        (F.col("n") - F.col("sx").cast("double") / F.col("m"))
        / F.sqrt(var_term.cast("double"))
        * F.col("m")
        / F.sqrt(F.col("m").cast("double"))
    )
    return (
        s.filter((F.col("m") == 14) & (var_term > 0))
        .select(
            "event_type",
            "day_idx",
            "n",
            F.round(z, 6).alias("z_score"),
            (F.abs(z) > 3.0).alias("is_anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# dq3 — primary-key audit: uniqueness of every table's declared key in
# one report — the first thing a warehouse checks after any load, and
# the precondition all the keyed joins above silently assume.
# ---------------------------------------------------------------------------

_DQ3_ORACLE = """
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_keys,
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_dup_rows
FROM customer
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'part', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT)
FROM part
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT event_id) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'documents', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT doc_id) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
FROM documents
UNION ALL
SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT vec_id) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT)
FROM embeddings
"""


@register("dq3_pk_uniqueness", oracle=_DQ3_ORACLE, tags=("A2", "A3", "S1"))
def dq3_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness report across every keyed table: row
    count, distinct key count, and duplicate-row count per table — the
    load-time gate that catches double-ingestion before any keyed join
    quietly fans out. All zeros in n_dup_rows on a healthy snapshot.

    Scale: one count-distinct aggregation per table, each independent
    (parallel jobs-graph leaves); at 100 TB the exact distinct swaps
    for the HLL contract (a4's pattern) when keys are near the row
    count anyway, or a groupBy(key).count() > 1 probe when the dup
    LIST is wanted, not just the count.
    """
    specs = [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]
    out = None
    for table, key in specs:
        t = load_table(spark, sf_dir, table)
        one = t.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("n_distinct_keys"),
        ).select(
            F.lit(table).alias("table_name"),
            "n_rows",
            "n_distinct_keys",
            (F.col("n_rows") - F.col("n_distinct_keys")).alias("n_dup_rows"),
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# dq4 — single-pass pipeline metrics via the Observation API: the
# counters a production job publishes about the data it JUST processed,
# collected from the same scan (no second pass over the input).
# ---------------------------------------------------------------------------

_DQ4_ORACLE = """
SELECT 'n_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM lineitem
UNION ALL
SELECT 'n_null_qty', CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'n_returned', CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'revenue_cents',
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
FROM lineitem
"""


@register("dq4_observed_metrics", oracle=_DQ4_ORACLE, tags=("A2", "U1"))
def dq4_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: attach an ``Observation`` to the lineitem
    scan, run the pass (a noop-format write — the "process the data"
    stand-in), and publish the observed counters as a metrics table.
    The oracle recomputes each counter with plain SQL, proving the
    observed values equal a dedicated audit pass — but the operator
    paid ZERO extra scans for them.

    Scale: observe() metrics are accumulator-style aggregates computed
    inside the existing tasks; at 100 TB this is the difference between
    monitoring-for-free and doubling the read bill. The final metrics
    table is a bounded driver-side LocalTableScan (4 rows by
    construction — documented plan-construction work, same class as
    q24's depth probe).
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Observation

    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("n_null_qty"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.sum(cents("l_extendedprice")).alias("revenue_cents"),
    )
    # The "real work" consuming the scan; noop sink = no output cost.
    observed.write.format("noop").mode("overwrite").save()
    vals = obs.get
    rows = [(k, int(vals[k])) for k in ("n_rows", "n_null_qty", "n_returned", "revenue_cents")]
    return spark.createDataFrame(rows, "metric string, value bigint")


# ---------------------------------------------------------------------------
# dq5 — schema contract: both engines' view of every table's column
# layout, normalized to one vocabulary and hash-compared. Catches
# silent parquet schema drift (a writer upgrade changing int32→int64,
# float64 embeddings, a reordered column) the moment it lands.
# ---------------------------------------------------------------------------

_DQ5_SPARK_TYPES = {
    "bigint": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "array<float>": "list<float32>",
}

_DQ5_ORACLE = """
SELECT table_name, column_name,
       CAST(ordinal_position AS INT) AS ordinal,
       CASE data_type
         WHEN 'BIGINT' THEN 'int64'
         WHEN 'INTEGER' THEN 'int32'
         WHEN 'DOUBLE' THEN 'float64'
         WHEN 'FLOAT' THEN 'float32'
         WHEN 'VARCHAR' THEN 'string'
         WHEN 'TIMESTAMP' THEN 'timestamp'
         WHEN 'FLOAT[]' THEN 'list<float32>'
         ELSE lower(data_type)
       END AS dtype
FROM information_schema.columns
WHERE table_name IN ('region', 'nation', 'customer', 'supplier', 'part',
                     'orders', 'lineitem', 'events', 'documents', 'embeddings')
"""


@register("dq5_schema_contract", oracle=_DQ5_ORACLE, tags=("S1", "F8"))
def dq5_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every table's (column, position, type) as Spark resolves it,
    normalized to an engine-neutral vocabulary; the oracle reads
    DuckDB's information_schema over the same parquet and normalizes
    its names. A hash match means the two engines agree on the ENTIRE
    star schema byte-for-byte — the contract every cross-engine parity
    result in this repo silently depends on, made an explicit grade.

    Scale: pure metadata — parquet footers only, no data scan; the
    output is a bounded LocalTableScan (driver-side bounded, like q24's
    depth probe). At 100 TB this audit costs the same as at sf0.001.
    """
    from ..io import TABLES

    rows = []
    for t in TABLES:
        for i, fld in enumerate(load_table(spark, sf_dir, t).schema.fields, 1):
            s = fld.dataType.simpleString()
            rows.append((t, fld.name, i, _DQ5_SPARK_TYPES.get(s, s)))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, ordinal int, dtype string"
    )


# ---------------------------------------------------------------------------
# dq6 — distribution drift (PSI): compare the document length
# distribution of two corpus halves with the Population Stability
# Index — the release gate that catches "the new crawl looks nothing
# like the old one" before training does.
# ---------------------------------------------------------------------------

_DQ6_ORACLE = """
WITH b AS (
  SELECT least(CAST(n_chars // 100 AS BIGINT), 9) AS bucket,
         CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ce,
         CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS co
  FROM documents GROUP BY 1
),
spine AS (
  SELECT s.bucket, COALESCE(b.ce, 0) AS ce, COALESCE(b.co, 0) AS co
  FROM (SELECT unnest(generate_series(0, 9)) AS bucket) s
  LEFT JOIN b ON b.bucket = s.bucket
),
t AS (
  SELECT CAST(SUM(ce) AS BIGINT) AS ne, CAST(SUM(co) AS BIGINT) AS no,
         list_sort(list([bucket, ce, co])) AS cells
  FROM spine
)
SELECT ne AS n_even, no AS n_odd,
       ROUND(list_sum(list_transform(cells, x ->
         (CAST(x[2] + 1 AS DOUBLE) / (ne + 10) - CAST(x[3] + 1 AS DOUBLE) / (no + 10))
         * ln((CAST(x[2] + 1 AS DOUBLE) / (ne + 10))
              / (CAST(x[3] + 1 AS DOUBLE) / (no + 10))))) + 0, 6) AS psi
FROM t
"""


@register("dq6_psi_drift", oracle=_DQ6_ORACLE, tags=("A2", "A7", "F4"))
def dq6_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the even- and odd-id corpus
    halves (stand-ins for last week's and this week's snapshots) over
    ten 100-char length buckets: PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with +1
    Laplace smoothing so empty buckets stay finite. The PSI sum folds
    IN BUCKET ORDER over the dense 10-bucket spine (missing buckets
    materialized as zeros — dropping them would silently bias the
    index), so both engines add the identical doubles in the identical
    order; counts are exact integers throughout. PSI < 0.1 is the
    conventional "no drift" gate; the fixture halves are i.i.d., so
    the golden pins a near-zero value.

    Scale: one map-side-combined groupBy over a CONSTANT 10-bucket
    key space, a 10-row spine join, and a single-row fold — the whole
    audit is O(scan); at 100 TB the only growing cost is the scan
    itself, and the bucket counts roll up mergeably per partition/day
    like every sketch in the dq family.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = docs.groupBy(
        F.least((F.col("n_chars") / 100).cast("long"), F.lit(9)).alias("bucket")
    ).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("ce"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("co"),
    )
    spine = spark.range(10).select(F.col("id").cast("long").alias("bucket"))
    dense = spine.join(F.broadcast(b), "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("ce"), F.lit(0)).alias("ce"),
        F.coalesce(F.col("co"), F.lit(0)).alias("co"),
    )
    t = dense.agg(
        F.sum("ce").alias("ne"),
        F.sum("co").alias("no"),
        F.array_sort(
            F.collect_list(F.array(F.col("bucket"), F.col("ce"), F.col("co")))
        ).alias("cells"),
    )

    def term(x):
        pe = (x[1] + 1).cast("double") / (F.col("ne") + 10)
        po = (x[2] + 1).cast("double") / (F.col("no") + 10)
        return (pe - po) * F.log(pe / po)

    psi = F.round(
        F.aggregate(F.col("cells"), F.lit(0.0), lambda acc, x: acc + term(x))
        + F.lit(0),
        6,
    )
    return t.select(
        F.col("ne").alias("n_even"),
        F.col("no").alias("n_odd"),
        psi.alias("psi"),
    )


# ---------------------------------------------------------------------------
# dp1 — column profiler: the one-pass per-column summary (counts,
# nulls, distincts, extremes) every wrangling tool prints before any
# transform is written — long-form so one schema fits every table.
# ---------------------------------------------------------------------------

_DP1_ORACLE = """
SELECT 'c_custkey' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(c_custkey) AS VARCHAR) AS min_repr,
       CAST(MAX(c_custkey) AS VARCHAR) AS max_repr
FROM customer
UNION ALL
SELECT 'c_name', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(c_name) AS BIGINT),
       CAST(COUNT(DISTINCT c_name) AS BIGINT),
       MIN(c_name), MAX(c_name)
FROM customer
UNION ALL
SELECT 'c_nationkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
       CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
FROM customer
UNION ALL
SELECT 'c_acctbal_cents', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
       CAST(COUNT(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT),
       CAST(MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS VARCHAR),
       CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS VARCHAR)
FROM customer
UNION ALL
SELECT 'c_mktsegment', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
       MIN(c_mktsegment), MAX(c_mktsegment)
FROM customer
"""


@register("dp1_column_profile", oracle=_DP1_ORACLE, tags=("A2", "A3", "F8"))
def dp1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form column profile of the customer table: per column, the
    row count, null count, exact distinct count, and min/max rendered
    as strings (one output schema regardless of column types).
    Float extremes profile through the exact cents representation —
    double→string rendering is ENGINE-SPECIFIC (scientific-notation
    thresholds differ), so numeric columns stringify integers, never
    doubles.

    Scale: each column profiles as an independent aggregation leaf
    over the same scan (Spark reuses the exchange-free scan per leaf;
    a shared-scan rewrite with approx_count_distinct is the 100 TB
    form — dq/a4 already grade that sketch). Long-form output means
    the profiler composes over any table by listing its columns.
    """
    customer = load_table(spark, sf_dir, "customer")

    def prof(col: str, expr) -> DataFrame:
        return customer.agg(
            F.lit(col).alias("column_name"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(expr)).alias("n_null"),
            F.count_distinct(expr).alias("n_distinct"),
            F.min(expr).cast("string").alias("min_repr"),
            F.max(expr).cast("string").alias("max_repr"),
        )

    parts = [
        prof("c_custkey", F.col("c_custkey")),
        prof("c_name", F.col("c_name")),
        prof("c_nationkey", F.col("c_nationkey")),
        prof("c_acctbal_cents", F.round(F.col("c_acctbal") * 100).cast("long")),
        prof("c_mktsegment", F.col("c_mktsegment")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# dp2 — join-key skew report: the pre-join audit that decides between
# a plain shuffle join, a broadcast, and j1's salting — heavy-hitter
# share of the fact table's join key, as data.
# ---------------------------------------------------------------------------

_DP2_TOPK = 5

_DP2_ORACLE = f"""
WITH k AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM k
)
SELECT k.key, k.cnt,
       m.n_keys, m.n_rows,
       ROUND(CAST(k.cnt AS DOUBLE) / m.n_rows + 0, 6) AS row_share,
       ROUND(CAST(k.cnt AS DOUBLE) * m.n_keys / m.n_rows + 0, 6) AS skew_factor
FROM k, m
ORDER BY k.cnt DESC, k.key
LIMIT {_DP2_TOPK}
"""


@register("dp2_key_skew_report", oracle=_DP2_ORACLE, tags=("A1", "O2", "A9"))
def dp2_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 heaviest lineitem join keys with their row share and
    skew factor (count ÷ mean count — 1.0 is perfectly uniform): the
    audit that decides, BEFORE a 100 TB join runs, whether the key
    needs j1's salting, AQE's skew split, or nothing. Exact counts,
    two ratios at 6 dp, (cnt, key) tiebreak.

    Scale: one map-side-combined groupBy + a single-row moment
    aggregate broadcast back + TakeOrdered(5) — the report costs one
    scan of the fact side regardless of skew. Run it per join key
    column; persist daily and dq2's anomaly window watches the
    skew_factor drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    m = k.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
    )
    joined = k.crossJoin(F.broadcast(m))
    return (
        joined.select(
            "key",
            "cnt",
            "n_keys",
            "n_rows",
            F.round(
                F.col("cnt").cast("double") / F.col("n_rows") + F.lit(0), 6
            ).alias("row_share"),
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows")
                + F.lit(0),
                6,
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(_DP2_TOPK)
    )


# ---------------------------------------------------------------------------
# dq7 — Benford first-digit audit: the fraud/synthesis detector —
# naturally-occurring money amounts follow log10(1+1/d); fabricated
# ones usually don't. First digits extract by STRING slicing (no
# log10 roundtrip), so everything but the final shares is integers.
# ---------------------------------------------------------------------------

_BENFORD_P = {
    1: 0.30102999566398119802,
    2: 0.17609125905568124208,
    3: 0.12493873660829992570,
    4: 0.09691001300805641436,
    5: 0.07918124604762482772,
    6: 0.06694678963061322440,
    7: 0.05799194697768673259,
    8: 0.05115252244738128827,
    9: 0.04575749056067513526,
}  # log10(1 + 1/d), pinned as literals on BOTH engines

_DQ7_ORACLE = f"""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE round(o_totalprice * 100) >= 1
),
c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
b(digit, p) AS (
  SELECT * FROM (VALUES
    {", ".join(f"({d}, {p!r})" for d, p in _BENFORD_P.items())}
  ) AS v(digit, p)
)
SELECT b.digit, COALESCE(c.n, 0) AS n, t.total,
       ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total + 0, 6) AS share,
       ROUND(CAST(b.p AS DOUBLE) + 0, 6) AS benford_p,
       ROUND(abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total
                 - CAST(b.p AS DOUBLE)) + 0, 6)
         AS abs_dev
FROM b LEFT JOIN c ON c.digit = b.digit CROSS JOIN t
"""


@register("dq7_benford_audit", oracle=_DQ7_ORACLE, tags=("A1", "F1", "A7"))
def dq7_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals against Benford's law:
    the digit comes from slicing the CENTS INTEGER's string form
    (log10-free — a float log near a power of ten can misbin;
    sub-cent amounts round to 0 cents and are excluded from BOTH the
    digit counts and the total, keeping the nine shares a partition
    of 1), counts
    join a dense 9-digit spine with the reference probabilities
    pinned as identical literals, and each digit reports its share
    and absolute deviation at 6 dp. Large deviations on real money
    data flag synthesis or tampering; this fixture's uniform-ish
    generator shows exactly the non-Benford signature the audit
    exists to catch.

    Scale: one map-side projection + a 9-key aggregate — audit cost
    is the scan. Digit counts merge per partition/day like every dq
    sketch.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.round(F.col("o_totalprice") * 100) >= 1
    )
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    b = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_P.items()], "digit long, p double"
    )
    dense = b.join(c, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n"), "p"
    )
    share = F.col("n").cast("double") / F.col("total")
    return dense.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        "total",
        F.round(share + F.lit(0), 6).alias("share"),
        F.round(F.col("p") + F.lit(0), 6).alias("benford_p"),
        F.round(F.abs(share - F.col("p")) + F.lit(0), 6).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# dq9 — duplicate-payment detector (round 4): pairs of purchases by the
# same user, close in time AND in amount — the classic double-charge
# audit.
# ---------------------------------------------------------------------------

_DQ9_ORACLE = """
SELECT a.event_id AS first_id,
       b.event_id AS second_id,
       a.user_id,
       CAST(abs(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS gap_us,
       CAST(abs(CAST(round(a.value * 100) AS BIGINT)
                - CAST(round(b.value * 100) AS BIGINT)) AS BIGINT) AS diff_units
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 14400000000
 AND abs(CAST(round(a.value * 100) AS BIGINT)
         - CAST(round(b.value * 100) AS BIGINT)) <= 500
WHERE a.event_type = 'purchase' AND b.event_type = 'purchase'
"""


@register("dq9_duplicate_payments", oracle=_DQ9_ORACLE, tags=("J8", "J6", "L1"))
def dq9_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected double charges: purchase pairs by the same user within
    4 hours AND within $5 of each other (exact integer-cent distance;
    µs time gap) — the audit that runs before a dedup/refund pipeline.
    Pairs are oriented by event_id so each suspect pair appears once.

    Scale: equi-join on user_id with time/amount residuals — the st8
    interval-join shape: one hash shuffle on the user key, residual
    predicates evaluated partition-locally, output bounded by
    purchases-per-user within the window. Never an all-pairs product.
    """
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", cents("value").alias("units")
    )
    a = p.select(
        F.col("event_id").alias("first_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("a_ts"),
        F.col("units").alias("a_units"),
    )
    b = p.select(
        F.col("event_id").alias("second_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("units").alias("b_units"),
    )
    gap_us = F.abs(
        ntz_epoch_us("b_ts")
        - ntz_epoch_us("a_ts")
    )
    diff_units = F.abs(F.col("a_units") - F.col("b_units"))
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("first_id") < F.col("second_id"))
            & (gap_us <= 14400000000)
            & (diff_units <= 500),
        )
        .select(
            "first_id",
            "second_id",
            "user_id",
            gap_us.alias("gap_us"),
            diff_units.alias("diff_units"),
        )
    )


# ---------------------------------------------------------------------------
# dp3 — categorical frequency profile (round 4): top-3 values per
# categorical column across the star schema, long form — the
# value-distribution half of the profiling pair (dp1 profiles numeric
# extremes; this profiles category mass).
# ---------------------------------------------------------------------------

_DP3_ORACLE = """
WITH vals AS (
  SELECT 'events.event_type' AS col_name, event_type AS value FROM events
  UNION ALL
  SELECT 'documents.lang', lang FROM documents
  UNION ALL
  SELECT 'documents.source', source FROM documents
  UNION ALL
  SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'customer.c_mktsegment', c_mktsegment FROM customer
),
counted AS (
  SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS n
  FROM vals GROUP BY col_name, value
),
ranked AS (
  SELECT col_name, value, n,
         CAST(row_number() OVER (
           PARTITION BY col_name ORDER BY n DESC, value
         ) AS BIGINT) AS value_rank,
         CAST(SUM(n) OVER (PARTITION BY col_name) AS BIGINT) AS total
  FROM counted
)
SELECT col_name, value_rank, value, n,
       round(n / CAST(total AS DOUBLE), 6) + 0 AS share
FROM ranked
WHERE value_rank <= 3
"""


@register("dp3_categorical_profile", oracle=_DP3_ORACLE, tags=("A9", "O3", "W2"))
def dp3_categorical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent values per categorical column across five
    columns of the star schema, with each value's share of the
    column's rows — the long-form categorical profile a pipeline
    publishes next to dp1's numeric one. Ranking ties break on the
    value string; shares divide exact integers.

    Scale: each branch aggregates to (column, value) cardinality
    before the union (map-side partials); the rank and the share
    window both partition by col_name — bounded keys, no global sort;
    WindowGroupLimit prunes past rank 3 pre-shuffle.
    """
    pairs = [
        ("events", "event_type", "events.event_type"),
        ("documents", "lang", "documents.lang"),
        ("documents", "source", "documents.source"),
        ("orders", "o_orderpriority", "orders.o_orderpriority"),
        ("customer", "c_mktsegment", "customer.c_mktsegment"),
    ]
    counted = None
    for table, col, label in pairs:
        branch = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("value"))
            .agg(F.count("*").alias("n"))
            .select(F.lit(label).alias("col_name"), "value", "n")
        )
        counted = branch if counted is None else counted.unionByName(branch)
    rank_w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), "value")
    tot_w = Window.partitionBy("col_name")
    ranked = counted.withColumn(
        "value_rank", F.row_number().over(rank_w).cast("bigint")
    ).withColumn("total", F.sum("n").over(tot_w))
    return ranked.filter(F.col("value_rank") <= 3).select(
        "col_name",
        "value_rank",
        "value",
        "n",
        (F.round(F.col("n") / F.col("total").cast("double"), 6) + 0).alias("share"),
    )


# ---------------------------------------------------------------------------
# DQ10 — freshness / staleness audit: how far each event type's latest
# arrival trails the table's high-water mark — the "is this feed dead?"
# check a pipeline pages on. Pure µs integer arithmetic end to end.
# ---------------------------------------------------------------------------

_DQ10_ORACLE = """
WITH hi AS (SELECT MAX(ts) AS max_ts FROM events),
per AS (
  SELECT event_type,
         MAX(ts) AS type_max_ts,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
)
SELECT p.event_type,
       p.type_max_ts,
       CAST(epoch_us(hi.max_ts) - epoch_us(p.type_max_ts) AS BIGINT)
         AS staleness_us,
       (epoch_us(hi.max_ts) - epoch_us(p.type_max_ts) > 21600000000)
         AS is_stale,
       p.n_events
FROM per p, hi
"""


@register("dq10_freshness_audit", oracle=_DQ10_ORACLE, tags=("A2", "F3", "A7"))
def dq10_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness: each event type's latest event time, its µs
    lag behind the global high-water mark, and a staleness flag at the
    6-hour SLA — the audit row a scheduler reads before deciding
    whether downstream aggregates may publish. The global max rides a
    1-row broadcast; lag arithmetic is exact BIGINT µs on both engines.

    Scale: two aggregations — one O(types) rollup and one scalar max —
    joined by broadcast; no windows, no per-row state. At 100 TB the
    per-type max pushes down to partial aggregates at the scan.
    """
    events = load_table(spark, sf_dir, "events")
    hi = events.agg(F.max("ts").alias("max_ts"))
    per = events.groupBy("event_type").agg(
        F.max("ts").alias("type_max_ts"),
        F.count("*").alias("n_events"),
    )
    j = per.crossJoin(F.broadcast(hi))
    lag_us = ntz_epoch_us("max_ts") - ntz_epoch_us("type_max_ts")
    return j.select(
        "event_type",
        "type_max_ts",
        lag_us.cast("bigint").alias("staleness_us"),
        (lag_us > 21600000000).alias("is_stale"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# DQ13 — duplicate-key impact: the fixture's lineitem does NOT enforce
# (orderkey, linenumber) uniqueness (measured ~11.8k duplicate pairs
# at sf0.01) — this audit quantifies the blast radius: how many key
# groups are duplicated, how many rows ride them, and the cents at
# stake if a consumer wrongly assumes PK semantics.
# ---------------------------------------------------------------------------

_DQ13_ORACLE = """
WITH g AS (
  SELECT l_orderkey, l_linenumber,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS grp_cents,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS keep_cents
  FROM lineitem GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_key_groups,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(SUM(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS n_dup_rows,
       CAST(MAX(k) AS BIGINT) AS worst_multiplicity,
       SUM(CASE WHEN k > 1 THEN grp_cents - keep_cents ELSE 0 END) / 100.0
         AS overcount_value
FROM g
"""


@register("dq13_duplicate_key_impact", oracle=_DQ13_ORACLE, tags=("A2", "L1", "A3"))
def dq13_duplicate_key_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key-assumption audit on (l_orderkey, l_linenumber):
    group multiplicities, rows riding duplicated keys, the worst
    multiplicity, and the exact value a survivorship dedup (keep the
    MIN-cents row — a deterministic policy) would remove from revenue
    totals. One number a consumer checks before writing MERGE logic
    that assumes the key is unique.

    Scale: one hash aggregation on the candidate key with partial
    map-side combine, then a 1-row rollup — the cheapest possible
    full-table uniqueness census (dq3 grades a different key; this
    one quantifies impact, not just existence).
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count("*").alias("k"),
        F.sum(cents("l_extendedprice")).alias("grp_cents"),
        F.min(cents("l_extendedprice")).alias("keep_cents"),
    )
    dup = F.col("k") > 1
    return g.agg(
        F.count("*").alias("n_key_groups"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        F.sum(F.when(dup, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("n_dup_rows"),
        F.max("k").cast("bigint").alias("worst_multiplicity"),
        (
            F.sum(
                F.when(dup, F.col("grp_cents") - F.col("keep_cents")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            / 100.0
        ).alias("overcount_value"),
    )


# ---------------------------------------------------------------------------
# dq12 — cross-table volume drift (round 5+): the referential volume
# monitor between fact tables. Items-per-order is stable by
# construction; a loader that drops lineitems (or double-loads them)
# shifts the weekly ratio. Each week is z-scored against its trailing
# 8-week baseline — the alert a warehouse fires BEFORE publishing a
# partition whose child/parent row ratio drifted.
# ---------------------------------------------------------------------------

_DQ12_ORACLE = """
WITH w AS (
  SELECT CAST(datediff('day', TIMESTAMP '1991-12-30', o.o_orderdate) // 7
              AS INT) AS wk,
         CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1),
r AS (SELECT wk, n_orders, n_items,
             CAST((n_items * 1000) // n_orders AS BIGINT) AS ratio_milli
      FROM w),
base AS (
  SELECT a.wk AS wk,
         CAST(COUNT(*) AS BIGINT) AS baseline_n,
         CAST(SUM(b.ratio_milli) AS BIGINT) AS sx,
         CAST(SUM(b.ratio_milli * b.ratio_milli) AS BIGINT) AS sxx
  FROM r a JOIN r b ON b.wk BETWEEN a.wk - 8 AND a.wk - 1 GROUP BY a.wk)
SELECT r.wk, r.n_orders, r.n_items, r.ratio_milli,
       COALESCE(base.baseline_n, 0) AS baseline_n,
       CASE WHEN base.baseline_n >= 4
             AND base.baseline_n * base.sxx - base.sx * base.sx > 0
            THEN ROUND((r.ratio_milli
                        - CAST(base.sx AS DOUBLE) / base.baseline_n)
                 / sqrt(CAST(base.baseline_n * base.sxx - base.sx * base.sx
                             AS DOUBLE)
                        / (base.baseline_n * (base.baseline_n - 1))), 6) + 0
       END AS z_ratio
FROM r LEFT JOIN base ON r.wk = base.wk
"""


@register("dq12_cross_table_volume_drift", oracle=_DQ12_ORACLE, tags=("A1", "J1", "W4"))
def dq12_cross_table_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly items-per-order ratio (exact integer milli-units:
    ``n_items*1000 div n_orders`` — truncating division is identical to
    DuckDB's ``//`` because both operands are positive) z-scored
    against the trailing 8-week baseline. The baseline join is an
    EQUI-join: each week's ratio is exploded to the 8 future weeks it
    baselines (offset 1..8) and re-aggregated — no range/theta join,
    no global window. Mean and variance come from exact BIGINT Σx/Σx²
    (identical doubles on both engines before the 6-dp round; ``+ 0``
    normalizes -0.0); weeks with under 4 baseline weeks or zero
    variance report NULL z.

    Scale: the weekly rollup collapses the fact join to O(weeks) rows;
    the explode×8 and re-aggregation run on that tiny table. The wk
    integer is days-since-1991-12-30 div 7 — strictly positive for
    this calendar, so floor == trunc on both engines (docstring bound,
    st14/s19 precedent).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    wk = (
        F.datediff(F.col("o_orderdate"), F.lit("1991-12-30").cast("date"))
        .cast("long")
        / 7
    )
    weekly = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .groupBy(F.floor(wk).cast("int").alias("wk"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_items"),
        )
        .withColumn(
            "ratio_milli", F.expr("(n_items * 1000) div n_orders")
        )
    )
    exploded = weekly.select(
        "wk",
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("off"),
        F.col("ratio_milli").alias("b_ratio"),
    ).select((F.col("wk") + F.col("off")).alias("target_wk"), "b_ratio")
    base = exploded.groupBy("target_wk").agg(
        F.count("*").alias("baseline_n"),
        F.sum("b_ratio").alias("sx"),
        F.sum(F.col("b_ratio") * F.col("b_ratio")).alias("sxx"),
    )
    j = weekly.join(base, weekly.wk == base.target_wk, "left")
    num = F.col("ratio_milli") - F.col("sx").cast("double") / F.col("baseline_n")
    den2 = F.col("baseline_n") * F.col("sxx") - F.col("sx") * F.col("sx")
    std = F.sqrt(
        den2.cast("double") / (F.col("baseline_n") * (F.col("baseline_n") - 1))
    )
    return j.select(
        "wk",
        "n_orders",
        "n_items",
        "ratio_milli",
        F.coalesce("baseline_n", F.lit(0)).alias("baseline_n"),
        F.when(
            (F.col("baseline_n") >= 4) & (den2 > 0),
            F.round(num / std, 6) + 0,
        ).alias("z_ratio"),
    )


# ---------------------------------------------------------------------------
# dp5 — join-cardinality planner (round 5+): the estimate a
# cost-based optimizer makes before choosing a join strategy, next to
# the truth. Keys hash into 64 histogram buckets; the textbook
# equi-depth estimate |A ⋈ B|_b ≈ rows_a·rows_b / max(ndv_a, ndv_b)
# is computed per bucket and compared with the exact per-key product
# Σ c_a(k)·c_b(k). The signed error is what a planner regression
# suite tracks — skewed keys inflate it, uniform keys drive it to
# zero.
# ---------------------------------------------------------------------------

_DP5_ORACLE = """
WITH a AS (
  SELECT ((o_orderkey % 2147483648) * 2654435761) % 64 AS bucket,
         o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
b AS (
  SELECT ((l_orderkey % 2147483648) * 2654435761) % 64 AS bucket,
         l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2),
astat AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS rows_a,
                 CAST(COUNT(*) AS BIGINT) AS ndv_a FROM a GROUP BY 1),
bstat AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS rows_b,
                 CAST(COUNT(*) AS BIGINT) AS ndv_b FROM b GROUP BY 1),
actual AS (
  SELECT a.bucket, CAST(SUM(a.c * b.c) AS BIGINT) AS actual_rows
  FROM a JOIN b ON a.bucket = b.bucket AND a.k = b.k GROUP BY 1)
SELECT astat.bucket,
       rows_a, rows_b, ndv_a, ndv_b,
       CAST((rows_a * rows_b) // GREATEST(ndv_a, ndv_b) AS BIGINT)
         AS est_rows,
       COALESCE(actual.actual_rows, 0) AS actual_rows,
       CAST(((rows_a * rows_b) // GREATEST(ndv_a, ndv_b)
             - COALESCE(actual.actual_rows, 0)) * 10000
            // GREATEST(COALESCE(actual.actual_rows, 0), 1) AS BIGINT)
         AS err_bp
FROM astat
JOIN bstat ON astat.bucket = bstat.bucket
LEFT JOIN actual ON astat.bucket = actual.bucket
"""


@register("dp5_join_cardinality_planner", oracle=_DP5_ORACLE, tags=("A1", "J1", "A4"))
def dp5_join_cardinality_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket join-size estimate vs truth for orders ⋈ lineitem on
    orderkey: 64 hash buckets (31-bit-masked Knuth hash — ANSI-safe),
    per-bucket row counts and exact NDVs feed the containment estimate
    ``rows_a·rows_b div max(ndv)``, the exact answer is Σ c_a·c_b over
    matching keys, and the signed error lands in integer basis points
    (the numerator can be negative — fine, because DuckDB's integer
    ``//`` and Spark's ``div`` both truncate toward zero).

    Scale: per-key counts are one hash aggregation each; the "actual"
    is an equi-join of the two COUNT tables (never the fact tables);
    everything downstream keys on 64 buckets. This is the arithmetic
    a CBO runs on catalog statistics — here it is value-graded.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bkt_o = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)) % 64
    bkt_l = ((F.col("l_orderkey") % F.lit(2147483648)) * F.lit(2654435761)) % 64
    a = orders.groupBy(
        bkt_o.alias("bucket"), F.col("o_orderkey").alias("k")
    ).agg(F.count("*").alias("c"))
    b = li.groupBy(
        bkt_l.alias("bucket"), F.col("l_orderkey").alias("k")
    ).agg(F.count("*").alias("c"))
    astat = a.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("rows_a"),
        F.count("*").alias("ndv_a"),
    )
    bstat = b.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("rows_b"),
        F.count("*").alias("ndv_b"),
    )
    actual = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.k") == F.col("b.k")),
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias(
            "actual_rows"
        ))
    )
    est = F.expr("(rows_a * rows_b) div greatest(ndv_a, ndv_b)")
    j = (
        astat.join(bstat, "bucket")
        .join(actual, "bucket", "left")
        .withColumn("est_rows", est)
        .withColumn("actual_rows", F.coalesce("actual_rows", F.lit(0)))
    )
    err_bp = F.expr(
        "((est_rows - actual_rows) * 10000)"
        " div greatest(actual_rows, 1)"
    )
    return j.select(
        "bucket",
        "rows_a",
        "rows_b",
        "ndv_a",
        "ndv_b",
        "est_rows",
        "actual_rows",
        err_bp.alias("err_bp"),
    )


# ---------------------------------------------------------------------------
# dp6 — functional-dependency miner (round 5+): does column X
# determine column Y? For each candidate FD the miner counts
# determinant values with more than one distinct dependent — zero
# violations means the FD holds exactly (schema-inference /
# normalization evidence). Candidates cover true FDs (nation →
# region), near-FDs, and non-FDs, so the output is a spectrum, not a
# tautology.
# ---------------------------------------------------------------------------

_DP6_ORACLE = """
WITH cand AS (
  SELECT 'n_nationkey->n_regionkey' AS fd,
         CAST(n_nationkey AS VARCHAR) AS det,
         CAST(n_regionkey AS VARCHAR) AS dep
  FROM nation
  UNION ALL
  SELECT 'c_custkey->c_mktsegment', CAST(c_custkey AS VARCHAR), c_mktsegment
  FROM customer
  UNION ALL
  SELECT 'c_mktsegment->c_nationkey', c_mktsegment,
         CAST(c_nationkey AS VARCHAR)
  FROM customer
  UNION ALL
  SELECT 'o_custkey->o_orderpriority', CAST(o_custkey AS VARCHAR),
         o_orderpriority
  FROM orders),
per_det AS (
  SELECT fd, det, CAST(COUNT(DISTINCT dep) AS BIGINT) AS n_dep
  FROM cand GROUP BY 1, 2)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_determinants,
       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(MAX(n_dep) AS BIGINT) AS max_dependents,
       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS INT) AS holds
FROM per_det GROUP BY fd
"""


@register("dp6_fd_miner", oracle=_DP6_ORACLE, tags=("A3", "A1", "O3"))
def dp6_fd_miner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact functional-dependency check over four candidates spanning
    the spectrum: nation→region (holds by schema), custkey→segment
    (holds — custkey is a key), segment→nation and custkey(of orders)→
    priority (violated). Violation = a determinant value observed with
    ≥2 distinct dependents; ``holds`` is the 0/1 verdict a schema
    normalizer consumes. Values stringify so every candidate shares
    one long-form shape.

    Scale: one union of projections, one (fd, det) distinct-dependent
    aggregation, one O(fd) rollup — the standard two-level FD counting
    that scales linearly; a full lattice search would batch candidates
    through this same shape level by level.
    """
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def cand(df, fd, det, dep):
        return df.select(
            F.lit(fd).alias("fd"),
            F.col(det).cast("string").alias("det"),
            F.col(dep).cast("string").alias("dep"),
        )

    c = (
        cand(nation, "n_nationkey->n_regionkey", "n_nationkey", "n_regionkey")
        .unionAll(cand(cust, "c_custkey->c_mktsegment", "c_custkey", "c_mktsegment"))
        .unionAll(
            cand(cust, "c_mktsegment->c_nationkey", "c_mktsegment", "c_nationkey")
        )
        .unionAll(
            cand(orders, "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")
        )
    )
    per_det = c.groupBy("fd", "det").agg(
        F.countDistinct("dep").alias("n_dep")
    )
    viol = F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
    return per_det.groupBy("fd").agg(
        F.count("*").alias("n_determinants"),
        viol.cast("long").alias("n_violating"),
        F.max("n_dep").alias("max_dependents"),
        (viol == 0).cast("int").alias("holds"),
    )


# ---------------------------------------------------------------------------
# dp7 — shuffle-partition advisor (round 5+): the sizing arithmetic
# behind spark.sql.shuffle.partitions and files.maxPartitionBytes,
# value-graded. Bytes-per-row estimates come from the schema (fixed
# widths + measured string lengths), target partition size is 128 MiB,
# and the advisor emits the partition count and skew headroom each
# table needs — the numbers this repo's own config comments cite.
# ---------------------------------------------------------------------------

_DP7_TARGET = 134217728  # 128 MiB

_DP7_ORACLE = f"""
WITH est AS (
  SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(50 + octet_length(encode(o_orderpriority))
                  + octet_length(encode(o_orderstatus))) AS BIGINT)
           AS est_bytes
  FROM orders
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(90 + octet_length(encode(l_returnflag))
                  + octet_length(encode(l_linestatus))) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'documents', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(30 + octet_length(encode(text))
                  + octet_length(encode(lang))) AS BIGINT)
  FROM documents)
SELECT tbl, n_rows, est_bytes,
       CAST(est_bytes // n_rows AS BIGINT) AS bytes_per_row,
       CAST(GREATEST((est_bytes + {_DP7_TARGET} - 1) // {_DP7_TARGET}, 1)
            AS BIGINT) AS advised_partitions,
       CAST(({_DP7_TARGET}) // GREATEST(est_bytes // n_rows, 1) AS BIGINT)
         AS rows_per_partition
FROM est
"""


@register("dp7_shuffle_partition_advisor", oracle=_DP7_ORACLE, tags=("A2", "F1", "O3"))
def dp7_shuffle_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-count advice per table: estimated in-memory bytes =
    fixed-width column footprint + measured string payload per row
    (exact integer sums), advised partitions = ceil(bytes / 128 MiB)
    via the ``(x + t − 1) div t`` integer ceiling, plus the implied
    rows-per-partition. The same arithmetic sizes
    spark.sql.shuffle.partitions at any corpus scale — run the advisor
    on catalog stats instead of a scan when they exist.

    Scale: three independent single-pass reductions (string lengths
    are the only per-row work); output is O(tables). Undersized
    partitions waste scheduler overhead, oversized ones spill —
    128 MiB is the parquet-row-group-aligned sweet spot this repo's
    session config assumes.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def est(df, tbl, fixed, *string_cols):
        payload = sum(
            (F.length(F.encode(F.col(c), "utf-8")) for c in string_cols),
            start=F.lit(fixed),
        )
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum(payload).cast("long").alias("est_bytes"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "est_bytes")

    e = (
        est(orders, "orders", 50, "o_orderpriority", "o_orderstatus")
        .unionAll(est(li, "lineitem", 90, "l_returnflag", "l_linestatus"))
        .unionAll(est(docs, "documents", 30, "text", "lang"))
    )
    t = _DP7_TARGET
    return e.select(
        "tbl",
        "n_rows",
        "est_bytes",
        F.expr("est_bytes div n_rows").alias("bytes_per_row"),
        F.expr(f"greatest((est_bytes + {t} - 1) div {t}, 1)").alias(
            "advised_partitions"
        ),
        F.expr(f"{t} div greatest(est_bytes div n_rows, 1)").alias(
            "rows_per_partition"
        ),
    )
