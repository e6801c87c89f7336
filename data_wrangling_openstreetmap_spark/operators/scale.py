"""Scale-posture operators (SURVEY.md §4.3): skew-resilient shuffles and
multi-level aggregation.

The salted join produces results identical to the plain formulation
(same oracle), so the skew machinery is value-graded, not just demoed;
bucketed co-located joins and hive-partition pruning are exercised in
tests/test_scale_layouts.py (they need a writable warehouse, which the
graded read-only path doesn't have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import cents, dsum, oracle_dsum

N_SALTS = 8

# ---------------------------------------------------------------------------
# Salted join: the hand-rolled defense for heavy-hitter keys (AQE's
# skew-join split is the automatic one — both belong in the toolbox;
# salting also fixes skewed AGGREGATION, which AQE does not).
# ---------------------------------------------------------------------------

_SALT_ORACLE = f"""
SELECT n_name, COUNT(*) AS n_orders, {oracle_dsum('o_totalprice')} AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
"""


@register("j1_salted_skew_join", oracle=_SALT_ORACLE, tags=("J1", "A1"))
def j1_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer revenue per nation, with the build side salted:
    each customer row is replicated N_SALTS times as (custkey, salt)
    and each order picks a deterministic salt, so one hot custkey
    spreads over N_SALTS shuffle partitions instead of one straggler
    task. Values are identical to the unsalted join (same oracle).

    Scale: replication multiplies the SMALL side by N_SALTS — pick the
    side that fits; for skewed groupBy the same trick is salt-in-key,
    partial agg, then re-agg without the salt. At 100 TB, N_SALTS sizes
    to (hottest-key rows ÷ target partition rows).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    salted_cust = customer.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    salted_orders = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALTS)).cast("int")
    )
    return (
        salted_orders.join(
            salted_cust,
            (salted_orders.o_custkey == salted_cust.c_custkey)
            & (salted_orders.salt == salted_cust.salt),
        )
        .join(F.broadcast(nation), salted_cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# A6 completion: CUBE (rollup's sibling) over region × order priority.
# ---------------------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT r_name, o_orderpriority, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
"""


@register("a6_cube", oracle=_CUBE_ORACLE, tags=("A6",))
def a6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(region, priority): all four grouping sets in one pass.

    Scale: Spark expands grouping sets map-side (each row feeds every
    set) then runs one partial+final agg — no N-pass re-scan; NULL
    markers distinguish the subtotal levels (keys here are non-null).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.cube("r_name", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial neighbor join (F9 × J6): the scale pattern for
# "all point pairs within radius r". The oracle brute-forces O(n²), the
# Spark side only joins within 3×3 grid-cell neighborhoods — value
# equality PROVES the bucketing loses no pair (requires r ≤ cell size).
# ---------------------------------------------------------------------------

_RADIUS_DEG = 0.5  # ≤ 1.0 (the cell size) or 3×3 coverage breaks

_GEO_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey % 170) * 0.5 - 42.0 AS lat,
         (c_custkey % 355) * 0.5 - 88.0 AS lon
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       sqrt((a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)) AS dist_deg
FROM pts a JOIN pts b ON a.id < b.id
WHERE sqrt((a.lat - b.lat) * (a.lat - b.lat)
         + (a.lon - b.lon) * (a.lon - b.lon)) <= {_RADIUS_DEG}
"""


@register("j6_grid_spatial_join", oracle=_GEO_ORACLE, tags=("F9", "J6", "J8"))
def j6_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within {radius} degrees, via 1°-grid bucketing:
    one side indexes points by cell, the other replicates each point to
    its 9 neighboring cells, so the join is a narrow equi-join on
    (cell_row, cell_col) instead of a cross product. Distances use
    explicit multiplication (pow() is not correctly-rounded everywhere;
    * + sqrt are) so both engines produce bit-identical doubles.

    Scale: shuffle keys are int cell coords; density skew (cities) is
    the hot-key risk — shrink cells or salt dense ones. This is the
    same meet-in-bucket shape as MinHash-LSH, in 2-D.
    """
    customer = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 170) * 0.5 - 42.0
    lon = (F.col("c_custkey") % 355) * 0.5 - 88.0
    pts = customer.select(
        F.col("c_custkey").alias("id"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat).cast("long").alias("cell_row"),
        F.floor(lon).cast("long").alias("cell_col"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1,1), dr -> "
        "transform(sequence(-1,1), dc -> struct(dr, dc)))))"
    )
    replicated = pts.select(
        "id", "lat", "lon", "cell_row", "cell_col", offsets.alias("o")
    ).select(
        "id",
        "lat",
        "lon",
        (F.col("cell_row") + F.col("o.dr")).alias("probe_row"),
        (F.col("cell_col") + F.col("o.dc")).alias("probe_col"),
    )
    a, b = replicated.alias("a"), pts.alias("b")
    dx = F.col("a.lat") - F.col("b.lat")
    dy = F.col("a.lon") - F.col("b.lon")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        a.join(
            b,
            (F.col("a.probe_row") == F.col("b.cell_row"))
            & (F.col("a.probe_col") == F.col("b.cell_col"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.alias("dist_deg"),
        )
        .filter(F.col("dist_deg") <= _RADIUS_DEG)
    )


# ---------------------------------------------------------------------------
# D1 — hive-partitioned layout + partition-pruned scan, value-graded.
# The 100 TB first lever: lay data out so filters never read dead files.
# ---------------------------------------------------------------------------

_D1_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders
WHERE year(o_orderdate) = 2001
GROUP BY o_orderpriority
"""


@register("d1_partition_pruned_scan", oracle=_D1_ORACLE, tags=("S1", "P2", "A7"))
def d1_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders into a hive-partitioned layout (one directory per
    order year), then answer a single-year question through it — the
    filter resolves to directory pruning, so non-matching years are
    never opened. Values are identical to filtering the flat table
    (same oracle); tests/test_scale_layouts.py asserts the plan's
    PartitionFilters carries the year predicate.

    Scale: THE first lever at 100 TB — date-partitioned parquet turns
    a full scan into |matching partitions| of IO, before any of
    Catalyst's row-group or predicate pushdown applies. The write here
    is the per-query demo form; production lays data out once.
    """
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="dwos_d1_")
    (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(path)
    )
    laid_out = spark.read.parquet(path)
    return (
        laid_out.filter(F.col("order_year") == 2001)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# D2 — bucketed co-located join, value-graded. Pre-shuffling both fact
# tables into the same bucket layout removes the join exchange entirely.
# ---------------------------------------------------------------------------

_D2_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("d2_bucketed_colocated_join", oracle=_D2_ORACLE, tags=("J1", "S6"))
def d2_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket BOTH join sides by the join key (8 buckets, sorted) into
    catalog tables, then join through the bucketed layout: matching
    bucket counts let Spark align bucket i with bucket i directly, so
    the join needs NO shuffle of either side — the exchange moved into
    the one-time layout write. Values identical to the plain join
    (same oracle); tests/test_scale_layouts.py asserts the exchange-free
    plan under a no-broadcast session.

    Scale: for a fact⋈fact join repeated across a 100 TB pipeline,
    bucketing amortizes the dominant shuffle into the ingest write;
    bucket count sizes to target-file-size × cluster width. The write
    per call is the demo form of that one-time layout.
    """
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = tempfile.mkdtemp(prefix="dwos_d2_")
    for name, df, key in (
        ("d2_orders_b", orders.select("o_custkey", "o_totalprice"), "o_custkey"),
        ("d2_customer_b", customer.select("c_custkey", "c_mktsegment"), "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", f"{base}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    ob = spark.table("d2_orders_b")
    cb = spark.table("d2_customer_b")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# D3 — Z-order (Morton) clustering key: the multi-dimensional file-
# skipping layout (Delta/Iceberg OPTIMIZE ZORDER) computed as exact
# integer bit-interleaving on both engines.
# ---------------------------------------------------------------------------

_Z_BITS = 9  # grid coords here fit 9 bits (gx < 170, gy < 355)


def _z_terms(gx: str, gy: str) -> str:
    """SQL bit-interleave: even bits ← gx, odd bits ← gy."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({gx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({gy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_D3_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         c_custkey % 170 AS gx,
         c_custkey % 355 AS gy
  FROM customer),
z AS (
  SELECT c_custkey, gx, gy, {_z_terms('gx', 'gy')} AS zkey
  FROM pts)
SELECT CAST(zkey // 1024 AS BIGINT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(gx) AS min_gx, MAX(gx) AS max_gx,
       MIN(gy) AS min_gy, MAX(gy) AS max_gy,
       MAX(gx) - MIN(gx) AS span_x,
       MAX(gy) - MIN(gy) AS span_y
FROM z GROUP BY CAST(zkey // 1024 AS BIGINT)
"""


@register("d3_zorder_curve", oracle=_D3_ORACLE, tags=("F9", "S1", "A1"))
def d3_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over a 2-D grid — the layout
    trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleaving the
    bits of the two grid coordinates gives a 1-D sort key whose
    contiguous ranges are spatially compact TILES, so min/max file
    statistics prune scans filtered on EITHER dimension (a plain sort
    clusters only its leading column). Points use the same key-derived
    grid as f9_geospatial; the graded output aggregates per 1024-key
    z-block and reports each block's bounding box — the spans being
    tile-sized (≤32×32 per 2^10 z-range, vs the full 170/355 extent for
    a 1-D layout) IS the observable clustering property, and
    tests/test_scale_layouts.py pins the file-level consequence by
    writing z-sorted parquet and comparing per-file bounding boxes
    against a 1-D-sorted layout.

    Scale: the z-key is a pure integer bit-interleave projection (no
    shuffle, exact on both engines); at 100 TB the write path is
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` feeding the
    parquet writer, and readers get two-dimensional row-group skipping
    for free from the stats Spark already records.
    """
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    pts = cust.select(
        "c_custkey",
        (key % 170).alias("gx"),
        (key % 355).alias("gy"),
    )
    zkey = None
    for i in range(_Z_BITS):
        for col, off in (("gx", 0), ("gy", 1)):
            term = F.shiftleft(
                F.shiftright(F.col(col), i).bitwiseAND(F.lit(1)), 2 * i + off
            )
            zkey = term if zkey is None else zkey + term
    z = pts.withColumn("zkey", zkey.cast("long"))
    return (
        z.groupBy((F.col("zkey") / 1024).cast("long").alias("z_block"))
        .agg(
            F.count("*").alias("n_points"),
            F.min("gx").alias("min_gx"),
            F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"),
            F.max("gy").alias("max_gy"),
            (F.max("gx") - F.min("gx")).alias("span_x"),
            (F.max("gy") - F.min("gy")).alias("span_y"),
        )
    )


# ---------------------------------------------------------------------------
# d4 — MERGE INTO semantics (SCD-1 upsert) as a full-outer join. Spark
# without a table format (Delta/Iceberg) has no MERGE statement, but the
# semantics an ingestion pipeline needs — update matched keys, insert
# unmatched ones, keep the rest — are a single full-outer join plus
# coalesce, and that IS what the formats execute under the hood.
# ---------------------------------------------------------------------------

_D4_ORACLE = """
WITH updates AS (
  SELECT c_custkey AS k, c_acctbal + 100.00 AS new_bal
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey + 1000000 AS k, 50.00 AS new_bal
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT
  COALESCE(u.k, t.c_custkey) AS c_custkey,
  COALESCE(u.new_bal, t.c_acctbal) AS acctbal,
  CASE WHEN u.k IS NULL THEN 'kept'
       WHEN t.c_custkey IS NULL THEN 'inserted'
       ELSE 'updated' END AS merge_action
FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.k
"""


@register("d4_merge_upsert", oracle=_D4_ORACLE, tags=("J2", "S6", "P6"))
def d4_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD-1 upsert): a deterministic updates batch (every
    custkey ≡ 3 mod 10 gets +100.00 balance; every ≡ 0 mod 97 spawns a
    new key at +10⁶) merges into the customer dimension — matched rows
    update, unmatched insert, the rest pass through, each tagged with
    its merge_action so downstream audits can count the three classes.

    Scale: one full-outer shuffle join hash-partitioned on the key —
    exactly the join Delta/Iceberg MERGE compiles to before file
    rewriting. The +100.00 update is exact in doubles (2-decimal value
    plus integer), so no rounding is needed for cross-engine parity.
    At 100 TB the win over rewrite-everything is partition pruning on
    the update batch's key range; the join shape is unchanged.
    """
    t = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    base = load_table(spark, sf_dir, "customer")
    updates = (
        base.filter(F.col("c_custkey") % 10 == 3)
        .select(
            F.col("c_custkey").alias("k"),
            (F.col("c_acctbal") + 100.00).alias("new_bal"),
        )
        .unionByName(
            base.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("k"),
                F.lit(50.00).alias("new_bal"),
            )
        )
    )
    merged = t.join(updates, t.c_custkey == updates.k, "full_outer")
    return merged.select(
        F.coalesce(F.col("k"), F.col("c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("new_bal"), F.col("c_acctbal")).alias("acctbal"),
        F.when(F.col("k").isNull(), "kept")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# d5 — incremental view maintenance: refresh a materialized aggregate
# from a change batch WITHOUT rescanning the base table. The batch face
# of streaming/sinks.upsert_sink, graded: merge(old_view, agg(delta))
# must equal agg(base ∪ delta) exactly — which holds because every
# maintained statistic is associative (counts and integer-cent sums).
# ---------------------------------------------------------------------------

_D5_ORACLE = """
WITH delta AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
),
unioned AS (
  SELECT o_custkey, o_totalprice FROM orders
  UNION ALL
  SELECT o_custkey, o_totalprice FROM delta
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spend
FROM unioned
GROUP BY o_custkey
"""


@register("d5_incremental_view_maintenance", oracle=_D5_ORACLE, tags=("A1", "J2", "S6"))
def d5_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of a per-customer order summary: the
    materialized view (aggregated once from the base) absorbs a change
    batch (every 7th order re-ingested) by aggregating ONLY the delta
    and merging state — counts add, cent sums add — never rescanning
    the base. The oracle recomputes from scratch over base ∪ delta, so
    the grade IS the maintenance-equals-recompute theorem for this
    view, exact because every statistic is associative and
    integer-exact.

    Scale: this is why 100 TB dashboards stay fresh — the refresh cost
    is O(|delta|) + a state-sized merge join, independent of base
    size. AVG/stddev maintain as (Σ, Σx², n); MIN/MAX and DISTINCT
    need retraction logs or sketches (a4b's mergeable HLL is the
    distinct-count path). The same merge body runs in
    streaming/sinks.upsert_sink per micro-batch.
    """
    orders = load_table(spark, sf_dir, "orders")
    base_view = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    delta = orders.filter(F.col("o_orderkey") % 7 == 0)
    delta_agg = delta.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    merged = (
        base_view.unionByName(delta_agg)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        (F.col("cents") / 100.0).alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# s16 — CDC changelog apply: replay an ordered I/U/D change stream onto
# a snapshot with last-writer-wins semantics — the full CDC contract d4
# (upsert-only) doesn't cover: deletes drop rows, and a later change
# beats an earlier one on the same key regardless of arrival order.
# ---------------------------------------------------------------------------

_S16_ORACLE = """
WITH changes AS (
  SELECT 1 AS seq, 'U' AS op, c_custkey AS k, c_acctbal + 50.00 AS bal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT 2, 'D', c_custkey, NULL FROM customer WHERE c_custkey % 14 = 0
  UNION ALL
  SELECT 3, 'I', c_custkey + 2000000, 10.00
  FROM customer WHERE c_custkey % 97 = 0
),
latest AS (
  SELECT k, op, bal FROM changes
  QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
),
merged AS (
  SELECT COALESCE(l.k, t.c_custkey) AS c_custkey,
         l.op,
         COALESCE(l.bal, t.c_acctbal) AS acctbal
  FROM customer t FULL OUTER JOIN latest l ON t.c_custkey = l.k
)
SELECT c_custkey, acctbal,
       CASE WHEN op IS NULL THEN 'kept'
            WHEN op = 'I' THEN 'inserted' ELSE 'updated' END AS apply_action
FROM merged
WHERE op IS DISTINCT FROM 'D'
"""


@register("s16_cdc_apply", oracle=_S16_ORACLE, tags=("J2", "S6", "W1"))
def s16_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a three-generation CDC changelog (updates at seq 1,
    deletes at seq 2, inserts at seq 3 — every key ≡ 0 mod 14 is first
    updated THEN deleted, proving last-writer-wins ordering, not
    arrival order) onto the customer snapshot: per key keep the
    max-seq change (partitioned rank), full-outer merge with the
    snapshot, drop keys whose final change is a delete, and tag each
    surviving row kept / updated / inserted.

    Scale: the per-key latest-change window is partitioned by the key
    (a changelog's natural shuffle); the merge is the same full-outer
    key join as d4. This IS what a table format's CDC read + MERGE
    does per batch; the streaming face is the foreachBatch sink with
    op-aware merge instead of pure upsert.
    """
    cust = load_table(spark, sf_dir, "customer")
    changes = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
            F.col("c_custkey").alias("k"),
            (F.col("c_acctbal") + 50.00).alias("bal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 14 == 0).select(
                F.lit(2).alias("seq"),
                F.lit("D").alias("op"),
                F.col("c_custkey").alias("k"),
                F.lit(None).cast("double").alias("bal"),
            )
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                F.lit(3).alias("seq"),
                F.lit("I").alias("op"),
                (F.col("c_custkey") + 2000000).alias("k"),
                F.lit(10.00).alias("bal"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        changes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("k", "op", "bal")
    )
    t = cust.select("c_custkey", "c_acctbal")
    merged = t.join(latest, t.c_custkey == latest.k, "full_outer").select(
        F.coalesce(F.col("k"), F.col("c_custkey")).alias("c_custkey"),
        "op",
        F.coalesce(F.col("bal"), F.col("c_acctbal")).alias("acctbal"),
    )
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "c_custkey",
        "acctbal",
        F.when(F.col("op").isNull(), "kept")
        .when(F.col("op") == "I", "inserted")
        .otherwise("updated")
        .alias("apply_action"),
    )


# ---------------------------------------------------------------------------
# d6 — dynamic partition overwrite (round 4): rewrite exactly ONE
# partition of a partitioned table in place, leave the rest untouched —
# the daily-reprocess primitive of every partitioned lake layout.
# ---------------------------------------------------------------------------

_D6_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(round((o_totalprice
             + CASE WHEN o_orderstatus = 'P' THEN 1000.00 ELSE 0 END) * 100)
           AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@register("d6_partition_overwrite", oracle=_D6_ORACLE, tags=("S1", "S6", "P2"))
def d6_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by status, then DYNAMIC-overwrite only
    the 'P' partition with repriced rows (+1000.00 — exact in doubles)
    and read the table back: untouched partitions must survive
    byte-for-byte, the rewritten one must show the new prices. The
    oracle derives the expected post-overwrite state from the base
    table directly.

    Scale: partitionOverwriteMode=dynamic replaces only partitions
    PRESENT in the incoming frame — the 100 TB daily-backfill pattern
    (rewrite one day, never touch the rest); static mode would drop
    every other partition. Reads prune on the partition column.
    """
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="dwos_d6_") + "/orders_parted"
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    repriced = orders.filter(F.col("o_orderstatus") == "P").withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.00
    )
    (
        repriced.write.partitionBy("o_orderstatus")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# A6 twin (round-5 rotation; a6_cube / q8_rollup graded): explicit
# GROUPING SETS — the asymmetric-subtotal form neither CUBE nor ROLLUP
# expresses (status×priority detail + per-status subtotal + grand
# total, but NO per-priority subtotal).
# ---------------------------------------------------------------------------

_A6B_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grp,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register("a6b_grouping_sets", oracle=_A6B_ORACLE, tags=("A6", "A1"))
def a6b_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a grouping-id disambiguator: the
    three asymmetric levels a finance rollup actually publishes —
    (status, priority) detail, per-status subtotal, grand total — and
    grouping_id() so an all-NULL key row is distinguishable from a
    subtotal row (both engines use the same MSB-first bitmask).

    Scale: like CUBE, Spark expands the sets map-side (each input row
    feeds every set it belongs to) and runs ONE partial+final
    aggregate — 3 sets ⇒ 3× partial-agg rows, not 3 passes over the
    fact; shuffle volume stays O(groups).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().alias("grp"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# D7 — snapshot diff: the data-diff between two table versions (the
# audit a lakehouse runs after every MERGE/overwrite — what changed,
# exactly). Two deterministic versions derive from the customer table
# (different mod-based deletion sets + a balance restatement), so both
# engines see identical inputs without any stored state.
# ---------------------------------------------------------------------------

_D7_ORACLE = """
WITH v_old AS (
  SELECT c_custkey,
         c_mktsegment,
         CASE WHEN c_custkey % 5 = 0
              THEN CAST(round(c_acctbal * 100) AS BIGINT) - 10000
              ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal_cents
  FROM customer WHERE c_custkey % 97 <> 0
),
v_new AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 89 <> 0
)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       o.bal_cents AS old_bal_cents,
       n.bal_cents AS new_bal_cents
FROM v_old o FULL JOIN v_new n ON o.c_custkey = n.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR o.bal_cents <> n.bal_cents OR o.c_mktsegment <> n.c_mktsegment
"""


@register("d7_snapshot_diff", oracle=_D7_ORACLE, tags=("J2", "S6", "P6"))
def d7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two snapshot versions of the customer
    dimension: FULL OUTER join on the key classifies every key as
    added / removed / changed (value comparison on exact cents +
    segment), and unchanged rows are filtered OUT — the minimal
    changeset a downstream consumer replays, and the audit trail a
    MERGE should reconcile to. The fixture derives both versions
    deterministically (distinct mod-based deletions; every 5th key's
    balance restated by -100.00 in the old version).

    Scale: one full-outer shuffle join on the key — the diff never
    materializes unchanged rows past the join filter, so output volume
    is the churn rate, not the table. At 100 TB, snapshot diffing is
    why you keep both versions partitioned the same way: the join
    becomes per-partition zipping with no exchange.
    """
    cust = load_table(spark, sf_dir, "customer")
    bal = cents("c_acctbal")
    v_old = cust.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, bal - 10000)
        .otherwise(bal)
        .alias("bal_cents"),
    )
    v_new = cust.filter(F.col("c_custkey") % 89 != 0).select(
        "c_custkey", "c_mktsegment", bal.alias("bal_cents")
    )
    o, n = v_old.alias("o"), v_new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    change = (
        F.when(F.col("o.c_custkey").isNull(), "added")
        .when(F.col("n.c_custkey").isNull(), "removed")
        .otherwise("changed")
    )
    differs = (
        F.col("o.c_custkey").isNull()
        | F.col("n.c_custkey").isNull()
        | (F.col("o.bal_cents") != F.col("n.bal_cents"))
        | (F.col("o.c_mktsegment") != F.col("n.c_mktsegment"))
    )
    return joined.filter(differs).select(
        F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
        change.alias("change_type"),
        F.col("o.bal_cents").alias("old_bal_cents"),
        F.col("n.bal_cents").alias("new_bal_cents"),
    )


# ---------------------------------------------------------------------------
# D8 — compaction planner: group a small-files inventory into
# target-size write groups by cutting the size-ordered cumulative byte
# stream at target boundaries — the plan a table-maintenance job
# executes to fix the small-files problem. The inventory derives
# deterministically from part (one "file" per part row).
# ---------------------------------------------------------------------------

_D8_TARGET = 128 * 1024 * 1024  # 128 MiB per compacted output group

_D8_ORACLE = f"""
WITH files AS (
  SELECT p_partkey AS file_id,
         p_size * 131072 + ((p_partkey % 2147483648) * 2654435761) % 1048576
           AS bytes
  FROM part
),
c AS (
  SELECT file_id, bytes,
         SUM(bytes) OVER (ORDER BY file_id ROWS UNBOUNDED PRECEDING) - bytes
           AS cum_before
  FROM files
)
SELECT CAST(cum_before // {_D8_TARGET} AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS group_bytes,
       MIN(file_id) AS first_file,
       MAX(file_id) AS last_file
FROM c
GROUP BY 1
"""


@register("d8_compaction_planner", oracle=_D8_ORACLE, tags=("W4", "A1", "F4"))
def d8_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction plan: each file lands in the write group
    addressed by floor(exclusive-prefix-bytes / 128 MiB) over the
    file-id-ordered inventory — the streaming cut that every group
    except possibly the last reaches the target size with at most one
    straddling file. Group count, byte totals, and id ranges are what
    the rewrite job executes and the metastore commits.

    Scale: the exclusive prefix sum is _helpers.scalable_running_sum
    over coarse file-id buckets — no global single-partition sort (the
    inventory at 100 TB is itself millions of rows); the rollup keys
    on O(groups). Byte arithmetic is exact BIGINT with the 31-bit-
    masked multiplicative hash (the s19/st14 ANSI-safe recipe).
    """
    from ._helpers import scalable_running_sum

    part = load_table(spark, sf_dir, "part")
    bytes_col = (
        F.col("p_size").cast("long") * 131072
        + ((F.col("p_partkey") % F.lit(2147483648)) * F.lit(2654435761)) % 1048576
    )
    files = part.select(
        F.col("p_partkey").alias("file_id"), bytes_col.alias("bytes")
    )
    c = scalable_running_sum(
        files,
        order_cols=["file_id"],
        value="bytes",
        bucket=F.floor(F.col("file_id") / 4096).cast("long"),
        out="cum_incl",
    )
    group_id = F.floor(
        (F.col("cum_incl") - F.col("bytes")) / F.lit(_D8_TARGET)
    ).cast("bigint")
    return (
        c.select(group_id.alias("group_id"), "bytes", "file_id")
        .groupBy("group_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("group_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
    )


# ---------------------------------------------------------------------------
# d10 — zone-map pruning simulator (round 5+): WHY clustering decides
# scan cost at 100 TB. The same orders are laid out two ways — files
# clustered by key (write order) and by date (partition order) — and
# the same date predicate is planned against each layout's per-file
# min/max zone maps. The date-clustered layout prunes almost every
# file; the key-clustered one scans them all with ~1 % true hits.
# ---------------------------------------------------------------------------

_D10_LO = "1995-06-01"
_D10_HI = "1995-09-01"

_D10_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         o_orderkey // 4096 AS key_file,
         (CAST(datediff('day', TIMESTAMP '1991-12-30', o_orderdate) AS BIGINT)
          // 7) // 4 AS date_file,
         CASE WHEN o_orderdate >= TIMESTAMP '{_D10_LO}'
               AND o_orderdate <  TIMESTAMP '{_D10_HI}'
              THEN 1 ELSE 0 END AS hit
  FROM orders),
layouts AS (
  SELECT 'key_clustered' AS layout, key_file AS file_id, o_orderdate, hit
  FROM base
  UNION ALL
  SELECT 'date_clustered', date_file, o_orderdate, hit FROM base),
zones AS (
  SELECT layout, file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(hit) AS BIGINT) AS n_hits,
         MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax
  FROM layouts GROUP BY 1, 2),
planned AS (
  SELECT layout, n_rows, n_hits,
         CASE WHEN zmax >= TIMESTAMP '{_D10_LO}'
               AND zmin <  TIMESTAMP '{_D10_HI}'
              THEN 1 ELSE 0 END AS survives
  FROM zones)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(survives) AS BIGINT) AS files_scanned,
       CAST(SUM(survives * n_rows) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_hits) AS BIGINT) AS rows_matched,
       CAST((SUM(n_hits) * 10000) // SUM(survives * n_rows) AS BIGINT)
         AS scan_efficiency_bp
FROM planned GROUP BY layout
"""


@register("d10_zone_map_pruning", oracle=_D10_ORACLE, tags=("S1", "A1", "P2"))
def d10_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan the predicate ``o_orderdate ∈ [1995-06-01, 1995-09-01)``
    against per-file (min, max) zone maps under two synthetic layouts:
    4096-key files in write order vs 4-week files in date order. A file
    survives iff its zone overlaps the predicate interval — exactly the
    row-group / data-file skipping decision parquet footers and
    lakehouse manifests make. Reports files scanned vs total, rows
    scanned vs truly matching, and integer basis-point scan efficiency
    (``hits*10000 div rows_scanned`` — positive, trunc == ``//``).

    Scale: zone maps are O(files) — both the build (one groupBy per
    layout) and the planning pass are aggregate-side; no fact-table
    row survives past the first shuffle. The date-file id reuses the
    dq12 positive week index (floor == trunc). This simulator is the
    oracle-checked twin of the REAL pruning asserted in
    d1_partition_pruned_scan's plan test — there Spark prunes
    directories; here the arithmetic itself is value-graded.
    """
    orders = load_table(spark, sf_dir, "orders")
    lo = F.lit(_D10_LO).cast("timestamp")
    hi = F.lit(_D10_HI).cast("timestamp")
    base = orders.select(
        "o_orderdate",
        F.expr("o_orderkey div 4096").alias("key_file"),
        F.expr(
            "floor(datediff(o_orderdate, date'1991-12-30') / 7) div 4"
        ).alias("date_file"),
        F.when(
            (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    layouts = base.select(
        F.lit("key_clustered").alias("layout"),
        F.col("key_file").alias("file_id"),
        "o_orderdate",
        "hit",
    ).unionAll(
        base.select(
            F.lit("date_clustered").alias("layout"),
            F.col("date_file").alias("file_id"),
            "o_orderdate",
            "hit",
        )
    )
    zones = layouts.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("hit").alias("n_hits"),
        F.min("o_orderdate").alias("zmin"),
        F.max("o_orderdate").alias("zmax"),
    )
    survives = (
        F.when((F.col("zmax") >= lo) & (F.col("zmin") < hi), 1)
        .otherwise(0)
        .alias("survives")
    )
    return (
        zones.select("layout", "n_rows", "n_hits", survives)
        .groupBy("layout")
        .agg(
            F.count("*").alias("files_total"),
            F.sum("survives").cast("long").alias("files_scanned"),
            F.sum(F.col("survives") * F.col("n_rows"))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_hits").cast("long").alias("rows_matched"),
            F.expr(
                "(sum(n_hits) * 10000) div sum(survives * n_rows)"
            ).alias("scan_efficiency_bp"),
        )
    )


# ---------------------------------------------------------------------------
# d11 — retention (TTL) sweep planner (round 5+): what a row-level
# retention policy would delete at the corpus horizon — clicks kept
# 90 days, views 30, signups 365, purchases forever. The sweep report
# (rows/bytes per type, partition-level vs row-level deletes) is what
# the maintenance job commits and compliance audits.
# ---------------------------------------------------------------------------

_D11_ORACLE = """
WITH mx AS (SELECT MAX(ts) AS horizon FROM events),
pol AS (
  SELECT * FROM (VALUES ('click', 90), ('view', 30), ('signup', 365))
    p(event_type, keep_days)),
aged AS (
  SELECT e.event_type,
         COALESCE(pol.keep_days, -1) AS keep_days,
         CASE WHEN pol.keep_days IS NOT NULL
               AND datediff('day', CAST(e.ts AS DATE), CAST(mx.horizon AS DATE))
                   > pol.keep_days
              THEN 1 ELSE 0 END AS expired,
         CAST(octet_length(encode(e.props)) + 40 AS BIGINT) AS est_bytes
  FROM events e LEFT JOIN pol ON e.event_type = pol.event_type, mx)
SELECT event_type,
       CAST(MAX(keep_days) AS INT) AS keep_days,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(expired) AS BIGINT) AS n_expired,
       CAST(SUM(expired * est_bytes) AS BIGINT) AS reclaim_bytes,
       CAST((SUM(expired) * 10000) // COUNT(*) AS BIGINT) AS expired_bp
FROM aged GROUP BY event_type
"""


@register("d11_retention_sweep", oracle=_D11_ORACLE, tags=("P2", "A1", "J2"))
def d11_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type TTL sweep against the corpus horizon (global max event
    time, broadcast scalar): policy joins as a 3-row broadcast dim
    (types without a policy keep forever, keep_days = −1), expiry is
    integer day arithmetic, reclaimed bytes estimate = payload bytes +
    40 per-row overhead. expired_bp is the integer share that tells
    the planner whether whole-partition drops beat row-level deletes.

    Scale: a TTL sweep at 100 TB is a partition-pruned scan + one
    rollup — the expiry predicate is exactly the partition filter when
    the table is date-partitioned (d1/d10 show the pruning); this
    report is the dry run every retention job logs before deleting.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("horizon"))
    pol = spark.createDataFrame(
        [("click", 90), ("view", 30), ("signup", 365)],
        "event_type string, keep_days int",
    )
    aged = (
        ev.join(F.broadcast(pol), "event_type", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.coalesce("keep_days", F.lit(-1)).alias("keep_days"),
            F.when(
                F.col("keep_days").isNotNull()
                & (
                    F.datediff(
                        F.col("horizon").cast("date"), F.col("ts").cast("date")
                    )
                    > F.col("keep_days")
                ),
                1,
            )
            .otherwise(0)
            .alias("expired"),
            (F.length(F.encode(F.col("props"), "utf-8")).cast("long") + 40)
            .alias("est_bytes"),
        )
    )
    return aged.groupBy("event_type").agg(
        F.max("keep_days").cast("int").alias("keep_days"),
        F.count("*").alias("n_rows"),
        F.sum("expired").cast("long").alias("n_expired"),
        F.sum(F.col("expired") * F.col("est_bytes"))
        .cast("long")
        .alias("reclaim_bytes"),
        F.expr("(sum(expired) * 10000) div count(*)").alias("expired_bp"),
    )


# ---------------------------------------------------------------------------
# ROUND-9 J3+J6+F9 twin (j6_grid_spatial_join graded the PAIR
# enumeration within radius; q4/j3b/j3c/f7c graded plain semi joins;
# f9/f9c/f9d/f27 the geospatial function surface). The angle: the
# EXISTS form of the spatial join — customers near AT LEAST ONE depot
# — where the depot set is itself a LEFT SEMI reduction of suppliers
# against the fact table, so the J3 and J6 legs compose in one plan
# and the grid bucketing must not duplicate or drop near-boundary
# members (the semi's distinct collapse is part of the grade).
# ---------------------------------------------------------------------------

_J18_RADIUS = 0.7  # ≤ 1.0 (the cell size) or 3×3 coverage breaks

_J18_ORACLE = f"""
WITH cpts AS (
  SELECT c_custkey AS id, c_mktsegment, c_acctbal,
         (c_custkey % 170) * 0.5 - 42.0 AS lat,
         (c_custkey % 355) * 0.5 - 88.0 AS lon
  FROM customer
), depots AS (
  SELECT (s_suppkey % 140) * 0.5 - 35.0 AS lat,
         (s_suppkey * 7 % 280) * 0.5 - 70.0 AS lon
  FROM supplier s
  WHERE EXISTS (SELECT 1 FROM lineitem
                WHERE l_suppkey = s.s_suppkey
                  AND l_returnflag = 'R' AND l_quantity >= 45.0)
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_near,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM cpts c
WHERE EXISTS (
  SELECT 1 FROM depots d
  WHERE sqrt((c.lat - d.lat) * (c.lat - d.lat)
           + (c.lon - d.lon) * (c.lon - d.lon)) <= {_J18_RADIUS}
)
GROUP BY 1
"""


@register(
    "j18_depot_proximity_semi", oracle=_J18_ORACLE, tags=("J3", "J6", "F9")
)
def j18_depot_proximity_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within {radius}° of at least one ACTIVE depot, rolled
    up per market segment. The depot set is a LEFT SEMI reduction
    first (J3: suppliers with a returned ≥45-quantity shipment — the
    existence test, not a join multiplication), then the proximity
    test is the EXISTS form of j6's grid-bucketed range join (J6/F9):
    customer probes replicate to their 3×3 cell neighborhood, a LEFT
    SEMI join against depot cells keeps probes whose cell holds a
    close-enough depot, and a DISTINCT collapses the ≤9 surviving
    replicas of each customer back to one membership row. Distances
    use explicit multiplication + sqrt (correctly rounded on both
    engines; same formula discipline as j6). Coordinates are exact
    multiples of 0.5°, so the boundary compare is bit-deterministic.

    Scale: both semi joins keep the probe side un-multiplied — the
    depot side collapses to distinct keys before the spatial stage and
    broadcasts (O(suppliers) points); the spatial shuffle keys are int
    cell coords (same density-skew caveat as j6: salt hot cells). The
    replicate-then-distinct is 9× on the probe side only, and the
    distinct reuses the segment rollup's shuffle at O(customers) keys.
    """
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    active = sup.join(
        li.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45.0)
        ).select("l_suppkey"),
        sup.s_suppkey == F.col("l_suppkey"),
        "left_semi",
    )
    d_lat = (F.col("s_suppkey") % 140) * 0.5 - 35.0
    d_lon = (F.col("s_suppkey") * 7 % 280) * 0.5 - 70.0
    depots = active.select(
        d_lat.alias("d_lat"),
        d_lon.alias("d_lon"),
        F.floor(d_lat).cast("long").alias("cell_row"),
        F.floor(d_lon).cast("long").alias("cell_col"),
    )
    c_lat = (F.col("c_custkey") % 170) * 0.5 - 42.0
    c_lon = (F.col("c_custkey") % 355) * 0.5 - 88.0
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        "c_mktsegment",
        "c_acctbal",
        c_lat.alias("lat"),
        c_lon.alias("lon"),
        F.floor(c_lat).cast("long").alias("base_row"),
        F.floor(c_lon).cast("long").alias("base_col"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1,1), dr -> "
        "transform(sequence(-1,1), dc -> struct(dr, dc)))))"
    )
    probes = pts.select(
        "id",
        "c_mktsegment",
        "c_acctbal",
        "lat",
        "lon",
        "base_row",
        "base_col",
        offsets.alias("o"),
    ).select(
        "id",
        "c_mktsegment",
        "c_acctbal",
        "lat",
        "lon",
        (F.col("base_row") + F.col("o.dr")).alias("probe_row"),
        (F.col("base_col") + F.col("o.dc")).alias("probe_col"),
    )
    dx = F.col("lat") - F.col("d_lat")
    dy = F.col("lon") - F.col("d_lon")
    near = probes.join(
        F.broadcast(depots),
        (F.col("probe_row") == F.col("cell_row"))
        & (F.col("probe_col") == F.col("cell_col"))
        & (F.sqrt(dx * dx + dy * dy) <= _J18_RADIUS),
        "left_semi",
    )
    members = near.select("id", "c_mktsegment", "c_acctbal").distinct()
    return members.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_near"),
        F.sum(cents("c_acctbal")).alias("bal_cents"),
    )
