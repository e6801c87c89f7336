"""Composite analytics queries #2 — classic TPC-H decision-support
shapes adapted to the graded star schema, plus an event-funnel query.

These extend the q11/q12 composites in ``relational.py`` with the
remaining canonical shapes: order-count distribution (q13), conditional
revenue share (q14), argmax over an aggregate (q15), a click→purchase
funnel (q16), explicit GROUPING SETS (a6b), correlated-subquery
decorrelation (q17), HAVING-joined top-N (q18), disjunctive predicate
pushdown (q19), a dimension joined twice by role (q20), EXISTS + NOT
EXISTS over one derived relation (q21), and scalar-threshold + anti-join
(q22). Each compiles to built-in Column expressions — no Python in the
hot path — and uses the exact integer-unit money recipe from
``_helpers`` so value-hashes match the DuckDB oracle at any partition
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import cents, ckpt, dsum, ntz_epoch_us, oracle_cents, oracle_dsum

# ---------------------------------------------------------------------------
# q13 — order-count distribution (the TPC-H Q13 shape): left outer join
# so zero-order customers survive, per-customer count, then a histogram
# of counts. Two cascaded aggregations, all-integer → exact.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_customer AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_customer
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_count_distribution", oracle=_Q13_ORACLE, tags=("J2", "A1", "A5", "O1"))
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N orders, including N=0 (left
    outer join keeps order-less customers; COUNT(o_orderkey) skips the
    null-padded rows).

    Scale: first agg shuffles on c_custkey (same key as the join — AQE
    reuses the exchange); second agg's input is |customers| rows
    collapsing to a handful of distinct counts, with map-side partial
    aggregation doing almost all of the work.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_customer = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue share per month (the TPC-H Q14 shape):
# conditional aggregate ratio over a part-enriched lineitem scan.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
WITH flat AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
         {oracle_cents('l_extendedprice')} * (100 - {oracle_cents('l_discount')}) AS rev_units,
         starts_with(p_type, 'PROMO') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT ship_month,
       CAST(SUM(CASE WHEN is_promo THEN rev_units ELSE 0 END) AS DOUBLE)
         / CAST(SUM(rev_units) AS DOUBLE) AS promo_share,
       SUM(CASE WHEN is_promo THEN rev_units ELSE 0 END) / 10000.0 AS promo_revenue,
       SUM(rev_units) / 10000.0 AS total_revenue
FROM flat
GROUP BY ship_month
ORDER BY ship_month
"""


@register("q14_promo_share", oracle=_Q14_ORACLE, tags=("J1", "J5", "A1", "A7", "P6", "F4"))
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly share of revenue from PROMO-type parts during 1996.

    The ratio divides two exact scale-4 integer-unit sums as doubles —
    longs below 2^53 map to exact doubles and IEEE division is
    correctly rounded, so both engines produce the identical bits with
    no rounding step.

    Scale: part is the small side (p_partkey, p_type only after
    pruning) → broadcast-hash join, no fact shuffle; the shipdate range
    prunes parquet row groups. One shuffle on the 12 month keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_units = cents("l_extendedprice") * (100 - cents("l_discount"))
    flat = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), li.l_partkey == F.col("p_partkey"))
        .select(
            F.date_trunc("month", "l_shipdate").alias("ship_month"),
            rev_units.alias("rev_units"),
            F.col("p_type").startswith("PROMO").alias("is_promo"),
        )
    )
    promo_units = F.sum(F.when(F.col("is_promo"), F.col("rev_units")).otherwise(F.lit(0)))
    total_units = F.sum("rev_units")
    return (
        flat.groupBy("ship_month")
        .agg(
            (promo_units.cast("double") / total_units.cast("double")).alias("promo_share"),
            (promo_units / 10000.0).alias("promo_revenue"),
            (total_units / 10000.0).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# q15 — top supplier by revenue in a quarter (the TPC-H Q15 shape):
# argmax over an aggregate, expressed as agg → broadcast-joined global
# max rather than an all-rows-in-one-partition window.
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({oracle_cents('l_extendedprice')} * (100 - {oracle_cents('l_discount')})) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_units / 10000.0 AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE rev_units = (SELECT MAX(rev_units) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("J1", "J5", "A1", "A2", "O1"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue over 1996 Q1. Ties all
    surface (exact integer-unit equality, no float epsilon), ordered by
    key for determinism.

    Scale: the per-supplier agg shuffles once on l_suppkey; the global
    max is a 1-row aggregate broadcast back, and supplier is a
    broadcast dim — no second fact shuffle, unlike the
    Window.partitionBy() (single-partition) formulation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-04-01 00:00:00")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_units"))
    )
    top = revenue.agg(F.max("rev_units").alias("max_units"))
    return (
        revenue.join(F.broadcast(top), revenue.rev_units == top.max_units)
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", (F.col("rev_units") / 10000.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16 — click→purchase funnel over events: per-user first-click /
# first-purchase timestamps, converting users only, with the gap in
# seconds. Sequence analysis as min-aggregates, not a window scan.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click'    THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT user_id, first_click, first_purchase,
       date_diff('second', first_click, first_purchase) AS seconds_to_convert
FROM firsts
WHERE first_click IS NOT NULL AND first_purchase > first_click
ORDER BY user_id
"""


@register("q16_funnel", oracle=_Q16_ORACLE, tags=("A1", "P6", "F3", "W5"))
def q16_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose first purchase followed their first click, with the
    conversion gap in whole seconds (integer — cross-engine exact;
    session TZ is pinned UTC so unix_timestamp on the ntz values agrees
    with DuckDB's naive date_diff).

    Scale: one shuffle on user_id with map-side partial MIN — no
    per-user window sort. The conditional-MIN idiom is the scalable
    form of "first event of type X per key".
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        firsts.filter(
            F.col("first_click").isNotNull()
            & (F.col("first_purchase") > F.col("first_click"))
        )
        .select(
            "user_id",
            "first_click",
            "first_purchase",
            (
                F.unix_timestamp("first_purchase") - F.unix_timestamp("first_click")
            ).alias("seconds_to_convert"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# a6b — explicit GROUPING SETS with grouping_id (completes A6 alongside
# the rollup/cube queries): region-level and nation-level revenue in one
# pass, distinguishable via the grouping bit vector.
# ---------------------------------------------------------------------------

_A6GS_ORACLE = f"""
SELECT r_name, n_name,
       GROUPING(r_name, n_name) AS gid,
       SUM({oracle_cents('o_totalprice')}) / 100.0 AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (r_name, n_name))
ORDER BY gid, r_name, n_name
"""


@register("a6_grouping_sets", oracle=_A6GS_ORACLE, tags=("A6", "J1", "A1"))
def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at region and region+nation grain in one aggregation via
    GROUPING SETS; ``grouping_id`` (same bit-vector semantics as
    DuckDB's GROUPING, column order fixed on both sides) labels the
    grain. Spark expands grouping sets into a single Expand + hash agg
    — one shuffle for both grains, vs two queries + union.

    Scale: same posture as q8_rollup — Expand doubles the shuffled rows
    but keys stay low-cardinality, so partial agg absorbs the blowup.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    flat = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        flat.groupingSets(
            [["r_name"], ["r_name", "n_name"]],
            "r_name",
            "n_name",
        )
        .agg(
            F.grouping_id().alias("gid"),
            (F.sum(cents("o_totalprice")) / 100.0).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue vs per-part average (the TPC-H Q17
# shape): a correlated-subquery filter expressed as a self-aggregating
# join, then a global aggregate.
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM({oracle_cents('l_quantity')}) / 100.0 / COUNT(l_quantity) AS avg_qty
  FROM lineitem
  GROUP BY l_partkey
)
SELECT SUM({oracle_cents('l_extendedprice')}) / 100.0 / 7.0 AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE {oracle_cents('l_quantity')} < 0.5 * 100.0 * avg_qty
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("J1", "A1", "A2", "P2"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly-average revenue from lineitems whose quantity is below
    half their part's average quantity (a correlated subquery,
    decorrelated into an aggregate-then-join).

    Determinism: the threshold compares exact quantity cents against
    0.5*100*avg where avg = exact-long-sum/100.0/count — every term is
    the identical double on both engines, so the boundary predicate
    cannot flicker.

    Scale: both sides shuffle on l_partkey (AQE reuses the exchange for
    the join); per_part is |parts| rows. The final agg is global but
    partial-aggregated map-side to one row per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(cents("l_quantity")) / 100.0 / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(cents("l_quantity") < 0.5 * 100.0 * F.col("avg_qty"))
        .agg(
            (F.sum(cents("l_extendedprice")) / 100.0 / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers (the TPC-H Q18 shape): HAVING over a
# per-order aggregate, joined back to orders and customers, top-N by
# order value.
# ---------------------------------------------------------------------------

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey AS ok, SUM({oracle_cents('l_quantity')}) / 100.0 AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({oracle_cents('l_quantity')}) > 30000
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = ok
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE, tags=("J1", "A1", "A5", "O1", "O2"))
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 highest-value orders among those whose lineitems total
    more than 300 quantity units (HAVING on exact integer cents — the
    300.00 boundary cannot drift), with the customer attached.

    Scale: per-order agg shuffles on l_orderkey and collapses to the
    HAVING survivors (small) → that side broadcasts into orders; the
    final TakeOrderedAndProject keeps only 20 rows per partition.
    o_orderkey is the unique tiebreak under the LIMIT.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(cents("l_quantity")).alias("qty_units"))
        .filter(F.col("qty_units") > 30000)
        .select("ok", (F.col("qty_units") / 100.0).alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.ok)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q22 — dormant high-balance customers per nation (the TPC-H Q22
# shape): global scalar-aggregate threshold + anti-join + grouped
# aggregate, composing A2, J4 and A1 in one query.
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
WITH threshold AS (
  SELECT SUM(CASE WHEN c_acctbal > 0 THEN {oracle_cents('c_acctbal')} ELSE 0 END) / 100.0
         / COUNT(CASE WHEN c_acctbal > 0 THEN 1 END) AS avg_pos_bal
  FROM customer
)
SELECT n_name,
       COUNT(*) AS n_dormant,
       SUM({oracle_cents('c_acctbal')}) / 100.0 AS total_bal
FROM customer, threshold
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_pos_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""


@register("q22_dormant_customers", oracle=_Q22_ORACLE, tags=("A2", "J4", "A1", "P6", "O1"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count and balance of customers who sit above the
    average positive account balance yet placed no order since
    2000-01-01 (every fixture customer has *some* order, so "dormant"
    is defined against the recent window to keep the anti-join
    non-vacuous).

    Determinism: the threshold is exact-long-sum/100.0/count — the
    identical double on both engines — so the > comparison is stable;
    remaining aggregates are exact integer units.

    Scale: the threshold is a 1-row broadcast; the anti-join shuffles
    customer vs orders.o_custkey (orders projected to the single key
    column first); nation broadcasts. One grouped shuffle on 25 keys.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    threshold = customer.agg(
        (
            F.sum(F.when(F.col("c_acctbal") > 0, cents("c_acctbal")).otherwise(F.lit(0))) / 100.0
            / F.count(F.when(F.col("c_acctbal") > 0, F.lit(1)))
        ).alias("avg_pos_bal")
    )
    return (
        customer.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-01-01 00:00:00").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_dormant"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("total_bal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue (the TPC-H Q19 shape): an OR of
# conjunctive (brand × size × quantity) clauses over a part join —
# exercises Catalyst's OR-predicate pushdown and constant folding.
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT SUM({oracle_cents('l_extendedprice')} * (100 - {oracle_cents('l_discount')})) / 10000.0
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("J1", "J5", "P2", "A2"))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems matching any of three brand/size/quantity
    clause bundles — the disjunctive-predicate shape that defeats naive
    single-column pushdown.

    Scale: Catalyst splits the OR into a common `l_quantity BETWEEN 1
    AND 50`-style envelope it can push to the scan, broadcasts part,
    and evaluates the residual disjunction post-join in codegen; the
    global sum partial-aggregates to one row per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30) & q.between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & q.between(20, 50))
    )
    rev_units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .filter(clause)
        .agg(
            (F.sum(rev_units) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q20 — trade-flow matrix (the TPC-H Q7 shape): the nation dimension
# joined TWICE under different roles — customer nation via orders,
# supplier nation via lineitem — yielding a nation-pair revenue matrix.
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       SUM({oracle_cents('l_extendedprice')} * (100 - {oracle_cents('l_discount')})) / 10000.0
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY cust_nation, supp_nation
ORDER BY cust_nation, supp_nation
"""


@register("q20_trade_flows", oracle=_Q20_ORACLE, tags=("J1", "J5", "A1", "O1", "J8"))
def q20_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue between ordered customer-nation/supplier-nation pairs:
    the same dimension participates twice under different join roles
    (aliased self-use, the TPC-H Q7 trade-volume shape). The `<`
    predicate keeps one row per unordered pair.

    Scale: both nation copies and supplier broadcast; the fact chain
    shuffles once on l_orderkey↔o_orderkey (the only big-big join),
    then the pair aggregate runs on ≤300 keys. At 100 TB, bucketing
    orders and lineitem on orderkey makes the remaining shuffle
    co-located.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            (F.sum(rev_units) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


# ---------------------------------------------------------------------------
# q21 — sole-fault supplier (the TPC-H Q21 shape): semi-join ("order had
# multiple suppliers") + anti-join ("no OTHER supplier returned goods")
# composed in one query — the EXISTS/NOT-EXISTS pair over the same
# derived relation.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH multi AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) >= 2
),
r_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, COUNT(*) AS numwait
FROM r_pairs a
JOIN multi    ON a.l_orderkey = multi.l_orderkey
JOIN supplier ON a.l_suppkey = s_suppkey
WHERE NOT EXISTS (
  SELECT 1 FROM r_pairs b
  WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_sole_fault_supplier", oracle=_Q21_ORACLE, tags=("J3", "J4", "A1", "A3", "O2"))
def q21_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers most often the ONLY one with returned ('R') lineitems
    in orders that involved at least two suppliers — EXISTS (semi on
    the multi-supplier order set) and NOT EXISTS (anti on "another
    supplier also returned") composed over one derived pair relation.

    The NOT EXISTS is decorrelated into an anti-join against the pair
    relation keyed (orderkey, other-supplier); equivalently a count
    window — the join form keeps both sides shuffle-partitioned on
    l_orderkey so every stage reuses one exchange.

    Scale: r_pairs and multi are both per-order aggregates of the same
    scan (shuffle on l_orderkey, reused); the anti-join self-pairs
    r_pairs on the same key. Final agg is 25 supplier keys; top-10 is
    TakeOrderedAndProject with s_name as the unique tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select("l_orderkey")
    )
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = r_pairs.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    sole = (
        r_pairs.join(multi, "l_orderkey", "left_semi")
        .join(
            others,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_suppkey") != F.col("b_suppkey")),
            "left_anti",
        )
    )
    return (
        sole.join(F.broadcast(supplier), sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Calendar densification (gap fill): every customer × every month of
# their active 1996–97 span, zero-filled where no orders exist. The
# missing-period densification every time-series pipeline needs before
# windowed math — a LEFT JOIN against a generated calendar spine.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         (year(o_orderdate) - 1990) * 12 + month(o_orderdate) - 1 AS midx,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_units
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
spans AS (SELECT o_custkey, MIN(midx) AS lo, MAX(midx) AS hi FROM m GROUP BY o_custkey),
spine AS (SELECT o_custkey, unnest(generate_series(lo, hi)) AS month_idx FROM spans)
SELECT spine.o_custkey AS custkey,
       spine.month_idx AS month_idx,
       COALESCE(m.spend_units, 0) / 100.0 AS month_spend,
       (m.midx IS NULL) AS gap_filled
FROM spine LEFT JOIN m
  ON spine.o_custkey = m.o_custkey AND spine.month_idx = m.midx
"""


@register("w8_gap_fill_calendar", oracle=_GAPFILL_ORACLE, tags=("A7", "J2", "F5"))
def w8_gap_fill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per customer, one row for EVERY month
    between their first and last 1996–97 order, spend zero-filled and
    flagged where the source had no rows. Time-series pipelines need
    the dense spine before moving averages / forward fills make sense;
    the capability is the generated-sequence spine + left join, which
    no plain aggregation expresses.

    Scale: the spine explodes to |customers| × span-months rows — at
    100 TB that's generated distributively from each customer's (lo,
    hi) pair, never materialized driver-side; the join key
    (custkey, month) is the aggregation key, so spine and sums
    co-partition on custkey and the join is skew-free. Integer month
    index keeps the whole query timezone-free; cents sums exact.
    """
    orders = load_table(spark, sf_dir, "orders")
    midx = (F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate") - 1
    m = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1998-01-01 00:00:00")
        )
        .groupBy("o_custkey", midx.alias("midx"))
        .agg(F.sum(cents("o_totalprice")).alias("spend_units"))
    )
    spine = (
        m.groupBy("o_custkey")
        .agg(F.min("midx").alias("lo"), F.max("midx").alias("hi"))
        .select(
            "o_custkey",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("month_idx"),
        )
    )
    joined = spine.join(
        m,
        (spine.o_custkey == m.o_custkey) & (spine.month_idx == m.midx),
        "left",
    )
    return joined.select(
        spine.o_custkey.alias("custkey"),
        "month_idx",
        (F.coalesce(F.col("spend_units"), F.lit(0)) / 100.0).alias("month_spend"),
        F.col("midx").isNull().alias("gap_filled"),
    )


# ---------------------------------------------------------------------------
# Nested-document shaping (the reference's JSON-document / Mongo-load
# step): re-nest order lines into an items array inside each order
# document, then compute over the NESTED shape with higher-order
# functions. The oracle computes the same numbers from the flat tables,
# proving nest → compute-over-nest loses nothing.
# ---------------------------------------------------------------------------

_NEST_ORACLE = """
SELECT o_orderkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_units,
       CAST(MAX(l_linenumber) AS BIGINT) AS max_line
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey < 1000
GROUP BY o_orderkey
"""


@register("n1_nested_doc_shaping", oracle=_NEST_ORACLE, tags=("F5", "A8", "P1"))
def n1_nested_doc_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document shaping: each order becomes a nested document with an
    ordered `items` array of (linenumber, quantity) structs — the shape
    the reference feeds to its JSON sink / document-DB load — and every
    output is then computed FROM the nested array with higher-order
    functions (size / aggregate / array_max over transform), never from
    the flat rows. Matching the flat-side oracle proves the
    nest-then-consume pipeline is lossless.

    Scale: one shuffle on the order key builds each document where its
    lines already are; struct packing is a projection. Downstream
    consumers read documents without re-joining — the point of
    materializing the nested shape at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    docs = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("line"),
                        F.round(F.col("l_quantity") * 100)
                        .cast("long")
                        .alias("qty_units"),
                    )
                )
            ).alias("items")
        )
    )
    items = F.col("items")
    return docs.select(
        "o_orderkey",
        F.size(items).cast("long").alias("n_items"),
        F.aggregate(
            F.transform(items, lambda s: s["qty_units"]),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qty_units"),
        F.array_max(F.transform(items, lambda s: s["line"]))
        .cast("long")
        .alias("max_line"),
    )


# ---------------------------------------------------------------------------
# q23 — activation-cohort weekly retention: the canonical product-
# analytics matrix (cohort week × week offset → active users + rate).
# ---------------------------------------------------------------------------

_Q23_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events WHERE value > 220.0),
activation AS (
  SELECT user_id, MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week
  FROM events WHERE value > 220.0 GROUP BY user_id),
act AS (
  SELECT a.cohort_week, u.week, u.user_id
  FROM uw u JOIN activation a USING (user_id)
  WHERE u.week >= a.cohort_week),
per AS (
  SELECT cohort_week,
         date_diff('day', CAST(cohort_week AS DATE), CAST(week AS DATE)) // 7
           AS week_offset,
         COUNT(DISTINCT user_id) AS n_active
  FROM act GROUP BY 1, 2),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM activation GROUP BY 1)
SELECT p.cohort_week,
       CAST(p.week_offset AS BIGINT) AS week_offset,
       CAST(p.n_active AS BIGINT) AS n_active,
       s.cohort_size,
       CAST(p.n_active AS DOUBLE) / s.cohort_size AS retention
FROM per p JOIN sizes s USING (cohort_week)
"""


@register(
    "q23_retention_cohorts", oracle=_Q23_ORACLE, tags=("A7", "A3", "J1", "W3")
)
def q23_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation-cohort weekly retention — the canonical product-
    analytics matrix: users are cohorted by the week of their first
    HIGH-VALUE event (value > 220, ~the fixture's p99 — activation, not
    mere presence, so cohorts actually spread across weeks), then each
    (cohort week, week offset) cell counts how many of that cohort were
    ACTIVE AT THE SAME BAR (another value > 220 event) in that later
    week, with the retention rate against the cohort size — high-value
    retention, not mere presence (the fixture's users emit ~2 events a
    day, so presence-retention is a wall of 1.0s).

    Scale: two distinct-aggregations (user-week activity, per-user
    activation min) shuffling on user_id, one join back on user_id, and
    a low-cardinality final rollup — all partial-aggregated, no window
    over the full event stream. At 100 TB the user-week distinct is the
    big shuffle; it is exactly the pre-aggregation that makes the rest
    cheap (events collapse to ≤ users × weeks rows before any join).
    Weeks are Monday-truncated in both engines; the offset divides an
    exact day difference by 7; retention is an exact integer ratio.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    hv = ev.filter(F.col("value") > 220.0)
    uw = hv.select("user_id", wk.alias("week")).distinct()
    activation = hv.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    act = uw.join(activation, "user_id").filter(
        F.col("week") >= F.col("cohort_week")
    )
    per = act.groupBy(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active"))
    sizes = activation.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return per.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


# ---------------------------------------------------------------------------
# scd2 — slowly-changing-dimension type-2 history build: the MERGE
# pattern expressed as join + union (vanilla Spark has no MERGE INTO;
# Delta/Iceberg compile theirs to exactly this shape).
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH updates AS (
  SELECT c_custkey,
         c_mktsegment || '/R2' AS c_mktsegment,
         c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 3),
closed AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
         CASE WHEN u.c_custkey IS NOT NULL
              THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
         (u.c_custkey IS NULL) AS is_current
  FROM customer c LEFT JOIN updates u USING (c_custkey)),
fresh AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM updates)
SELECT * FROM closed UNION ALL SELECT * FROM fresh
"""


@register(
    "scd2_dimension_history",
    oracle=_SCD2_ORACLE,
    tags=("J2", "O3", "P6", "F3"),
)
def scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build — the warehouse
    MERGE pattern: an incoming update batch (synthesized
    deterministically: every 7th customer changes segment and balance
    at the 2024-06-01 snapshot) is merged into the current dimension as
    versioned rows. Matched rows are CLOSED (valid_to stamped, no
    longer current) and re-inserted with the new attributes as the open
    version; unmatched rows stay open. Vanilla Spark has no MERGE INTO
    — Delta and Iceberg compile theirs to exactly this left-join +
    union-all plan, which is what a user migrating dimension-
    maintenance jobs needs.

    Scale: one equi-join on the dimension key (broadcast when the
    update batch is small — the common case; sort-merge otherwise)
    plus a union-all that never shuffles. History grows by the update
    count, not the dimension size. The balance update is a single IEEE
    double add (identical on both engines); timestamps are ntz
    literals on the Spark side matching DuckDB's naive TIMESTAMP.
    """
    cust = load_table(spark, sf_dir, "customer")
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    updates = cust.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("/R2")).alias("u_segment"),
        (F.col("c_acctbal") + 100.0).alias("u_acctbal"),
    )
    merged = cust.join(F.broadcast(updates), "c_custkey", "left")
    closed = merged.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        t1.alias("valid_from"),
        F.when(F.col("u_segment").isNotNull(), t2).alias("valid_to"),
        F.col("u_segment").isNull().alias("is_current"),
    )
    fresh = updates.select(
        "c_custkey",
        F.col("u_segment").alias("c_mktsegment"),
        F.col("u_acctbal").alias("c_acctbal"),
        t2.alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionAll(fresh)


# ---------------------------------------------------------------------------
# q24 — hierarchy closure: iterative parent-chain traversal (the BOM /
# org-chart / category-tree walk every warehouse eventually needs), as
# an iterative DataFrame loop with a KNOWN depth bound — the same
# Pregel-as-DataFrames pattern as l2_dup_clusters, here over a tree.
# Spark 4.1 also ships native WITH RECURSIVE — q24b below runs the
# SAME traversal through it; both forms stay registered (the loop is
# the portable/depth-controlled shape, the CTE the declarative one).
# ---------------------------------------------------------------------------

_Q24_ORACLE = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
  UNION ALL
  SELECT node, cur // 10, depth + 1 FROM chain WHERE cur >= 10
)
SELECT node AS c_custkey, cur AS root_key, CAST(depth AS INT) AS depth
FROM chain WHERE cur < 10
"""


@register("q24_hierarchy_closure", oracle=_Q24_ORACLE, tags=("J1", "A2", "P6"))
def q24_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root + depth for every node of a synthetic decimal hierarchy
    (parent(k) = k div 10; keys under 10 are roots — the fixture has no
    organic tree, so the edge rule is arithmetic, which also gives the
    oracle a recursive CTE to grade the closure against).

    The loop ITERATES depth times, not once per node: each pass
    advances every unfinished node one level in a single map-side
    projection, so the work is O(depth × n) with depth known up front
    (⌈log₁₀ max_key⌉ — one tiny agg action, the only driver
    synchronization). No joins at all here because the parent rule is
    arithmetic; with a materialized edge table each pass becomes an
    equi-join against the (parent, child) relation — same shape as
    l2_dup_clusters' label propagation, which handles the general
    graph case.

    Scale: depth passes over n rows, all map-side; a 100 TB
    organizational/category hierarchy is still depth ≤ ~20, so the
    loop count stays trivial while each pass is embarrassingly
    parallel.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    max_key = cust.agg(F.max("c_custkey")).collect()[0][0]
    depth_bound = max(1, len(str(int(max_key))))
    frontier = cust.select(
        F.col("c_custkey"),
        F.col("c_custkey").alias("cur"),
        F.lit(0).alias("depth"),
    )
    for _ in range(depth_bound):
        frontier = frontier.select(
            "c_custkey",
            F.when(F.col("cur") >= 10, (F.col("cur") / 10).cast("long"))
            .otherwise(F.col("cur"))
            .alias("cur"),
            F.when(F.col("cur") >= 10, F.col("depth") + 1)
            .otherwise(F.col("depth"))
            .alias("depth"),
        )
    return frontier.select(
        "c_custkey",
        F.col("cur").alias("root_key"),
        F.col("depth").cast("int").alias("depth"),
    )


# ---------------------------------------------------------------------------
# q25 — shipping-priority top-10 (the classic "unshipped revenue"
# report): revenue of orders placed before a cutoff whose lineitems
# ship after it, top-10 by revenue.
# ---------------------------------------------------------------------------

_Q25_CUTOFF = "1998-06-01 00:00:00"

_Q25_ORACLE = f"""
SELECT
  l_orderkey,
  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
    AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q25_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_Q25_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q25_shipping_priority", oracle=_Q25_ORACLE, tags=("J1", "J5", "A1", "O2", "P2"))
def q25_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 highest-revenue orders from the BUILDING segment placed
    before the cutoff but (partially) unshipped at it — the classic
    shipping-priority report: a three-table join with filters on every
    input, exact integer-unit revenue (price-cents × discount-percent
    units, scale 4), and a revenue-ranked top-10.

    Scale: both date predicates and the segment filter push to their
    scans; customer keys broadcast into orders; orders⋈lineitem is the
    lone real shuffle, on the order key. The top-10 compiles to
    TakeOrderedAndProject — per-partition heads merged on the driver,
    never a global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _Q25_CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q25_CUTOFF
    )
    rev_units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_units) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q26 — forecast revenue change: the what-if scan — revenue that would
# be gained by eliminating small discounts on mid-size orders in one
# year. A single filtered aggregation whose entire value is pushdown.
# ---------------------------------------------------------------------------

_Q26_ORACLE = """
SELECT
  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0 AS forecast_revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q26_forecast_revenue", oracle=_Q26_ORACLE, tags=("A2", "P2", "F4"))
def q26_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta from hypothetically dropping 3–7% discounts on
    sub-24-quantity lines shipped in one year — a single global
    aggregate over a triple-predicate scan. Every predicate is
    sargable (date range, discount band, quantity bound), so at 100 TB
    the query is row-group pruning plus a map-side partial sum; the
    revenue product stays in exact integer units (scale 4).

    Float caveat handled: the discount band compares 2-decimal doubles
    against exact literals — 0.03/0.07 are not exact binaries, but the
    fixture's discounts are the same parsed doubles in both engines,
    so the comparisons agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    units = cents("l_extendedprice") * cents("l_discount")
    return filtered.agg(
        (F.sum(units) / 10000.0).alias("forecast_revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q27 — customer lifetime-value curves: average cumulative spend per
# customer by (acquisition cohort, weeks since acquisition) — the LTV
# matrix growth teams read next to q23's retention matrix.
# ---------------------------------------------------------------------------

_Q27_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey
),
cohorted AS (
  SELECT f.o_custkey,
         CAST(floor(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                             f.first_dt) / 7) AS INT) AS cohort_week,
         CAST(floor(datediff('day', f.first_dt, o.o_orderdate) / 7)
              AS INT) AS week_since,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM firsts f JOIN orders o ON o.o_custkey = f.o_custkey
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cohort_size
  FROM cohorted GROUP BY cohort_week
),
weekly AS (
  SELECT cohort_week, week_since, SUM(cents) AS wk_cents
  FROM cohorted GROUP BY cohort_week, week_since
),
cum AS (
  SELECT cohort_week, week_since,
         SUM(wk_cents) OVER (PARTITION BY cohort_week ORDER BY week_since
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_cents
  FROM weekly
)
SELECT c.cohort_week, c.week_since, s.cohort_size,
       c.cum_cents / 100.0 / s.cohort_size AS avg_cum_spend
FROM cum c JOIN sizes s USING (cohort_week)
"""


@register("q27_ltv_curves", oracle=_Q27_ORACLE, tags=("A1", "W4", "A7", "J1"))
def q27_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV curves: for each acquisition cohort (week of first order)
    and each observed week-since-acquisition, the average CUMULATIVE
    spend per cohort member — cumulative cents via a per-cohort window
    over the weekly aggregate (observed weeks only; both engines see
    the same gaps), divided once by the cohort size. Integer cents keep
    every cumulative value exact; the single final division produces
    the identical double on both engines, so no rounding is needed.

    Scale: first-order dates are one shuffle on customer; the weekly
    grain collapses orders before the window, which is PARTITIONED by
    cohort (hundreds of rows per cohort series at any corpus size) —
    no global sort, no per-order window state.
    """
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    cohorted = orders.join(firsts, "o_custkey").select(
        "o_custkey",
        F.floor(
            F.datediff(F.col("first_dt"), F.lit("1995-01-01").cast("timestamp_ntz")) / 7
        )
        .cast("int")
        .alias("cohort_week"),
        F.floor(F.datediff(F.col("o_orderdate"), F.col("first_dt")) / 7)
        .cast("int")
        .alias("week_since"),
        cents("o_totalprice").alias("cents"),
    )
    sizes = cohorted.groupBy("cohort_week").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    weekly = cohorted.groupBy("cohort_week", "week_since").agg(
        F.sum("cents").alias("wk_cents")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weekly.select(
        "cohort_week",
        "week_since",
        F.sum("wk_cents").over(w).alias("cum_cents"),
    )
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_since",
        "cohort_size",
        (F.col("cum_cents") / 100.0 / F.col("cohort_size")).alias("avg_cum_spend"),
    )


# ---------------------------------------------------------------------------
# q28 — local supplier volume (the classic join-CYCLE query): revenue
# from lineitems where the ordering customer and the supplying supplier
# share a nation — the correlation predicate lives BETWEEN two
# dimension paths, not on either one.
# ---------------------------------------------------------------------------

_Q28_ORACLE = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
         AS local_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM customer
JOIN orders   ON o_custkey  = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


@register("q28_local_supplier_volume", oracle=_Q28_ORACLE, tags=("J1", "J5", "A1", "P2"))
def q28_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-nation revenue per nation over a two-year window: the join
    graph is a CYCLE (lineitem joins orders→customer on one side and
    supplier on the other, with the customer/supplier nations equated
    at the end) — the shape that exposes join-ORDER sensitivity,
    because the closing equality predicate can only be applied after
    both dimension paths have been walked.

    Scale: the date filter prunes orders first; customer and supplier
    (with nation keys) broadcast; the two fact shuffles key on
    o_orderkey — Catalyst applies the same-nation filter as soon as
    both nationkey columns are in scope, so the cycle closes without a
    cartesian step. Revenue stays in exact integer units (scale 4).
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1999-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    rev_units = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(rev_units) / 10000.0).alias("local_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q24b — the SAME hierarchy closure via Spark 4.1's native WITH
# RECURSIVE, graded against DuckDB's recursive CTE (engine-vs-engine
# recursion, like x1's engine-vs-engine ASOF).
# ---------------------------------------------------------------------------


@register("q24b_recursive_cte", oracle=_Q24_ORACLE, tags=("J1", "A2", "P6"))
def q24b_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4.1 ``WITH RECURSIVE``): the q24
    parent-chain walk written declaratively — anchor = every node at
    depth 0, recursive step divides the key by 10 until it reaches a
    single-digit root. Identical oracle to q24, so the two forms are
    mutually checking: iterative loop == native recursion == DuckDB
    recursion.

    Scale: Spark plans this as a UnionLoop that materializes each
    iteration's frontier — the same per-round shuffles as the explicit
    loop, with the engine owning convergence instead of a driver-side
    depth probe. Depth is log₁₀(maxkey), so the recursion is bounded
    the same way q24's loop is.
    """
    load_table(spark, sf_dir, "customer").select("c_custkey").createOrReplaceTempView(
        "q24b_customer"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
          FROM q24b_customer
          UNION ALL
          SELECT node, cur DIV 10, depth + 1 FROM chain WHERE cur >= 10
        )
        SELECT node AS c_custkey, cur AS root_key, CAST(depth AS INT) AS depth
        FROM chain WHERE cur < 10
        """
    )


# ---------------------------------------------------------------------------
# q29 — event-transition matrix (product-analytics "paths"): counts of
# consecutive event-type pairs per user timeline.
# ---------------------------------------------------------------------------

_Q29_ORACLE = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@register("q29_event_transitions", oracle=_Q29_ORACLE, tags=("W3", "A1"))
def q29_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    timeline (lead() per user, tie-broken by the unique event_id, then
    a pair rollup) — the input to funnel discovery and next-action
    models. Each user's final event emits no transition.

    Scale: one shuffle on user_id for the lead window, then a
    25-key-at-most pair aggregation with map-side partials — the same
    two-exchange shape as st3's sessionization.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )


# ---------------------------------------------------------------------------
# a23 — arg-extrema aggregates (max_by / min_by): "the id of the row
# with the extreme value" without a self-join or window.
# ---------------------------------------------------------------------------

_A23_ORACLE = """
SELECT event_type,
       arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 100000000 + event_id)
         AS top_event_id,
       arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 100000000 + event_id)
         AS bottom_event_id,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@register("a23_arg_extrema", oracle=_A23_ORACLE, tags=("A9", "A1"))
def a23_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the event id carrying the highest and lowest
    value — ``max_by``/``min_by`` over an exact integer COMPOSITE key
    (cents·10⁸ + id) so two-decimal value ties cannot make the answer
    partition-order luck (the bare max_by(id, value) form is
    nondeterministic under ties; so is DuckDB's arg_max — and DuckDB
    1.x accepts no struct/list ordering key, hence the packed BIGINT
    both engines share).

    Scale: a single partial-aggregated groupBy — max_by carries one
    (key, candidate) pair per partition, exactly like MAX; the window/
    self-join alternatives carry the whole group.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.round(F.col("value") * 100).cast("long") * 100_000_000 + F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", key).alias("top_event_id"),
        F.min_by("event_id", key).alias("bottom_event_id"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# a22 — A/B experiment readout: deterministic hash bucketing, group
# means, lift, and a Welch t-statistic — all from exact integer
# moments so the one sqrt and the divisions are bit-identical across
# engines (u3's z-score recipe, applied to experimentation).
# ---------------------------------------------------------------------------

_A22_ORACLE = """
WITH m AS (
  SELECT
    COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
    COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n_b,
    COALESCE(SUM(CASE WHEN user_id % 2 = 0
                      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS sx_a,
    COALESCE(SUM(CASE WHEN user_id % 2 = 1
                      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS sx_b,
    COALESCE(SUM(CASE WHEN user_id % 2 = 0
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END), 0) AS sxx_a,
    COALESCE(SUM(CASE WHEN user_id % 2 = 1
                      THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END), 0) AS sxx_b
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       ROUND(CAST(sx_a AS DOUBLE) / n_a, 6) AS mean_a_cents,
       ROUND(CAST(sx_b AS DOUBLE) / n_b, 6) AS mean_b_cents,
       ROUND(CAST(sx_b AS DOUBLE) / n_b - CAST(sx_a AS DOUBLE) / n_a, 6) AS lift_cents,
       ROUND(
         (CAST(sx_b AS DOUBLE) / n_b - CAST(sx_a AS DOUBLE) / n_a)
         / sqrt(
             CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a
           + CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b
         ), 6) AS t_welch
FROM m
"""


@register("a22_ab_lift", oracle=_A22_ORACLE, tags=("A2", "A11"))
def a22_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout in one pass: users hash into arms by parity,
    purchase value accumulates as exact integer cents moments (count,
    Σx, Σx²) per arm, and the output derives means, lift, and the
    Welch t-statistic. The moment products run in DECIMAL(38,0)
    (HUGEINT in the oracle) so n·Σx² − (Σx)² is exact; each engine then
    performs the IDENTICAL sequence of double divisions and one sqrt —
    rounded 6 for belt-and-braces.

    Scale: a single global conditional aggregate — partial moments per
    partition, one 1-row merge; the readout never shuffles the facts
    at all. Real assignment uses xxhash64(user_id, salt) — parity
    stands in deterministically here.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = cents("value")
    arm_a, arm_b = (F.col("user_id") % 2 == 0), (F.col("user_id") % 2 == 1)
    dec = "decimal(38,0)"
    m = ev.agg(
        F.count(F.when(arm_a, 1)).alias("n_a"),
        F.count(F.when(arm_b, 1)).alias("n_b"),
        F.coalesce(F.sum(F.when(arm_a, c)), F.lit(0)).alias("sx_a"),
        F.coalesce(F.sum(F.when(arm_b, c)), F.lit(0)).alias("sx_b"),
        F.coalesce(F.sum(F.when(arm_a, c * c)), F.lit(0)).alias("sxx_a"),
        F.coalesce(F.sum(F.when(arm_b, c * c)), F.lit(0)).alias("sxx_b"),
    )
    mean_a = F.col("sx_a").cast("double") / F.col("n_a")
    mean_b = F.col("sx_b").cast("double") / F.col("n_b")
    num_a = (
        F.col("n_a").cast(dec) * F.col("sxx_a").cast(dec)
        - F.col("sx_a").cast(dec) * F.col("sx_a").cast(dec)
    ).cast("double")
    num_b = (
        F.col("n_b").cast(dec) * F.col("sxx_b").cast(dec)
        - F.col("sx_b").cast(dec) * F.col("sx_b").cast(dec)
    ).cast("double")
    var_a = num_a / (F.col("n_a").cast("double") * (F.col("n_a") - 1))
    var_b = num_b / (F.col("n_b").cast("double") * (F.col("n_b") - 1))
    t = (mean_b - mean_a) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return m.select(
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a_cents"),
        F.round(mean_b, 6).alias("mean_b_cents"),
        F.round(mean_b - mean_a, 6).alias("lift_cents"),
        F.round(t, 6).alias("t_welch"),
    )


# ---------------------------------------------------------------------------
# j12 — point-in-time (PIT) join: enrich each event with the dimension
# version that was valid AT THE EVENT'S TIMESTAMP — the feature-store /
# "as-was" reporting primitive that prevents temporal leakage (joining
# today's segment onto last month's events).
# ---------------------------------------------------------------------------

_J12_CUTOVER = "2024-01-15 00:00:00"

_J12_ORACLE = f"""
WITH v1 AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
         CASE WHEN c_custkey % 7 = 3
              THEN TIMESTAMP '{_J12_CUTOVER}' END AS valid_to
  FROM customer),
v2 AS (
  SELECT c_custkey, c_mktsegment || '/R2' AS c_mktsegment,
         TIMESTAMP '{_J12_CUTOVER}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer WHERE c_custkey % 7 = 3),
dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT d.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e
JOIN dim d ON e.user_id + 1 = d.c_custkey
          AND e.ts >= d.valid_from
          AND (d.valid_to IS NULL OR e.ts < d.valid_to)
GROUP BY d.c_mktsegment
"""


@register("j12_point_in_time_join", oracle=_J12_ORACLE, tags=("J6", "J5", "F3"))
def j12_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT enrichment against a two-version SCD2-style dimension
    (segment renamed mid-January for every 7th customer): each event
    joins the version whose [valid_from, valid_to) interval contains
    its timestamp, so the same customer's events land in DIFFERENT
    segments on either side of the cutover — the leakage-free join a
    feature store must produce for training-data backfills.

    Scale: equi-join on the customer key with the interval predicate
    as a residual filter — versions per key are few (2 here; bounded
    by change frequency in general), so this is a broadcast/hash join,
    never a range-probe: the general unbounded-interval case is
    j6_range_join's grid blocking, and the latest-only case degrades
    to j7's as-of.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    tc = F.lit(_J12_CUTOVER).cast("timestamp_ntz")
    v1 = cust.select(
        "c_custkey",
        "c_mktsegment",
        t0.alias("valid_from"),
        F.when(F.col("c_custkey") % 7 == 3, tc).alias("valid_to"),
    )
    v2 = cust.filter(F.col("c_custkey") % 7 == 3).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("/R2")).alias("c_mktsegment"),
        tc.alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    joined = ev.join(
        F.broadcast(dim),
        (ev.user_id + 1 == dim.c_custkey)
        & (ev.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (ev.ts < dim.valid_to)),
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# j14 — interval-overlap self-join: orders as fulfillment intervals
# [orderdate, last shipdate], paired per customer when the intervals
# overlap (the "how many in-flight orders at once" concurrency
# question). The Spark plan grid-blocks the timeline so the pairing is
# an equi-join; the exact overlap predicate then prunes the candidates.
# ---------------------------------------------------------------------------

_J14_ORACLE = """
WITH iv AS (
  SELECT o.o_custkey AS custkey, o.o_orderkey AS okey,
         o.o_orderdate AS start_ts, MAX(l.l_shipdate) AS end_ts
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.custkey, a.okey AS okey_a, b.okey AS okey_b
  FROM iv a JOIN iv b
    ON a.custkey = b.custkey AND a.okey < b.okey
   AND a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts
)
SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
FROM pairs
GROUP BY custkey
"""


@register("j14_interval_overlap_join", oracle=_J14_ORACLE, tags=("J6", "J8", "F3"))
def j14_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, the number of order pairs whose fulfillment
    intervals (order date → latest line shipdate) overlap — the
    interval-overlap theta join, the second classic range-join shape
    after j7's as-of. Semantics: closed intervals, a.start ≤ b.end ∧
    b.start ≤ a.end, id-ordered pairs so each counts once.

    Scale: the oracle's theta join is quadratic per customer; the
    Spark plan never runs it. Each interval explodes into the 7-day
    grid cells it covers (bounded fan-out: span/7 + 1 cells), pairs
    meet by (custkey, cell) EQUI-join, the exact predicate prunes
    false neighbors, and DISTINCT collapses pairs spanning several
    shared cells — the same meet-in-bucket shape as the LSH band join
    and j6's spatial grid, linear in intervals × cells. Cell width
    trades fan-out against candidate precision; 7 days ≈ the median
    fulfillment span here.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(
            lineitem.select("l_orderkey", "l_shipdate"),
            orders.o_orderkey == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("start_ts"),
        )
        .agg(F.max("l_shipdate").alias("end_ts"))
    )
    epoch = F.lit("1970-01-01").cast("date")
    cells = iv.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("start_ts").cast("date"), epoch) / 7),
                F.floor(F.datediff(F.col("end_ts").cast("date"), epoch) / 7),
            )
        ),
    )
    # merge hint: both sides are the SAME exploded fact-sized relation,
    # but Catalyst can't size through explode(sequence(...)) and may
    # estimate the build side under the broadcast threshold — at sf0.1
    # in a default 1g-heap session that broadcast OOMs, and shuffle_hash
    # merely moves the OOM to the per-task hash build (both observed in
    # the round-6 sf0.1 sweep). A sort-merge join spills gracefully at
    # ANY memory budget, the right default for a fact×fact equi-join on
    # (custkey, cell).
    a, b = cells.alias("a"), cells.hint("merge").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.custkey") == F.col("b.custkey"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.okey") < F.col("b.okey")),
        )
        .filter(
            (F.col("a.start_ts") <= F.col("b.end_ts"))
            & (F.col("b.start_ts") <= F.col("a.end_ts"))
        )
        .select(
            F.col("a.custkey").alias("custkey"),
            F.col("a.okey").alias("okey_a"),
            F.col("b.okey").alias("okey_b"),
        )
        .distinct()
    )
    return pairs.groupBy("custkey").agg(F.count("*").alias("n_overlap_pairs"))


# ---------------------------------------------------------------------------
# q30 — event-sequence pattern matching: each user's ordered event
# history becomes a symbol string, and funnels/anomalies are REGEXES
# over it — the MATCH_RECOGNIZE-style sequence operator, expressed
# with engine-native strings instead of a dedicated clause.
# ---------------------------------------------------------------------------

_Q30_ORACLE = """
WITH j AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
                      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                      ELSE 'e' END, '' ORDER BY ts, event_id) AS journey
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(journey) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(journey, '[cv]+p')) AS BIGINT)
         AS n_conversions,
       CAST(len(regexp_extract_all(journey, 'ee+')) AS BIGINT)
         AS n_error_runs,
       CAST(COALESCE(list_max(list_transform(
              regexp_extract_all(journey, '[cv]+'), x -> length(x))), 0)
            AS BIGINT) AS longest_browse_run
FROM j
"""


@register("q30_event_pattern_match", oracle=_Q30_ORACLE, tags=("A8", "F2", "L4", "W3"))
def q30_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern mining per user: events collapse to a
    time-ordered symbol string (c/v/p/s/e), then funnels are regex
    counts over it — browse-then-buy conversions (``[cv]+p``),
    repeated-error runs (``ee+``), and the longest browse streak.
    The MATCH_RECOGNIZE shape without the clause: classify → order →
    match, with leftmost greedy non-overlapping matches (identical in
    Java regex and RE2 for these backreference-free patterns).
    Ordering is pinned by the (unique) event time with the id
    tiebreak, so the string — and every match count — is
    deterministic.

    Scale: one shuffle to assemble each user's (calendar-bounded)
    journey; matching is a per-row projection. Histories that outgrow
    a row get pre-sessionized first (st3) and matched per session —
    same operator, bounded strings; the symbol alphabet keeps the
    string 1 byte per event regardless of type names.
    """
    ev = load_table(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    j = ev.select("user_id", "ts", "event_id", sym.alias("sym")).groupBy(
        "user_id"
    ).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "sym"))),
                lambda s: s["sym"],
            ),
        ).alias("journey")
    )
    browse_runs = F.regexp_extract_all(F.col("journey"), F.lit("[cv]+"), F.lit(0))
    return j.select(
        "user_id",
        F.length("journey").cast("long").alias("n_events"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("[cv]+p"), F.lit(0)))
        .cast("long")
        .alias("n_conversions"),
        F.size(F.regexp_extract_all(F.col("journey"), F.lit("ee+"), F.lit(0)))
        .cast("long")
        .alias("n_error_runs"),
        F.coalesce(
            F.array_max(F.transform(browse_runs, F.length)), F.lit(0)
        )
        .cast("long")
        .alias("longest_browse_run"),
    )


# ---------------------------------------------------------------------------
# n2 — deep flatten with null preservation: a two-level nested
# document (customer → orders[] → lines[]) flattened back to long form
# with OUTER explodes, so customers with no orders (and orders with no
# lines) survive as null rows — the lossless inverse of n1's nesting.
# ---------------------------------------------------------------------------

_N2_ORACLE = """
WITH li AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_units
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_custkey, o_orderkey, li.n_lines, li.qty_units
  FROM orders LEFT JOIN li ON li.l_orderkey = orders.o_orderkey
  WHERE o_orderkey < 2000
)
SELECT c.c_custkey, o.o_orderkey, o.n_lines, o.qty_units
FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 200
"""


@register("n2_deep_flatten", oracle=_N2_ORACLE, tags=("P1", "F5", "A8", "J2"))
def n2_deep_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a two-level nested document: customers nest
    their orders (each order carrying per-line rollups), then the
    document is flattened back with ``explode_outer`` — the
    null-preserving explode — and graded against the flat LEFT-JOIN
    image. Proves the nest→flatten cycle is lossless INCLUDING the
    empty-array edge (a plain ``explode`` would silently drop
    order-less customers, the classic flattening bug).

    Scale: nesting is n1's shuffle-on-key groupBy; the outer explode
    is a projection (no shuffle) whose fan-out equals the array
    sizes — flattening never re-joins. Keys are range-filtered only to
    keep the golden snapshot reviewable.
    """
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_units"),
        )
    )
    odocs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("o_orderkey", "n_lines", "qty_units")
                )
            ).alias("orders")
        )
    )
    nested = customer.join(
        odocs, customer.c_custkey == odocs.o_custkey, "left"
    ).select("c_custkey", "orders")
    flat = nested.select(
        "c_custkey", F.explode_outer("orders").alias("o")
    )
    return flat.select(
        "c_custkey",
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.col("o.n_lines").alias("n_lines"),
        F.col("o.qty_units").alias("qty_units"),
    )


# ---------------------------------------------------------------------------
# a27 — Mann–Whitney U (rank-sum) test: the nonparametric sibling of
# a22's Welch t — no normality assumption, driven entirely by ranks.
# Tie-averaged ranks are kept EXACT by working in doubled units
# (avg rank × 2 = min_rank + max_rank), so every statistic up to the
# final z is integer arithmetic.
# ---------------------------------------------------------------------------

_A27_ORACLE = """
WITH p AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         event_id,
         user_id % 2 AS grp
  FROM events WHERE event_type = 'purchase'
),
rk AS (
  SELECT cents, grp,
         CAST(row_number() OVER (ORDER BY cents, event_id) AS BIGINT) AS rn
  FROM p
),
vg AS (
  SELECT cents,
         MIN(rn) AS rmin, MAX(rn) AS rmax,
         CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca
  FROM rk GROUP BY cents
),
m AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(t) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_vals,
         CAST(SUM(ca * (rmin + rmax)) AS BIGINT) AS r2a,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM vg
)
SELECT n_a, n - n_a AS n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       ties AS tie_term,
       CASE WHEN n_a = 0 OR n - n_a = 0 OR n_vals = 1 THEN 0.0
            ELSE ROUND(CAST(r2a - n_a * (n_a + 1) - n_a * (n - n_a) AS DOUBLE)
                       / (2.0 * sqrt(CAST(n_a AS DOUBLE) * (n - n_a)
                                     * (CAST(n AS DOUBLE) * n * n - n - ties)
                                     / (12.0 * n * (n - 1)))) + 0, 6)
       END AS z_mw
FROM m
"""


@register("a27_mann_whitney", oracle=_A27_ORACLE, tags=("A2", "A11", "W1"))
def a27_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between even- and odd-user purchase amounts:
    pooled cents are ranked globally, ties take the average rank —
    carried as min_rank + max_rank (= 2·avg, always an integer) — and
    U, the tie-correction Σ(t³−t), and the normal-approximation z all
    derive from four exact integer sums; only the final z divides and
    roots, in one expression written identically on both engines.

    Scale: the global rank uses the two-level scalable_row_number
    (bucketed by cents — never an unbounded single-partition sort);
    everything after is a per-distinct-value aggregate and a
    single-row reduce. The oracle uses DuckDB's plain global
    row_number — same ranks, quadratic-free on both sides.
    """
    from ._helpers import scalable_row_number

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
        (F.col("user_id") % 2).alias("grp"),
    )
    rk = scalable_row_number(
        p,
        key="cents",
        bucket_width=512,
        order_cols=[F.col("cents"), F.col("event_id")],
        out="rn",
    )
    vg = rk.groupBy("cents").agg(
        F.min("rn").alias("rmin"),
        F.max("rn").alias("rmax"),
        F.count("*").alias("t"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
    )
    m = vg.agg(
        F.sum("ca").alias("n_a"),
        F.sum("t").alias("n"),
        F.count("*").alias("n_vals"),
        F.sum(F.col("ca") * (F.col("rmin") + F.col("rmax"))).alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n_a, n = F.col("n_a"), F.col("n")
    n_b = n - n_a
    u2a = F.col("r2a") - n_a * (n_a + 1)
    # variance factor cubes n in DOUBLE (identical expression in the
    # oracle): the integer n**3 would overflow BIGINT past ~2.09M rows,
    # and a 6-dp-rounded z does not need the cube exact.
    z = F.when(
        (n_a == 0) | (n_b == 0) | (F.col("n_vals") == 1), F.lit(0.0)
    ).otherwise(
        F.round(
            (u2a - n_a * n_b).cast("double")
            / (
                F.lit(2.0)
                * F.sqrt(
                    n_a.cast("double")
                    * n_b
                    * (n.cast("double") * n * n - n - F.col("ties"))
                    / (F.lit(12.0) * n * (n - 1))
                )
            )
            + F.lit(0),
            6,
        )
    )
    return m.select(
        n_a.alias("n_a"),
        n_b.cast("long").alias("n_b"),
        u2a.cast("long").alias("u2_a"),
        F.col("ties").alias("tie_term"),
        z.alias("z_mw"),
    )


# ---------------------------------------------------------------------------
# a28 — two-proportion z-test: did the even-user cohort CONVERT at a
# different rate than the odd cohort? The categorical sibling of a22
# (means) and a27 (ranks) — the three standard A/B readouts.
# ---------------------------------------------------------------------------

_A28_ORACLE = """
WITH u AS (
  SELECT user_id, user_id % 2 AS grp,
         MAX(CASE WHEN event_type = 'purchase' AND value >= 90 THEN 1
                  ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
         CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
  FROM u
)
SELECT n_a, x_a, n_b, x_b,
       CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0.0
            ELSE ROUND((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                       / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)) + 0, 6)
       END AS z_prop
FROM m
"""


@register("a28_two_proportion_test", oracle=_A28_ORACLE, tags=("A2", "A11", "P6"))
def a28_two_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z between even/odd user cohorts on "made a
    high-value purchase" (value ≥ 90 — chosen because plain
    any-purchase saturates at 100% in every fixture, degenerating the
    test): per-user conversion flags collapse to four integers
    (n, x per arm); the pooled-variance z statistic is one double
    expression over them, written identically on both engines and
    rounded at 6 dp. Degenerate pools (p̂ ∈ {0,1} — e.g. every user
    converts at small sf) make the statistic undefined; both engines
    return the documented 0.0 sentinel instead of dividing by zero
    (Spark runs ANSI mode — an unguarded expression would throw).

    Scale: one shuffle to the per-user flag (map-side MAX partial),
    then a single-row reduce. The user dimension never materializes
    beyond its aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", (F.col("user_id") % 2).alias("grp")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 90), 1
            ).otherwise(0)
        ).alias("converted")
    )
    m = u.agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)).alias("x_a"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)).alias("x_b"),
    )
    n_a, x_a = F.col("n_a"), F.col("x_a")
    n_b, x_b = F.col("n_b"), F.col("x_b")
    pooled = (x_a + x_b).cast("double") / (n_a + n_b)
    z = F.when(
        ((x_a + x_b) == 0) | ((x_a + x_b) == (n_a + n_b)), F.lit(0.0)
    ).otherwise(
        F.round(
            (x_a.cast("double") / n_a - x_b.cast("double") / n_b)
            / F.sqrt(
                pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
            )
            + F.lit(0),
            6,
        )
    )
    return m.select("n_a", "x_a", "n_b", "x_b", z.alias("z_prop"))


# ---------------------------------------------------------------------------
# a29 — two-sample Kolmogorov–Smirnov: the largest gap between the two
# cohorts' empirical CDFs, computed entirely in integers by scaling
# both step functions by n_A·n_B.
# ---------------------------------------------------------------------------

_A29_ORACLE = """
WITH p AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, user_id % 2 AS grp
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT cents,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM p GROUP BY cents
),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM v),
c AS (
  SELECT cents,
         CAST(SUM(ca) OVER (ORDER BY cents) AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER (ORDER BY cents) AS BIGINT) AS cum_b
  FROM v
),
d AS (
  SELECT cents, t.n_a, t.n_b,
         abs(cum_a * t.n_b - cum_b * t.n_a) AS gap2
  FROM c, t
)
SELECT n_a, n_b,
       CAST(gap2 AS BIGINT) AS d_scaled,
       cents AS d_at_cents,
       CASE WHEN n_a * n_b = 0 THEN 0.0
            ELSE ROUND(CAST(gap2 AS DOUBLE) / (n_a * n_b) + 0, 6)
       END AS ks_stat
FROM d
QUALIFY row_number() OVER (ORDER BY gap2 DESC, cents) = 1
"""


@register("a29_ks_test", oracle=_A29_ORACLE, tags=("A2", "A11", "W4"))
def a29_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS between even- and odd-user purchase amounts: the
    empirical CDFs are compared as INTEGER step functions — both
    scaled by n_A·n_B, so the max gap, the cents value where it
    occurs (smallest on ties), and the n_A·n_B denominator are exact;
    only the final ks_stat ratio is a double, rounded at 6 dp.

    Scale: the cumulative window runs over the DISTINCT-cents table —
    an aggregation child bounded by the price domain (~10⁴ values
    regardless of row count), the one place the plan sweep admits a
    SinglePartition exchange; the argmax is TakeOrdered(1) with the
    cents tiebreak. The raw scan only ever feeds a hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("user_id") % 2).alias("grp"),
    )
    v = p.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    t = v.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = v.select(
        "cents",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    d = c.crossJoin(F.broadcast(t)).select(
        "cents",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap2"),
    )
    return (
        d.orderBy(F.desc("gap2"), "cents")
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.col("gap2").alias("d_scaled"),
            F.col("cents").alias("d_at_cents"),
            F.when(F.col("n_a") * F.col("n_b") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("gap2").cast("double") / (F.col("n_a") * F.col("n_b"))
                    + F.lit(0),
                    6,
                )
            )
            .alias("ks_stat"),
        )
    )


# ---------------------------------------------------------------------------
# a30 — chi-square independence: is event mix independent of the user
# cohort? Observed/expected over a FIXED (event_type × parity) grid,
# with the χ² sum folded in cell order (dq6's recipe) so the doubles
# add identically on both engines.
# ---------------------------------------------------------------------------

_A30_ORACLE = """
WITH o AS (
  SELECT event_type, user_id % 2 AS grp, CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT o.event_type, o.grp, o.obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_t,
         CAST(SUM(obs) OVER (PARTITION BY grp) AS BIGINT) AS col_t,
         CAST(SUM(obs) OVER () AS BIGINT) AS n
  FROM o
),
g AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         list_sort(list([obs, row_t, col_t])) AS cells
  FROM m
)
SELECT n AS n_events, n_cells,
       ROUND(list_sum(list_transform(cells, x ->
         (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) * x[3] / n)
         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) * x[3] / n)
         / (CAST(x[2] AS DOUBLE) * x[3] / n))) + 0, 6) AS chi2
FROM g
"""


@register("a30_chi_square", oracle=_A30_ORACLE, tags=("A2", "A11", "A8"))
def a30_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence over the (event_type × user-parity) contingency
    grid: observed counts and both marginals are exact integers; each
    cell's (O−E)²/E evaluates the identical double expression, and the
    10 cell terms fold in sorted-cell order (the [obs, row_t, col_t]
    triple is unique per cell — the sort pins the order, dq6's
    recipe), then one 6-dp round.

    Scale: one hash aggregate over a constant 10-cell key space plus
    marginal windows over those 10 rows — the statistic's cost is the
    scan; the grid never grows with data. Mergeable per-day cell
    counts roll up exactly like the dq sketches.
    """
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy("event_type", (F.col("user_id") % 2).alias("grp")).agg(
        F.count("*").alias("obs")
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("grp")
    w_all = Window.partitionBy()
    m = o.select(
        "obs",
        F.sum("obs").over(w_row).alias("row_t"),
        F.sum("obs").over(w_col).alias("col_t"),
        F.sum("obs").over(w_all).alias("n"),
    )
    g = m.agg(
        F.max("n").alias("n"),
        F.count("*").alias("n_cells"),
        F.array_sort(
            F.collect_list(F.array(F.col("obs"), F.col("row_t"), F.col("col_t")))
        ).alias("cells"),
    )

    def term(x):
        e = x[1].cast("double") * x[2] / F.col("n")
        diff = x[0].cast("double") - e
        return diff * diff / e

    chi2 = F.round(
        F.aggregate(F.col("cells"), F.lit(0.0), lambda acc, x: acc + term(x))
        + F.lit(0),
        6,
    )
    return g.select(
        F.col("n").alias("n_events"),
        F.col("n_cells").alias("n_cells"),
        chi2.alias("chi2"),
    )


# ---------------------------------------------------------------------------
# q31 — association rules: support and lift over the co-purchase pair
# counts — market-basket mining from exact integer counts, the
# analytics layer above a14's raw pairs / g2's graph.
# ---------------------------------------------------------------------------

_Q31_MIN_SUP = 2
_Q31_TOPK = 20

from .llm import co_purchase_baskets, co_purchase_edges, oracle_co_edges  # noqa: E402

_Q31_ORACLE = f"""
WITH {oracle_co_edges(_Q31_MIN_SUP)},
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
item AS (
  SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM li GROUP BY 1
),
r AS (
  SELECT p.u, p.v, p.n_uv, iu.n_item AS n_u, iv.n_item AS n_v, n.n_baskets,
         ROUND(CAST(p.n_uv AS DOUBLE) / n.n_baskets + 0, 6) AS support,
         ROUND(CAST(p.n_uv AS DOUBLE) * n.n_baskets
               / (iu.n_item * iv.n_item) + 0, 6) AS lift
  FROM e p
  JOIN item iu ON iu.item = p.u
  JOIN item iv ON iv.item = p.v
  CROSS JOIN n
)
SELECT u, v, n_uv, n_u, n_v, support, lift
FROM r
ORDER BY lift DESC, u, v
LIMIT {_Q31_TOPK}
"""


@register("q31_association_rules", oracle=_Q31_ORACLE, tags=("J8", "A1", "O2"))
def q31_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs by lift: support = n(u,v)/N and
    lift = n(u,v)·N / (n(u)·n(v)) from exact basket counts (lift > 1 ⇒
    the parts co-occur beyond chance — the rule-mining signal). Both
    ratios evaluate the identical double expression from identical
    integers; ordering is (lift, u, v) with the unique pair tiebreak.

    Scale: pair counting is a14's per-basket self-join (bounded by
    basket width, never all-parts²); the item side broadcasts; the
    top-k is TakeOrdered. Raising min-support prunes the pair table
    the way every production FP-growth prefilter does.
    """
    li = co_purchase_baskets(spark, sf_dir)
    n_baskets = li.agg(
        F.count_distinct("l_orderkey").alias("n_baskets")
    )
    item = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("n_item")
    )
    pair = co_purchase_edges(spark, sf_dir, _Q31_MIN_SUP)
    iu = item.select(F.col("item").alias("u"), F.col("n_item").alias("n_u"))
    iv = item.select(F.col("item").alias("v"), F.col("n_item").alias("n_v"))
    r = (
        pair.join(F.broadcast(iu), "u")
        .join(F.broadcast(iv), "v")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "u",
            "v",
            "n_uv",
            "n_u",
            "n_v",
            F.round(
                F.col("n_uv").cast("double") / F.col("n_baskets") + F.lit(0), 6
            ).alias("support"),
            F.round(
                F.col("n_uv").cast("double")
                * F.col("n_baskets")
                / (F.col("n_u") * F.col("n_v"))
                + F.lit(0),
                6,
            ).alias("lift"),
        )
    )
    return r.orderBy(F.desc("lift"), "u", "v").limit(_Q31_TOPK)


# ---------------------------------------------------------------------------
# q34 — Pareto share: what fraction of revenue comes from the top 20%
# of customers — the concentration KPI in ratio form (a26's Gini is
# the integral form), built on the scale-safe global rank.
# ---------------------------------------------------------------------------

_Q34_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT o_custkey, cents,
         CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rn
  FROM cust
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(cents) AS BIGINT) AS total_cents FROM cust)
SELECT m.n_cust, m.total_cents,
       CAST(m.n_cust // 5 AS BIGINT) AS top_n,
       CAST(SUM(CASE WHEN rk.rn <= m.n_cust // 5 THEN rk.cents ELSE 0 END)
            AS BIGINT) AS top_cents,
       ROUND(CAST(SUM(CASE WHEN rk.rn <= m.n_cust // 5 THEN rk.cents ELSE 0 END)
                  AS DOUBLE) / m.total_cents + 0, 6) AS pareto_share
FROM rk, m
GROUP BY m.n_cust, m.total_cents
"""


@register("q34_pareto_share", oracle=_Q34_ORACLE, tags=("W1", "A2", "O2"))
def q34_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of the top-20% customers: per-customer cents
    totals rank globally (DESCENDING via the negated-key form of the
    two-level scalable_row_number — the bucket stays a monotonic
    coarsening of the sort key), the top ⌊n/5⌋ sum exactly, and the
    share is one ratio at 6 dp. The 80/20 dashboard number, exact.

    Scale: the rank never single-partition-sorts the customer table
    (the oracle's plain window does — the point of the scale-safe
    twin); everything else is two aggregates. Tie policy: equal
    revenues order by customer key, so the boundary customer is
    deterministic on both engines.
    """
    from ._helpers import scalable_row_number

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = scalable_row_number(
        cust.withColumn("neg", -F.col("cents")),
        key="neg",
        bucket_width=1_000_000,
        order_cols=[F.col("neg"), F.col("o_custkey")],
        out="rn",
    )
    m = cust.agg(
        F.count("*").alias("n_cust"), F.sum("cents").alias("total_cents")
    )
    joined = ranked.crossJoin(F.broadcast(m))
    top = joined.groupBy("n_cust", "total_cents").agg(
        F.sum(
            F.when(
                F.col("rn") <= F.floor(F.col("n_cust") / 5), F.col("cents")
            ).otherwise(0)
        ).alias("top_cents")
    )
    return top.select(
        "n_cust",
        "total_cents",
        F.floor(F.col("n_cust") / 5).cast("long").alias("top_n"),
        "top_cents",
        F.round(
            F.col("top_cents").cast("double") / F.col("total_cents") + F.lit(0), 6
        ).alias("pareto_share"),
    )


# ---------------------------------------------------------------------------
# A31 — Spearman rank correlation (round 4): monotone association
# between daily event volume and daily value, from exact tie-averaged
# ranks. Kendall (w23) grades concordant pairs; Spearman grades rank
# linearity — both belong in the drift-monitoring toolbox.
# ---------------------------------------------------------------------------

_A31_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_ev,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1
), ranked AS (
  SELECT
    2 * rank() OVER (ORDER BY n_ev) + COUNT(*) OVER (PARTITION BY n_ev) - 1 AS rx,
    2 * rank() OVER (ORDER BY v) + COUNT(*) OVER (PARTITION BY v) - 1 AS ry
  FROM daily
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy
  FROM ranked
)
SELECT n AS n_days,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0.0
            ELSE round(
              (n * sxy - sx * sy)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0
       END AS spearman_rho
FROM m
"""


@register("a31_spearman_corr", oracle=_A31_ORACLE, tags=("A11", "W1", "A7"))
def a31_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between daily event count and daily exact value
    total: tie-averaged ranks kept integer by DOUBLING them
    (avg-rank = rank() + (ties-1)/2 ⇒ 2·avg-rank = 2·rank() + ties - 1,
    which cancels in ρ), then Pearson on ranks from exact BIGINT
    moments — one double division at the end, rounded to 6 dp on both
    engines (`+ 0` normalizes -0.0). Degenerate (all-tied) sides take
    an explicit 0.0 on both engines — DuckDB's x/0 is NULL where
    Spark's ANSI mode throws.

    Scale: ranks run over the O(days) daily aggregate — the window's
    SinglePartition exchange only ever carries aggregated rows (the
    plan-sweep structural rule); moments are one global agg. Doubled
    rank products stay < 2⁶³ up to ~10⁶ distinct days.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n_ev"),
        F.sum(cents("value")).alias("v"),
    )
    rx = (
        2 * F.rank().over(Window.orderBy("n_ev"))
        + F.count("*").over(Window.partitionBy("n_ev"))
        - 1
    )
    ry = (
        2 * F.rank().over(Window.orderBy("v"))
        + F.count("*").over(Window.partitionBy("v"))
        - 1
    )
    ranked = daily.select(rx.alias("rx"), ry.alias("ry"))
    m = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    rho = F.when(varx * vary == 0, F.lit(0.0)).otherwise(
        F.round(cov / F.sqrt(varx.cast("double") * vary.cast("double")), 6) + 0
    )
    return m.select(F.col("n").alias("n_days"), rho.alias("spearman_rho"))


# ---------------------------------------------------------------------------
# Q35 — month-over-month growth (round 4): calendar rollup + lag +
# guarded ratio, the canonical trend-report composite.
# ---------------------------------------------------------------------------

_Q35_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_units,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT month,
       rev_units / 100.0 AS revenue,
       lag(rev_units) OVER (ORDER BY month) / 100.0 AS prev_revenue,
       CASE WHEN lag(rev_units) OVER (ORDER BY month) = 0 THEN NULL
            ELSE round(
              (rev_units - lag(rev_units) OVER (ORDER BY month))
              / CAST(lag(rev_units) OVER (ORDER BY month) AS DOUBLE), 6) + 0
       END AS mom_growth,
       n_orders
FROM monthly
"""


@register("q35_mom_growth", oracle=_Q35_ORACLE, tags=("A7", "W3", "F3"))
def q35_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month growth: calendar-bucket
    rollup (exact integer units), lag over the month series, guarded
    ratio rounded to 6 dp (first month's growth is NULL on both
    engines; a zero previous month would be too, instead of an ANSI
    divide error).

    Scale: the lag window runs over the O(months) aggregate — its
    SinglePartition exchange carries only aggregated rows. The fact
    scan reduces map-side via partial aggregation on the month key.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.sum(cents("o_totalprice")).alias("rev_units"),
        F.count("*").alias("n_orders"),
    )
    # The lag is applied via withColumn straight on the aggregate so the
    # window's single-partition exchange feeds directly off the
    # HashAggregate (a pre-window Project would trip the structural
    # plan sweep even though the row count is identical).
    w = Window.orderBy("month")
    stats = monthly.withColumn("prev_units", F.lag("rev_units").over(w))
    prev = F.col("prev_units")
    growth = F.when(prev == 0, F.lit(None).cast("double")).otherwise(
        F.round((F.col("rev_units") - prev) / prev.cast("double"), 6) + 0
    )
    return stats.select(
        "month",
        (F.col("rev_units") / 100.0).alias("revenue"),
        (prev / 100.0).alias("prev_revenue"),
        growth.alias("mom_growth"),
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Q36 — ordered conversion funnel (round 4): users who progressed
# view → click → purchase IN ORDER, each stage strictly after the
# previous stage's first touch.
# ---------------------------------------------------------------------------

_Q36_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after
"""


@register("q36_conversion_funnel", oracle=_Q36_ORACLE, tags=("A2", "J1", "W3"))
def q36_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel: users with a view, users whose first
    click follows their first view, users whose first purchase follows
    that click — each stage anchored at the FIRST qualifying touch of
    the previous stage (the standard strictly-ordered funnel, not mere
    set intersection; q29/x4 grade adjacent transitions and regex
    paths, this grades the anchored-progression count).

    Scale: three shuffles on user_id (one per stage anchor), each
    reducing to per-user minima before the next join; stage frontiers
    broadcast once small. A single-pass alternative (conditional min
    over a per-user sorted window) trades one shuffle for a wider
    state row — at 100 TB the staged form keeps every exchange
    key-partitioned and spill-free.
    """
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after")))
    )


# ---------------------------------------------------------------------------
# A32 — Herfindahl–Hirschman concentration index (round 4): revenue
# concentration across market segments per order year. The
# antitrust-style share-of-squares metric (a26's Gini ranks
# inequality; HHI squares shares) from an exact integer quotient.
# ---------------------------------------------------------------------------

_A32_ORACLE = """
WITH seg AS (
  SELECT date_part('year', o_orderdate) AS order_year,
         c_mktsegment,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS su
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT CAST(order_year AS BIGINT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       round(10000.0
             * CAST(SUM(CAST(su AS HUGEINT) * CAST(su AS HUGEINT)) AS DOUBLE)
             / (CAST(SUM(su) AS DOUBLE) * CAST(SUM(su) AS DOUBLE)), 6) + 0 AS hhi
FROM seg
GROUP BY order_year
"""


@register("a32_hhi_concentration", oracle=_A32_ORACLE, tags=("A11", "A1", "F4"))
def a32_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI of yearly revenue across market segments, on the 0–10000
    scale: HHI = 10⁴·Σsᵢ² with sᵢ the segment's revenue share — which
    reduces to 10⁴·Σuᵢ²/(Σuᵢ)² over exact integer cent totals. The
    squares of segment-year cents exceed BIGINT at ~$10⁹ (measured at
    sf0.001 under ANSI mode), so Σu² accumulates in DECIMAL(38,0) on
    Spark and HUGEINT on DuckDB — both exact — and each side casts the
    identical exact integer to double once before the single division
    (6-dp round, `+ 0`). A year with one active segment grades exactly
    10000.

    Scale: two cascaded aggregations (year×segment, then year) on
    bounded keys; the fact shuffle is the orders⋈customer join;
    DECIMAL(38,0) holds Σu² to ~10¹⁹ dollars per segment-year.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "c_mktsegment",
        )
        .agg(F.sum(cents("o_totalprice")).alias("su"))
    )
    su_dec = F.col("su").cast("decimal(19,0)")
    return seg.groupBy("order_year").agg(
        F.count("*").alias("n_segments"),
        (
            F.round(
                10000.0
                * F.sum(su_dec * su_dec).cast("double")
                / (F.sum("su").cast("double") * F.sum("su").cast("double")),
                6,
            )
            + 0
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# A33 — calendar seasonality index (round 4): each calendar month's
# average revenue relative to the overall monthly average, as one
# exact-integer cross-multiplied quotient.
# ---------------------------------------------------------------------------

_A33_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         date_part('month', o_orderdate) AS cal_month,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS units
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(units) AS BIGINT) AS all_units,
         CAST(COUNT(*) AS BIGINT) AS all_months
  FROM monthly
)
SELECT CAST(cal_month AS BIGINT) AS cal_month,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       SUM(units) / 100.0 AS total_revenue,
       round(CAST(SUM(units) AS DOUBLE) * all_months
             / (COUNT(*) * all_units), 6) + 0 AS seasonal_index
FROM monthly, tot
GROUP BY cal_month, all_months, all_units
"""


@register("a33_seasonal_index", oracle=_A33_ORACLE, tags=("A7", "F3", "A2"))
def a33_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality: index_m = (avg revenue of calendar
    month m) / (overall monthly average), computed as the
    cross-multiplied integer quotient Σu_m·N_total/(n_m·Σu_total) so
    the only float op is the final division (both engines divide the
    identical exact integers; 6-dp round). An index > 1 marks a
    seasonally strong month.

    Scale: the monthly rollup is the only fact pass; the grand total is
    a one-row broadcast joined back cross-style — O(12) output.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        F.month("o_orderdate").cast("bigint").alias("cal_month"),
    ).agg(F.sum(cents("o_totalprice")).alias("units"))
    tot = monthly.agg(
        F.sum("units").alias("all_units"), F.count("*").alias("all_months")
    )
    per = monthly.groupBy("cal_month").agg(
        F.count("*").alias("n_months"),
        F.sum("units").alias("month_units"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "cal_month",
        "n_months",
        (F.col("month_units") / 100.0).alias("total_revenue"),
        (
            F.round(
                F.col("month_units").cast("double")
                * F.col("all_months")
                / (F.col("n_months") * F.col("all_units")),
                6,
            )
            + 0
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Q37 — repeat-purchase share (round 4): how much of the buyer base
# comes back — the retention scalar every growth report leads with.
# ---------------------------------------------------------------------------

_Q37_ORACLE = """
WITH buyers AS (
  SELECT user_id, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CASE WHEN COUNT(*) = 0 THEN 0.0
            ELSE round(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END)
                       / CAST(COUNT(*) AS DOUBLE), 6) + 0
       END AS repeat_share
FROM buyers
"""


@register("q37_repeat_purchase_share", oracle=_Q37_ORACLE, tags=("A2", "A5", "P2"))
def q37_repeat_purchase_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of purchasing users with two or more purchases: per-user
    purchase counts, then one global ratio of exact integers (explicit
    0.0 when there are no buyers — the ANSI divide guard). q23 grades
    the month-by-month cohort grid; this grades the headline scalar.

    Scale: the type filter pushes to the scan; one shuffle on user_id
    bounded by distinct buyers; the final agg is a single row.
    """
    events = load_table(spark, sf_dir, "events")
    buyers = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    repeat = F.sum(F.when(F.col("n_purchases") >= 2, 1).otherwise(0))
    return buyers.agg(
        F.count("*").alias("n_buyers"),
        repeat.cast("bigint").alias("n_repeat"),
        F.when(F.count("*") == 0, F.lit(0.0))
        .otherwise(F.round(repeat / F.count("*").cast("double"), 6) + 0)
        .alias("repeat_share"),
    )


# ---------------------------------------------------------------------------
# Q38 — reliability ranking under uncertainty (round 4): per-supplier
# on-time rate scored by the Wilson lower bound, so a 3-for-3 supplier
# cannot outrank a 95-for-100 one — the small-sample-honest ranking
# every quality gate needs.
# ---------------------------------------------------------------------------

_Q38_ORACLE = """
WITH ship AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_ship,
         CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_suppkey
),
scored AS (
  SELECT l_suppkey, n_ship, n_ontime,
         round(n_ontime / CAST(n_ship AS DOUBLE), 6) + 0 AS ontime_rate,
         round(
           (n_ontime / CAST(n_ship AS DOUBLE) + 1.9208 / n_ship
            - 1.96 * sqrt((n_ontime / CAST(n_ship AS DOUBLE))
                          * (1 - n_ontime / CAST(n_ship AS DOUBLE)) / n_ship
                          + 0.9604 / (n_ship * CAST(n_ship AS DOUBLE))))
           / (1 + 3.8416 / n_ship), 6) + 0 AS wilson_low
  FROM ship
)
SELECT l_suppkey, n_ship, n_ontime, ontime_rate, wilson_low
FROM scored
ORDER BY wilson_low DESC, l_suppkey
LIMIT 20
"""


@register("q38_supplier_reliability", oracle=_Q38_ORACLE, tags=("A11", "F4", "O2", "J1"))
def q38_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by the Wilson-score LOWER bound of their
    on-time-ship rate (shipped within 60 days of the order): the
    bound shrinks toward 0 for thin samples, so certainty is ranked,
    not just the point estimate. z=1.96 constants are pre-folded
    literals (z²=3.8416, z²/2=1.9208, z²/4=0.9604) and the formula is
    written IDENTICALLY on both engines over exact integer (k, n) —
    the IEEE op sequence matches, so the 6-dp rounds agree; ranking
    ties break on the supplier key.

    Scale: one fact join on orderkey (both sides hash-partition),
    per-supplier counts, then TakeOrderedAndProject for the top-20 —
    no global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ship = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_ship"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ontime"),
        )
    )
    n = F.col("n_ship")
    p = F.col("n_ontime") / n.cast("double")
    wilson = (
        p
        + 1.9208 / n
        - 1.96
        * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n.cast("double")))
    ) / (1 + 3.8416 / n)
    return (
        ship.select(
            "l_suppkey",
            "n_ship",
            "n_ontime",
            (F.round(p, 6) + 0).alias("ontime_rate"),
            (F.round(wilson, 6) + 0).alias("wilson_low"),
        )
        .orderBy(F.col("wilson_low").desc(), "l_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A35 — exact median + MAD (round 4): the robust location/scale pair
# from bounded-domain aggregation — no sort of the raw rows, no
# interpolation ambiguity (lower-median convention pinned on both
# engines).
# ---------------------------------------------------------------------------

_A35_ORACLE = """
WITH counts AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM counts),
cum AS (
  SELECT c, SUM(k) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS ck, n
  FROM counts, tot
),
med AS (SELECT MIN(c) AS m, MIN(n) AS n FROM cum WHERE ck >= (n + 1) // 2),
devs AS (
  SELECT abs(c - m) AS d, CAST(SUM(k) AS BIGINT) AS k
  FROM counts, med GROUP BY 1
),
dcum AS (
  SELECT d, SUM(k) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS ck, n
  FROM devs, med
)
SELECT (SELECT n FROM med) AS n_rows,
       (SELECT m FROM med) / 100.0 AS median_value,
       (SELECT MIN(d) FROM dcum WHERE ck >= (n + 1) // 2) / 100.0 AS mad_value
"""


@register("a35_median_mad", oracle=_A35_ORACLE, tags=("A1", "A2", "A11"))
def a35_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and median-absolute-deviation of event values via
    BOUNDED-DOMAIN aggregation: counts per distinct cent value, a
    cumulative walk over that small table picks the lower median (rank
    ⌈n/2⌉ — the convention pinned identically on both engines), and a
    second counted walk over |x − median| yields the MAD. No raw-row
    sort, no float interpolation — every step is integer arithmetic.

    Scale: both cumulative windows run over the O(distinct cents)
    aggregate (the a29 KS-test recipe) — the domain, not the row
    count, bounds the single-partition work; the raw table is touched
    exactly once by the counting groupBy. This is how exact medians
    survive 100 TB when the value domain is bounded; for unbounded
    domains the declared path is approx_percentile (a10b's t-digest
    contract).
    """
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(cents("value").alias("c")).agg(
        F.count("*").alias("k")
    )
    tot = counts.agg(F.sum("k").alias("n"))
    cum_w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("ck", F.sum("k").over(cum_w)).crossJoin(
        F.broadcast(tot)
    )
    half = F.floor((F.col("n") + 1) / 2)
    med = (
        cum.filter(F.col("ck") >= half)
        .agg(F.min("c").alias("m"), F.min("n").alias("n"))
    )
    devs = (
        counts.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("c") - F.col("m")).alias("d"))
        .agg(F.sum("k").alias("k"), F.min("n").alias("n"))
    )
    dcum = devs.withColumn("ck", F.sum("k").over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
    mad = dcum.filter(F.col("ck") >= half).agg(F.min("d").alias("mad_c"))
    return (
        med.crossJoin(F.broadcast(mad))
        .select(
            F.col("n").alias("n_rows"),
            (F.col("m") / 100.0).alias("median_value"),
            (F.col("mad_c") / 100.0).alias("mad_value"),
        )
    )


# ---------------------------------------------------------------------------
# A34 — segment revenue beta (round 4): each market segment's
# sensitivity to the total daily revenue — the cov/var regression
# slope from exact DECIMAL/HUGEINT moments.
# ---------------------------------------------------------------------------

_A34_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, c_mktsegment,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS su
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT d, CAST(SUM(su) AS BIGINT) AS st FROM daily GROUP BY d
),
j AS (
  SELECT daily.c_mktsegment, CAST(daily.su AS HUGEINT) AS su,
         CAST(tot.st AS HUGEINT) AS st
  FROM daily JOIN tot ON daily.d = tot.d
),
m AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(su) AS s_x, SUM(st) AS s_y,
         SUM(su * st) AS s_xy, SUM(st * st) AS s_yy
  FROM j GROUP BY c_mktsegment
)
SELECT c_mktsegment, n AS n_days,
       CASE WHEN n * s_yy - s_y * s_y = 0 THEN 0.0
            ELSE round(CAST(n * s_xy - s_x * s_y AS DOUBLE)
                       / CAST(n * s_yy - s_y * s_y AS DOUBLE), 6) + 0
       END AS beta
FROM m
"""


@register("a34_segment_beta", oracle=_A34_ORACLE, tags=("A11", "A1", "J1"))
def a34_segment_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression slope (beta) of each segment's daily revenue against
    the TOTAL daily revenue: cov(x,y)/var(y) from exact integer
    moments. The cross-products of daily cent totals exceed BIGINT
    (the a32 lesson), so every moment accumulates in DECIMAL(38,0) on
    Spark / HUGEINT on DuckDB; the exact integers cast to double once
    for the single division (6-dp round; degenerate zero-variance
    totals take an explicit 0.0 on both engines). Each segment's
    moments run over the days the segment traded, so betas are not
    constrained to average to 1.

    Scale: daily×segment rollup, a daily-total rollup joined back on
    the O(days) key, then one bounded-key aggregation; DECIMAL(38,0)
    holds the moment sums to ~10¹⁹ cent-products.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.to_date("o_orderdate").alias("d"), "c_mktsegment")
        .agg(F.sum(cents("o_totalprice")).alias("su"))
    )
    tot = daily.groupBy("d").agg(F.sum("su").alias("st"))
    j = daily.join(tot, "d").select(
        "c_mktsegment",
        F.col("su").cast("decimal(19,0)").alias("su"),
        F.col("st").cast("decimal(19,0)").alias("st"),
    )
    m = j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("su").alias("s_x"),
        F.sum("st").alias("s_y"),
        F.sum(F.col("su") * F.col("st")).alias("s_xy"),
        F.sum(F.col("st") * F.col("st")).alias("s_yy"),
    )
    var = F.col("n") * F.col("s_yy") - F.col("s_y") * F.col("s_y")
    cov = F.col("n") * F.col("s_xy") - F.col("s_x") * F.col("s_y")
    beta = F.when(var == 0, F.lit(0.0)).otherwise(
        F.round(cov.cast("double") / var.cast("double"), 6) + 0
    )
    return m.select("c_mktsegment", F.col("n").alias("n_days"), beta.alias("beta"))


# ---------------------------------------------------------------------------
# Q39 — order-priority transition matrix (round 4): Markov transition
# counts and row-normalized probabilities between consecutive orders of
# the same customer — the sequence-analytics rollup q29 (event
# transitions) grades on the event stream, here on the orders axis.
# ---------------------------------------------------------------------------

_Q39_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderpriority,
         lag(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_prio
  FROM orders
),
pairs AS (
  SELECT prev_prio AS from_prio, o_orderpriority AS to_prio,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_prio IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_prio, to_prio, n,
       round(n / CAST(SUM(n) OVER (PARTITION BY from_prio) AS DOUBLE), 6) + 0
         AS p
FROM pairs
"""


@register("q39_priority_transitions", oracle=_Q39_ORACLE, tags=("W3", "A1", "A9"))
def q39_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each customer's
    consecutive order priorities: lag within (customer, order-date,
    order-key) order, pair counts, and the row-normalized transition
    probability (exact integer ÷ exact integer, 6 dp). Each row of the
    matrix sums to 1 — the estimator every churn/escalation model
    starts from.

    Scale: one shuffle on o_custkey for the lag, then a 25-key
    aggregation; the normalizing window partitions by from_prio
    (bounded cardinality). Never a global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_orderpriority").alias("to_prio"),
        F.lag("o_orderpriority").over(w).alias("from_prio"),
    ).filter(F.col("from_prio").isNotNull())
    pairs = seq.groupBy("from_prio", "to_prio").agg(F.count("*").alias("n"))
    tot_w = Window.partitionBy("from_prio")
    return pairs.select(
        "from_prio",
        "to_prio",
        "n",
        (
            F.round(F.col("n") / F.sum("n").over(tot_w).cast("double"), 6) + 0
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# Q42 — order streaks: each customer's longest run of CONSECUTIVE
# active months — the classic gaps-and-islands rewrite (month_number −
# dense_rank is constant within a run), the engagement metric a
# retention model features on.
# ---------------------------------------------------------------------------

_Q42_ORACLE = """
WITH months AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
  FROM orders
),
isl AS (
  SELECT o_custkey, m,
         m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
  FROM months
),
runs AS (
  SELECT o_custkey, grp, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM isl GROUP BY o_custkey, grp
)
SELECT o_custkey,
       CAST(SUM(run_len) AS BIGINT) AS n_active_months,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs GROUP BY o_custkey
"""


@register("q42_order_streaks", oracle=_Q42_ORACLE, tags=("W1", "W3", "A1"))
def q42_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer activity streaks over calendar months: distinct
    active months collapse to runs via the gaps-and-islands identity
    (month_index − row_number is constant exactly within a consecutive
    run), then each customer reports total active months, number of
    streaks, and the longest streak. Month index year*12+month is
    exact integer arithmetic on both engines.

    Scale: one distinct shuffle to (customer, month) — already tiny
    relative to orders — then a per-customer window over ≤ a few
    hundred month rows and two keyed rollups that reuse the customer
    partitioning. No global window anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    isl = months.withColumn("grp", F.col("m") - F.row_number().over(w))
    runs = isl.groupBy("o_custkey", "grp").agg(F.count("*").alias("run_len"))
    return runs.groupBy("o_custkey").agg(
        F.sum("run_len").cast("bigint").alias("n_active_months"),
        F.count("*").alias("n_streaks"),
        F.max("run_len").cast("bigint").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Q43 — leave-one-out target encoding: each order's feature is the mean
# order value of its customer's market segment EXCLUDING the order
# itself — the leakage-free categorical encoding a tabular model
# trains on (including self leaks the label; the LOO identity
# (sum − own)/(n − 1) removes it exactly).
# ---------------------------------------------------------------------------

_Q43_ORACLE = """
WITH j AS (
  SELECT o.o_orderkey, c.c_mktsegment,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, SUM(cents) AS s
  FROM j GROUP BY c_mktsegment
)
SELECT j.o_orderkey, j.c_mktsegment,
       CASE WHEN seg.n > 1
            THEN ROUND(CAST(seg.s - j.cents AS DOUBLE) / (seg.n - 1) / 100.0, 6)
            ELSE NULL END AS loo_avg_price
FROM j JOIN seg ON seg.c_mktsegment = j.c_mktsegment
"""


@register("q43_loo_target_encoding", oracle=_Q43_ORACLE, tags=("W4", "J1", "A1"))
def q43_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out mean encoding of market segment by order value:
    per-segment exact cents sum and count aggregate ONCE, broadcast
    back, and each row computes (sum − own)/(n − 1) — identical
    integers divided identically on both engines, rounded at 6 dp
    (NULL for a singleton segment, which the fixture doesn't have but
    the expression must not divide by zero on).

    Scale: deliberately NOT a whole-partition window — segments are
    few and huge, so a partitionBy(segment) window is a skew magnet;
    the aggregate-then-broadcast-join shape keeps the per-row pass
    embarrassingly parallel and the shuffle bounded by O(segments).
    The customer dim joins by broadcast before any aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        "o_orderkey", "c_mktsegment", cents("o_totalprice").alias("cents")
    )
    seg = j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    out = j.join(F.broadcast(seg), "c_mktsegment")
    loo = F.when(
        F.col("n") > 1,
        F.round(
            (F.col("s") - F.col("cents")).cast("double")
            / (F.col("n") - 1)
            / 100.0,
            6,
        ),
    )
    return out.select("o_orderkey", "c_mktsegment", loo.alias("loo_avg_price"))


# ---------------------------------------------------------------------------
# Q44 — dense monthly spine: every (segment, month) cell in the
# corpus's month range, zero-filled where no order exists — the
# gap-free series a forecasting model or dashboard requires (missing
# months silently vanish from a plain GROUP BY).
# ---------------------------------------------------------------------------

_Q44_ORACLE = f"""
WITH bounds AS (
  SELECT MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)) AS mn,
         MAX(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)) AS mx
  FROM orders
),
spine AS (
  SELECT c_mktsegment, m
  FROM (SELECT DISTINCT c_mktsegment FROM customer),
       (SELECT unnest(generate_series(
          (SELECT mn FROM bounds), (SELECT mx FROM bounds))) AS m)
),
agg AS (
  SELECT c.c_mktsegment,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {oracle_dsum('o.o_totalprice')} AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT s.c_mktsegment, s.m AS month_idx,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(a.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN agg a
  ON a.c_mktsegment = s.c_mktsegment AND a.m = s.m
"""


@register("q44_dense_monthly_spine", oracle=_Q44_ORACLE, tags=("F5", "A7", "J2"))
def q44_dense_monthly_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled (segment × month) revenue series: the month range
    comes from a 1-row min/max aggregate, F.sequence + explode builds
    the spine against the distinct segment list, and the actual
    monthly rollup LEFT-joins onto it with COALESCE(0) fills — the
    idiom that turns sparse facts into a dense modeling matrix.

    Scale: the spine is O(segments × months) — generated, never
    scanned; the only big-data pass is the monthly rollup (broadcast
    dim join + one shuffle on low-cardinality keys). The spine side of
    the final join broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    agg = j.groupBy("c_mktsegment", m.alias("m")).agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue")
    )
    bounds = orders.agg(
        F.min(m).alias("mn"), F.max(m).alias("mx")
    )
    segs = cust.select("c_mktsegment").distinct()
    spine = (
        segs.crossJoin(F.broadcast(bounds))
        .select(
            "c_mktsegment",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("m"),
        )
    )
    out = spine.join(agg, ["c_mktsegment", "m"], "left")
    return out.select(
        "c_mktsegment",
        F.col("m").alias("month_idx"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A41 — exact WEIGHTED median (weight = quantity) of the line price per
# return flag: the bounded-domain counting recipe (a35) generalized to
# weighted ranks — the robust "typical unit price" a mean would let
# bulk orders distort.
# ---------------------------------------------------------------------------

_A41_ORACLE = """
WITH counts AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(SUM(l_quantity) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, c, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY c
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM counts
)
SELECT flag AS l_returnflag,
       CAST(MIN(tw) AS BIGINT) AS total_weight,
       MIN(CASE WHEN 2 * cw >= tw THEN c END) / 100.0 AS weighted_median
FROM cum GROUP BY flag
"""


@register("a41_weighted_median", oracle=_A41_ORACLE, tags=("A1", "A11", "W4"))
def a41_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted lower median of line price per return flag:
    weights aggregate per distinct cent value (the bounded-domain
    move), a cumulative weight walk runs over that small table, and
    the median is the smallest value whose cumulative weight reaches
    half the total (2·cw ≥ tw — integer comparison, no division). All
    arithmetic BIGINT; the only division is the final /100 display.

    Scale: the raw table is touched once by the counting groupBy; the
    cumulative window runs over O(flags × distinct cents) aggregate
    rows, partitioned by flag — the a35/a29 recipe with a weight
    column. For unbounded domains the declared path is the t-digest
    contract (a10b).
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        cents("l_extendedprice").alias("c"),
    ).agg(F.sum("l_quantity").cast("bigint").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    cum = counts.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_tot)
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        (
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("c"))) / 100.0
        ).alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# DQ11 — order/lineitem reconciliation: does the order header's total
# agree with the sum of its lines? The cross-table consistency audit
# every finance pipeline runs — and the fixture, which generates the
# two tables independently, is full of honest mismatches for it to
# count.
# ---------------------------------------------------------------------------

_DQ11_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS li_cents
  FROM lineitem GROUP BY 1
),
r AS (
  SELECT o.o_orderstatus,
         CAST(round(o.o_totalprice * 100) AS BIGINT)
           - COALESCE(li.li_cents, 0) AS diff
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatched,
       CAST(MAX(abs(diff)) AS BIGINT) AS max_abs_diff_cents,
       CAST(SUM(abs(diff)) AS BIGINT) AS total_abs_diff_cents
FROM r GROUP BY o_orderstatus
"""


@register("dq11_order_reconciliation", oracle=_DQ11_ORACLE, tags=("A2", "J2", "A1"))
def dq11_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: each order's stated total
    compared (in exact cents) against the sum of its line prices; per
    status the audit reports how many orders disagree, the worst gap,
    and the total drift. Orders with NO lines reconcile against 0 via
    the LEFT join — absence is a finding, not a crash.

    Scale: one shuffle to pre-aggregate lines per order (map-side
    partials do most of it), one shuffle join on the order key, then
    an O(statuses) rollup. Exact integers end to end.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(cents("l_extendedprice")).alias("li_cents"))
    )
    r = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        (
            cents("o_totalprice") - F.coalesce(F.col("li_cents"), F.lit(0))
        ).alias("diff"),
    )
    return r.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("diff") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.max(F.abs("diff")).cast("bigint").alias("max_abs_diff_cents"),
        F.sum(F.abs("diff")).cast("bigint").alias("total_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# Q46 — share-of-parent rollup: each nation's revenue as a fraction of
# its region's — the treemap/drill-down statistic, computed as a join
# of two aggregates rather than a window so neither level's skew
# concentrates on one task.
# ---------------------------------------------------------------------------

_Q46_ORACLE = """
WITH nat AS (
  SELECT n.n_regionkey, n.n_name,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
reg AS (
  SELECT n_regionkey, SUM(cents) AS reg_cents FROM nat GROUP BY 1
)
SELECT r.r_name AS region, nat.n_name AS nation,
       nat.n_orders,
       nat.cents / 100.0 AS revenue,
       ROUND(CAST(nat.cents AS DOUBLE) / reg.reg_cents, 6) AS share_of_region
FROM nat
JOIN reg ON reg.n_regionkey = nat.n_regionkey
JOIN region r ON r.r_regionkey = nat.n_regionkey
"""


@register("q46_share_of_parent", oracle=_Q46_ORACLE, tags=("A1", "J5", "F4"))
def q46_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue share within region: the child level aggregates
    once (exact cents), the parent level re-aggregates the CHILD table
    (25 rows — never the facts twice), and the share divides identical
    integers cast to double, rounded at 6 dp. Dims broadcast; the
    share join runs on the O(nations) aggregate.

    Scale: one fact shuffle to O(nations) groups; the parent rollup
    and both share joins touch only aggregate-sized tables. A window
    over partitionBy(region) would compute the same number while
    funneling every nation row of a region through one task — the
    join-of-aggregates form is the skew-safe spelling.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    nat = j.groupBy("n_regionkey", "n_name").agg(
        F.sum(cents("o_totalprice")).alias("cents"),
        F.count("*").alias("n_orders"),
    )
    reg = nat.groupBy("n_regionkey").agg(F.sum("cents").alias("reg_cents"))
    out = nat.join(F.broadcast(reg), "n_regionkey").join(
        F.broadcast(region), nat.n_regionkey == region.r_regionkey
    )
    return out.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        "n_orders",
        (F.col("cents") / 100.0).alias("revenue"),
        F.round(
            F.col("cents").cast("double") / F.col("reg_cents"), 6
        ).alias("share_of_region"),
    )


# ---------------------------------------------------------------------------
# Q47 — inter-purchase interval distribution: how long between a
# customer's consecutive orders, histogrammed in whole weeks — the
# repurchase-cycle curve a lifecycle-marketing model is trained on.
# ---------------------------------------------------------------------------

_Q47_ORACLE = """
WITH g AS (
  SELECT o_custkey,
         datediff('day',
                  CAST(lag(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS DATE),
                  CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT CAST(gap_days // 7 AS BIGINT) AS gap_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(MIN(gap_days) AS BIGINT) AS min_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1
"""


@register("q47_interpurchase_distribution", oracle=_Q47_ORACLE, tags=("W3", "A7", "A1"))
def q47_interpurchase_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of gaps between consecutive orders per customer:
    lag over the per-customer order timeline yields day gaps (first
    order per customer contributes nothing), bucketed into whole weeks
    with per-bucket day extrema. Calendar-day arithmetic on DATE casts
    is exact integers on both engines.

    Scale: one shuffle on custkey, per-customer lag scan, then an
    O(weeks) rollup — the histogram never materializes raw pairs.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
    )
    g = orders.select(gap.alias("gap_days")).filter(F.col("gap_days").isNotNull())
    return g.groupBy(
        F.floor(F.col("gap_days") / 7).cast("bigint").alias("gap_weeks")
    ).agg(
        F.count("*").alias("n_intervals"),
        F.min("gap_days").cast("bigint").alias("min_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# DP4 — numeric correlation matrix (long form): exact-moment Pearson r
# for every pair of lineitem's numeric measures — the profiling matrix
# a feature-selection pass reads. DECIMAL/HUGEINT second moments (the
# a32/a34 recipe) so the only floats are the final three divisions.
# ---------------------------------------------------------------------------

_DP4_ORACLE = """
WITH u AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_discount * 100) AS BIGINT) AS disc
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(price) AS HUGEINT) AS sp, CAST(SUM(qty) AS HUGEINT) AS sq,
         CAST(SUM(disc) AS HUGEINT) AS sd,
         SUM(CAST(price AS HUGEINT) * price) AS spp,
         SUM(CAST(qty AS HUGEINT) * qty) AS sqq,
         SUM(CAST(disc AS HUGEINT) * disc) AS sdd,
         SUM(CAST(price AS HUGEINT) * qty) AS spq,
         SUM(CAST(price AS HUGEINT) * disc) AS spd,
         SUM(CAST(qty AS HUGEINT) * disc) AS sqd
  FROM u
)
SELECT pair, ROUND(cov_n / sqrt(vx * vy), 6) + 0 AS pearson_r
FROM (
  SELECT 'price_qty' AS pair,
         CAST(n * spq - sp * sq AS DOUBLE) AS cov_n,
         CAST(n * spp - sp * sp AS DOUBLE) AS vx,
         CAST(n * sqq - sq * sq AS DOUBLE) AS vy FROM m
  UNION ALL
  SELECT 'price_disc',
         CAST(n * spd - sp * sd AS DOUBLE),
         CAST(n * spp - sp * sp AS DOUBLE),
         CAST(n * sdd - sd * sd AS DOUBLE) FROM m
  UNION ALL
  SELECT 'qty_disc',
         CAST(n * sqd - sq * sd AS DOUBLE),
         CAST(n * sqq - sq * sq AS DOUBLE),
         CAST(n * sdd - sd * sd AS DOUBLE) FROM m
)
"""


@register("dp4_numeric_correlation_matrix", oracle=_DP4_ORACLE, tags=("A11", "A2", "F4"))
def dp4_numeric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between price, quantity, and
    discount from ONE pass of exact integer moments: every sum and
    cross-product accumulates in DECIMAL(38,0) (HUGEINT on the oracle
    side — BIGINT squares of cent sums overflow near 10⁹ rows, the a32
    lesson), and r = (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    divides identical doubles, rounded at 6 dp with the negative-zero
    guard.

    Scale: a single partial+final global aggregate (9 moments, one
    row) — the matrix costs one scan regardless of pair count; the
    pair expansion is a 3-row projection of that scalar row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d38 = lambda c: c.cast("decimal(38,0)")
    u = li.select(
        cents("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        cents("l_discount").alias("disc"),
    )
    m = u.agg(
        d38(F.count("*")).alias("n"),
        d38(F.sum("price")).alias("sp"),
        d38(F.sum("qty")).alias("sq"),
        d38(F.sum("disc")).alias("sd"),
        F.sum(d38(F.col("price")) * F.col("price")).alias("spp"),
        F.sum(d38(F.col("qty")) * F.col("qty")).alias("sqq"),
        F.sum(d38(F.col("disc")) * F.col("disc")).alias("sdd"),
        F.sum(d38(F.col("price")) * F.col("qty")).alias("spq"),
        F.sum(d38(F.col("price")) * F.col("disc")).alias("spd"),
        F.sum(d38(F.col("qty")) * F.col("disc")).alias("sqd"),
    )

    def pair(name, sxy, sx, sxx, sy, syy):
        cov = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        vx = (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        vy = (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        return m.select(
            F.lit(name).alias("pair"),
            (F.round(cov / F.sqrt(vx * vy), 6) + 0).alias("pearson_r"),
        )

    return (
        pair("price_qty", "spq", "sp", "spp", "sq", "sqq")
        .unionByName(pair("price_disc", "spd", "sp", "spp", "sd", "sdd"))
        .unionByName(pair("qty_disc", "sqd", "sq", "sqq", "sd", "sdd"))
    )


# ---------------------------------------------------------------------------
# A43 — behavioral entropy per user: Shannon entropy of each user's
# event-type mix — the exploration/repetitiveness score a
# personalization or bot-detection model features on (0 = one-note
# user, log2(5) ≈ 2.32 = uniform over the fixture's five types).
# ---------------------------------------------------------------------------

_A43_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
t AS (SELECT user_id, SUM(k) AS n FROM c GROUP BY 1)
SELECT c.user_id,
       CAST(MIN(t.n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(-SUM((CAST(k AS DOUBLE) / t.n)
                  * log2(CAST(k AS DOUBLE) / t.n)), 6) + 0 AS entropy_bits
FROM c JOIN t ON t.user_id = c.user_id
GROUP BY c.user_id
"""


@register("a43_user_entropy", oracle=_A43_ORACLE, tags=("A1", "A11", "F4"))
def a43_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy over event types: exact integer counts
    shuffle once to (user, type), the per-user total joins back on the
    same key, and H = −Σ p·log2 p divides identical integers before
    one rounded log each (round 6 + 0 — the TF-IDF/libm convention;
    entropy of rational p is irrational, so round-half ties don't
    arise). A user seen with one type scores exactly −1·log2(1) = 0.

    Scale: two aggregations and one join, all partitioned by user_id
    (the join reuses the counts table's partitioning); no windows, no
    driver math. At 100 TB the (user, type) table is the corpus's
    behavioral sketch — this query IS its reduction.
    """
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    t = c.groupBy("user_id").agg(F.sum("k").alias("n"))
    j = c.join(t, "user_id")
    p = F.col("k").cast("double") / F.col("n")
    return j.groupBy("user_id").agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.count("*").alias("n_types"),
        (F.round(-F.sum(p * F.log2(p)), 6) + 0).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Q48 — customer revenue-decile TRANSITION matrix (1995 → 1996): where
# last year's deciles migrated — the mobility table behind churn-risk
# and upsell models. Deciles use w32's closed-form rank bin
# ((rn−1)·10)//n + 1 over the SCALABLE two-level rank, per year.
# ---------------------------------------------------------------------------


def _q48_year_cte(year: int, alias: str) -> str:
    return f"""{alias}_per AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS units
  FROM orders WHERE year(o_orderdate) = {year} GROUP BY o_custkey
),
{alias}_ranked AS (
  SELECT o_custkey,
         row_number() OVER (ORDER BY units, o_custkey) AS rn,
         COUNT(*) OVER () AS n
  FROM {alias}_per
),
{alias}_bin AS (
  SELECT o_custkey, CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile
  FROM {alias}_ranked
)"""


_Q48_ORACLE = f"""
WITH {_q48_year_cte(1995, "a")},
{_q48_year_cte(1996, "b")}
SELECT a.decile AS decile_1995, b.decile AS decile_1996,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM a_bin a JOIN b_bin b ON a.o_custkey = b.o_custkey
GROUP BY 1, 2
"""


@register("q48_decile_transition", oracle=_Q48_ORACLE, tags=("W1", "A1", "J1"))
def q48_decile_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year decile migration: customers ranked by exact 1995
    revenue and again by 1996 revenue (both via the closed-form rank
    bin on a scalable two-level row number — no ntile, no global
    sort), inner-joined on the customer, and counted per (from, to)
    decile cell. Customers active in only one year drop out — the
    matrix describes movement, not churn (q23's job).

    Scale: each year is one keyed aggregation + scalable_row_number
    (the only global window runs over O(#rank-buckets) aggregate
    rows); the transition join is customer-keyed and the output is a
    fixed ≤100-cell matrix.
    """
    from ._helpers import scalable_row_number

    orders = load_table(spark, sf_dir, "orders")

    def year_deciles(year: int, out: str) -> DataFrame:
        # localCheckpoint: per (O(active customers)) feeds the rank's
        # double scan plus the count — re-derived 3x otherwise.
        per = (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(cents("o_totalprice")).alias("units"))
        ).transform(ckpt)
        ranked = scalable_row_number(
            per,
            order_cols=[F.col("units"), F.col("o_custkey")],
            bucket=F.floor(F.col("units") / F.lit(1 << 20)).cast("long"),
            out="rn",
        )
        n_tot = per.agg(F.count("*").alias("n"))
        x = (F.col("rn") - 1) * 10
        return ranked.crossJoin(F.broadcast(n_tot)).select(
            "o_custkey",
            ((x - x % F.col("n")) / F.col("n") + 1).cast("bigint").alias(out),
        )

    a = year_deciles(1995, "decile_1995")
    b = year_deciles(1996, "decile_1996")
    return (
        a.join(b, "o_custkey")
        .groupBy("decile_1995", "decile_1996")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Q49 — Pareto frontier (2-D skyline): orders dominated by NO other
# order on (price, recency) — the skyline operator of the classic
# Börzsönyi/"skyline query" literature, computed as a prefix-max scan
# instead of the O(n²) NOT EXISTS the semantics literally state.
# ---------------------------------------------------------------------------

_Q49_ORACLE = """
WITH b AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT o_orderkey, price_cents, CAST(d AS TIMESTAMP) AS order_date
FROM b a
WHERE NOT EXISTS (
  SELECT 1 FROM b o
  WHERE o.price_cents >= a.price_cents AND o.d >= a.d
    AND (o.price_cents > a.price_cents OR o.d > a.d)
)
"""


@register("q49_pareto_skyline", oracle=_Q49_ORACLE, tags=("W4", "A1", "P2"))
def q49_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of orders maximizing (price, recency): an order
    survives iff no other order is ≥ on both dimensions and > on one.
    The oracle states the semantics as the quadratic NOT EXISTS; the
    Spark plan computes the identical set linearly — collapse to one
    row per distinct price (its max date), prefix-max the dates over
    STRICTLY higher prices (a lag over the price-ordered aggregate),
    and keep a row iff it carries its price group's max date AND that
    date strictly exceeds every higher price's best date. Rows tied on
    both dimensions all survive (neither dominates), matching the
    NOT EXISTS exactly.

    Scale: one aggregation to O(distinct prices) rows; the only
    ordered window runs over that aggregate (sweep-admitted), and the
    verdict joins back by price — no self-join of the fact table,
    ever. k-D skylines iterate the same scan per added dimension.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        cents("o_totalprice").alias("price_cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    per_price = b.groupBy("price_cents").agg(F.max("d").alias("max_d"))
    w = Window.orderBy(F.col("price_cents").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = per_price.withColumn("best_higher", F.max("max_d").over(w))
    j = b.join(F.broadcast(frontier), "price_cents")
    keep = (F.col("d") == F.col("max_d")) & (
        F.col("best_higher").isNull() | (F.col("d") > F.col("best_higher"))
    )
    return j.filter(keep).select(
        "o_orderkey",
        "price_cents",
        F.col("d").cast("timestamp").alias("order_date"),
    )


# ---------------------------------------------------------------------------
# A45 — Tukey outlier fences per priority: exact quartiles by
# bounded-domain counting (the a35/a41 recipe), IQR fences kept in
# DOUBLED cents so the 1.5×IQR arithmetic stays integral, and the
# outlier census an anomaly monitor publishes.
# ---------------------------------------------------------------------------

_A45_ORACLE = """
WITH counts AS (
  SELECT o_orderpriority AS pri,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT pri, c, k,
         SUM(k) OVER (PARTITION BY pri ORDER BY c ROWS UNBOUNDED PRECEDING) AS ck,
         SUM(k) OVER (PARTITION BY pri) AS n
  FROM counts
),
q AS (
  SELECT pri,
         MIN(CASE WHEN 4 * ck >= n THEN c END) AS q1,
         MIN(CASE WHEN 4 * ck >= 3 * n THEN c END) AS q3,
         CAST(MIN(n) AS BIGINT) AS n
  FROM cum GROUP BY pri
),
f AS (
  SELECT pri, n, q1, q3,
         2 * q1 - 3 * (q3 - q1) AS lo2,
         2 * q3 + 3 * (q3 - q1) AS hi2
  FROM q
)
SELECT f.pri AS o_orderpriority, f.n AS n_orders,
       f.q1 / 100.0 AS q1, f.q3 / 100.0 AS q3,
       CAST(SUM(CASE WHEN 2 * counts.c < f.lo2 OR 2 * counts.c > f.hi2
                     THEN counts.k ELSE 0 END) AS BIGINT) AS n_outliers
FROM f JOIN counts ON counts.pri = f.pri
GROUP BY 1, 2, 3, 4
"""


@register("a45_tukey_outliers", oracle=_A45_ORACLE, tags=("A1", "A11", "P2"))
def a45_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Tukey fences: lower quartile = smallest value with
    cumulative count ≥ n/4 (pinned via the integer test 4·ck ≥ n; Q3
    mirrors at 3n), fences at Q1 − 1.5·IQR and Q3 + 1.5·IQR carried
    as DOUBLED cents (2·c vs 2·Q1 − 3·IQR) so the half-unit never
    exists — outliers counted with pure integer comparisons; only the
    displayed quartiles divide by 100.

    Scale: the raw table is touched once by the counting groupBy; the
    cumulative walks run over O(priorities × distinct cents) aggregate
    rows (partitioned by priority); the fence check joins the tiny
    per-priority fence table back to the COUNTS, not the raw rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        cents("o_totalprice").alias("c"),
    ).agg(F.count("*").alias("k"))
    w_cum = (
        Window.partitionBy("pri")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("pri")
    cum = counts.withColumn("ck", F.sum("k").over(w_cum)).withColumn(
        "n", F.sum("k").over(w_tot)
    )
    q = cum.groupBy("pri").agg(
        F.min(F.when(4 * F.col("ck") >= F.col("n"), F.col("c"))).alias("q1"),
        F.min(F.when(4 * F.col("ck") >= 3 * F.col("n"), F.col("c"))).alias("q3"),
        F.min("n").cast("bigint").alias("n"),
    )
    f = q.select(
        "pri", "n", "q1", "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("lo2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("hi2"),
    )
    jf = counts.join(F.broadcast(f), "pri")
    out = F.when(
        (2 * F.col("c") < F.col("lo2")) | (2 * F.col("c") > F.col("hi2")),
        F.col("k"),
    ).otherwise(0)
    return jf.groupBy(
        F.col("pri").alias("o_orderpriority"),
        F.col("n").alias("n_orders"),
        (F.col("q1") / 100.0).alias("q1"),
        (F.col("q3") / 100.0).alias("q3"),
    ).agg(F.sum(out).cast("bigint").alias("n_outliers"))


# ---------------------------------------------------------------------------
# Q50 — concurrency curve (sweep line): how many user sessions are
# open at once, per day — the capacity-planning statistic. Intervals
# (30-min-gap sessions) become ±1 edge events; the running edge sum IS
# the concurrency level, so the "interval overlap count" needs no
# interval join at all.
# ---------------------------------------------------------------------------

_Q50_ORACLE = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM lagged
), sess_id AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sess AS (
  SELECT user_id, MIN(ts) AS s, MAX(ts) + INTERVAL '30 minutes' AS e
  FROM sess_id GROUP BY user_id, sid
), edges AS (
  SELECT s AS ts, 1 AS delta, user_id FROM sess
  UNION ALL
  SELECT e, -1, user_id FROM sess
), lvl AS (
  SELECT ts, SUM(delta) OVER (ORDER BY ts, delta, user_id
                              ROWS UNBOUNDED PRECEDING) AS level
  FROM edges
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(MAX(level) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM lvl GROUP BY 1
"""


@register("q50_max_concurrency", oracle=_Q50_ORACLE, tags=("W4", "A7", "ST3"))
def q50_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by sweep line: st3's 30-minute
    gap sessions emit a +1 edge at session start and a −1 at end
    (end = last event + gap), edges sort by (ts, delta, user) — ends
    before starts at the same instant, so back-to-back sessions never
    double-count — and the global prefix sum of deltas is the live
    concurrency level, maxed per day. No interval self-join: overlap
    counting is a linear scan of 2·|sessions| edges.

    Scale: sessionization is the per-user partitioned pass; the ONLY
    global ordering is the edge prefix sum, computed with
    _helpers.scalable_running_sum over day buckets (the tiny global
    window runs on O(#days) aggregates) — the sweep line survives any
    corpus size the session store does.
    """
    from ._helpers import scalable_running_sum

    events = load_table(spark, sf_dir, "events")
    sess = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    # One explode instead of a start/end UNION: the union form derives
    # the sessionization twice (and the prefix-sum helper's double scan
    # doubles that again); exploding both edges from one row keeps a
    # single derivation, and ckpt covers the helper's re-read.
    edges = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("w.start").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("w.end").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
        "user_id",
    ).select(
        F.col("e.ts").alias("ts"), F.col("e.delta").alias("delta"), "user_id"
    ).transform(ckpt)  # ckpt tier-2 (O(2*sessions) edges): see _helpers.ckpt contract

    day_bkt = ntz_epoch_us("ts")
    lvl = scalable_running_sum(
        edges,
        order_cols=["ts", "delta", "user_id"],
        value="delta",
        bucket=F.floor(day_bkt / (86400 * 1000000)).cast("long"),
        out="level",
    )
    return lvl.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.max("level").cast("bigint").alias("max_concurrent"),
        F.count("*").alias("n_edges"),
    )


# ---------------------------------------------------------------------------
# Q51 — RFM segmentation: Recency / Frequency / Monetary quintile
# scores per customer plus the classic segment label — the marketing
# workhorse composite, built from THREE scalable rank passes and
# closed-form bins (no ntile, no global sort).
# ---------------------------------------------------------------------------


def _q51_rank_cte(metric_sql: str, alias: str, desc: bool) -> str:
    order = f"{metric_sql} {'DESC' if desc else 'ASC'}, o_custkey"
    return f"""{alias} AS (
  SELECT o_custkey,
         CAST(((row_number() OVER (ORDER BY {order}) - 1) * 5)
              // (COUNT(*) OVER ()) + 1 AS BIGINT) AS score
  FROM base
)"""


_Q51_ORACLE = f"""
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS freq,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monet
  FROM orders GROUP BY o_custkey
),
{_q51_rank_cte("last_order", "r", True)},
{_q51_rank_cte("freq", "f", True)},
{_q51_rank_cte("monet", "m", True)}
SELECT base.o_custkey,
       r.score AS r_score, f.score AS f_score, m.score AS m_score,
       CASE
         WHEN r.score <= 2 AND f.score <= 2 AND m.score <= 2 THEN 'champion'
         WHEN r.score >= 4 AND f.score <= 2 THEN 'at_risk_loyal'
         WHEN r.score <= 2 AND f.score >= 4 THEN 'new_promising'
         WHEN r.score >= 4 AND f.score >= 4 AND m.score >= 4 THEN 'hibernating'
         ELSE 'core'
       END AS segment
FROM base
JOIN r ON r.o_custkey = base.o_custkey
JOIN f ON f.o_custkey = base.o_custkey
JOIN m ON m.o_custkey = base.o_custkey
"""


@register("q51_rfm_segmentation", oracle=_Q51_ORACLE, tags=("W1", "A1", "P6"))
def q51_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scores: customers ranked on recency (latest order first),
    frequency, and monetary value — scores are quintile bins via the
    closed-form ((rn−1)·5)//n + 1 over scalable two-level ranks (score
    1 = best on every axis since all three rank DESC), then the rule
    table maps score triples to the named segments a CRM campaign
    targets. Every rank's ORDER BY ends in o_custkey, so ties are
    deterministic on both engines.

    Scale: one keyed aggregation, then three scalable_row_number
    passes over the O(customers) aggregate (each one's only global
    window runs on O(#rank-buckets) rows) joined back by customer key.
    A windowless engine pays exactly the same three passes.
    """
    from ._helpers import scalable_row_number

    orders = load_table(spark, sf_dir, "orders")
    # localCheckpoint: base (O(customers)) feeds n_tot, three
    # scalable_row_number passes (each double-scanning its input — the
    # documented family trade-off) and the final key spine — 16
    # exchanges without truncation.
    base = orders.groupBy("o_custkey").agg(
        ntz_epoch_us(F.max("o_orderdate")).alias(
            "last_order"
        ),
        F.count("*").alias("freq"),
        F.sum(cents("o_totalprice")).alias("monet"),
    ).transform(ckpt)
    n_tot = base.agg(F.count("*").alias("n"))

    def quintile(metric: str, out: str, width: int) -> DataFrame:
        neg = (-F.col(metric).cast("long")).alias("_negm")
        ranked = scalable_row_number(
            base.select("o_custkey", F.col(metric), neg),
            order_cols=[F.col("_negm"), F.col("o_custkey")],
            bucket=F.floor(F.col("_negm") / F.lit(width)).cast("long"),
            out="rn",
        )
        x = (F.col("rn") - 1) * 5
        return ranked.crossJoin(F.broadcast(n_tot)).select(
            "o_custkey",
            ((x - x % F.col("n")) / F.col("n") + 1).cast("bigint").alias(out),
        )

    r = quintile("last_order", "r_score", 86400 * 1000000 * 64)
    f = quintile("freq", "f_score", 4)
    m = quintile("monet", "m_score", 1 << 22)
    j = (
        base.select("o_custkey")
        .join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(m, "o_custkey")
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2) & (F.col("m_score") <= 2),
            "champion",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "at_risk_loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "new_promising")
        .when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "hibernating",
        )
        .otherwise("core")
    )
    return j.select(
        "o_custkey", "r_score", "f_score", "m_score", seg.alias("segment")
    )


# ---------------------------------------------------------------------------
# Q52 — cohort LTV triangle: cumulative revenue per acquisition cohort
# by months-since-first-order — the lifetime-value table every growth
# model is fit on (q23 counts retention; this accumulates value).
# ---------------------------------------------------------------------------

_Q52_ORACLE = """
WITH first AS (
  SELECT o_custkey,
         MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
           AS cohort_m
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort_m,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
           - f.cohort_m AS offset_m,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT cohort_m, offset_m, n_orders,
       SUM(cents) OVER (PARTITION BY cohort_m ORDER BY offset_m
                        ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_revenue
FROM rev
"""


@register("q52_cohort_ltv", oracle=_Q52_ORACLE, tags=("A7", "W4", "J1"))
def q52_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV triangle: each customer's cohort is their first-order month
    (integer month index), every order lands at its month offset from
    that cohort, and revenue accumulates per cohort across offsets —
    the (cohort × offset) matrix whose rows are the value curves a
    payback model extrapolates. Exact cents under the prefix sum;
    division only at display.

    Scale: the first-order table is one keyed aggregation that joins
    back by customer (both sides customer-partitioned); the cumulative
    window runs per cohort over O(offsets) aggregate rows — bounded by
    the calendar, not the data.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    first = orders.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    j = orders.join(first, "o_custkey")
    rev = j.groupBy(
        "cohort_m", (m - F.col("cohort_m")).alias("offset_m")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("cents"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("offset_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        "cohort_m",
        "offset_m",
        "n_orders",
        (F.sum("cents").over(w) / 100.0).alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# q53 — ABC/XYZ inventory classification (round 5+): the planning
# matrix every supply chain runs. ABC buckets parts by cumulative
# revenue share (A ≤ 70 %, B ≤ 90 %, C rest — share compared in exact
# integer cross-products, never a float quotient); XYZ buckets by
# demand volatility (coefficient of variation of monthly quantity:
# X < 0.5, Y < 1.0, Z rest or unmeasurable).
# ---------------------------------------------------------------------------

_Q53_ORACLE = f"""
WITH rev AS (
  SELECT l_partkey, SUM({oracle_cents('l_extendedprice')}) AS cents_rev
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(SUM(cents_rev) AS BIGINT) AS total_cents FROM rev),
cum AS (
  SELECT l_partkey, cents_rev,
         CAST(SUM(cents_rev) OVER (ORDER BY cents_rev DESC, l_partkey)
              AS BIGINT) AS cum_cents
  FROM rev),
abc AS (
  SELECT l_partkey, cents_rev,
         CASE WHEN 10 * cum_cents <= 7 * total_cents THEN 'A'
              WHEN 10 * cum_cents <= 9 * total_cents THEN 'B'
              ELSE 'C' END AS abc_class
  FROM cum, tot),
mq AS (
  SELECT l_partkey,
         CAST(date_part('year', l_shipdate) * 12
              + date_part('month', l_shipdate) AS INT) AS mon,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
vol AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS sqq
  FROM mq GROUP BY 1),
xyz AS (
  SELECT l_partkey,
         CASE WHEN n < 2 THEN 'Z'
              ELSE CASE
                WHEN FLOOR(1000 * sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                                       / (n * (n - 1)))
                           / (CAST(sq AS DOUBLE) / n)) < 500 THEN 'X'
                WHEN FLOOR(1000 * sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                                       / (n * (n - 1)))
                           / (CAST(sq AS DOUBLE) / n)) < 1000 THEN 'Y'
                ELSE 'Z' END
         END AS xyz_class
  FROM vol)
SELECT abc.abc_class, xyz.xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(abc.cents_rev) AS BIGINT) AS class_cents,
       CAST((SUM(abc.cents_rev) * 10000) // MAX(tot.total_cents) AS BIGINT)
         AS share_bp
FROM abc JOIN xyz ON abc.l_partkey = xyz.l_partkey, tot
GROUP BY 1, 2
"""


@register("q53_abc_xyz", oracle=_Q53_ORACLE, tags=("A1", "W4", "J1"))
def q53_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ matrix over parts: cumulative-revenue class (descending
    prefix sum of exact cents, inclusive of the current part; the 70/90
    boundaries compare ``10*cum ≤ 7|9*total`` in BIGINT — exact up to
    ~9e17 total cents, i.e. beyond 100 TB of 2-dp money) crossed with
    the monthly-demand coefficient of variation (sample std / mean from
    exact Σq/Σq² — identical doubles both engines; ``floor(1000·cv)``
    bucketed at 500/1000 milli-units; parts observed in <2 months are
    unmeasurable → Z). Output is the 9-cell planning matrix with part
    counts, class revenue, and integer basis-point shares
    (``class_cents*10000 div total`` — positive, trunc == floor).

    Scale: the descending prefix sum is _helpers.scalable_running_sum
    over coarse negated-cents buckets (no global single-partition
    sort); both per-part profiles are one hash aggregation each; the
    scalar total broadcasts via the single-row crossJoin pattern.
    """
    from ._helpers import scalable_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(cents("l_extendedprice")).alias("cents_rev")
    )
    tot = rev.agg(F.sum("cents_rev").cast("long").alias("total_cents"))
    ranked = scalable_running_sum(
        rev.withColumn("neg", -F.col("cents_rev")),
        order_cols=[F.col("neg"), F.col("l_partkey")],
        value="cents_rev",
        bucket=F.floor(F.col("neg") / F.lit(1000000)).cast("long"),
        out="cum_cents",
    )
    abc = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "cents_rev",
        "total_cents",
        F.when(
            10 * F.col("cum_cents") <= 7 * F.col("total_cents"), "A"
        )
        .when(10 * F.col("cum_cents") <= 9 * F.col("total_cents"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    mon = (
        F.year("l_shipdate") * 12 + F.month("l_shipdate")
    ).cast("int")
    mq = li.groupBy(
        "l_partkey", mon.alias("mon")
    ).agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    vol = mq.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    cv_milli = F.floor(
        1000
        * F.sqrt(
            (F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")).cast(
                "double"
            )
            / (F.col("n") * (F.col("n") - 1))
        )
        / (F.col("sq").cast("double") / F.col("n"))
    )
    xyz = vol.select(
        "l_partkey",
        F.when(F.col("n") < 2, "Z")
        .when(cv_milli < 500, "X")
        .when(cv_milli < 1000, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents_rev").cast("long").alias("class_cents"),
            F.expr(
                "(sum(cents_rev) * 10000) div max(total_cents)"
            ).alias("share_bp"),
        )
    )


# ---------------------------------------------------------------------------
# a47 — discrete-time repurchase hazard curve (round 5+): classic
# survival analysis on the order history. For each week k since a
# customer's first purchase: how many customers were still "at risk"
# (no second purchase yet, observation window long enough to see week
# k) and how many made their second purchase that week. The hazard
# h(k) = events/at-risk is the curve retention teams read; censoring
# (customers whose window ends before week k) is handled the
# Kaplan–Meier way — they leave the risk set, they don't count as
# events.
# ---------------------------------------------------------------------------

_A47_HORIZON_W = 26

_A47_ORACLE = f"""
WITH firsts AS (
  SELECT o_custkey AS c, MIN(o_orderdate) AS f FROM orders GROUP BY 1),
seconds AS (
  SELECT o.o_custkey AS c, MIN(o.o_orderdate) AS s
  FROM orders o JOIN firsts ON o.o_custkey = firsts.c
  WHERE o.o_orderdate > firsts.f GROUP BY 1),
horizon AS (SELECT MAX(o_orderdate) AS mx FROM orders),
cust AS (
  SELECT firsts.c,
         CAST(datediff('day', firsts.f, horizon.mx) // 7 AS BIGINT) AS obs_w,
         CAST(datediff('day', firsts.f, seconds.s) // 7 AS BIGINT) AS w
  FROM firsts LEFT JOIN seconds ON firsts.c = seconds.c, horizon),
ks AS (SELECT CAST(k AS INT) AS k FROM generate_series(0, {_A47_HORIZON_W}) t(k)),
cells AS (
  SELECT ks.k,
         CASE WHEN cust.obs_w >= ks.k AND (cust.w IS NULL OR cust.w >= ks.k)
              THEN 1 ELSE 0 END AS at_risk,
         CASE WHEN cust.w = ks.k AND cust.obs_w >= ks.k
              THEN 1 ELSE 0 END AS ev
  FROM cust, ks)
SELECT k, CAST(SUM(at_risk) AS BIGINT) AS n_at_risk,
       CAST(SUM(ev) AS BIGINT) AS n_events,
       CAST((SUM(ev) * 10000) // SUM(at_risk) AS BIGINT) AS hazard_bp
FROM cells GROUP BY k HAVING SUM(at_risk) > 0
"""


@register("a47_hazard_curve", oracle=_A47_ORACLE, tags=("A1", "J2", "W3"))
def a47_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly repurchase hazard over the first 26 weeks of each
    customer's lifetime: time-to-second-purchase in whole weeks
    (``datediff div 7`` — non-negative, trunc == floor), right-censored
    at the corpus horizon (global max order date, a one-row broadcast
    scalar). ``hazard_bp = events*10000 div at_risk`` is exact integer
    basis points; weeks nobody could have reached are dropped.

    Scale: two hash aggregations on o_custkey (first/second purchase
    — the second via a self-join filtered to post-first orders, same
    shuffle key), then a ×27 literal-range explode on the O(customers)
    profile and an O(horizon) rollup. No window functions at all —
    the risk-set recurrence is expressed as a per-(customer, week)
    predicate, so the whole curve is two shuffles over bounded data.
    """
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.min("o_orderdate").alias("f")
    )
    seconds = (
        orders.join(firsts, orders.o_custkey == firsts.c)
        .where(F.col("o_orderdate") > F.col("f"))
        .groupBy("c")
        .agg(F.min("o_orderdate").alias("s"))
    )
    horizon = orders.agg(F.max("o_orderdate").alias("mx"))
    cust = (
        firsts.join(seconds, "c", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "c",
            F.expr("datediff(mx, f) div 7").cast("long").alias("obs_w"),
            F.expr("datediff(s, f) div 7").cast("long").alias("w"),
        )
    )
    cells = cust.select(
        "obs_w",
        "w",
        F.explode(F.sequence(F.lit(0), F.lit(_A47_HORIZON_W))).alias("k"),
    ).select(
        F.col("k").cast("int").alias("k"),
        F.when(
            (F.col("obs_w") >= F.col("k"))
            & (F.col("w").isNull() | (F.col("w") >= F.col("k"))),
            1,
        )
        .otherwise(0)
        .alias("at_risk"),
        F.when(
            (F.col("w") == F.col("k")) & (F.col("obs_w") >= F.col("k")), 1
        )
        .otherwise(0)
        .alias("ev"),
    )
    return (
        cells.groupBy("k")
        .agg(
            F.sum("at_risk").cast("long").alias("n_at_risk"),
            F.sum("ev").cast("long").alias("n_events"),
            F.expr("(sum(ev) * 10000) div sum(at_risk)").alias("hazard_bp"),
        )
        .filter(F.col("n_at_risk") > 0)
    )


# ---------------------------------------------------------------------------
# a48 — trimmed mean (round 5+): the robust location estimate between
# a35's median/MAD and the plain average — drop the cheapest and
# priciest 5 % of orders per segment, average the middle 90 % in
# exact cents. Rank-based, so it needs a unique tiebreak, not a value
# threshold (ties at the cut must resolve identically on both
# engines).
# ---------------------------------------------------------------------------

_A48_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
r AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents, o_orderkey) AS rk,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM j)
SELECT segment,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(2 * (MAX(n) // 20) AS BIGINT) AS n_trimmed,
       ROUND(SUM(CASE WHEN rk > n // 20 AND rk <= n - n // 20
                      THEN cents ELSE 0 END) / 100.0
             / SUM(CASE WHEN rk > n // 20 AND rk <= n - n // 20
                        THEN 1 ELSE 0 END), 6) + 0 AS trimmed_mean
FROM r GROUP BY segment
"""


@register("a48_trimmed_mean", oracle=_A48_ORACLE, tags=("A1", "W1", "J1"))
def a48_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 %-each-side trimmed mean of order value per market segment:
    rank orders by (cents, orderkey) within segment, drop the bottom
    and top ``n div 20`` ranks, average the exact-cent sum of the rest
    (identical BIGINT sum ÷ identical count → identical doubles before
    the 6-dp round; ``+ 0`` normalizes -0.0). The unique orderkey
    tiebreak makes the cut deterministic under value ties.

    Scale: the window ranks the RAW order fact inside 5 segment
    partitions — unlike w38 (whose window runs over a calendar-bounded
    aggregate), this shape per-partition-sorts the full fact and is
    the honest cost of an exact rank trim; at 100 TB swap in the
    two-level scalable_row_number per segment (same cut, no
    single-partition sort). The trim is a rank predicate inside the
    same aggregation — no second pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        cents("o_totalprice").alias("cents"),
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("segment")
    r = j.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    kept = (F.col("rk") > F.expr("n div 20")) & (
        F.col("rk") <= F.col("n") - F.expr("n div 20")
    )
    return r.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_orders"),
        (2 * F.expr("max(n) div 20")).cast("long").alias("n_trimmed"),
        (
            F.round(
                F.sum(F.when(kept, F.col("cents")).otherwise(0)) / 100.0
                / F.sum(F.when(kept, 1).otherwise(0)),
                6,
            )
            + 0
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# q54 — order-level SLA attainment (round 5+): did the WHOLE order
# ship within its priority's promise? Order-level because the last
# lineitem defines fulfilment — a per-line rate would overstate
# attainment whenever one straggler line blows the promise.
# ---------------------------------------------------------------------------

_Q54_ORACLE = """
WITH ship AS (
  SELECT l_orderkey, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1),
sla AS (
  SELECT o.o_orderpriority,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 30
              WHEN o.o_orderpriority = '3-MEDIUM' THEN 60
              ELSE 90 END AS sla_days,
         CAST(datediff('day', o.o_orderdate, s.last_ship) AS BIGINT)
           AS days_to_ship
  FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey)
SELECT o_orderpriority,
       CAST(MAX(sla_days) AS INT) AS sla_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN days_to_ship <= sla_days THEN 1 ELSE 0 END)
            AS BIGINT) AS n_attained,
       CAST((SUM(CASE WHEN days_to_ship <= sla_days THEN 1 ELSE 0 END)
             * 10000) // COUNT(*) AS BIGINT) AS attainment_bp,
       CAST(MAX(days_to_ship) AS BIGINT) AS worst_days
FROM sla GROUP BY o_orderpriority
"""


@register("q54_sla_attainment", oracle=_Q54_ORACLE, tags=("A1", "J1", "P6"))
def q54_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of orders whose LAST lineitem shipped within the
    priority-dependent SLA (urgent/high 30 days, medium 60, rest 90),
    in integer basis points (``attained*10000 div n`` — positive,
    trunc == ``//``), plus the worst observed fulfilment time.

    Scale: the per-order last-ship reduction is one hash aggregation
    on l_orderkey; the orders join shares that key (co-partitioned
    shuffle, no broadcast needed for the fact side); the final rollup
    keys on 5 priorities. Calendar arithmetic is integer days.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    sla_days = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 30
        )
        .when(F.col("o_orderpriority") == "3-MEDIUM", 60)
        .otherwise(90)
    )
    sla = orders.join(
        ship, orders.o_orderkey == ship.l_orderkey
    ).select(
        "o_orderpriority",
        sla_days.alias("sla_days"),
        F.datediff("last_ship", "o_orderdate").cast("long").alias(
            "days_to_ship"
        ),
    )
    att = F.sum(
        F.when(F.col("days_to_ship") <= F.col("sla_days"), 1).otherwise(0)
    )
    return sla.groupBy("o_orderpriority").agg(
        F.max("sla_days").cast("int").alias("sla_days"),
        F.count("*").alias("n_orders"),
        att.cast("long").alias("n_attained"),
        F.expr(
            "(sum(case when days_to_ship <= sla_days then 1 else 0 end)"
            " * 10000) div count(*)"
        ).alias("attainment_bp"),
        F.max("days_to_ship").alias("worst_days"),
    )


# ---------------------------------------------------------------------------
# a50 — Welch's t-test, all segment pairs (round 5+): completes the
# two-sample battery (a27 rank-based, a28 proportions, a29 KS, a30
# chi-square) with the unequal-variance mean test. Moment sums are
# exact — Σx in BIGINT cents, Σx² in DECIMAL(38,0) (cent squares
# overflow BIGINT near ~10⁹ cent-rows: the round-4 gotcha) — so both
# engines feed identical doubles into the t and Welch–Satterthwaite
# df formulas.
# ---------------------------------------------------------------------------

_A50_ORACLE = """
WITH s AS (
  SELECT c.c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sx,
         SUM(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT)
                  * CAST(round(o.o_totalprice * 100) AS BIGINT)
                  AS HUGEINT)) AS sxx
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1),
pairs AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         a.n AS n_a, b.n AS n_b,
         CAST(a.sx AS DOUBLE) / a.n AS m_a,
         CAST(b.sx AS DOUBLE) / b.n AS m_b,
         (CAST(a.sxx AS DOUBLE)
          - a.n * (CAST(a.sx AS DOUBLE) / a.n)
                * (CAST(a.sx AS DOUBLE) / a.n)) / (a.n - 1) AS v_a,
         (CAST(b.sxx AS DOUBLE)
          - b.n * (CAST(b.sx AS DOUBLE) / b.n)
                * (CAST(b.sx AS DOUBLE) / b.n)) / (b.n - 1) AS v_b
  FROM s a JOIN s b ON a.seg < b.seg)
SELECT seg_a, seg_b, n_a, n_b,
       ROUND((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) + 0 AS t_stat,
       ROUND(((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b))
             / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 6) + 0
         AS welch_df
FROM pairs
"""


@register("a50_welch_ttest", oracle=_A50_ORACLE, tags=("A1", "F4", "J8"))
def a50_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic and Welch–Satterthwaite
    degrees of freedom for every market-segment pair's order values
    (10 pairs). Per-segment moments reduce once; the pair join runs on
    the 5-row aggregate. Every float operation consumes exact integer
    sums in the same order on both engines, so the doubles are
    bit-identical before the 6-dp round (``+ 0`` for -0.0).

    Scale: one fact shuffle for the moment reduction (broadcast
    segment map), then O(groups²) arithmetic on the aggregate —
    the test itself costs nothing at any corpus size. Σx² accumulates
    in DECIMAL(38,0)/HUGEINT (cent squares overflow BIGINT at
    ~$10⁹ segment-years — CLAUDE.md round-4 rule).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    c = cents("o_totalprice")
    s = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").alias("n"),
            F.sum(c).alias("sx"),
            F.sum((c * c).cast("decimal(38,0)")).alias("sxx"),
        )
    )
    a, b = s.alias("a"), s.alias("b")
    p = a.join(b, F.col("a.seg") < F.col("b.seg")).select(
        F.col("a.seg").alias("seg_a"),
        F.col("b.seg").alias("seg_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        (F.col("a.sx").cast("double") / F.col("a.n")).alias("m_a"),
        (F.col("b.sx").cast("double") / F.col("b.n")).alias("m_b"),
        (
            (
                F.col("a.sxx").cast("double")
                - F.col("a.n")
                * (F.col("a.sx").cast("double") / F.col("a.n"))
                * (F.col("a.sx").cast("double") / F.col("a.n"))
            )
            / (F.col("a.n") - 1)
        ).alias("v_a"),
        (
            (
                F.col("b.sxx").cast("double")
                - F.col("b.n")
                * (F.col("b.sx").cast("double") / F.col("b.n"))
                * (F.col("b.sx").cast("double") / F.col("b.n"))
            )
            / (F.col("b.n") - 1)
        ).alias("v_b"),
    )
    se2_a = F.col("v_a") / F.col("n_a")
    se2_b = F.col("v_b") / F.col("n_b")
    return p.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        (
            F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2_a + se2_b), 6)
            + 0
        ).alias("t_stat"),
        (
            F.round(
                ((se2_a + se2_b) * (se2_a + se2_b))
                / (
                    se2_a * se2_a / (F.col("n_a") - 1)
                    + se2_b * se2_b / (F.col("n_b") - 1)
                ),
                6,
            )
            + 0
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# q57 — receivables aging (round 5+): the finance-desk view of open
# orders — bucket every not-finished order by its age at the corpus
# horizon (0–30 / 31–60 / 61–90 / 90+ days) per market segment, with
# exact cents exposure. The aging matrix is THE collections report;
# its bucket edges are integer day comparisons, so no float ever
# appears.
# ---------------------------------------------------------------------------

_Q57_ORACLE = """
WITH mx AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
aged AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', o.o_orderdate, mx.horizon) AS BIGINT) AS age,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey, mx
  WHERE o.o_orderstatus <> 'F')
SELECT segment,
       CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90'
            ELSE '90+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS exposure_cents,
       CAST(MAX(age) AS BIGINT) AS oldest_days
FROM aged GROUP BY 1, 2
"""


@register("q57_receivables_aging", oracle=_Q57_ORACLE, tags=("A1", "J1", "P6"))
def q57_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order exposure aged against the corpus horizon (global max
    order date — a one-row broadcast scalar) in the standard 30/60/90
    buckets per segment: order counts, exact cents exposure, oldest
    open order. Bucket edges are integer day comparisons.

    Scale: one fact shuffle for the segment join's rollup (customer
    map broadcasts), O(segments × 4) output. The horizon scalar is the
    a47 crossJoin pattern — no driver round-trip.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mx = orders.agg(F.max("o_orderdate").alias("horizon"))
    aged = (
        orders.where(F.col("o_orderstatus") != "F")
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff("horizon", "o_orderdate").cast("long").alias("age"),
            cents("o_totalprice").alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy("segment", bucket.alias("age_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("long").alias("exposure_cents"),
        F.max("age").alias("oldest_days"),
    )


# ---------------------------------------------------------------------------
# q58 — difference-in-differences (round 5+): the workhorse causal
# estimate. Treatment = promo-type parts, control = everything else;
# periods split at 1995-06-17. DiD = (ȳ_treat,post − ȳ_treat,pre) −
# (ȳ_ctrl,post − ȳ_ctrl,pre) on per-lineitem discounted revenue —
# four cell means from exact cents sums, so both engines assemble the
# identical estimate double.
# ---------------------------------------------------------------------------

_Q58_CUT = "1995-06-17"

_Q58_ORACLE = f"""
WITH cells AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
         CASE WHEN l.l_shipdate >= TIMESTAMP '{_Q58_CUT}'
              THEN 1 ELSE 0 END AS post,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (
  SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sx
  FROM cells GROUP BY 1, 2)
SELECT
  MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_treat_pre,
  MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_treat_post,
  MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_ctrl_pre,
  MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_ctrl_post,
  ROUND(
    (MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(sx AS DOUBLE) / n END)
     - MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(sx AS DOUBLE) / n END))
    - (MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(sx AS DOUBLE) / n END)
       - MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(sx AS DOUBLE) / n END)),
    6) + 0 AS did_cents
FROM s
"""


@register("q58_diff_in_diff", oracle=_Q58_ORACLE, tags=("A2", "J1", "P6"))
def q58_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences for promo parts around 1995-06-17 on
    per-lineitem discounted revenue: the four cell counts plus the DiD
    estimate in cents (6-dp rounded; every mean divides an exact
    BIGINT cents sum by an exact count, the same operations in the
    same order on both engines, then one final subtraction chain).

    Scale: one fact shuffle for the 2×2 cell reduction (part flag
    broadcasts with the dimension); the estimate itself is arithmetic
    over FOUR rows. This is how causal dashboards run at 100 TB —
    reduce to design cells first, estimate on the driver-sized result
    (here kept distributed as a 1-row DataFrame).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    treated = F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0)
    post = F.when(
        F.col("l_shipdate") >= F.lit(_Q58_CUT).cast("timestamp"), 1
    ).otherwise(0)
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    s = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == part.p_partkey,
        )
        .groupBy(treated.alias("treated"), post.alias("post"))
        .agg(F.count("*").alias("n"), F.sum(rev_cents).alias("sx"))
    )

    def cell(t: int, p: int, expr):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), expr)
        )

    mean = F.col("sx").cast("double") / F.col("n")
    return s.agg(
        cell(1, 0, F.col("n")).alias("n_treat_pre"),
        cell(1, 1, F.col("n")).alias("n_treat_post"),
        cell(0, 0, F.col("n")).alias("n_ctrl_pre"),
        cell(0, 1, F.col("n")).alias("n_ctrl_post"),
        (
            F.round(
                (cell(1, 1, mean) - cell(1, 0, mean))
                - (cell(0, 1, mean) - cell(0, 0, mean)),
                6,
            )
            + 0
        ).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# q59 — duration-capped sessionization (round 5+): real session rules
# are two-dimensional — split on a 30-minute inactivity gap AND on a
# 4-hour maximum session length (a device left streaming must not
# produce one infinite session). The cap anchors to the gap-session's
# first event, so the split is closed-form per row: no recurrence, no
# iterative pass — the property that keeps sessionization one window
# + one projection at 100 TB.
# ---------------------------------------------------------------------------

_Q59_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
gs AS (
  SELECT user_id, ts,
         SUM(new_gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS gap_sid
  FROM flagged),
anchored AS (
  SELECT user_id, ts, gap_sid,
         MIN(ts) OVER (PARTITION BY user_id, gap_sid) AS gap_start
  FROM gs),
capped AS (
  SELECT user_id, ts, gap_sid,
         (epoch_us(ts) - epoch_us(gap_start)) // CAST(14400000000 AS BIGINT) AS sub
  FROM anchored),
sess AS (
  SELECT user_id, gap_sid, sub,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
           AS span_s
  FROM capped GROUP BY 1, 2, 3)
SELECT user_id,
       CAST(COUNT(DISTINCT gap_sid) AS BIGINT) AS n_gap_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_capped_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(MAX(span_s) AS BIGINT) AS max_span_s
FROM sess GROUP BY user_id
"""


@register("q59_capped_sessions", oracle=_Q59_ORACLE, tags=("ST3", "W3", "A1"))
def q59_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-rule sessionization: 30-minute gap splits (lag + running
    flag sum — the st3 batch recurrence) THEN a 4-hour length cap
    anchored at each gap-session's first event (``elapsed div 4h`` —
    closed-form, so a marathon stream splits deterministically without
    any iterative re-anchoring). Per user: gap-session and
    capped-session counts, the largest session, the longest span.
    Every timestamp difference is exact integer microseconds.

    Scale: every window partitions by user (and gap-session) — bounded
    state, no global sort; the anchor MIN is one more pass over the
    same partitioning, and Spark reuses the exchange. Anchored capping
    is the scalable discipline: a rolling 4h-from-last-split rule
    would be an inherently sequential recurrence.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = ntz_epoch_us("ts")
    prev_us = F.lag(us).over(w)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_us.isNull() | (us - prev_us > 1800 * 1000000), 1
        )
        .otherwise(0)
        .alias("new_gap"),
    )
    gs = flagged.select(
        "user_id", "ts", F.sum("new_gap").over(wrun).alias("gap_sid")
    )
    wanchor = Window.partitionBy("user_id", "gap_sid")
    anchored = gs.select(
        "user_id",
        "ts",
        "gap_sid",
        F.min("ts").over(wanchor).alias("gap_start"),
    )
    sub = F.expr(
        "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        " - timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', gap_start))"
        " div 14400000000"  # 4h in µs as a BIGINT literal (ANSI: 4*3600*1000000 overflows INT)
    )
    sess = (
        anchored.select("user_id", "ts", "gap_sid", sub.alias("sub"))
        .groupBy("user_id", "gap_sid", "sub")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', max(ts))"
                " - timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', min(ts))) div 1000000"
            ).alias("span_s"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("gap_sid").alias("n_gap_sessions"),
        F.count("*").alias("n_capped_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.max("span_s").alias("max_span_s"),
    )


# ---------------------------------------------------------------------------
# q60 — rate/volume decomposition (round 5+): the FP&A bridge. The
# year-over-year revenue change per segment splits EXACTLY into
# volume effect ΔQ·P₀, rate effect Q₀·ΔP, and the joint term ΔQ·ΔP
# (rev = qty · avg-price, so the three terms reconcile to ΔR by
# algebra, not approximation). Everything is derived from two exact
# integer pairs (Σqty, Σcents) per cell — the decomposition is pure
# arithmetic on the 2-row-per-segment aggregate.
# ---------------------------------------------------------------------------

_Q60_ORACLE = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment,
         CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
         CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS r
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
w AS (
  SELECT segment,
         MAX(CASE WHEN yr = 1996 THEN q END) AS q0,
         MAX(CASE WHEN yr = 1996 THEN r END) AS r0,
         MAX(CASE WHEN yr = 1997 THEN q END) AS q1,
         MAX(CASE WHEN yr = 1997 THEN r END) AS r1
  FROM cells GROUP BY segment)
SELECT segment, q0, q1, r0, r1,
       ROUND((q1 - q0) * (CAST(r0 AS DOUBLE) / q0) / 100, 6) + 0
         AS volume_effect,
       ROUND(q0 * (CAST(r1 AS DOUBLE) / q1 - CAST(r0 AS DOUBLE) / q0) / 100,
             6) + 0 AS rate_effect,
       ROUND((q1 - q0)
             * (CAST(r1 AS DOUBLE) / q1 - CAST(r0 AS DOUBLE) / q0) / 100,
             6) + 0 AS joint_effect,
       ROUND(CAST(r1 - r0 AS DOUBLE) / 100, 6) + 0 AS total_delta
FROM w
"""


@register("q60_rate_volume_decomposition", oracle=_Q60_ORACLE, tags=("A1", "J1", "F4"))
def q60_rate_volume_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1996→1997 revenue bridge per segment: with Q = total quantity
    and P = R/Q average unit price, ΔR = ΔQ·P₀ + Q₀·ΔP + ΔQ·ΔP — the
    three effects and the total are each divisions/products of exact
    integer pairs performed identically on both engines (round 6,
    ``+ 0``), and they reconcile to the exact cents delta by
    construction. The window is restricted to the two complete years,
    so every cell exists.

    Scale: one fact reduction to (segment, year) grain — the bridge is
    arithmetic over ten rows. The orders join shares the l_orderkey
    shuffle key; the customer segment map broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == orders.o_orderkey,
        )
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("q"),
            F.sum(cents("l_extendedprice")).alias("r"),
        )
    )
    w = cells.groupBy("segment").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == 1996, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1997, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == 1997, F.col("r"))).alias("r1"),
    )
    p0 = F.col("r0").cast("double") / F.col("q0")
    p1 = F.col("r1").cast("double") / F.col("q1")
    dq = F.col("q1") - F.col("q0")
    return w.select(
        "segment",
        "q0",
        "q1",
        "r0",
        "r1",
        (F.round(dq * p0 / 100, 6) + 0).alias("volume_effect"),
        (F.round(F.col("q0") * (p1 - p0) / 100, 6) + 0).alias("rate_effect"),
        (F.round(dq * (p1 - p0) / 100, 6) + 0).alias("joint_effect"),
        (F.round((F.col("r1") - F.col("r0")).cast("double") / 100, 6) + 0)
        .alias("total_delta"),
    )


# ---------------------------------------------------------------------------
# q61 — last-touch attribution (round 5+): every purchase credits the
# LAST click by the same user within a 7-day lookback; purchases with
# no qualifying click are organic. The marketing rollup that sits on
# top of the as-of machinery (j7/j12/x1) — here the deliverable is
# the per-campaign revenue ledger, exact to the cent, with integer
# basis-point shares.
# ---------------------------------------------------------------------------

_Q61_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, ts,
         {oracle_cents('value')} AS rev
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, event_id,
         'cmp_' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4
                        AS VARCHAR) AS campaign
  FROM events WHERE event_type = 'click'),
ranked AS (
  SELECT p.event_id, p.rev, c.campaign,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rk
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND c.ts <= p.ts
   AND epoch_us(p.ts) - epoch_us(c.ts) <= 7 * 86400 * CAST(1000000 AS BIGINT)),
attributed AS (
  SELECT p.event_id, p.rev, COALESCE(r.campaign, 'organic') AS campaign
  FROM p LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) r
    ON p.event_id = r.event_id),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS total_rev FROM attributed)
SELECT campaign,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST((SUM(rev) * 10000) // tot.total_rev AS BIGINT) AS share_bp
FROM attributed, tot
GROUP BY campaign, tot.total_rev
"""


@register("q61_attribution_lasttouch", oracle=_Q61_ORACLE, tags=("J7", "F7", "A1"))
def q61_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-campaign attributed revenue: campaign = the JSON props key
    of the winning click (last by (ts, event_id) within the 7-day
    lookback, rank-1 per purchase), organic when no click qualifies.
    Counts, exact cents, and ``rev·10⁴ div total`` basis points.

    Scale: the candidate join keys on user_id (hash shuffle both
    sides) with the time predicates applied in-join; the rank-1 window
    partitions per purchase. Clicks per (user, week) are bounded in
    any real event stream, so candidate fan-out is bounded — the same
    posture as the graded as-of family, plus a JSON extraction that
    stays in codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        cents("value").alias("rev"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.concat(
            F.lit("cmp_"),
            (
                F.get_json_object("props", "$.k").cast("int") % 4
            ).cast("string"),
        ).alias("campaign"),
    )
    us = ntz_epoch_us("ts")
    cus = ntz_epoch_us("c_ts")
    cand = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("ts"))
        & (us - cus <= F.lit(604800000000)),  # 7 d in µs as one BIGINT literal
    )
    wr = Window.partitionBy("event_id").orderBy(
        F.desc("c_ts"), F.desc("c_event_id")
    )
    winner = (
        cand.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select("event_id", "campaign")
    )
    attributed = p.join(winner, "event_id", "left").select(
        "rev", F.coalesce("campaign", F.lit("organic")).alias("campaign")
    )
    tot = attributed.agg(F.sum("rev").cast("long").alias("total_rev"))
    return (
        attributed.groupBy("campaign")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "campaign",
            "n_purchases",
            "revenue_cents",
            F.expr("(revenue_cents * 10000) div total_rev").alias(
                "share_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q62 — price elasticity per brand (round 5+): the log-log regression
# slope of quantity on unit price across a brand's lineitems. Floats
# enter once — ln() per row, identical doubles on both engines — and
# are immediately QUANTIZED to integer micro-units, so every
# aggregation downstream is exact and order-free (the engine's
# quantize-then-aggregate discipline applied to a float-native
# statistic).
# ---------------------------------------------------------------------------

_Q62_ORACLE = """
WITH r AS (
  SELECT p.p_brand AS brand,
         CAST(round(ln(l.l_extendedprice / l.l_quantity) * 1000000)
              AS BIGINT) AS lx,
         CAST(round(ln(l.l_quantity) * 1000000) AS BIGINT) AS ly
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity > 0),
s AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
         SUM(CAST(lx AS HUGEINT) * ly) AS sxy,
         SUM(CAST(lx AS HUGEINT) * lx) AS sxx
  FROM r GROUP BY brand)
SELECT brand, n,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
            THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0
       END AS elasticity
FROM s
"""


@register("q62_price_elasticity", oracle=_Q62_ORACLE, tags=("A1", "J1", "F4"))
def q62_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope of ln(qty) on ln(unit price) per brand: per-row logs
    round to integer micro-units (identical doubles → identical
    integers), moment sums accumulate exactly (Σx·y in
    HUGEINT/DECIMAL — micro-unit products reach ~10²⁶ per group), and
    the slope divides exact values cast to double in the same order on
    both engines. Negative elasticity = normal demand; the per-brand
    spread is the pricing team's report.

    Scale: one fact shuffle to brand grain (25 brands) with map-side
    partials doing the Σ work; the ln/round projection is whole-stage
    codegen. Quantize-then-aggregate is what makes a log-space
    statistic hash-gradeable at all — raw double sums drift with
    partition order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lx = F.round(
        F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1000000
    ).cast("long")
    ly = F.round(F.log(F.col("l_quantity")) * 1000000).cast("long")
    r = (
        li.where(F.col("l_quantity") > 0)
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == part.p_partkey,
        )
        .select(F.col("p_brand").alias("brand"), lx.alias("lx"), ly.alias("ly"))
    )
    s = r.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(
            F.col("lx").cast("decimal(38,0)") * F.col("ly").cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            F.col("lx").cast("decimal(38,0)") * F.col("lx").cast("decimal(38,0)")
        ).alias("sxx"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    # Zero x-variance (e.g. a single-lineitem brand): DuckDB 0.0/0.0 is
    # NULL but Spark is NaN — guard to NULL on both engines.
    return s.select(
        "brand",
        "n",
        F.when(den != 0, F.round(num / den, 6) + 0).alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# a51 — deterministic permutation test (round 5+): is the BUILDING vs
# AUTOMOBILE order-value difference explainable by labeling chance?
# 64 pseudo-permutations reassign each pooled order by one bit of a
# Knuth hash (a fresh odd multiplier per replicate), the null
# distribution of mean differences comes out exactly, and the p-value
# is the integer share of replicates at least as extreme as the
# observed difference — a resampling test with zero RNG state, fully
# hash-gradeable.
# ---------------------------------------------------------------------------

_A51_PERMS = 64

_A51_ORACLE = f"""
WITH pooled AS (
  SELECT o.o_orderkey AS k,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
obs AS (
  SELECT CAST(SUM(CASE WHEN grp = 1 THEN cents END) AS DOUBLE)
           / SUM(CASE WHEN grp = 1 THEN 1 END)
         - CAST(SUM(CASE WHEN grp = 0 THEN cents END) AS DOUBLE)
           / SUM(CASE WHEN grp = 0 THEN 1 END) AS d
  FROM pooled),
perms AS (
  SELECT t.j,
         ((((pooled.k % 2147483648) * (2654435761 + 2 * t.j))
           % 2147483648) // 8192) % 2 AS bit,
         pooled.cents
  FROM pooled, generate_series(0, {_A51_PERMS - 1}) t(j)),
nulls AS (
  SELECT j,
         CAST(SUM(CASE WHEN bit = 1 THEN cents END) AS DOUBLE)
           / SUM(CASE WHEN bit = 1 THEN 1 END)
         - CAST(SUM(CASE WHEN bit = 0 THEN cents END) AS DOUBLE)
           / SUM(CASE WHEN bit = 0 THEN 1 END) AS d
  FROM perms
  GROUP BY j
  HAVING SUM(CASE WHEN bit = 1 THEN 1 END) > 0
     AND SUM(CASE WHEN bit = 0 THEN 1 END) > 0)
SELECT ROUND(obs.d / 100, 6) + 0 AS obs_diff,
       CAST(COUNT(*) AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN abs(nulls.d) >= abs(obs.d) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
       CAST((SUM(CASE WHEN abs(nulls.d) >= abs(obs.d) THEN 1 ELSE 0 END)
             * 10000) // COUNT(*) AS BIGINT) AS p_bp
FROM nulls, obs
GROUP BY obs.d
"""


@register("a51_permutation_test", oracle=_A51_ORACLE, tags=("A2", "A1", "F4"))
def a51_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test on the two-segment mean difference: replicate
    j relabels each pooled order by bit 13 of ``(key mod 2³¹)·(2654435761
    + 2j) mod 2³¹`` (31-bit-masked — ANSI-safe; a fresh odd multiplier
    per replicate), every replicate's mean difference is computed from
    exact cents sums, and p = share of replicates with |d| ≥ |observed|
    in integer basis points. Degenerate replicates (an empty side)
    drop out on both engines.

    Scale: the pooled fact explodes ×64 map-side and reduces in ONE
    hash aggregation keyed on (replicate, bit) — at 100 TB that is 64
    passes' worth of statistics for one shuffle; the comparison table
    is O(replicates). This is how resampling inference runs on a
    cluster: derandomized, replicated via hash bits, never via RNG
    state.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    pooled = (
        orders.join(
            F.broadcast(
                cust.select("c_custkey", "c_mktsegment").where(
                    F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
                )
            ),
            orders.o_custkey == cust.c_custkey,
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("grp"),
            cents("o_totalprice").alias("cents"),
        )
    )
    def mean_diff(flag):
        s1 = F.sum(F.when(F.col(flag) == 1, F.col("cents")))
        n1 = F.sum(F.when(F.col(flag) == 1, 1))
        s0 = F.sum(F.when(F.col(flag) == 0, F.col("cents")))
        n0 = F.sum(F.when(F.col(flag) == 0, 1))
        return s1.cast("double") / n1 - s0.cast("double") / n0, n1, n0

    d_obs, _, _ = mean_diff("grp")
    obs = pooled.agg(d_obs.alias("d_obs"))
    perms = pooled.select(
        "cents",
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(_A51_PERMS - 1))).alias("j"),
    ).select(
        "j",
        "cents",
        F.expr(
            "((((k % 2147483648) * (2654435761 + 2 * j))"
            " % 2147483648) div 8192) % 2"
        ).alias("bit"),
    )
    d_null, n1, n0 = mean_diff("bit")
    nulls = (
        perms.groupBy("j")
        .agg(d_null.alias("d"), n1.alias("n1"), n0.alias("n0"))
        .where((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    ext = F.sum(
        F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    )
    return (
        nulls.crossJoin(F.broadcast(obs))
        .agg(
            (F.round(F.max("d_obs") / 100, 6) + 0).alias("obs_diff"),
            F.count("*").alias("n_perms"),
            ext.cast("long").alias("n_extreme"),
            F.expr(
                "(sum(case when abs(d) >= abs(d_obs) then 1 else 0 end)"
                " * 10000) div count(*)"
            ).alias("p_bp"),
        )
    )


# ---------------------------------------------------------------------------
# a52 — price indices (round 5+): Laspeyres (base-weighted), Paasche
# (current-weighted), and Fisher between 1996 and 1997 over the parts
# traded in BOTH years. Unit prices quantize to integer micro-cents
# via exact division (``rev_cents·1000 div qty``), the four
# cross-products Σp·q accumulate in DECIMAL(38,0)/HUGEINT, and the
# indices emerge as integer micro-ratios — macro-economics with a
# hash-exact answer.
# ---------------------------------------------------------------------------

_A52_ORACLE = """
WITH py AS (
  SELECT l_partkey,
         CAST(date_part('year', o_orderdate) AS INT) AS yr,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
p AS (SELECT l_partkey, yr, q, (rev * 1000) // q AS p_micro FROM py),
matched AS (
  SELECT p0.l_partkey, p0.q AS q0, p0.p_micro AS pm0,
         p1.q AS q1, p1.p_micro AS pm1
  FROM p p0 JOIN p p1 ON p0.l_partkey = p1.l_partkey
  WHERE p0.yr = 1996 AND p1.yr = 1997),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(CAST(pm1 AS HUGEINT) * q0) AS p1q0,
         SUM(CAST(pm0 AS HUGEINT) * q0) AS p0q0,
         SUM(CAST(pm1 AS HUGEINT) * q1) AS p1q1,
         SUM(CAST(pm0 AS HUGEINT) * q1) AS p0q1
  FROM matched)
SELECT n_parts,
       CAST((p1q0 * 1000000) // p0q0 AS BIGINT) AS laspeyres_micro,
       CAST((p1q1 * 1000000) // p0q1 AS BIGINT) AS paasche_micro,
       ROUND(sqrt((CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE))
                  * (CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE))), 6) + 0
         AS fisher
FROM s
"""


@register("a52_price_indices", oracle=_A52_ORACLE, tags=("A2", "J1", "F4"))
def a52_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1996→1997 price indices over parts traded both years: unit
    price = exact integer micro-cents (truncating division — positive
    operands), Laspeyres = Σp₁q₀/Σp₀q₀ and Paasche = Σp₁q₁/Σp₀q₁ as
    integer micro-ratios from DECIMAL(38,0)/HUGEINT cross-products,
    Fisher = √(L·P) as the one float (identical doubles both engines,
    round 6). Values near 10⁶ mean flat prices.

    Scale: one fact reduction to (part, year) grain, a self-join on
    part id (hash-partitioned, both sides already reduced), one global
    moment row. The micro-quantization is what makes a price INDEX —
    a ratio of products of ratios — hash-gradeable at any volume.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    py = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            "l_partkey", F.year("o_orderdate").cast("int").alias("yr")
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("q"),
            F.sum(cents("l_extendedprice")).alias("rev"),
        )
    )
    p = py.select(
        "l_partkey", "yr", "q", F.expr("(rev * 1000) div q").alias("p_micro")
    )
    p0 = p.where(F.col("yr") == 1996).select(
        "l_partkey", F.col("q").alias("q0"), F.col("p_micro").alias("pm0")
    )
    p1 = p.where(F.col("yr") == 1997).select(
        "l_partkey", F.col("q").alias("q1"), F.col("p_micro").alias("pm1")
    )
    both = p0.join(p1, "l_partkey")
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = both.agg(
        F.count("*").alias("n_parts"),
        F.sum(dec("pm1") * dec("q0")).alias("p1q0"),
        F.sum(dec("pm0") * dec("q0")).alias("p0q0"),
        F.sum(dec("pm1") * dec("q1")).alias("p1q1"),
        F.sum(dec("pm0") * dec("q1")).alias("p0q1"),
    )
    return s.select(
        "n_parts",
        F.expr("CAST((p1q0 * 1000000) div p0q0 AS BIGINT)").alias(
            "laspeyres_micro"
        ),
        F.expr("CAST((p1q1 * 1000000) div p0q1 AS BIGINT)").alias(
            "paasche_micro"
        ),
        (
            F.round(
                F.sqrt(
                    (F.col("p1q0").cast("double") / F.col("p0q0").cast("double"))
                    * (
                        F.col("p1q1").cast("double")
                        / F.col("p0q1").cast("double")
                    )
                ),
                6,
            )
            + 0
        ).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# a53 — X̄/R control chart (round 5+): statistical process control
# over weekly revenue subgroups. Each week's first 5 observed days
# (rank within week — fixed subgroup size, as Shewhart requires) form
# a subgroup; limits are X̄̄ ± A₂(5)·R̄ with the textbook constant
# A₂ = 0.577. The out-of-control census is the alert a process
# monitor pages on.
# ---------------------------------------------------------------------------

_A53_A2 = 0.577  # Shewhart A2 for subgroup size 5

_A53_ORACLE = f"""
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT segment, x // 7 AS wk, y,
         row_number() OVER (PARTITION BY segment, x // 7 ORDER BY x) AS rk
  FROM daily),
sub AS (
  SELECT segment, wk,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(MAX(y) - MIN(y) AS BIGINT) AS r
  FROM ranked WHERE rk <= 5
  GROUP BY 1, 2 HAVING COUNT(*) = 5),
grand AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_subgroups,
         CAST(SUM(sy) AS BIGINT) AS ssy,
         CAST(SUM(r) AS BIGINT) AS sr
  FROM sub GROUP BY segment)
SELECT g.segment, g.n_subgroups,
       ROUND(CAST(g.ssy AS DOUBLE) / (5 * g.n_subgroups) / 100, 6) + 0
         AS xbarbar,
       ROUND(CAST(g.sr AS DOUBLE) / g.n_subgroups / 100, 6) + 0 AS rbar,
       CAST(SUM(CASE WHEN CAST(s.sy AS DOUBLE) / 5
                          > CAST(g.ssy AS DOUBLE) / (5 * g.n_subgroups)
                            + {_A53_A2} * (CAST(g.sr AS DOUBLE)
                                           / g.n_subgroups)
                      OR CAST(s.sy AS DOUBLE) / 5
                         < CAST(g.ssy AS DOUBLE) / (5 * g.n_subgroups)
                           - {_A53_A2} * (CAST(g.sr AS DOUBLE)
                                          / g.n_subgroups)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control
FROM grand g JOIN sub s ON g.segment = s.segment
GROUP BY g.segment, g.n_subgroups, g.ssy, g.sr
"""


@register("a53_xbar_control", oracle=_A53_ORACLE, tags=("A1", "W1", "F4"))
def a53_xbar_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X̄/R chart per segment: subgroups = each week's first
    5 observed days of revenue (rank-selected so every subgroup has
    exactly n=5 — the constant A₂ depends on n), X̄̄ and R̄ from exact
    cents sums, control limits X̄̄ ± 0.577·R̄, and the count of
    subgroups breaching them. Every mean divides exact integers the
    same way on both engines, so even the limit COMPARISONS agree
    bit-for-bit.

    Scale: daily rollup → per-(segment, week) rank (partitioned
    window, bounded partitions) → two O(subgroups) aggregations. SPC
    over a 100 TB event firehose is exactly this plan at a finer
    grain — the constants table is the only thing that changes.
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
    wk = F.expr("x div 7")
    wr = Window.partitionBy("segment", wk).orderBy("x")
    ranked = daily.select(
        "segment", wk.alias("wk"), "y", F.row_number().over(wr).alias("rk")
    )
    sub = (
        ranked.where(F.col("rk") <= 5)
        .groupBy("segment", "wk")
        .agg(
            F.sum("y").cast("long").alias("sy"),
            (F.max("y") - F.min("y")).cast("long").alias("r"),
            F.count("*").alias("cnt"),
        )
        .where(F.col("cnt") == 5)
    )
    grand = sub.groupBy("segment").agg(
        F.count("*").alias("n_subgroups"),
        F.sum("sy").cast("long").alias("ssy"),
        F.sum("r").cast("long").alias("sr"),
    )
    xbb = F.col("ssy").cast("double") / (5 * F.col("n_subgroups"))
    rbar = F.col("sr").cast("double") / F.col("n_subgroups")
    xbar = F.col("sy").cast("double") / 5
    out = F.when(
        (xbar > xbb + _A53_A2 * rbar) | (xbar < xbb - _A53_A2 * rbar), 1
    ).otherwise(0)
    return (
        grand.join(sub, "segment")
        .groupBy("segment", "n_subgroups", "ssy", "sr")
        .agg(F.sum(out).cast("long").alias("n_out_of_control"))
        .select(
            "segment",
            "n_subgroups",
            (F.round(xbb / 100, 6) + 0).alias("xbarbar"),
            (F.round(rbar / 100, 6) + 0).alias("rbar"),
            "n_out_of_control",
        )
    )


# ---------------------------------------------------------------------------
# a54 — record statistics (round 5+): extreme-value theory's cleanest
# testable fact — in an i.i.d. series of n observations the expected
# number of running records is the harmonic number H_n, regardless of
# the distribution. Daily segment revenue: observed record days
# (strict new maxima) against H_n; a large excess means trend, not
# luck. H_n folds in ascending k order on BOTH engines (sequential
# list folds), so even the float expectation is engine-identical.
# ---------------------------------------------------------------------------

_A54_ORACLE = """
WITH daily AS (
  SELECT c.c_mktsegment AS segment,
         CAST(datediff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
              AS BIGINT) AS x,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
rec AS (
  SELECT segment, x, y,
         CASE WHEN MAX(y) OVER (PARTITION BY segment ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR y > MAX(y) OVER (PARTITION BY segment ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_record
  FROM daily),
s AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(is_record) AS BIGINT) AS n_records
  FROM rec GROUP BY segment)
SELECT segment, n_days, n_records,
       ROUND(list_sum(list_transform(range(1, n_days + 1),
                                     k -> 1.0 / k)), 6) + 0
         AS expected_records
FROM s
"""


@register("a54_record_statistics", oracle=_A54_ORACLE, tags=("W4", "A1", "F5"))
def a54_record_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record census per segment: a record day strictly beats
    the exclusive prefix max of daily revenue (exact cents); the
    i.i.d. expectation is the harmonic number H_n, folded over
    sequence(1..n) in the same ascending order on both engines so the
    double matches bit-for-bit before the round. Observed ≫ expected
    is the distribution-free trend test.

    Scale: the record flag is one partitioned prefix-max window over
    the bounded daily grain; H_n is a per-row O(n_days) fold on the
    O(segments) result — nothing scales with fact volume but the
    first rollup.
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
    w_prev = (
        Window.partitionBy("segment")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = daily.select(
        "segment",
        F.when(
            F.max("y").over(w_prev).isNull()
            | (F.col("y") > F.max("y").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("is_record"),
    )
    s = rec.groupBy("segment").agg(
        F.count("*").alias("n_days"),
        F.sum("is_record").cast("long").alias("n_records"),
    )
    harmonic = F.aggregate(
        F.sequence(F.lit(1).cast("long"), F.col("n_days")),
        F.lit(0.0),
        lambda acc, k: acc + F.lit(1.0) / k,
    )
    return s.select(
        "segment",
        "n_days",
        "n_records",
        (F.round(harmonic, 6) + 0).alias("expected_records"),
    )
