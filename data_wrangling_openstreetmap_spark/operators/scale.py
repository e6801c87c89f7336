"""Scale-posture operators (SURVEY.md §4.3): skew-resilient shuffles and
multi-level aggregation.

The salted join produces results identical to the plain formulation
(same oracle), so the skew machinery is value-graded, not just demoed;
bucketed co-located joins and hive-partition pruning are exercised in
tests/test_scale_layouts.py (they need a writable warehouse, which the
graded read-only path doesn't have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import dsum, oracle_dsum

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
