"""Relational core: scan → filter → project → aggregate → join → sort.

Covers SURVEY.md §2 rows S1, P1–P6, J1–J5, A1–A3, A5, A7, O1–O6. The
reference's query layer is exploratory SQL/Mongo aggregations over the
wrangled OSM tables (top contributors, amenity counts, tag statistics);
these are the same shapes expressed over the graded star schema.

Every query here compiles to built-in Column expressions — whole-stage
codegen end to end, no Python in the hot path. Filters are sargable
(plain column comparisons) so they push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ._helpers import davg, dsum, dsum_expr, money, oracle_davg, oracle_dsum, oracle_dsum_expr

# ---------------------------------------------------------------------------
# q1 — flagship: TPC-H-Q1-style pricing summary (scan S1, filter P2,
# computed exprs F4, hash agg A1, sort O1).
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity')} AS sum_qty,
  {oracle_dsum('l_extendedprice')} AS sum_base_price,
  {oracle_dsum_expr('CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))', 'DECIMAL(38,4)')} AS sum_disc_price,
  {oracle_dsum_expr('CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))', 'DECIMAL(38,6)')} AS sum_charge,
  {oracle_davg('l_quantity')} AS avg_qty,
  {oracle_davg('l_extendedprice')} AS avg_price,
  {oracle_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("S1", "P2", "F4", "A1", "O1"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: group lineitem by flag/status with eight
    aggregates over a shipdate filter.

    Scale: single shuffle on two low-cardinality keys; Catalyst emits
    partial (map-side) + final hash aggregation, so the shuffle carries
    only |groups|×|partitions| rows regardless of input size. The
    shipdate predicate pushes down to parquet row-group stats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (1 - money("l_discount"))
    charge = disc_price * (1 + money("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price, "decimal(38,4)").alias("sum_disc_price"),
            dsum_expr(charge, "decimal(38,6)").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
