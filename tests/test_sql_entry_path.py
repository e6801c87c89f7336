"""E3 — the SQL-string entry path (SURVEY.md §3.2): after
register_views, any §2 operator is reachable as ANSI SQL text through
the same Catalyst pipeline as the DataFrame API. A couple of
round-trips prove the views and the dialect line up."""

from __future__ import annotations

from data_wrangling_openstreetmap_spark.io import register_views
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_text_matches_dataframe_api(spark):
    register_views(spark, SF)
    sql_top3 = spark.sql(
        """
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal
        FROM (
          SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                 row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
                 ) AS rk
          FROM customer
        ) WHERE rk <= 3
        """
    )
    assert _rows(sql_top3) == _rows(REGISTRY["q3_topk_window"].fn(spark, SF))

    sql_join = spark.sql(
        """
        SELECT r_name, n_name, COUNT(*) AS n_orders,
               -- Spark SQL parses 100.0 as DECIMAL(3,1); cast to keep
               -- the double semantics of the DataFrame-API literal
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
                 AS total_revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey   = c_custkey
        GROUP BY r_name, n_name
        """
    )
    assert _rows(sql_join) == _rows(REGISTRY["q2_join_chain"].fn(spark, SF))


def test_views_cover_all_tables(spark):
    register_views(spark, SF)
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0
