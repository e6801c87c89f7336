"""Cross-checks for the Python-UDF surface (U2–U5): each Python-side
result must match an equivalent built-in formulation."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.001"


def test_u2_pandas_udf_matches_builtin_sigmoid(spark):
    got = {
        r.c_custkey: r.score
        for r in REGISTRY["u2_pandas_udf_score"].fn(spark, SF).collect()
    }
    want = {
        r.c_custkey: 1.0 / (1.0 + math.exp(-r.c_acctbal / 1000.0))
        for r in load_table(spark, SF, "customer").collect()
    }
    assert got.keys() == want.keys()
    # graded output rounds to 6 dp (oracle parity) → half-ulp-of-rounding
    assert all(abs(got[k] - want[k]) <= 5e-7 for k in want)


def test_u3_grouped_map_matches_window_zscore(spark):
    got = {
        r.c_custkey: r.z for r in REGISTRY["u3_grouped_map_zscore"].fn(spark, SF).collect()
    }
    w = Window.partitionBy("c_mktsegment")
    want_df = load_table(spark, SF, "customer").select(
        "c_custkey",
        (
            (F.col("c_acctbal") - F.mean("c_acctbal").over(w))
            / F.stddev_pop("c_acctbal").over(w)
        ).alias("z"),
    )
    want = {r.c_custkey: r.z for r in want_df.collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_u5_udtf_matches_explode_split(spark):
    got = REGISTRY["u5_udtf_tag_split"].fn(spark, SF)
    part = load_table(spark, SF, "part")
    keys = part.select(
        F.concat_ws(":", F.lit("brand"), F.col("p_brand"), F.col("p_type")).alias(
            "key"
        )
    )
    want = keys.select(
        "key", F.posexplode(F.split("key", ":")).alias("position", "part")
    ).select("key", "part", "position")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_u1_scalar_udf_matches_builtin_mapping(spark):
    got = {
        r.p_partkey: r.clean_name
        for r in REGISTRY["u1_scalar_udf_normalize"].fn(spark, SF).collect()
    }
    # Built-in form: every synthetic address ends in "St." → "Street".
    part = load_table(spark, SF, "part")
    want = {
        r.p_partkey: f"{r.p_name} Street" for r in part.select("p_partkey", "p_name").collect()
    }
    assert got == want
