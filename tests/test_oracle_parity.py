"""Replicates the driver's DuckDB-oracle comparison for every registered
query, at sf0.001 by default (fast; set DWOS_TEST_SF_DIR=/root/testdata/sf0.01
to run the exact graded scale)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from data_wrangling_openstreetmap_spark import oracle as orc
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
QUERY_NAMES = sorted(REGISTRY)


def test_contract_shape():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs), "every oracle key must have a query"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        spark_rows = [tuple(r) for r in df.collect()]
        assert len(spark_rows) >= 0  # rows-only check, mirrors the driver
        # rows-only queries must still not crash the driver's collector:
        # no array/map cells are required only on the oracle path, so
        # nothing further to assert here.
        return
    # Driver-strict comparison: toPandas() vs duckdb .df(), dtype-family
    # equality + stringified-cell equality + array-cell rejection. This
    # is the gate that reproduces round 1's entire red class locally.
    # It is strictly STRONGER than the value-level compare (identical
    # stringified cells ⇒ rounded-value multiset equality), so the
    # friendlier diagnostic below runs only on failure — one Spark
    # execution + one DuckDB execution per query instead of two each
    # (round-9 suite-time trim, VERDICT r8 §Next #6).
    pdf = df.toPandas()
    odf = orc.run_oracle_df(spec.oracle, sf_dir)
    strict = orc.strict_compare_frames(pdf, odf)
    if strict:
        # Value-level diagnostic comparison (friendlier failure
        # messages) — re-executes both sides, acceptable on failure.
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        o_cols, o_rows = orc.run_oracle(spec.oracle, sf_dir)
        problems = orc.compare(spark_cols, spark_rows, o_cols, o_rows)
        assert not problems, f"{name}: " + "; ".join(problems)
    assert not strict, f"{name} [driver-strict]: " + "; ".join(strict)
