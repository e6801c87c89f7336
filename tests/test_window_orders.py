"""Structural window order-tie determinism sweep (VERDICT r7 §Next #2).

Round 7's sf0.1 sweep caught w36_anchored_vwap emitting load-dependent
prefix sums because its window ORDER BY was not unique on lineitem and
one sf0.1 tie class carried different values — a hazard class that had
survived six rounds of hand-auditing. This module makes the class
structurally extinct: it walks every registered query's OPTIMIZED plan,
extracts each Window node, and asserts against the real fixture that
every order-sensitive window either has a unique (partition, order) or
only value-identical tie classes (see plans/window_orders.py for the
exact invariant and the order-insensitive shapes that are exempt).

The revert-evidence test rebuilds w36's PRE-FIX window spec inline and
asserts the checker flags it with the known supplier-707 witness tie —
so the sweep is proven to FAIL if the w36 fix (or the checker itself)
ever regresses, without actually reverting anything.

The sweep runs at sf0.1 because that is the smallest fixture containing
a differing-value tie within a supplier partition (sf0.001 has zero tie
classes; sf0.01's eight global ties never share a partition) — graded
scale cannot see this hazard, which is exactly why it lived six rounds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.operators._helpers import cents
from data_wrangling_openstreetmap_spark.plans import (
    SweepStats,
    window_order_hazards,
)
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

SWEEP_SF = os.environ.get("DWOS_WINDOW_SWEEP_SF", "/root/testdata/sf0.1")

# osm_wrangle_demo generates its own XML extract in a temp dir (no
# fixture tables, no Window nodes in its summary plan) — same skip as
# tools/gen_plan_audit.py.
SKIP = {"osm_wrangle_demo"}


def _w36_prefix_vwap(spark, order_cols) -> DataFrame:
    """w36's shape with a parameterized ORDER BY — ``order_cols``
    without the value columns reproduces the pre-fix hazard."""
    li = load_table(spark, SWEEP_SF, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    num = F.sum(cents("l_extendedprice") * F.col("l_quantity").cast("bigint")).over(w)
    den = F.sum(F.col("l_quantity").cast("bigint")).over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        num.alias("num"),
        den.alias("den"),
    ).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        (F.expr("(num * 100) div den") / 10000.0).alias("vwap"),
    )


def test_checker_flags_reverted_w36(spark):
    """Executable revert-evidence: the pre-fix w36 ORDER BY (key triple
    only, no value columns) must be flagged as a tie violation on the
    sf0.1 fixture — the exact defect the round-7 sweep caught live."""
    bad = _w36_prefix_vwap(spark, ["l_shipdate", "l_orderkey", "l_linenumber"])
    hazards = window_order_hazards(bad)
    assert len(hazards) == 1, [str(h) for h in hazards]
    assert hazards[0].kind == "tie-violation", str(hazards[0])
    # the round-7 witness: supplier 707's duplicated line pair
    assert "707" in hazards[0].detail, str(hazards[0])


def test_checker_passes_fixed_w36(spark):
    """The shipped w36 (value columns appended to the ORDER BY) has
    only value-identical ties — zero hazards."""
    _ensure_loaded()
    df = REGISTRY["w36_anchored_vwap"].fn(spark, SWEEP_SF)
    hazards = window_order_hazards(df)
    assert not hazards, [str(h) for h in hazards]


@pytest.mark.timeout(1200)
def test_registry_windows_tie_safe(spark):
    """The full sweep: every Window node of every registered query is
    tie-safe on the sf0.1 fixture. 'skipped' entries fail too — a
    window the checker cannot evaluate is a hole, not a pass."""
    _ensure_loaded()
    cache: dict = {}
    stats = SweepStats()
    failures = []
    for name, spec in REGISTRY.items():
        if name in SKIP:
            continue
        df = spec.fn(spark, SWEEP_SF)
        for hz in window_order_hazards(df, cache=cache, stats=stats):
            failures.append(f"{name}: {hz}")
    assert not failures, "\n".join(failures)
    # the sweep must have actually inspected the surface, not vacuously
    # passed because plan walking broke
    assert stats.windows_seen > 150, stats
    assert stats.windows_checked > 100, stats
