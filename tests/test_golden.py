"""Golden-file regression: every registered query's sf0.001 output must
match its committed snapshot (tests/golden/, regenerate with
``python -m tests.make_golden``). This is the value check for rows-only
queries the DuckDB oracle can't hash, and a fast oracle-free signal for
the rest."""

from __future__ import annotations

import os

import pytest

from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded
from tests.golden_util import golden_path, render

_ensure_loaded()
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_golden_snapshot(spark, built_smoke, name):
    path = golden_path(name)
    if not os.path.exists(path):
        pytest.fail(
            f"missing golden for {name}; run `python -m tests.make_golden {name}`"
        )
    df = built_smoke.df(name)  # shared sf0.001 construction (conftest)
    got = render(df.columns, [tuple(r) for r in df.collect()])
    with open(path) as f:
        want = f.read()
    assert got == want, f"{name} drifted from golden snapshot ({path})"
