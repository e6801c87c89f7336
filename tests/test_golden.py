"""Golden-file regression: every registered query's sf0.001 output must
match its committed snapshot (tests/golden/, regenerate with
``python -m tests.make_golden``). This is the value check for rows-only
queries the DuckDB oracle can't hash, and a fast oracle-free signal for
the rest."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded
from tests.golden_util import golden_path, render

_ensure_loaded()
SF = "/root/testdata/sf0.001"

_THREADS = max(1, int(os.environ.get("DWOS_SUITE_THREADS", "6")))


def _snapshot_verdict(df, name: str):
    path = golden_path(name)
    if not os.path.exists(path):
        return (
            f"missing golden for {name}; run `python -m tests.make_golden {name}`"
        )
    try:
        got = render(df.columns, [tuple(r) for r in df.collect()])
    except Exception as ex:
        return f"{name}: collect raised {type(ex).__name__}: {ex}"
    with open(path) as f:
        want = f.read()
    if got != want:
        return f"{name} drifted from golden snapshot ({path})"
    return None


@pytest.fixture(scope="session")
def golden_verdicts(request, spark, built_smoke):
    """Round-11 suite-time lever: construction stays SERIAL through the
    memoized SmokeBuilds (it mutates os.environ and shared dicts), but
    the slow part — one collect + render per query — overlaps on a
    small thread pool (collect releases the GIL at the py4j socket).
    Per-query tests assert cached verdicts, so granularity and failure
    messages are unchanged; DWOS_SUITE_THREADS=1 restores sequential."""
    from tests.test_oracle_parity import _selected_names

    names = _selected_names(request, "test_golden_snapshot")
    frames = {n: built_smoke.df(n) for n in names}  # serial, memoized
    if _THREADS == 1:
        return {n: _snapshot_verdict(frames[n], n) for n in names}
    from tests.test_oracle_parity import _bind_active_session

    with ThreadPoolExecutor(
        max_workers=_THREADS, initializer=_bind_active_session, initargs=(spark,)
    ) as ex:
        futs = {n: ex.submit(_snapshot_verdict, frames[n], n) for n in names}
        return {n: f.result() for n, f in futs.items()}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_golden_snapshot(golden_verdicts, name):
    verdict = golden_verdicts[name]
    assert verdict is None, verdict
