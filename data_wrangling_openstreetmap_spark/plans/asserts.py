"""Capture and assert on Spark physical plans."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# Operators that move rows across the JVM↔Python boundary. Graded
# queries must not contain any of these unless explicitly allowed
# (SURVEY.md §2.8 design rule).
PYTHON_EVAL_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",  # two-sided cogrouped applyInPandas (u12)
    "FlatMapGroupsInArrow",  # grouped applyInArrow (u10)
    "FlatMapCoGroupsInArrow",  # cogrouped applyInArrow (u13)
    "MapInArrow",
    # a Python Data Source scan renders as "BatchScan <name> ... (Python)"
    "(Python)",
)


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints Python-side,
    so stdout capture is faithful)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *fragments: str) -> str:
    plan = plan_string(df)
    missing = [f for f in fragments if f not in plan]
    assert not missing, f"plan lacks {missing}:\n{plan}"
    return plan


def assert_no_python_eval(df: DataFrame, name: str = "") -> None:
    # SIMPLE mode, deliberately: a Python Data Source scan renders its
    # "(Python)" tag only in explain("simple") — the formatted plan
    # says just "BatchScan <name>" (the CLAUDE.md formatted-plan
    # blindness gotcha, round-5+ instance).
    plan = plan_string(df, mode="simple")
    hits = [m for m in PYTHON_EVAL_MARKERS if m in plan]
    assert not hits, f"{name}: Python-boundary operators {hits} in plan:\n{plan}"
