"""Golden-file serialization shared by the generator and the test.

Rows are canonicalized with the same code the oracle comparison uses
(order-insensitive, type-tagged) then rendered one repr per line — a
deterministic snapshot that catches value regressions in ALL queries,
including the rows-only ones the DuckDB oracle can't value-check.
"""

from __future__ import annotations

import os

from data_wrangling_openstreetmap_spark.oracle import canonical_rows

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SF_GOLDEN = "/root/testdata/sf0.001"

# Rounded to keep float repr jitter out of snapshots (canonical values
# are already engine-deterministic; this guards only repr choices).
MAX_SNAPSHOT_ROWS = 20000


def render(cols: list[str], rows: list[tuple]) -> str:
    canon = canonical_rows(cols, rows)
    header = f"# cols={sorted(cols)} rows={len(rows)}\n"
    return header + "\n".join(repr(r) for r in canon[:MAX_SNAPSHOT_ROWS]) + "\n"


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.txt")
