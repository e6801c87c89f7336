"""The dedup fixture lives at sf0.1 ONLY (5,000 docs, 8 planted exact
duplicate pairs; smaller SFs have zero dups — FIXTURES.md). These tests
pin the dedup operators against that fixture: survivor count, oracle
parity at the fixture scale, and exact-dup recall of the LSH path."""

from __future__ import annotations

import duckdb
import pytest

from data_wrangling_openstreetmap_spark.oracle import compare, run_oracle
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.1"


def test_exact_dedup_collapses_planted_duplicates(spark):
    spec = REGISTRY["l1_exact_dedup"]
    df = spec.fn(spark, SF)
    rows = [tuple(r) for r in df.collect()]
    assert len(rows) == 4992  # 5000 - 8 planted dups
    oc, orows = run_oracle(spec.oracle, SF)
    assert not compare(df.columns, rows, oc, orows)


def test_minhash_lsh_recalls_every_planted_pair(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    planted = {
        tuple(r)
        for r in con.execute(
            "SELECT min(doc_id), max(doc_id) FROM documents "
            "GROUP BY text HAVING count(*) > 1"
        ).fetchall()
    }
    con.close()
    assert len(planted) == 8
    candidates = {
        (r.doc_a, r.doc_b) for r in REGISTRY["l2_minhash_lsh"].fn(spark, SF).collect()
    }
    assert planted <= candidates  # exact dups share every band → recall 1.0
