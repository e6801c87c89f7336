"""Semantics cross-checks for the round-11 additions.

l2_substring_span_pairs already has a DuckDB oracle (cross-ENGINE) and
a golden snapshot; this adds a full independent PYTHON reimplementation
(cross-FORMULATION: collected texts, dict-based gram index, diagonal
islands in plain loops) and asserts the entire result frame matches —
anchors, df-cap, pair set, shared-gram counts, witness grams, and the
longest-span measurement all verified against code that shares nothing
with the Spark pipeline but the task definition.
"""

from __future__ import annotations

import re
from collections import defaultdict

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"
K = 8
DF_CAP = 50

# the engine-wide tokenizer contract: RE2's \s class, empties dropped
_WS = re.compile(r"[\t\n\f\r ]+")


def _brute_force(texts: dict[int, str]):
    grams: dict[int, list[tuple[int, str]]] = {}
    doc_sets: dict[str, set[int]] = defaultdict(set)
    for doc_id, text in texts.items():
        toks = [t for t in _WS.split(text or "") if t]
        if len(toks) < K:
            continue
        occ = []
        for i in range(len(toks) - K + 1):
            gram = " ".join(toks[i : i + K])
            occ.append((i + 1, gram))
            doc_sets[gram].add(doc_id)
        grams[doc_id] = occ
    kept = {g for g, ds in doc_sets.items() if 2 <= len(ds) <= DF_CAP}
    by_gram: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for doc_id, occ in grams.items():
        for pos, gram in occ:
            if gram in kept:
                by_gram[gram].append((doc_id, pos))
    pair_occ: dict[tuple[int, int], list[tuple[str, int, int]]] = defaultdict(list)
    for gram, lst in by_gram.items():
        for da, pa in lst:
            for db, pb in lst:
                if da < db:
                    pair_occ[(da, db)].append((gram, pa, pb))
    expected = {}
    for (da, db), occs in pair_occ.items():
        shared = {g for g, _, _ in occs}
        diags: dict[int, list[int]] = defaultdict(list)
        for _, pa, pb in occs:
            diags[pa - pb].append(pa)
        longest = 0
        for pas in diags.values():
            pas.sort()
            run = 1
            longest = max(longest, 1)
            for prev, cur in zip(pas, pas[1:]):
                run = run + 1 if cur == prev + 1 else 1
                longest = max(longest, run)
        expected[(da, db)] = (
            len(shared),
            longest + K - 1,
            min(shared),
        )
    return expected


def _brute_force_scrub(texts: dict[int, str]):
    """Independent keep-first span scrub: set algebra in plain loops."""
    occ: dict[int, list[tuple[int, str]]] = {}
    doc_sets: dict[str, set[int]] = defaultdict(set)
    n_tokens: dict[int, int] = {}
    for doc_id, text in texts.items():
        toks = [t for t in _WS.split(text or "") if t]
        n_tokens[doc_id] = len(toks)
        if len(toks) < K:
            continue
        rows = []
        for i in range(len(toks) - K + 1):
            gram = " ".join(toks[i : i + K])
            rows.append((i + 1, gram))
            doc_sets[gram].add(doc_id)
        occ[doc_id] = rows
    first = {g: min(ds) for g, ds in doc_sets.items()}
    kept = {g for g, ds in doc_sets.items() if 2 <= len(ds) <= DF_CAP}
    expected = {}
    for doc_id, rows in occ.items():
        covered: set[int] = set()
        grams: set[str] = set()
        for pos, gram in rows:
            if gram in kept and doc_id > first[gram]:
                covered.update(range(pos, pos + K))
                grams.add(gram)
        if covered:
            expected[doc_id] = (
                n_tokens[doc_id],
                len(covered),
                n_tokens[doc_id] - len(covered),
                len(grams),
            )
    return expected


def test_l1_span_scrub_census_matches_python_reimplementation(spark):
    _ensure_loaded()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    expected = _brute_force_scrub(texts)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["tokens_scrubbed"],
            r["tokens_kept"],
            r["n_dup_grams"],
        )
        for r in REGISTRY["l1_span_scrub_census"].fn(spark, SF).collect()
    }
    assert got == expected
    assert len(got) >= 5  # non-degenerate fixture
    # conservation + sanity: scrubbed+kept == total, every scrub >= K
    for n, scrubbed, kept_t, grams in got.values():
        assert scrubbed + kept_t == n
        assert scrubbed >= K and grams >= 1
    # cross-operator consistency: every duplicate side (doc_b) of the
    # pair report must appear in the scrub census — the report and the
    # action agree on who holds duplicated spans
    pair_bs = {
        r["doc_b"]
        for r in REGISTRY["l2_substring_span_pairs"].fn(spark, SF).collect()
    }
    assert pair_bs <= set(got)


def test_l2_substring_span_pairs_matches_python_reimplementation(spark):
    _ensure_loaded()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    expected = _brute_force(texts)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared_grams"],
            r["longest_span_tokens"],
            r["witness_gram"],
        )
        for r in REGISTRY["l2_substring_span_pairs"].fn(spark, SF).collect()
    }
    assert got == expected
    # non-degenerate fixture: pairs exist, and at least one pair shares
    # a span strictly longer than the K-token anchor floor
    assert len(got) >= 5
    assert any(span > K for _, span, _ in got.values())
    assert all(span >= K for _, span, _ in got.values())
