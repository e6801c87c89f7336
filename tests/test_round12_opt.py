"""Focused tests for the round-12 OPTIMIZATION rewrites.

Each optimization was proven output-identical against the DuckDB
oracles and the pre-change golden snapshots; these tests additionally
pin the NEW internals' edge behavior that the fixture cannot exercise:

- the dense/sparse regime split of the token-set similarity family
  (the fixture's 31-word vocabulary always takes the dense branch, so
  the branch EQUIVALENCE and the >64-vocab refusal need synthetic
  corpora);
- the vectorized top-k kernel's boundary semantics (blocks with fewer
  than k non-self candidates — the case where the -inf self-masking
  could diverge from the old remove-then-slice loop).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.functions import text as T
from data_wrangling_openstreetmap_spark.operators.llm import (
    _l2_jaccard_pairs_sparse,
    _vectorized_topk,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dense_token_masks_refuses_large_vocab(spark):
    texts = [" ".join(f"w{i}" for i in range(start, start + 40)) for start in (0, 33)]
    df = _docs(spark, texts)  # vocab = 73 distinct tokens > 64
    assert T.dense_token_masks(df, "doc_id") is None


def test_dense_token_masks_counts_match_distinct_tokens(spark):
    texts = ["a b b a c", "c c c", "a  a\t a", ""]
    df = _docs(spark, texts)
    masks = T.dense_token_masks(df, "doc_id").collect()
    got = {r["doc_id"]: r["__n"] for r in masks}
    # empty doc emits no mask row — mirrors explode in the sparse plan
    assert got == {1: 3, 2: 1, 3: 1}


def test_dense_branch_equals_sparse_branch_jaccard(spark):
    # small closed vocabulary, duplicate tokens, exact/near/disjoint
    # pairs — run BOTH regimes on the same frame and compare sets
    texts = [
        "red green blue yellow",
        "red green blue yellow",          # exact dup of 1
        "red green blue yellow purple",    # jac 4/5
        "purple orange",                    # far
        "red red red green green blue yellow",  # dup tokens → same set as 1
        "cyan",
    ]
    df = _docs(spark, texts)
    masks = T.dense_token_masks(df, "doc_id")
    assert masks is not None
    common = F.bit_count(F.col("a.__mask").bitwiseAND(F.col("b.__mask")))
    jac = common.cast("double") / (F.col("a.__n") + F.col("b.__n") - common)
    dense = (
        T.mask_pair_scan(masks, "doc_id", spark)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.9)
    )
    sparse = _l2_jaccard_pairs_sparse(df)
    d = {(r.doc_a, r.doc_b): r.jaccard for r in dense.collect()}
    s = {(r.doc_a, r.doc_b): r.jaccard for r in sparse.collect()}
    assert d == s
    assert (1, 2) in d and (1, 5) in d and d[(1, 2)] == 1.0


def _loop_topk(q_ids, all_ids, S, k):
    """The r1–r11 per-row loop form, kept here as the reference."""
    out_q, out_n, out_c = [], [], []
    for i in range(S.shape[0]):
        mask = all_ids != q_ids[i]
        cand_ids, cand = all_ids[mask], S[i][mask]
        order = np.lexsort((cand_ids, -cand))[:k]
        out_q.extend([q_ids[i]] * len(order))
        out_n.extend(cand_ids[order])
        out_c.extend(cand[order])
    return (
        np.array(out_q, dtype=np.int64),
        np.array(out_n, dtype=np.int64),
        np.array(out_c, dtype=np.float64),
    )


@pytest.mark.parametrize("n_cand", [3, 5, 6, 9])
def test_vectorized_topk_matches_loop_incl_small_blocks(n_cand):
    # n_cand spans fewer-than-k, exactly-k-with-self, and larger blocks;
    # scores engineered with heavy ties so the (score desc, id asc)
    # tiebreak is load-bearing, and every query id present in the
    # candidate set so self-exclusion fires.
    rng = np.random.RandomState(7)
    k = 5
    q_ids = np.arange(1, 8, dtype=np.int64)
    all_ids = np.arange(1, n_cand + 1, dtype=np.int64)  # overlaps q_ids
    S = np.round(rng.choice([0.1, 0.5, 0.9], size=(len(q_ids), n_cand)), 6)
    got = _vectorized_topk(q_ids, all_ids, S.copy(), k)
    want = _loop_topk(q_ids, all_ids, S, k)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
