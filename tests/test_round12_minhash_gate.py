"""Planted-corpus tests for l2_incremental_minhash_dedup — the
ingestion-time near-dup admission gate (round 12). The LSH family is
FIXED (the oracle-exact 16-hash / 4-band family), so every outcome
below is deterministic; the planted corpus sits exactly on the
operator's knobs:

- exact-dup arrival → guaranteed candidate (identical text ⇒ identical
  band keys), Jaccard ppm = 1_000_000, is_dup = 1;
- arrival-vs-arrival duplicates are INVISIBLE (the gate checks
  arrivals against the kept corpus only — the within-batch job is
  l2_minhash_lsh / l1_exact_dedup);
- bucket-cap saturation: cap+1 identical corpus docs kill their
  buckets, so even an IDENTICAL arrival is not flagged (boilerplate
  shells must not gate admissions);
- exact-cap boundary: cap identical corpus docs keep their buckets —
  n_candidates = cap, best_match = min corpus id;
- a verified NEAR dup above threshold (superset text: 18/19 shingles,
  ppm 947_368) and a verified candidate BELOW threshold (18/28
  shingles, ppm 642_857, is_dup = 0 — LSH recalled it via one band,
  the exact-Jaccard verify rejected it);
- a random dense-overlap corpus for blind cross-engine parity;
- the docstring's streaming claim is PROVEN: arrivals replay as a
  3-micro-batch file stream against the batch-built band index +
  corpus shingle-set arrays, fully stateless per row (array_intersect
  carries the arrival's shingles IN the row) up to ONE complete-mode
  aggregation — no chained stateful ops (the Spark 4.1 trap).
"""

from __future__ import annotations

import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.operators.llm import _MH_BUCKET_CAP
from tests.test_oracle_parity import _check_one

SRC_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
CAP = _MH_BUCKET_CAP  # the planted cap-boundary groups sit exactly on it


def _mk_sf_dir(tmp_path_factory, name, docs):
    d = tmp_path_factory.mktemp(name)
    for t in TABLES:
        shutil.copy(f"{SRC_SF}/{t}.parquet", d / f"{t}.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["planted"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def gate_sf(tmp_path_factory):
    docs = []
    # exact dup: arrival 1 == corpus 2
    a = " ".join(_words("a", 10))
    docs += [(1, a), (2, a)]
    # arrival-vs-arrival duplicates: 3 == 5, no corpus twin
    m = " ".join(_words("m", 10))
    docs += [(3, m), (5, m)]
    # unique arrival / unique corpus: never surface
    docs += [(7, " ".join(_words("q", 12))), (4, " ".join(_words("r", 12)))]
    # near dup ABOVE threshold: arrival 9 = corpus 8's 20 tokens + one
    # extra -> shingle sets 18 shared / 19 union (ppm 947368)
    n = _words("n", 20)
    docs += [(8, " ".join(n)), (9, " ".join(n + ["extraxyz"]))]
    # candidate BELOW threshold: arrival 13 = corpus 8's 20 tokens +
    # ten x0y* extras -> 18/28 (ppm 642857 < 0.7); collides with
    # corpus 8 in exactly one band under the fixed hash family
    # (verified against a pure-Python replica of the oracle family)
    docs += [(13, " ".join(n + [f"x0y{j}" for j in range(10)]))]
    # an LSH miss: arrival 11 shares only 8 of 16 tokens with corpus 10
    # (shingle Jaccard ~1/3) — no band collides, correctly absent
    docs += [
        (10, " ".join(_words("s", 16))),
        (11, " ".join(_words("s", 8) + _words("u", 8))),
    ]
    # bucket-cap saturation: CAP+1 identical corpus docs + identical
    # arrival 201
    b = " ".join(_words("b", 10))
    docs += [(200 + 2 * i, b) for i in range(CAP + 1)] + [(201, b)]
    # exact-cap boundary: CAP identical corpus docs + identical
    # arrival 401
    c = " ".join(_words("c", 10))
    docs += [(400 + 2 * i, c) for i in range(CAP)] + [(401, c)]
    return _mk_sf_dir(tmp_path_factory, "mh_gate_planted", docs)


@pytest.fixture(scope="module")
def gate_random_sf(tmp_path_factory):
    # dense overlap: tiny vocabulary, so shingle sets intersect heavily
    # and several band buckets hold many docs (cap interplay included)
    rng = random.Random(0xD12B)
    vocab = [f"z{i}" for i in range(6)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
        for i in range(1, 61)
    ]
    return _mk_sf_dir(tmp_path_factory, "mh_gate_random", docs)


def test_gate_planted_parity(spark, gate_sf):
    assert _check_one(spark, gate_sf, "l2_incremental_minhash_dedup") is None


def test_gate_random_parity(spark, gate_random_sf):
    assert (
        _check_one(spark, gate_random_sf, "l2_incremental_minhash_dedup")
        is None
    )


def test_gate_planted_semantics(spark, gate_sf):
    from data_wrangling_openstreetmap_spark.registry import REGISTRY

    rows = REGISTRY["l2_incremental_minhash_dedup"].fn(spark, gate_sf).collect()
    by_doc = {r.doc_id: r for r in rows}
    # output is arrivals only, and exactly the recalled ones
    assert sorted(by_doc) == [1, 9, 13, 401]
    # exact dup: guaranteed recall, exact ppm, flagged
    r1 = by_doc[1]
    assert (r1.n_candidates, r1.best_match, r1.best_jaccard_ppm, r1.is_dup) == (
        1, 2, 1_000_000, 1,
    )
    # near dup above threshold: 18 shared / 19 union shingles
    r9 = by_doc[9]
    assert (r9.best_match, r9.best_jaccard_ppm, r9.is_dup) == (8, 947_368, 1)
    # recalled candidate REJECTED by the exact verify: 18/28 < 0.7
    r13 = by_doc[13]
    assert (r13.best_match, r13.best_jaccard_ppm, r13.is_dup) == (8, 642_857, 0)
    # exact-cap boundary: all CAP corpus twins are candidates; min id
    # wins the (equal-Jaccard) tiebreak
    r401 = by_doc[401]
    assert (
        r401.n_candidates,
        r401.best_match,
        r401.best_jaccard_ppm,
        r401.is_dup,
    ) == (CAP, 400, 1_000_000, 1)
    # invisible by design: arrival-arrival dups (3, 5), the unique
    # arrival (7), the LSH miss (11), and the cap-saturated arrival
    # (201 — its corpus twins are boilerplate, buckets dropped)


def test_gate_streaming_image(spark, gate_sf, tmp_path):
    """The operator's docstring claims an arriving batch 'computes
    signatures map-side and joins stream-static against the persisted
    band index' — this proves it. Static side: the capped (band, key,
    cand_doc) index plus per-corpus-doc shingle-set ARRAYS. Stream
    side: arrivals replay as a 3-micro-batch file stream; band keys
    and the arrival's own shingle set are computed STATELESSLY per
    row, candidates come from the stream-static band join, and
    common/union are per-row array_intersect arithmetic — so ONE
    complete-mode aggregation (collect_set + max-struct) yields the
    gate's exact output."""
    from data_wrangling_openstreetmap_spark.functions import text as T
    from data_wrangling_openstreetmap_spark.operators.llm import (
        _MH_BUCKET_CAP,
        _mh_banded,
    )
    from data_wrangling_openstreetmap_spark.registry import REGISTRY
    from data_wrangling_openstreetmap_spark.streaming.replay import (
        run_to_memory,
        write_ordered_chunks,
    )

    docs = spark.read.parquet(f"{gate_sf}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)

    # Static artifacts, built once (at 100 TB: persisted, appended on
    # admission): the capped band index joined to corpus shingle sets.
    corp_banded = _mh_banded(corpus)
    live = (
        corp_banded.groupBy("band", "key")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") <= _MH_BUCKET_CAP)
        .select("band", "key")
    )
    corp_sets = corpus.select(
        F.col("doc_id").alias("cand_doc"),
        F.array_distinct(T.shingles(F.col("text"), k=3)).alias("c_shs"),
    )
    index = (
        corp_banded.join(live, ["band", "key"])
        .select("band", "key", F.col("doc_id").alias("cand_doc"))
        .join(corp_sets, "cand_doc")
    )

    replay = str(tmp_path / "gate_replay")
    rows = docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").collect()
    per = (len(rows) + 2) // 3
    chunks = [
        spark.createDataFrame(rows[i * per : (i + 1) * per], docs.schema)
        for i in range(3)
    ]
    write_ordered_chunks(chunks, replay)

    def gate(stream_docs):
        arr = stream_docs.select(
            "doc_id",
            "text",
            F.array_distinct(T.shingles(F.col("text"), k=3)).alias("a_shs"),
        )
        # a_shs rides the banding projection — re-attaching it by
        # doc_id would be a stream-stream self-join (unsupported in
        # complete mode), which is exactly why _mh_banded grew `carry`
        banded = _mh_banded(arr, carry=("a_shs",))
        hit = banded.join(index, ["band", "key"])  # stream-static
        scored = hit.select(
            "doc_id",
            "cand_doc",
            F.size(F.array_intersect("a_shs", "c_shs")).cast("long").alias(
                "common"
            ),
            (
                F.size("a_shs")
                + F.size("c_shs")
                - F.size(F.array_intersect("a_shs", "c_shs"))
            )
            .cast("long")
            .alias("u"),
        ).withColumn("ppb", F.expr("(1000000000 * common) DIV u"))
        best = F.max(
            F.struct(
                F.col("ppb"),
                (-F.col("cand_doc")).alias("neg_cand"),
                F.col("cand_doc"),
                F.col("common"),
                F.col("u"),
            )
        ).alias("best")
        agg = scored.groupBy("doc_id").agg(
            F.size(F.collect_set("cand_doc")).cast("bigint").alias(
                "n_candidates"
            ),
            best,
        )
        return agg.select(
            "doc_id",
            "n_candidates",
            F.col("best.cand_doc").alias("best_match"),
            F.expr(
                "CAST((1000000 * best.common) DIV best.u AS BIGINT)"
            ).alias("best_jaccard_ppm"),
            (F.lit(10) * F.col("best.common") >= F.lit(7) * F.col("best.u"))
            .cast("int")
            .alias("is_dup"),
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(stream, gate, "sink_mh_gate", output_mode="complete")
    got = sorted(tuple(r) for r in spark.table("sink_mh_gate").collect())
    want = sorted(
        tuple(r)
        for r in REGISTRY["l2_incremental_minhash_dedup"]
        .fn(spark, gate_sf)
        .collect()
    )
    assert got == want
