"""Property tests for the exact-substring span-dedup family
(VERDICT r11 §Next 4): the operators were fixture-tuned
(K = 8 anchor width, df-cap = 50), so this module plants ADVERSARIAL
corpora that sit exactly on those knobs and runs BOTH engines
(the driver-strict parity check) plus semantic assertions the fixture
could never exercise:

- cap saturation: a K-gram in df-cap + 1 documents must vanish from
  the pair report AND the scrub (boilerplate never scrubs);
- exact-cap boundary: df == cap keeps all C(cap, 2) pairs;
- K boundary: a shared run of exactly K tokens is one anchor / span K;
  a shared run of K − 1 tokens is invisible;
- multi-span pairs, long-run span arithmetic (run + K − 1);
- periodic self-similar documents (the Lee-et-al pathological case:
  one token repeated — every in-doc position anchors the same gram);
- a seeded random small-vocabulary corpus for blind cross-engine
  parity where shared grams are dense and overlapping.
"""

from __future__ import annotations

import random
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_oracle_parity import _check_one

SPAN_K = 8
DF_CAP = 50
SRC_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mk_sf_dir(tmp_path_factory, name: str, docs: list[tuple[int, str]]) -> str:
    """A driver-shaped sf_dir whose documents table is the planted
    corpus (other tables copied from sf0.001 so oracle view
    registration binds)."""
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


def _doc(doc_id: int, *chunks: list[str]) -> tuple[int, str]:
    toks: list[str] = []
    for c in chunks:
        toks.extend(c)
    return doc_id, " ".join(toks)


def _filler(doc_id: int, n: int) -> list[str]:
    """Doc-unique tokens — can never form a cross-doc shared gram."""
    return [f"f{doc_id}x{i}" for i in range(n)]


@pytest.fixture(scope="module")
def planted_sf(tmp_path_factory):
    docs: list[tuple[int, str]] = []
    # K boundary: docs 1/2 share EXACTLY K contiguous tokens.
    s = _words("s", SPAN_K)
    docs.append(_doc(1, _filler(1, 5), s, _filler(1, 5)[::-1]))
    docs.append(_doc(2, _filler(2, 4), s, _filler(2, 6)[::-1]))
    # Below the floor: docs 3/4 share EXACTLY K-1 contiguous tokens.
    t = _words("t", SPAN_K - 1)
    docs.append(_doc(3, _filler(3, 6), t, _filler(3, 4)[::-1]))
    docs.append(_doc(4, _filler(4, 3), t, _filler(4, 7)[::-1]))
    # Long run: docs 5/6 share 12 contiguous tokens -> span 12,
    # 12 - K + 1 = 5 shared anchors.
    u = _words("u", 12)
    docs.append(_doc(5, _filler(5, 2), u, _filler(5, 2)[::-1]))
    docs.append(_doc(6, _filler(6, 3), u, _filler(6, 1)[::-1]))
    # Two DISJOINT K-spans in one pair: docs 7/8.
    v, w = _words("v", SPAN_K), _words("w", SPAN_K)
    docs.append(_doc(7, v, _filler(7, 5), w))
    docs.append(_doc(8, w, _filler(8, 6), v))
    # Periodic pathology: docs 9/10 are one repeated token.
    docs.append(_doc(9, ["p"] * 10))
    docs.append(_doc(10, ["p"] * 10))
    # Cap saturation: DF_CAP + 1 docs all carry the same K-run.
    b = _words("b", SPAN_K)
    for i in range(DF_CAP + 1):
        docs.append(_doc(100 + i, _filler(100 + i, 3), b))
    # Exact cap boundary: DF_CAP docs all carry the same K-run.
    c = _words("c", SPAN_K)
    for i in range(DF_CAP):
        docs.append(_doc(300 + i, _filler(300 + i, 3), c))
    return _mk_sf_dir(tmp_path_factory, "span_planted", docs)


@pytest.fixture(scope="module")
def random_sf(tmp_path_factory):
    rng = random.Random(0xD12)
    vocab = [f"z{i}" for i in range(5)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 40))))
        for i in range(1, 31)
    ]
    return _mk_sf_dir(tmp_path_factory, "span_random", docs)


def _collect(spark, sf_dir, name):
    from data_wrangling_openstreetmap_spark.registry import REGISTRY

    df = REGISTRY[name].fn(spark, sf_dir)
    return {tuple(r) for r in df.collect()}, df.columns


def test_span_pairs_planted_parity(spark, planted_sf):
    assert _check_one(spark, planted_sf, "l2_substring_span_pairs") is None


def test_span_scrub_planted_parity(spark, planted_sf):
    assert _check_one(spark, planted_sf, "l1_span_scrub_census") is None


def test_incremental_scrub_planted_parity_and_semantics(spark, planted_sf):
    """The round-12 ingestion-time image: arrivals (odd ids) scrub
    against the corpus (even ids) ONLY — never against each other."""
    assert _check_one(spark, planted_sf, "l1_incremental_span_scrub") is None
    rows, cols = _collect(spark, planted_sf, "l1_incremental_span_scrub")
    by_doc = {r[cols.index("doc_id")]: r for r in rows}
    assert all(d % 2 == 1 for d in by_doc), "corpus doc in arrival census"

    def field(doc, col):
        return by_doc[doc][cols.index(col)]

    # Arrival doc 1 shares its K-run with CORPUS doc 2 -> scrubbed,
    # even though doc 1 < doc 2 (no keep-first here: corpus wins).
    assert field(1, "tokens_scrubbed") == SPAN_K
    assert field(1, "n_src_docs") == 1
    # Arrival doc 9 duplicates arrival-side doc... no: 9 is odd and 10
    # is even, so the periodic pair is arrival-vs-corpus: doc 9 is
    # scrubbed whole against corpus doc 10.
    assert field(9, "tokens_scrubbed") == field(9, "n_tokens") == 10
    # Docs 5 (odd, owns the 12-run with corpus doc 6) and 7 (odd,
    # shares both K-spans with corpus doc 8): corpus wins regardless
    # of id order.
    assert field(5, "tokens_scrubbed") == 12
    assert field(7, "tokens_scrubbed") == 2 * SPAN_K
    assert field(7, "n_hit_grams") == 2
    # K-1 sharers stay invisible (3 odd / 4 even share only 7 tokens).
    assert 3 not in by_doc
    # Cap group (101 carriers of the b-run): the CORPUS-side df of the
    # b-gram is ~50... compute it exactly: even ids in [100, 150].
    corpus_b = len([i for i in range(100, 100 + DF_CAP + 1) if i % 2 == 0])
    if corpus_b <= DF_CAP:  # gram stays in the index
        odd_b = [i for i in range(100, 100 + DF_CAP + 1) if i % 2 == 1]
        for d in odd_b:
            assert field(d, "tokens_scrubbed") == SPAN_K
            assert field(d, "n_src_docs") == corpus_b


def test_span_pairs_planted_semantics(spark, planted_sf):
    rows, cols = _collect(spark, planted_sf, "l2_substring_span_pairs")
    by_pair = {
        (r[cols.index("doc_a")], r[cols.index("doc_b")]): r for r in rows
    }

    def field(pair, col):
        return by_pair[pair][cols.index(col)]

    # K boundary: exactly-K share -> one anchor, span K.
    assert field((1, 2), "n_shared_grams") == 1
    assert field((1, 2), "longest_span_tokens") == SPAN_K
    assert field((1, 2), "witness_gram") == " ".join(_words("s", SPAN_K))
    # K-1 share is invisible.
    assert (3, 4) not in by_pair
    # Long run: span 12, 5 anchors.
    assert field((5, 6), "longest_span_tokens") == 12
    assert field((5, 6), "n_shared_grams") == 12 - SPAN_K + 1
    # Two disjoint K-spans: 2 anchors, longest still K.
    assert field((7, 8), "n_shared_grams") == 2
    assert field((7, 8), "longest_span_tokens") == SPAN_K
    # Periodic docs: the single gram 'p'*K anchors at every in-doc
    # position; the main diagonal carries a 3-run -> span 10 (the
    # whole doc), and there is exactly ONE distinct gram.
    assert field((9, 10), "n_shared_grams") == 1
    assert field((9, 10), "longest_span_tokens") == 10
    # Cap saturation: df = cap+1 docs sharing the b-run produce NO pair.
    saturated = [p for p in by_pair if 100 <= p[0] <= 100 + DF_CAP]
    assert saturated == []
    # Exact cap: df = cap keeps every pair among the 50 carriers.
    boundary = [p for p in by_pair if 300 <= p[0] <= 300 + DF_CAP]
    assert len(boundary) == DF_CAP * (DF_CAP - 1) // 2
    # and nothing else leaked.
    assert len(by_pair) == 4 + len(boundary)


def test_span_scrub_planted_semantics(spark, planted_sf):
    rows, cols = _collect(spark, planted_sf, "l1_span_scrub_census")
    by_doc = {r[cols.index("doc_id")]: r for r in rows}

    def field(doc, col):
        return by_doc[doc][cols.index(col)]

    # Keep-first: the min-doc_id owner of each gram is never scrubbed.
    for owner in (1, 3, 5, 7, 9, 300):
        assert owner not in by_doc, f"span owner {owner} was scrubbed"
    # Doc 2 loses exactly the K shared positions.
    assert field(2, "tokens_scrubbed") == SPAN_K
    assert field(2, "tokens_kept") == field(2, "n_tokens") - SPAN_K
    # K-1 sharers are untouched.
    assert 4 not in by_doc
    # Doc 6 loses the full 12-token run.
    assert field(6, "tokens_scrubbed") == 12
    # Doc 8 carries BOTH spans of the (7, 8) pair -> 2K positions, and
    # doc 7 owns both grams (7 < 8) so it keeps everything.
    assert field(8, "tokens_scrubbed") == 2 * SPAN_K
    assert field(8, "n_dup_grams") == 2
    # Periodic doc 10 is scrubbed WHOLE (every position covered).
    assert field(10, "tokens_scrubbed") == field(10, "n_tokens") == 10
    assert field(10, "tokens_kept") == 0
    # Cap saturation: none of the df = cap+1 carriers is scrubbed.
    assert not any(100 <= d <= 100 + DF_CAP for d in by_doc)
    # Exact cap: every non-first carrier loses exactly the K-run.
    for i in range(1, DF_CAP):
        assert field(300 + i, "tokens_scrubbed") == SPAN_K
    # Scrubbed token mass == DISTINCT covered positions, recomputed
    # independently in DuckDB from the raw corpus (not via the oracle).
    con = duckdb.connect()
    total = con.execute(
        f"""
        WITH t AS (
          SELECT doc_id,
                 string_split(trim(text), ' ') AS toks
          FROM read_parquet('{planted_sf}/documents.parquet')),
        g AS (
          SELECT doc_id, i AS pos,
                 array_to_string(toks[i:i + {SPAN_K} - 1], ' ') AS gram
          FROM t, LATERAL unnest(generate_series(1, len(toks) - {SPAN_K} + 1)) AS u(i)
          WHERE len(toks) >= {SPAN_K}),
        st AS (SELECT gram, MIN(doc_id) AS fd, COUNT(DISTINCT doc_id) AS nd
               FROM g GROUP BY gram),
        dup AS (SELECT g.* FROM g JOIN st USING (gram)
                WHERE nd BETWEEN 2 AND {DF_CAP} AND doc_id > fd),
        cov AS (SELECT DISTINCT doc_id,
                       unnest(generate_series(pos, pos + {SPAN_K} - 1)) AS tk
                FROM dup)
        SELECT COUNT(*) FROM cov
        """
    ).fetchone()[0]
    con.close()
    assert sum(field(d, "tokens_scrubbed") for d in by_doc) == total


def test_incremental_scrub_streaming_image(spark, planted_sf, tmp_path):
    """The operator's docstring claims the ingestion-time scrub 'joins
    stream-static against the anchor index (exactly the st6 shape under
    readStream)' — this proves it: the arriving snapshot (odd ids)
    replays as a file-source stream in 3 micro-batches, grams explode
    STATELESSLY, the stream-static join hits the batch-built index, and
    ONE stateful complete-mode aggregation per doc (collect_set sizes —
    no chained stateful ops, the Spark 4.1 dedup→agg trap) reproduces
    the batch census exactly."""
    from pyspark.sql import functions as F

    from data_wrangling_openstreetmap_spark.functions import text as T
    from data_wrangling_openstreetmap_spark.operators.llm import (
        _SPAN_DF_CAP,
        _SPAN_K,
    )
    from data_wrangling_openstreetmap_spark.registry import REGISTRY
    from data_wrangling_openstreetmap_spark.streaming.replay import (
        run_to_memory,
        write_ordered_chunks,
    )

    docs = spark.read.parquet(f"{planted_sf}/documents.parquet")

    def grams(df):
        toks = df.select(
            "doc_id", T.tokens(F.col("text")).alias("toks")
        ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
        return (
            toks.filter(F.col("n_tokens") >= _SPAN_K)
            .select(
                "doc_id",
                "n_tokens",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(1), F.col("n_tokens") - _SPAN_K + 1),
                        lambda i: F.array_join(
                            F.slice(F.col("toks"), i, _SPAN_K), " "
                        ),
                    )
                ).alias("pos0", "gram"),
            )
            .select(
                "doc_id", "n_tokens", (F.col("pos0") + 1).alias("pos"), "gram"
            )
        )

    # Static side: the (gram, src_doc) anchor index with the df-cap.
    corp_g = grams(docs.filter(F.col("doc_id") % 2 == 0))
    kept = (
        corp_g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") <= _SPAN_DF_CAP)
        .select("gram")
    )
    idx = (
        corp_g.select(F.col("doc_id").alias("src_doc"), "gram")
        .distinct()
        .join(kept, "gram")
    )

    # Stream side: arrivals replayed as 3 file chunks.
    replay = str(tmp_path / "doc_replay")
    rows = docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").collect()
    per = (len(rows) + 2) // 3
    chunks = [
        spark.createDataFrame(rows[c * per : (c + 1) * per], docs.schema)
        for c in range(3)
    ]
    write_ordered_chunks(chunks, replay)

    def census(stream_docs):
        hit = grams(stream_docs).join(idx, "gram")  # stream-static
        tk = hit.select(
            "doc_id",
            "n_tokens",
            "gram",
            "src_doc",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + _SPAN_K - 1)
            ).alias("tk"),
        )
        return tk.groupBy("doc_id").agg(
            F.max("n_tokens").cast("bigint").alias("n_tokens"),
            F.size(F.collect_set("tk")).cast("bigint").alias("tokens_scrubbed"),
            (F.max("n_tokens") - F.size(F.collect_set("tk")))
            .cast("bigint")
            .alias("tokens_kept"),
            F.size(F.collect_set("gram")).cast("bigint").alias("n_hit_grams"),
            F.size(F.collect_set("src_doc")).cast("bigint").alias("n_src_docs"),
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    run_to_memory(stream, census, "sink_incr_scrub", output_mode="complete")
    got = sorted(tuple(r) for r in spark.table("sink_incr_scrub").collect())
    want = sorted(
        tuple(r)
        for r in REGISTRY["l1_incremental_span_scrub"]
        .fn(spark, planted_sf)
        .collect()
    )
    assert got == want


def test_span_family_random_corpus_parity(spark, random_sf):
    """Dense overlapping shared grams from a 5-token vocabulary:
    every diagonal/island/dedup edge case the planted corpus spells
    out individually occurs here at once — blind cross-engine check."""
    assert _check_one(spark, random_sf, "l2_substring_span_pairs") is None
    assert _check_one(spark, random_sf, "l1_span_scrub_census") is None
    assert _check_one(spark, random_sf, "l1_incremental_span_scrub") is None
