"""LLM-data-pipeline operators (SURVEY.md §2.10 L1–L6).

Dedup (exact, token-set fingerprint, Jaccard, MinHash-LSH, SimHash,
embedding-cosine), similarity search (exact top-k + LSH-bucketed ANN),
text analysis (stats, word frequency, quality scoring, language ID),
and embedding math (norms, centroids) over the `documents` and
`embeddings` tables.

Every graded query compiles to built-in Column expressions (split /
higher-order array functions / xxhash64) — zero Python in the hot path,
so each text operator is a map-side projection that scales linearly and
the only shuffles are the explicit groupBy/join keys documented per
query. The MinHash/SimHash/LSH variants are the 100 TB path for what
the exact O(n²) forms compute at test scale; both are registered so the
oracle grades the exact form and tests cross-check the approximate one
against it.

Determinism: integer-ratio math (Jaccard, quality) is IEEE-exact on
both engines; float aggregates (cosine, centroids) are rounded to 6
decimals on BOTH sides; every top-k orders with a unique id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V
from ..io import load_table
from ..registry import register
from ._helpers import ckpt, iter_ckpt, spread

# DuckDB expression for the same token array Spark's T.tokens() builds.
_ORACLE_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x != '')"
_ORACLE_DTOKS = f"list_distinct({_ORACLE_TOKS})"


# ---------------------------------------------------------------------------
# L1 — exact dedup: drop duplicate texts keeping the min doc_id.
# ---------------------------------------------------------------------------

_L1_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""


@register("l1_exact_dedup", oracle=_L1_ORACLE, tags=("L1",))
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup, keep-min-doc_id (deterministic, unlike
    dropDuplicates whose survivor is partition-order dependent).

    Scale: one shuffle hash-partitioned by `text` (at 100 TB, by
    xxhash64(text) to keep shuffle keys narrow); each duplicate group is
    colocated so the window never spills across executors. The sf0.1
    fixture's 8 planted duplicate pairs collapse; smaller SFs are a
    no-op that must still hash-match (FIXTURES.md).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# L2a — token-set fingerprint dedup: docs with identical distinct-token
# sets (the canonical-key form of near-dup detection).
# ---------------------------------------------------------------------------

_L2_FPRINT_ORACLE = f"""
SELECT
  array_to_string(list_sort({_ORACLE_DTOKS}), ' ') AS tokenset_key,
  COUNT(*) AS n_docs,
  MIN(doc_id) AS min_doc_id
FROM documents
GROUP BY tokenset_key
HAVING COUNT(*) > 1
"""


@register("l2_fingerprint_dupsets", oracle=_L2_FPRINT_ORACLE, tags=("L2", "L4"))
def l2_fingerprint_dupsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-set detection by canonical token-set fingerprint:
    groups of documents whose sorted distinct-token strings coincide.

    Scale: group key is the canonical string here (oracle-comparable);
    the production form groups by T.fingerprint64 (xxhash64 of the same
    key) so the shuffle carries 8 bytes per row instead of the text.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(T.token_set_key(F.col("text")).alias("tokenset_key"), "doc_id")
        .groupBy("tokenset_key")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# L2b — n-gram/token Jaccard near-dup pair join, inverted-index style.
# ---------------------------------------------------------------------------

_L2_JACCARD_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, {_ORACLE_DTOKS} AS ts FROM documents
)
SELECT
  a.doc_id AS doc_a,
  b.doc_id AS doc_b,
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
    / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE jaccard >= 0.9
"""


@register("l2_jaccard_pairs", oracle=_L2_JACCARD_ORACLE, tags=("L2", "J8"))
def l2_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by distinct-token Jaccard ≥ 0.9. Two exact
    regimes, picked by a bounded vocabulary probe
    (T.dense_token_masks):

    DENSE (global vocab ≤ 64 — this fixture's 31-word synthetic corpus
    at every SF): each doc's token set folds into one BIGINT mask,
    |A∩B| = bit_count(a & b), and the n²/2 pairs evaluate as a
    broadcast pair scan of narrow mask rows. The r1–r11 inverted-index
    form degenerated here — every token bucket held ~all docs, so it
    generated the SAME Ω(n²) pairs ~31× over (~190M intermediate rows,
    148 s at sf0.1) and paid a pair-count shuffle to collapse them;
    the mask scan is the identical result at one AND+POPCOUNT per pair
    (optimization r12, ~37×).

    SPARSE (real zipfian corpora): the inverted-index join — explode
    tokens → self-join on token → count common per pair — never the
    O(n²) cross product; hot tokens df-cap (they can't distinguish
    near-dups) or route to the registered MinHash-LSH variant.
    Jaccard is exact integer-ratio math in both regimes, so both
    engines produce bit-identical doubles — no rounding needed
    (branch equivalence test: tests/test_round12_opt.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    masks = T.dense_token_masks(docs, "doc_id")
    if masks is None:
        return _l2_jaccard_pairs_sparse(docs)
    common = F.bit_count(F.col("a.__mask").bitwiseAND(F.col("b.__mask")))
    jac = common.cast("double") / (F.col("a.__n") + F.col("b.__n") - common)
    return (
        T.mask_pair_scan(masks, "doc_id", spark)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.9)
    )


def _l2_jaccard_pairs_sparse(docs: DataFrame) -> DataFrame:
    """Inverted-index regime of l2_jaccard_pairs (see its docstring)."""
    toks = docs.select(
        F.col("doc_id"),
        F.size(T.distinct_tokens(F.col("text"))).alias("n_toks"),
        F.explode(T.distinct_tokens(F.col("text"))).alias("tok"),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_toks").alias("na"),
            F.col("b.n_toks").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.9)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# L2b' — character n-gram Jaccard (sub-word near-dup: robust to word
# reordering and boundary noise that token-level Jaccard misses).
# ---------------------------------------------------------------------------

_NGRAM_DF_CAP = 25  # grams in more docs than this can't separate near-dups

_CHARGRAMS = (
    "list_distinct(list_transform(generate_series(1, length(text)-2), "
    "i -> substr(text, i, 3)))"
)

_L2_NGRAM_ORACLE = f"""
WITH g0 AS (
  SELECT doc_id, unnest(gs) AS gram FROM (
    SELECT doc_id, {_CHARGRAMS} AS gs FROM documents)
),
dfreq AS (SELECT gram, count(*) AS df FROM g0 GROUP BY gram),
g AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN dfreq USING(gram)
      WHERE df <= {_NGRAM_DF_CAP}),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY da, db
)
SELECT da AS doc_a, db AS doc_b,
       CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = da
JOIN sizes sb ON sb.doc_id = db
WHERE jaccard >= 0.8
"""


@register("l2_ngram_jaccard", oracle=_L2_NGRAM_ORACLE, tags=("L2", "J8", "F5"))
def l2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by DISCRIMINATIVE character-trigram Jaccard ≥ 0.8:
    grams appearing in more than {cap} documents are dropped on BOTH
    engines before the inverted-index join — they carry no near-dup
    signal and their df² join blowup is the entire cost of the naive
    formulation (measured: 55 s → sub-second at sf0.01). Jaccard is
    over each document's retained grams; integer-ratio math, no
    rounding needed.

    Scale: the df computation is one cheap groupBy; the cap bounds the
    join's per-gram fan-out at df², making worst-case cost
    |grams|·cap² regardless of corpus size — the standard prefix/df
    filtering trick from similarity-join literature.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.expr("transform(sequence(1, length(text)-2), i -> substring(text, i, 3))")
    )
    g0 = docs.select("doc_id", F.explode(grams).alias("gram"))
    dfreq = g0.groupBy("gram").agg(F.count("*").alias("df"))
    g = g0.join(
        F.broadcast(dfreq.filter(F.col("df") <= _NGRAM_DF_CAP)), "gram"
    ).select("doc_id", "gram")
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = g.alias("a"), g.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("common")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


# ---------------------------------------------------------------------------
# L2c — MinHash + LSH banding candidates (the 100 TB near-dup path).
# ROUND 6 (VERDICT r5 §Next #5): the signature now uses an
# oracle-EXPRESSIBLE universal hash family — a 31-polynomial base hash
# of each shingle mod 2^31-1 (the l4_winnow_fingerprint recipe,
# unicode-codepoint-exact on both engines), seed-varied by 16 affine
# maps (a_i*h + b_i) mod p — so the full shingle → signature → band →
# candidate-pair pipeline is hash-graded against DuckDB, not rows-only.
# The production-grade xxhash64 family remains in functions/text.py
# (minhash_signature / lsh_band_keys) for callers that don't need
# cross-engine reproducibility.
# ---------------------------------------------------------------------------

_MH_P = 2147483647  # 2^31-1, the winnow modulus; a*h fits BIGINT
_MH_A = [12289 + 40503 * i for i in range(16)]
_MH_B = [7919 + 104729 * i for i in range(16)]
_MH_BANDKEY_MULT = 1000003

_MH_BASE_HASH_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, len(s) + 1), j -> CAST(ascii(s[j]) AS BIGINT))), "
    f"(acc, c) -> (acc * 31 + c) % {_MH_P})"
)


def _codepoint_fold(s):
    """Spark image of ``_MH_BASE_HASH_SQL``: in-order codepoint fold
    (acc*31 + cp) mod 2^31-1 over a string column. Codepoint-exact on
    both engines including astral-plane text (Spark 4 ascii() returns
    the full code point; split(s,'') keeps surrogate pairs whole —
    test_minhash_lsh_non_bmp_parity_with_oracle). Shared by
    l2_minhash_lsh (per-shingle) and l4_token_counts (fingerprint).
    O(len) JVM-side: splits to a char array ONCE then folds (the
    substr-in-HOF form is O(len²) — CLAUDE.md gotcha)."""
    return F.aggregate(
        F.filter(F.split(s, ""), lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % _MH_P,
    )


def _mh_band_key_sql(b: int) -> str:
    expr = str(b)
    for r in range(4):
        expr = f"(({expr}) * {_MH_BANDKEY_MULT} + s{4 * b + r}) % {_MH_P}"
    return expr


# --- Composed shingle fold (optimization r13, VERDICT r12 §Next #2) ---
#
# ``_codepoint_fold`` over a k-word shingle string re-walks every
# character of every word k times (each word sits in up to k shingles)
# AND pays the shingle string's construction (array_join) plus a
# per-shingle split back into characters. But the fold is a linear
# recurrence — fold(A ⧺ B) = (fold(A)·31^len(B) + fold(B)) mod p — so
# per-token partial folds compose into every shingle hash EXACTLY:
#
#   h(t₁‥tₖ joined by ' ') = fold over tokens of
#       h' = ((h·31 + 32) mod p · pw(t) + f(t)) mod p      (32 = ' ')
#
# where f(t) is the token's own fold and pw(t) = 31^len(t) mod p. Each
# character is now folded ONCE per document (inside its token), and
# each shingle costs O(k) BIGINT ops with no string building. The
# integer VALUES are identical by the recurrence above (every
# intermediate < 2^63: (p−1)² < 2^62) — the DuckDB oracles keep
# evaluating the plain string fold and the parity suite pins equality
# at three SFs, including astral-plane text (pw counts CODEPOINTS
# because it advances inside the same per-element fold, never via
# UTF-16 length()).
#
# (f, pw) pack into one long — f·2³¹ + pw, both < 2³¹ — so the
# per-character accumulator stays a primitive (a struct accumulator
# allocates per character; measured ~2× slower).

_MH_TWO31 = 2147483648  # 2^31
_MH_MASK31 = 2147483647  # low 31 bits (pw < p = 2^31 − 1 always fits)


def _token_fold_pow(t):
    """Packed (codepoint fold)·2³¹ + (31^len mod p) of one token."""
    return F.aggregate(
        F.filter(F.split(t, ""), lambda ch: ch != ""),
        F.lit(1).cast("long"),  # h = 0, pw = 1
        lambda acc, ch: (
            (F.shiftright(acc, 31) * 31 + F.ascii(ch)) % _MH_P
        )
        * _MH_TWO31
        + (acc.bitwiseAND(F.lit(_MH_MASK31)) * 31) % _MH_P,
    )


def _compose_shingle_hash(tp_slice):
    """fold(array_join(tokens, ' ')) from the tokens' packed partial
    folds — the linear-recurrence composition above. Sentinel −1 marks
    'no token folded yet' (real folds are ≥ 0); an empty token list
    composes to 0 = fold('')."""
    return F.aggregate(
        tp_slice,
        F.lit(-1).cast("long"),
        lambda acc, tp: F.when(acc < 0, F.shiftright(tp, 31)).otherwise(
            (
                ((acc * 31 + 32) % _MH_P)
                * tp.bitwiseAND(F.lit(_MH_MASK31))
                + F.shiftright(tp, 31)
            )
            % _MH_P
        ),
        lambda acc: F.greatest(acc, F.lit(0).cast("long")),
    )


def _token_folds(text):
    """Projection producing the per-token packed partial folds
    (``_token_fold_pow`` over ``T.tokens``). MUST be aliased into its
    own select before ``_shingle_hash_col`` consumes it — see there."""
    return F.transform(T.tokens(text), _token_fold_pow)


def _shingle_hash_col(tp, k: int = 3):
    """array<long> of k-gram shingle folds from a MATERIALIZED
    per-token packed-fold column — value-identical to
    ``F.transform(T.shingles(text, k), _codepoint_fold)`` (equality
    pinned by test_round13_opt and the MinHash parity suite).

    ``tp`` MUST be a projected ATTRIBUTE (``_token_folds`` aliased in a
    parent select), never the transform expression inline: every
    reference from inside the per-shingle lambda re-evaluates an inline
    expression PER SHINGLE INDEX — the substr-in-HOF O(L²) gotcha class
    (memory list) — which re-folds every character of the document
    once per shingle and measured 3–5× SLOWER than the string fold
    this replaces (l2_minhash_lsh 0.94 → 2.94 s warm at sf0.1; caught
    by the r13 same-batch before/after sweep). As an attribute the
    token fold runs once per document and each shingle costs O(k)
    primitive ops."""

    def one(i):
        return _compose_shingle_hash(F.slice(tp, i, k))

    n = F.size(tp)
    return F.when(n <= k, F.array(_compose_shingle_hash(tp))).otherwise(
        F.transform(F.sequence(F.lit(1), n - k + 1), one)
    )


def _mh_banded(docs: DataFrame, carry: tuple = ()) -> DataFrame:
    """(doc_id, *carry, band, key) LSH band rows for the
    oracle-expressible MinHash family (16 hashes, 4 bands × 4 rows) —
    the shared shingle → signature → band-key projection behind
    l2_minhash_lsh and l2_incremental_minhash_dedup. One map-side
    projection, no shuffle: the caller decides what to join on
    (band, key). ``carry`` columns pass through untouched — a
    STREAMING caller needs its payload (e.g. the arrival's shingle
    set) to ride the projection, since re-attaching it by doc_id
    would be a stream-stream self-join."""
    hs = docs.select(
        "doc_id",
        *carry,
        _token_folds(F.col("text")).alias("__tp"),
    ).select(
        "doc_id",
        *carry,
        _shingle_hash_col(F.col("__tp"), k=3).alias("hv"),
    )

    def seeded_min(i: int):
        # NB: a plain `lambda h, i=i:` would NOT work here — F.transform
        # treats a two-argument lambda as (element, index) and binds the
        # element INDEX over the default, silently corrupting the seed.
        a_i, b_i = _MH_A[i], _MH_B[i]
        return F.array_min(
            F.transform(F.col("hv"), lambda h: (F.lit(a_i) * h + F.lit(b_i)) % _MH_P)
        ).alias(f"s{i}")

    sig = hs.select("doc_id", *carry, *[seeded_min(i) for i in range(16)])

    def band_key(b: int):
        expr = F.lit(b).cast("long")
        for r in range(4):
            expr = (expr * _MH_BANDKEY_MULT + F.col(f"s{4 * b + r}")) % _MH_P
        return expr

    return sig.select(
        "doc_id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), band_key(b).alias("key")
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id",
        *carry,
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )


_MINHASH_LSH_ORACLE = f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks) - 1),
                                  i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         END AS shs
  FROM t),
hs AS (
  SELECT doc_id, list_transform(shs, s -> {_MH_BASE_HASH_SQL}) AS hv
  FROM sh),
sig AS (
  SELECT doc_id,
         {", ".join(f"list_min(list_transform(hv, h -> ({_MH_A[i]} * h + {_MH_B[i]}) % {_MH_P})) AS s{i}" for i in range(16))}
  FROM hs),
banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_mh_band_key_sql(b)} AS key FROM sig" for b in range(4))}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


@register("l2_minhash_lsh", oracle=_MINHASH_LSH_ORACLE, tags=("L2",))
def l2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 hashes) → LSH(4 bands × 4 rows) candidate pairs.

    shingle → signature → band keys is one map-side projection; the only
    shuffle groups by (band, key) — candidates meet in buckets, so cost
    is O(n·bands + Σ bucket²) instead of O(n²). Identical texts share
    every band key, so exact-duplicate recall is 1.0 by construction
    (hash-family-independent); the 0.9-Jaccard recall of this
    parameterization is cross-checked in tests against l2_jaccard_pairs.

    Hash family (round 6): base hash = in-order codepoint fold
    (acc*31 + c) mod 2^31-1 per shingle (identical fold on both
    engines — the winnow recipe; codepoint-exact INCLUDING astral-plane
    text: Spark 4's ascii() returns the full code point and split(s,'')
    keeps surrogate pairs whole — proven end-to-end against the DuckDB
    oracle in test_llm_ops.py::test_minhash_lsh_non_bmp_parity_with_oracle,
    ADVICE r6 #2), then h_i = (a_i*h + b_i) mod p over
    16 fixed affine seeds; band key re-folds the band's 4 slots with a
    distinct multiplier. Every intermediate fits BIGINT (a_i·h <
    2^51), so the DuckDB oracle reproduces the exact candidate set.
    """
    banded = _mh_banded(spread(load_table(spark, sf_dir, "documents")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# L2d — SimHash fingerprints (bit-majority over token hashes).
# ---------------------------------------------------------------------------


# Full oracle since round 7 (the minhash/token-counts recipe, third
# application): the signature is re-founded on the oracle-expressible
# 31-poly codepoint fold, seed-varied by TWO affine maps — 62 vote
# lanes (31 bits each) instead of xxhash64's 64. The production
# xxhash64 family stays in functions/text.py (simhash64), still
# exercised by the l2_simhash_invariance contract and the property
# tests; THIS op is the cross-engine-reproducible form.
_SH_A1, _SH_B1 = 48271, 11213
_SH_A2, _SH_B2 = 16807, 104651


def _sh_lane_sql(arr: str, lane_base: int) -> str:
    terms = [
        f"(CASE WHEN 2 * list_sum(list_transform({arr}, h -> (h >> {b}) & 1))"
        f" > len({arr}) THEN (CAST(1 AS BIGINT) << {lane_base + b}) ELSE 0 END)"
        for b in range(31)
    ]
    return " + ".join(terms)


_SIMHASH_ORACLE = f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
h AS MATERIALIZED (
  -- MATERIALIZED: DuckDB inlines plain CTEs per reference, which would
  -- recompute the per-token codepoint fold once per bit expression.
  SELECT doc_id,
         list_transform(toks, s -> ({_SH_A1} * {_MH_BASE_HASH_SQL} + {_SH_B1}) % {_MH_P}) AS a1,
         list_transform(toks, s -> ({_SH_A2} * {_MH_BASE_HASH_SQL} + {_SH_B2}) % {_MH_P}) AS a2
  FROM t)
SELECT doc_id,
       CAST({_sh_lane_sql('a1', 0)} + {_sh_lane_sql('a2', 31)} AS BIGINT)
         AS simhash
FROM h
"""


@register("l2_simhash", oracle=_SIMHASH_ORACLE, tags=("L2",))
def l2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """62-bit SimHash per document: for each bit, occurrence-weighted
    majority vote over all tokens — bit b set iff MORE than half the
    token hashes have bit b set (strict majority; the tie rule is part
    of the graded contract). Hamming neighbors ⇒ near-duplicates;
    identical token multisets ⇒ identical fingerprints (asserted in
    tests, order-invariance by construction since votes sum over the
    multiset). Hash family (round 7): per-token 31-poly codepoint fold
    seed-varied by two affine maps mod 2^31−1 — 31 vote lanes each,
    exactly reproducible in the DuckDB oracle, so the fingerprints are
    value-hash-graded (the xxhash64 production family remains in
    functions/text.py for callers not needing cross-engine
    reproduction; 62 vs 64 bits changes nothing downstream — the
    chunk-bucket join splits whatever width into 4 chunks).

    Scale: pure projection, no shuffle at all — the fold arrays are
    computed ONCE in a projection and the 62 per-bit folds re-read the
    materialized arrays (both engines; the oracle's CTE is MATERIALIZED
    for the same reason). The downstream near-dup join buckets on
    16-bit fingerprint chunks (pigeonhole: hamming ≤ 3 ⇒ at least one
    of 4 chunks identical), same meet-in-bucket shape as MinHash-LSH.
    `spread` (r13): the 62-lane vote projection is the heavy map work
    and the fixture scan is one row group (guide §2.5); the exchange
    moves only (doc_id, text) once.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))

    def lane(seed_a: int, seed_b: int):
        def xf(t):
            return (F.lit(seed_a) * _codepoint_fold(t) + F.lit(seed_b)) % _MH_P

        return xf

    hs = docs.select(
        "doc_id",
        F.transform(T.tokens(F.col("text")), lane(_SH_A1, _SH_B1)).alias("a1"),
        F.transform(T.tokens(F.col("text")), lane(_SH_A2, _SH_B2)).alias("a2"),
    )

    def vote_for_bit(b: int):
        # HOF lambdas must take exactly (acc, x) — no captured defaults
        # (two-arg transform lambdas bind (element, index); CLAUDE.md).
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    simhash = None
    for lane_col, base in (("a1", 0), ("a2", 31)):
        for b in range(31):
            vote = F.aggregate(F.col(lane_col), F.lit(0), vote_for_bit(b))
            bit = (
                F.when(vote > 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            term = F.shiftleft(bit, base + b)
            simhash = term if simhash is None else simhash.bitwiseOR(term)
    return hs.select("doc_id", simhash.alias("simhash"))


# ---------------------------------------------------------------------------
# L2e — embedding-cosine near-dup pairs (vector-space dedup).
# ---------------------------------------------------------------------------

_L2_EMB_ORACLE = """
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b,
  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
"""


@register("l2_embedding_neardup", oracle=_L2_EMB_ORACLE, tags=("L2", "L3", "J8"))
def l2_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4 — sized to
    the fixture, whose max pairwise cosine is ~0.51).

    Optimization r12: the r1–r11 form was the pure-Catalyst pair join
    (BNLJ + 64-element zip_with/aggregate fold per pair — 2M pairs ×
    interpreted HOF lambdas, measured 35.6 s at sf0.1). This is
    exactly q10's 'small index, huge query side' regime, so it now
    rides the same guarded broadcast-matmul kernel: the normalized
    index broadcasts once (size-guarded — fails loudly past
    Q10_INDEX_CAP_ROWS), queries stream through mapInPandas in Arrow
    batches, each batch one BLAS matmul, emitting only upper-triangle
    pairs over the threshold. Scores round to 6 dp — numpy blocked
    summation, Spark's fold and DuckDB's list_cosine_similarity agree
    well past 1e-9 (the q10/l3_cosine_topk_hof shared-oracle
    precedent). Measured 0.35 s warm (~100×), parity-verified at all
    three SFs.

    Scale: past the broadcast cap the threshold query runs on
    l3_ann_lsh buckets (random-hyperplane partitioning) instead —
    registered separately so the exact form stays gradable; the
    pure-Catalyst pairwise formulation survives as
    l3_cosine_topk_hof's documented reference shape.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids_idx = _guarded_index_arrays(e)
    bc = spark.sparkContext.broadcast(ids_idx)

    def neardup_pairs(batches):
        all_ids, idx = bc.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy()
            Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            # upper triangle only (vec_a < vec_b), threshold inline;
            # index-column tiled (r13) so neither the score block nor
            # the emission ever materializes whole per batch
            yield from _neardup_tiles(q_ids, all_ids, Q, idx, 0.4)

    return e.mapInPandas(
        neardup_pairs, "vec_a bigint, vec_b bigint, cosine double"
    )


# ---------------------------------------------------------------------------
# q9 — headline text-analysis stats (L4).
# ---------------------------------------------------------------------------

_Q9_ORACLE = rf"""
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len({_ORACLE_TOKS})) AS BIGINT) AS total_tokens,
  CAST(SUM(len({_ORACLE_TOKS})) AS DOUBLE) / COUNT(*) AS avg_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


@register("q9_text_stats", oracle=_Q9_ORACLE, tags=("L4", "A1", "A3"))
def q9_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: doc count, token totals, average
    tokens per doc, character volume, distinct sources.

    Scale: tokenization is a projection; one low-cardinality shuffle on
    lang with partial aggregation map-side. avg is exact-integer sum ÷
    count → identical doubles on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_toks = docs.withColumn("n_toks", F.size(T.tokens(F.col("text"))))
    return with_toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        (F.sum("n_toks").cast("double") / F.count("*")).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# L4 — word frequency (explode + count, the classic).
# ---------------------------------------------------------------------------

_L4_FREQ_ORACLE = rf"""
SELECT tok, COUNT(*) AS cnt
FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
GROUP BY tok
ORDER BY cnt DESC, tok
LIMIT 20
"""


@register("l4_word_freq", oracle=_L4_FREQ_ORACLE, tags=("L4", "F5", "O2"))
def l4_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by global frequency (tie-broken by token).

    Scale: explode multiplies rows ~50×, but partial aggregation
    collapses each partition to its distinct tokens before the shuffle,
    so the exchange carries |vocab|×|partitions| rows; orderBy+limit
    compiles to TakeOrderedAndProject (no global sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# L4 — quality scoring (length + type-token-ratio heuristic).
# ---------------------------------------------------------------------------

_L4_QUALITY_ORACLE = rf"""
SELECT
  doc_id,
  len({_ORACLE_TOKS}) AS n_tokens,
  len({_ORACLE_DTOKS}) AS n_distinct_tokens,
  LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
    * (CASE WHEN len({_ORACLE_TOKS}) > 0
            THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE) / len({_ORACLE_TOKS})
            ELSE 0.0 END) AS quality
FROM documents
"""


@register("l4_quality_score", oracle=_L4_QUALITY_ORACLE, tags=("L4",))
def l4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristic: length component × type-token
    ratio, in [0,1] (T.quality_score).

    Pure projection (no shuffle); all math is integer-ratio IEEE
    division — bit-identical across engines without rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
        F.size(T.distinct_tokens(F.col("text"))).alias("n_distinct_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
    )


# ---------------------------------------------------------------------------
# L4 — language ID heuristic vs. the labeled lang column.
# ---------------------------------------------------------------------------


def _oracle_lang_hits(lang: str, words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_intersect(list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')), [{arr}]))"


def _lang_id_oracle() -> str:
    hits = {
        lang: _oracle_lang_hits(lang, words) for lang, words in T._STOPWORDS.items()
    }
    # Tie-break mirrors T.lang_id: among max-hit languages the
    # lexicographically LARGEST lang wins → test in reverse-lex order.
    reverse_lex = sorted(hits, reverse=True)
    case = " ".join(
        f"WHEN h_{lang} = best THEN '{lang}'" for lang in reverse_lex
    )
    hit_cols = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    greatest = "GREATEST(" + ", ".join(f"h_{lang}" for lang in sorted(hits)) + ")"
    return f"""
WITH scored AS (
  SELECT lang, {hit_cols} FROM documents
),
picked AS (
  SELECT lang, {greatest} AS best,
         CASE WHEN {greatest} = 0 THEN 'und' {case} END AS lang_pred
  FROM scored
)
SELECT lang, lang_pred, COUNT(*) AS n_docs
FROM picked
GROUP BY lang, lang_pred
"""


@register("l4_lang_id", oracle=_lang_id_oracle(), tags=("L4",))
def l4_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of the stopword-overlap language-ID heuristic
    against the labeled lang column ('und' = no stopword hit — the
    expected outcome on this synthetic word-salad corpus; real-text
    behavior is unit-tested on multilingual fixtures).

    Scale: projection + one tiny shuffle on (lang, lang_pred).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# L4 — token counting, whitespace vs BPE-ish (subword) tokenization.
# ---------------------------------------------------------------------------


# Full oracle since round 7 (VERDICT r6 §Next #4), the minhash recipe
# applied twice: (a) Spark's lookaround-boundary split — which DuckDB's
# RE2 cannot run — is re-stated for the oracle as the equivalent
# EXTRACTION '\w+|[^\w\s]+' (maximal word runs and maximal
# punctuation runs; splitting at every w/W boundary and swallowing
# whitespace produces exactly those runs, and \w and \s are both
# ASCII-only in Java regex AND RE2, so the classes agree); (b) the
# xxhash64 token-set fingerprint — no DuckDB image — becomes the
# oracle-expressible codepoint fold of the SAME canonical token-set
# key. The production xxhash64 family stays in functions/text.py
# (fingerprint64) for callers not needing cross-engine reproduction.
_TOKEN_COUNTS_ORACLE = rf"""
WITH k AS (
  SELECT doc_id, text,
         {_ORACLE_TOKS} AS toks,
         array_to_string(list_sort(list_distinct({_ORACLE_TOKS})), ' ') AS s
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS INT)
         AS bpe_ish_tokens,
       {_MH_BASE_HASH_SQL} AS fingerprint
FROM k
"""


@register("l4_token_counts", oracle=_TOKEN_COUNTS_ORACLE, tags=("L4", "F2"))
def l4_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under two tokenizers — whitespace and a
    BPE-flavored word/punctuation-boundary regex (the training-data
    budget estimator) — plus a 31-poly codepoint-fold fingerprint of the
    canonical token set (sorted distinct tokens; identical token sets ⇒
    identical fingerprint). The Spark side runs the REAL lookaround
    regex; the oracle counts the equivalent '\\w+|[^\\w\\s]+' extraction
    (see _TOKEN_COUNTS_ORACLE for the equivalence argument), so the
    hash grades all three values, not just row counts.

    Scale: pure projection; a real BPE vocab would ride in as a
    broadcast trie with the same shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("ws_tokens"),
        F.size(T.bpe_ish_tokens(F.col("text"))).alias("bpe_ish_tokens"),
        _codepoint_fold(T.token_set_key(F.col("text"))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# L6 — pairwise centroid distances (completes "pairwise distance").
# ---------------------------------------------------------------------------

_L6_DIST_ORACLE = """
WITH per_dim AS (
  SELECT label, i AS dim, ROUND(AVG(embedding[i]::DOUBLE), 6) AS c
  FROM embeddings, generate_series(1, 64) t(i)
  GROUP BY label, i
)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(sqrt(SUM((a.c - b.c) * (a.c - b.c))), 6) AS euclidean
FROM per_dim a JOIN per_dim b ON a.dim = b.dim AND a.label < b.label
GROUP BY label_a, label_b
"""


@register("l6_centroid_distances", oracle=_L6_DIST_ORACLE, tags=("L6", "J8"))
def l6_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance between every pair of label centroids, in the
    exploded (label, dim, value) form: per-dim averages (rounded 6 —
    identical inputs on both engines) join on dim, squared differences
    sum per label pair. |labels|²·d rows total — trivially parallel.

    Scale: the exploded form never materializes vectors driver-side and
    reuses the l6_centroids shuffle shape; for millions of centroids
    this becomes the q10 broadcast-matmul instead.
    """
    e = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )
    a, b = per_dim.alias("a"), per_dim.alias("b")
    diff = F.col("a.c") - F.col("b.c")
    return (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(F.round(F.sqrt(F.sum(diff * diff)), 6).alias("euclidean"))
    )


# ---------------------------------------------------------------------------
# q10 — headline exact cosine top-k similarity search (L3).
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  a.vec_id AS vec_id,
  b.vec_id AS neighbor_id,
  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
QUALIFY row_number() OVER (
  PARTITION BY a.vec_id
  ORDER BY ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
           b.vec_id
) <= 5
"""


# Hard cap on the broadcast-index regime: past this many index rows the
# driver-side build is a guaranteed OOM at production dims, so the
# operator refuses loudly instead of silently collecting a 100 TB table.
# 4M rows × 64 dims × 8 B ≈ 2 GiB of broadcast — the practical ceiling
# for a per-executor in-memory matmul index.
Q10_INDEX_CAP_ROWS = 4_000_000


def _guarded_index_arrays(e: DataFrame, cap_rows: int = Q10_INDEX_CAP_ROWS):
    """Build the (ids, normalized-matrix) numpy index from an embeddings
    DataFrame, refusing loudly if the table exceeds ``cap_rows``.

    Guard and collect are ONE bounded job: ``limit(cap+1).toArrow()``
    caps driver memory at cap+1 rows regardless of table size
    (LocalLimit short-circuits the scan), then cap+1 arriving rows
    prove the table is over budget and raise. The collect is
    Arrow-columnar: one flat float64 buffer reshaped, no per-row Python
    objects (measured ~4× faster cold than Row collect).
    """
    import numpy as np

    tbl = e.limit(cap_rows + 1).toArrow()
    if tbl.num_rows > cap_rows:
        raise ValueError(
            f"q10_cosine_topk: index side has >{cap_rows} rows — the "
            "broadcast-matmul regime does not scale there. Use "
            "l3_knn_block_matmul (distributed exact), l3_ann_lsh, or "
            "l3_ann_ivf instead."
        )
    n = tbl.num_rows
    ids = tbl.column("vec_id").to_numpy()
    emb = tbl.column("embedding").combine_chunks()
    flat = emb.flatten().to_numpy()
    if n and len(flat) == n * (len(flat) // n) and len(flat) % n == 0:
        mat = flat.reshape(n, len(flat) // n).astype(np.float64)
    else:  # ragged fallback (never hit on fixed-dim fixtures)
        mat = np.array(emb.to_pylist(), dtype=np.float64)
    index = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return np.asarray(ids, dtype=np.int64), index


def _vectorized_topk(q_ids, all_ids, S, k):
    """Per-row top-k of a rounded score matrix by (score desc, id asc),
    excluding self-pairs — ONE vectorized lexsort over the whole matrix
    instead of a Python loop of per-row lexsorts (optimization r12: the
    row loop was ~60% of q10's batch time at sf0.1; identical output —
    the self row is driven to −inf so it can only surface when a block
    holds fewer than k non-self candidates, and the final keep-mask
    drops exactly those, mirroring the old mask-then-sort).

    Returns (query_ids, neighbor_ids, scores) flat arrays.
    """
    import numpy as np

    S = S.copy()
    S[q_ids[:, None] == all_ids[None, :]] = -np.inf
    order = np.lexsort((np.broadcast_to(all_ids, S.shape), -S), axis=1)[:, :k]
    rows = np.repeat(np.arange(S.shape[0]), order.shape[1])
    cols = order.ravel()
    keep = all_ids[cols] != q_ids[rows]
    rows, cols = rows[keep], cols[keep]
    return q_ids[rows], all_ids[cols], S[rows, cols]


# ---------------------------------------------------------------------------
# In-kernel score-matrix tiling (optimization r13, VERDICT r12 §Next #1
# / §What's-wrong #1): no Arrow kernel may materialize an unbounded
# dense score block. The r12 kernels computed ONE B×B (or batch×index)
# float64 matrix per group — fine at sf0.1 where B is a few hundred,
# a guaranteed worker OOM at 100 TB for a hot LSH bucket, a fat IVF
# cell, or a capped-but-large broadcast index (4M rows × 10k-row batch
# = 320 GB of scores). Every matmul now runs in tiles of at most
# _KERNEL_TILE_CELLS score cells (128 MiB of float64); whenever a group
# fits one tile — every group of every fixture SF does — the tile slice
# is a full-array numpy view, so the gemm call and therefore every
# rounded double is BIT-IDENTICAL to the untiled r12 kernel (goldens
# pin this). Multi-tile groups additionally cap what one group may
# RETURN (_KERNEL_PAIR_EMIT_CAP): the all-pairs kernels' output is
# inherently O(B²) rows held in the worker until Arrow ships them, so a
# group that would emit more than the cap fails loudly with routing
# advice instead of silently OOM-killing the executor (the
# _guarded_index_arrays pattern).
# ---------------------------------------------------------------------------

_KERNEL_TILE_CELLS = 4096 * 4096  # ≤ 128 MiB of float64 per score tile

_KERNEL_PAIR_EMIT_CAP = 100_000_000  # pair rows one group may return (~2.4 GB)


def _tile_steps(n_rows: int, n_cols: int):
    """Row ranges [r0, r1) tiling an (n_rows × n_cols) score matrix so
    each tile holds ≤ _KERNEL_TILE_CELLS cells (one range when the whole
    matrix fits — the bit-identity fast path; single-row tiles when
    n_cols alone exceeds the budget)."""
    step = max(1, _KERNEL_TILE_CELLS // max(1, n_cols))
    for r0 in range(0, n_rows, step):
        yield r0, min(n_rows, r0 + step)


def _guard_pair_emit(n_pairs: int, what: str, advice: str):
    if n_pairs > _KERNEL_PAIR_EMIT_CAP:
        raise ValueError(
            f"{what}: one group would emit ~{n_pairs} candidate pairs "
            f"(> {_KERNEL_PAIR_EMIT_CAP}). {advice}"
        )


def _bucket_pair_frame(ids, E, N):
    """All ordered non-self pairs of one LSH bucket with rounded cosine
    = (E·Eᵀ)/outer(N,N), row-tiled (l3_ann_lsh kernel core)."""
    import numpy as np
    import pandas as pd

    B = len(ids)
    _guard_pair_emit(
        B * (B - 1),
        "l3_ann_lsh",
        "This bucket is degenerately hot — add hyperplanes (finer "
        "buckets) or more tables; an all-pairs scan of it cannot fit "
        "one worker.",
    )
    chunks = []
    for r0, r1 in _tile_steps(B, B):
        S = np.round((E[r0:r1] @ E.T) / np.outer(N[r0:r1], N), 6)
        qi, ii = np.nonzero(ids[r0:r1, None] != ids[None, :])
        chunks.append(
            pd.DataFrame(
                {"vec_id": ids[r0 + qi], "neighbor_id": ids[ii], "cosine": S[qi, ii]}
            )
        )
    return pd.concat(chunks, ignore_index=True)


def _cell_pair_frame(q_ids, i_ids, Qu, Iu):
    """All (probe, assignment) non-self pairs of one IVF cell with
    rounded cosine = Qu·Iuᵀ over unit vectors, row-tiled
    (l3_ann_ivf kernel core)."""
    import numpy as np
    import pandas as pd

    _guard_pair_emit(
        len(q_ids) * len(i_ids),
        "l3_ann_ivf",
        "This cell is degenerately fat — raise n_cells (finer "
        "quantizer) or lower nprobe/nassign; its probes×assignments "
        "grid cannot fit one worker.",
    )
    chunks = []
    for r0, r1 in _tile_steps(len(q_ids), len(i_ids)):
        S = np.round(Qu[r0:r1] @ Iu.T, 6)
        qi, ii = np.nonzero(q_ids[r0:r1, None] != i_ids[None, :])
        chunks.append(
            pd.DataFrame(
                {
                    "vec_id": q_ids[r0 + qi],
                    "neighbor_id": i_ids[ii],
                    "cosine": S[qi, ii],
                }
            )
        )
    return pd.concat(chunks, ignore_index=True)


def _semdedup_dropped_frame(ids, E, N, threshold):
    """Ids dropped within one SemDeDup cell: vec y is dropped iff some
    x with x.vec_id < y.vec_id has rounded cosine ≥ threshold —
    computed as a row-tiled (E·Eᵀ)/outer(N,N) scan marking hit columns
    (l2_semdedup kernel core). Output already distinct per group, and
    cells partition the vectors, so no cross-group dedup is needed."""
    import numpy as np
    import pandas as pd

    B = len(ids)
    dropped = np.zeros(B, dtype=bool)
    for r0, r1 in _tile_steps(B, B):
        S = np.round((E[r0:r1] @ E.T) / np.outer(N[r0:r1], N), 6)
        hit = (S >= threshold) & (ids[r0:r1, None] < ids[None, :])
        dropped |= hit.any(axis=0)
    return pd.DataFrame({"vec_id": ids[dropped]})


def _neardup_tiles(q_ids, all_ids, Q, idx, threshold):
    """Upper-triangle (q < i) pairs with rounded cosine ≥ threshold,
    generated one index-column tile at a time (l2_embedding_neardup
    kernel core) — emission streams per tile through mapInPandas, so
    neither the score block NOR the output ever materializes whole."""
    import numpy as np
    import pandas as pd

    for c0, c1 in _tile_steps(idx.shape[0], max(1, len(q_ids))):
        S = np.round(Q @ idx[c0:c1].T, 6)
        qi, ii = np.nonzero(
            (S >= threshold) & (q_ids[:, None] < all_ids[None, c0:c1])
        )
        yield pd.DataFrame(
            {"vec_a": q_ids[qi], "vec_b": all_ids[c0 + ii], "cosine": S[qi, ii]}
        )


def _tiled_topk(q_ids, all_ids, Q, X, k):
    """Top-k by (rounded cosine desc, id asc) of Q·Xᵀ over unit rows,
    excluding self-pairs, never materializing more than one score tile.

    Single-tile inputs (every fixture group/batch) take the exact
    untiled r12 path — one gemm over full-array views + _vectorized_topk
    — so results are bit-identical to the previous kernels. Multi-tile
    inputs fold a running 2k-wide merge: the global top-k is the top-k
    of per-tile top-ks (tiles partition the candidate set; order keys
    and self-masking are per-tile identical), padded with −inf scores /
    sentinel ids that can never outrank a real candidate.

    Returns (query_ids, neighbor_ids, scores) flat arrays.
    """
    import numpy as np

    n_idx = X.shape[0]
    step = max(1, _KERNEL_TILE_CELLS // max(1, len(q_ids)))
    if step >= n_idx:
        S = np.round(Q @ X.T, 6)
        return _vectorized_topk(q_ids, all_ids, S, k)

    sent_id = np.iinfo(np.int64).max  # ties at −inf lose to any real id

    def local_topk_padded(c0, c1):
        S = np.round(Q @ X[c0:c1].T, 6)
        ids_t = all_ids[c0:c1]
        S = S.copy()
        S[q_ids[:, None] == ids_t[None, :]] = -np.inf
        kk = min(k, S.shape[1])
        order = np.lexsort((np.broadcast_to(ids_t, S.shape), -S), axis=1)[:, :kk]
        sc = np.take_along_axis(S, order, axis=1)
        idc = ids_t[order]
        if kk < k:  # pad narrow tiles to k columns
            pad = k - kk
            sc = np.hstack([sc, np.full((sc.shape[0], pad), -np.inf)])
            idc = np.hstack(
                [idc, np.full((idc.shape[0], pad), sent_id, dtype=np.int64)]
            )
        idc = np.where(np.isneginf(sc), sent_id, idc)  # masked self slots
        return sc, idc

    best_s = best_i = None
    for c0 in range(0, n_idx, step):
        c1 = min(n_idx, c0 + step)
        sc, idc = local_topk_padded(c0, c1)
        if best_s is None:
            best_s, best_i = sc, idc
            continue
        cat_s = np.hstack([best_s, sc])
        cat_i = np.hstack([best_i, idc])
        order = np.lexsort((cat_i, -cat_s), axis=1)[:, :k]
        best_s = np.take_along_axis(cat_s, order, axis=1)
        best_i = np.take_along_axis(cat_i, order, axis=1)
    rows = np.repeat(np.arange(best_s.shape[0]), best_s.shape[1])
    flat_s = best_s.ravel()
    flat_i = best_i.ravel()
    keep = ~np.isneginf(flat_s)
    return q_ids[rows[keep]], flat_i[keep], flat_s[keep]


@register("q10_cosine_topk", oracle=_Q10_ORACLE, tags=("L3", "U2", "W2"))
def q10_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN: top-5 cosine neighbors for every embedding, computed
    as a broadcast-index block matmul in Arrow-batched numpy
    (mapInPandas) — the one hot path where a vectorized Pandas UDF
    beats built-in expressions ~40× (measured: 0.9 s vs 35 s cold at
    sf0.1 vs 13.8 s DuckDB).

    Scale: this is the 'small index, huge query side' regime — the
    normalized index matrix broadcasts once (n·d·8 bytes), queries
    stream through executors in Arrow batches, each batch a dense BLAS
    matmul + lexsort. The index build is SIZE-GUARDED
    (``Q10_INDEX_CAP_ROWS``, bounded limit-count probe — never an
    unguarded full-table collect); past the cap the operator fails
    loudly and routes to l3_knn_block_matmul (distributed exact, same
    oracle) or the ANN paths (l3_ann_lsh / l3_ann_ivf).
    Scores round to 6 dp — numpy's blocked summation, Spark's fold,
    and DuckDB's list_cosine_similarity agree well past 1e-9.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids_idx = _guarded_index_arrays(e)
    bc = spark.sparkContext.broadcast(ids_idx)
    k = 5

    def topk(batches):
        import pandas as pd

        all_ids, idx = bc.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy()
            Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            out_q, out_n, out_c = _tiled_topk(q_ids, all_ids, Q, idx, k)
            yield pd.DataFrame(
                {"vec_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    return e.mapInPandas(topk, "vec_id bigint, neighbor_id bigint, cosine double")


@register("l3_cosine_topk_hof", oracle=_Q10_ORACLE, tags=("L3", "J8", "W2"))
def l3_cosine_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact k-NN, all-builtin formulation: self-join + zip_with
    fold dot + window top-k. Norms are precomputed per row (O(n·d)) so
    the pair loop is a dot product only; tie-break on rounded score
    then neighbor id. Kept registered alongside the matmul form as the
    pure-Catalyst reference: O(n²·d) with no Python boundary, and the
    recall oracle for l3_ann_lsh.

    Optimization r13 (VERDICT r12 §Next #6): SYMMETRIC HALVING — the
    join scans a.vec_id < b.vec_id (half the pairs), scores each
    unordered pair ONCE, and mirrors it with a 2-struct explode.
    cos(a,b) is BIT-identical to cos(b,a): the per-element products of
    the zip_with commute (IEEE multiply), the fold visits them in the
    same order, and nrm_a·nrm_b commutes — so every (vec_id, neighbor)
    cosine and every rank is unchanged (goldens + 3-SF oracle parity
    pin it). The cosine is projected to an attribute BEFORE the
    explode so it evaluates once per half-pair (CollapseProject keeps
    a non-cheap alias referenced twice), and the explode takes the
    inline array expression so InferFiltersFromGenerate cannot inline
    anything below it (the l2_bbit_minhash r13 lesson). 35.1 → 19.9 s
    warm at sf0.1 — the remaining cost is the interpreted HOF fold on
    n²/2 pairs, which is this operator's documented point (the
    all-builtin contrast to q10's Arrow kernel); an unrolled fixed-64
    codegen dot was tried and measured 3× SLOWER (98.7 s — the flat
    128-element_at expression never reaches whole-stage codegen under
    the BNLJ), so the fold stays.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(
        V.dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    half = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("ida"),
        F.col("b.vec_id").alias("idb"),
        cos.alias("cosine"),
    )
    pairs = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("ida").alias("vec_id"),
                    F.col("idb").alias("neighbor_id"),
                    F.col("cosine"),
                ),
                F.struct(
                    F.col("idb").alias("vec_id"),
                    F.col("ida").alias("neighbor_id"),
                    F.col("cosine"),
                ),
            )
        ).alias("pr")
    ).select("pr.vec_id", "pr.neighbor_id", "pr.cosine")
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("vec_id", "neighbor_id", "cosine")
    )


@register("l3_knn_block_matmul", oracle=_Q10_ORACLE, tags=("L3", "U3", "W2"))
def l3_knn_block_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact k-NN as a block matrix multiply — the 100 TB
    exact path q10's size guard routes to when the index side outgrows
    a broadcast. NOTHING is ever materialized on the driver.

    Shape: queries hash into QB row-blocks, index into IB col-blocks;
    each side is replicated across the other's block axis (queries ×IB,
    index ×QB — the classic 2-D block matmul, total movement
    n_q·d·IB + n_i·d·QB, minimized at QB/IB ∝ √(n_q/n_i)). A single
    shuffle on (qb, ib) colocates every (query-block, index-block)
    pair; ``applyInPandas`` runs one dense BLAS matmul per cell and
    emits each query's LOCAL top-k within the cell (k rows per query
    per cell, rounded-then-tiebroken exactly like the oracle, so the
    union of per-cell top-ks provably contains the global top-k). A
    final k-per-key window over k·IB candidate rows — partitioned by
    vec_id, never global — picks the answer. At 100 TB, QB·IB grows
    with data so each cell's matrices stay in executor memory; the plan
    shape is unchanged.
    """
    QB = IB = 4
    k = 5
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ib_spine = spark.range(IB).select(F.col("id").cast("int").alias("ib"))
    qb_spine = spark.range(QB).select(F.col("id").cast("int").alias("qb"))
    q_rep = (
        e.withColumn("qb", F.pmod(F.xxhash64("vec_id"), F.lit(QB)).cast("int"))
        .crossJoin(F.broadcast(ib_spine))
        .select("qb", "ib", F.lit("q").alias("side"), "vec_id", "embedding")
    )
    i_rep = (
        e.withColumn("ib", F.pmod(F.xxhash64("vec_id"), F.lit(IB)).cast("int"))
        .crossJoin(F.broadcast(qb_spine))
        .select("qb", "ib", F.lit("i").alias("side"), "vec_id", "embedding")
    )
    tagged = q_rep.unionByName(i_rep)

    def cell_topk(pdf):
        import numpy as np
        import pandas as pd

        q = pdf[pdf["side"] == "q"]
        i = pdf[pdf["side"] == "i"]
        if q.empty or i.empty:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"vec_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
        q_ids = q["vec_id"].to_numpy()
        i_ids = i["vec_id"].to_numpy()
        Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        X = np.stack(i["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        out_q, out_n, out_c = _tiled_topk(q_ids, i_ids, Q, X, k)
        return pd.DataFrame({"vec_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    partials = tagged.groupBy("qb", "ib").applyInPandas(
        cell_topk, "vec_id bigint, neighbor_id bigint, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        partials.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# L3 — LSH-bucketed approximate NN (the scale path for q10).
# ---------------------------------------------------------------------------

def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (builtin LCG — keeps the
    operator dependency-free and reproducible across runs)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


@register("l3_ann_lsh", oracle=None, tags=("L3",))
def l3_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via random-hyperplane LSH with
    OR-amplification: 12 independent hash tables × 4 sign bits (16
    buckets each); candidates meet if they collide in ANY table.

    Scale: replaces q10's O(n²·d) with O(tables · Σ bucket²·d) — at 16
    buckets/table that's ~12/16 = 3/4 the exact cost here but shrinks
    quadratically as buckets grow with n (planes ≈ log2(n/target_bucket);
    the table count buys recall INDEPENDENTLY of the per-table bucket
    count, so at scale the same 12 tables ride finer bucketing).
    Everything up to the bucket self-join is a projection; the join
    shuffles on (table, bucket) — a narrow int pair. Table count tuned
    round 12 (VERDICT r11 §Next 7): 6×4 measured recall@5 0.576
    (sf0.01) / 0.614 (sf0.1); 12×4 measures 0.812 / 0.855 — the ≥ 0.70
    contract floor holds with margin at both SFs. DuckDB can't express
    meet-in-bucket, hence rows-only grading with the exact form as the
    in-repo recall oracle.

    Oracle conversion CLOSED (VERDICT r7 §Next #6): the model is a
    sampled/probabilistic index whose value contract is recall, and
    that contract IS driver-graded via l3_ann_recall_contract.
    """
    e = load_table(spark, sf_dir, "embeddings")
    n_tables, n_planes = 12, 4
    tables = [
        _hyperplanes(n_planes, 64, seed=1000 + t) for t in range(n_tables)
    ]
    bucket_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                F.concat_ws(
                    "",
                    *[
                        F.when(
                            V.dot(F.col("embedding"), F.array(*[F.lit(x) for x in p]))
                            > 0,
                            "1",
                        ).otherwise("0")
                        for p in planes
                    ],
                ).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    e = e.select(
        "vec_id",
        "embedding",
        V.norm(F.col("embedding")).alias("nrm"),
        F.explode(bucket_entries).alias("bk"),
    ).select("vec_id", "embedding", "nrm", "bk.tbl", "bk.bucket")

    # Score each bucket's ordered pairs as ONE dense BLAS matmul per
    # (table, bucket) group (optimization r12): the r1–r11 bucket
    # self-join evaluated ~1.5M pair cosines through interpreted
    # zip_with/aggregate HOF lambdas (~100M element ops — 40 s at
    # sf0.1); the grouped Arrow kernel computes the identical rounded
    # doubles (dot/(nrm_a·nrm_b), JVM-computed norms ride along so the
    # formula matches term for term) in ~3 s. Same narrow
    # (ids, cosine) rows flow to the id-pair min-agg dedup + window.
    def bucket_pairs(pdf):
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        N = pdf["nrm"].to_numpy().astype(np.float64)
        return _bucket_pair_frame(ids, E, N)

    # Collapse multi-table collisions of the same pair on the ID PAIR,
    # not on (ids, cosine): per-group BLAS matmuls of different shapes
    # can in principle differ in the last ulp, and a score within half
    # an ulp of a 0.5e-6 rounding boundary would leave the same pair
    # duplicated with two cosines under DISTINCT (ADVICE r12 #1; on the
    # fixture all copies are value-identical — goldens pin that — so
    # MIN returns the same double DISTINCT kept).
    pairs = (
        e.groupBy("tbl", "bucket")
        .applyInPandas(
            bucket_pairs, "vec_id bigint, neighbor_id bigint, cosine double"
        )
        .groupBy("vec_id", "neighbor_id")
        .agg(F.min("cosine").alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("vec_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# L3 — IVF (inverted-file) approximate NN: the other standard ANN scale
# path (coarse k-means cells + multi-probe), complementing the LSH one.
# ---------------------------------------------------------------------------


@register("l3_ann_ivf", oracle=None, tags=("L3",))
def l3_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via IVF: a coarse k-means
    quantizer (32 cells) trained with pyspark.ml KMeans **on a seeded
    sample**, each index vector assigned to its `nassign`=2 nearest
    cells (multi-assignment — the standard boundary-case fix: a true
    neighbor straddling a cell border is reachable through either
    copy), each query probing its `nprobe`=8 nearest cells; candidates
    meet per cell group — one dense Arrow matmul per cell (optimization
    r12; was an equi-join scoring ~2M pair dots through interpreted HOF
    lambdas, 27 s at sf0.1) — then dedup on the id pair (min-agg,
    ADVICE r12 #1).

    Scale contract (every stage distributed — nothing collects the
    table):
    - quantizer: ``df.sample(seed)`` caps the training set; only the 32
      centroid vectors (32×64 doubles) ever reach the driver, then
      broadcast back as a literal dimension frame;
    - assignment + probes: the 32×64 centroid matrix broadcasts to an
      Arrow kernel that scores a whole batch per numpy pass and ranks
      in-kernel (r13; scores accumulate dimension-by-dimension — the
      exact fold order of the r12 HOF dot, so every double and every
      rank is bit-identical) — a projection, no crossJoin expansion,
      no window exchange, no shuffle of the vectors themselves;
    - candidates: equi-join probes×assignments on cell id — cost
      Σ(probes·assigns per cell) ≤ (nprobe·nassign/n_cells)·n² instead
      of n²; multi-assignment duplicates a pair that meets in two
      shared cells — scored map-side first (identical rounded double
      per copy), then collapsed by a min-agg on the id pair (r13,
      ADVICE r12 #1 — robust to last-ulp gemm variance across cells);
    - top-k: row_number window per query id.
    nprobe/nassign trade cost for recall; round-12 tuning (VERDICT r11
    §Next 7) measured recall@5 vs exact: 16 cells/nprobe 4/nassign 1
    (the prior setting) 0.547 sf0.01 / 0.554 sf0.1; the shipped
    32/8/2 measures 0.830 / 0.818 — ≥ 0.70 with margin at both SFs.

    Oracle conversion CLOSED (VERDICT r7 §Next #6): the quantizer is a
    sampled KMeans model with no DuckDB image; the value contract
    (recall vs exact) is driver-graded via l3_ann_recall_contract.
    Round-8 arrival-order audit: this is the registry's ONE
    layout-dependent query — df.sample's Bernoulli draw depends on
    partition layout, so centroids (hence neighbor sets) vary with
    arrival order while the recall contract stays green under any
    layout (docs/ROUND8_NOTES.md §11).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n_cells, nprobe, nassign, k = 32, 8, 2, 5
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    unit = e.select("vec_id", V.l2_normalize(F.col("embedding")).alias("u"))

    # Coarse quantizer on a seeded half sample (at 100 TB this fraction
    # shrinks to whatever ~10⁵ training vectors cost; the contract is
    # the same: the full table is never collected).
    train = unit.sample(fraction=0.5, seed=7).select(
        array_to_vector("u").alias("features")
    )
    kk = min(n_cells, train.count())
    model = KMeans(k=kk, seed=7, maxIter=8).fit(train)

    # Rank every (vector, centroid) pair by dot product: rank 1 = the
    # vector's home cell, ranks 1..nprobe = the cells it probes.
    # Optimization r13 (VERDICT r12 §Next #5): the r12 form still scored
    # the n×32 centroid crossJoin through the interpreted HOF dot and
    # ranked it with a row_number window (an exchange of n×32 rows each
    # carrying the 64-double vector). The Arrow kernel scores a whole
    # batch against the 32×64 centroid matrix and ranks in-kernel — a
    # pure projection, no crossJoin expansion and no window exchange.
    # BIT-IDENTITY, not just closeness: scores accumulate dimension by
    # dimension (S += u[:,d]·C[d,:]), the exact addition order of
    # V.dot's sequential fold, so every double equals the old plan's
    # and the (score desc, cell asc) ranks cannot move (goldens +
    # recall contract pin it; -0.0 == 0.0 ties fall to the cell key on
    # both engines).
    import numpy as np

    cmat = np.array(
        [[float(x) for x in c] for c in model.clusterCenters()], dtype=np.float64
    )
    bc_c = spark.sparkContext.broadcast(cmat)
    n_rank = min(nprobe, kk)

    def assign_rank(batches):
        import pandas as pd

        C = bc_c.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            U = np.stack(pdf["u"].to_numpy()).astype(np.float64)
            S = np.zeros((n, C.shape[0]), dtype=np.float64)
            for d in range(C.shape[1]):  # sequential fold — see above
                S += U[:, d : d + 1] * C[None, :, d]
            cells_ax = np.arange(C.shape[0], dtype=np.int64)
            order = np.lexsort((np.broadcast_to(cells_ax, S.shape), -S), axis=1)[
                :, :n_rank
            ]
            rows = np.repeat(np.arange(n), n_rank)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[rows],
                    "u": pdf["u"].to_numpy()[rows],
                    "cell": order.ravel().astype(np.int32),
                    "rk": np.tile(np.arange(1, n_rank + 1), n),
                }
            )

    ranked = unit.mapInPandas(
        assign_rank, "vec_id bigint, u array<double>, cell int, rk int"
    )

    # Multi-assignment means one (query, index) pair can meet in up to
    # nassign cells — score FIRST (duplicates recompute the identical
    # rounded double), then collapse on the narrow (ids, cosine) row so
    # the dedup exchange never carries the two 64-double vectors
    # (round-12 self-review: distinct over the vector payload is ~60×
    # the shuffle bytes of the id-pair form). Optimization r12: the
    # per-cell probes×assigns scoring is ONE dense BLAS matmul per
    # cell group (the l3_knn cell kernel) — the r1–r11 equi-join
    # evaluated ~2M pair dots through interpreted HOF lambdas
    # (27 s at sf0.1); identical rounded doubles, same distinct+window.
    # One kernel evaluation feeds both roles: every emitted rank is a
    # probe row ('q', rk ≤ nprobe by construction) and additionally an
    # assignment row ('i') when rk ≤ nassign — the explode replaces the
    # r12 probes/assign union whose two branches each re-derived the
    # scoring (row multiset identical).
    tagged = ranked.select(
        "cell",
        F.explode(
            F.when(
                F.col("rk") <= nassign, F.array(F.lit("q"), F.lit("i"))
            ).otherwise(F.array(F.lit("q")))
        ).alias("side"),
        F.col("vec_id").alias("vid"),
        F.col("u"),
    )

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        q = pdf[pdf["side"] == "q"]
        i = pdf[pdf["side"] == "i"]
        if q.empty or i.empty:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"vec_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
        q_ids = q["vid"].to_numpy()
        i_ids = i["vid"].to_numpy()
        Qu = np.stack(q["u"].to_numpy())
        Iu = np.stack(i["u"].to_numpy())
        return _cell_pair_frame(q_ids, i_ids, Qu, Iu)

    # id-pair dedup instead of DISTINCT over (ids, cosine) — see
    # l3_ann_lsh (ADVICE r12 #1): collapses a multi-assignment copy even
    # if two cells' gemms ever differ in the last rounded ulp.
    pairs = (
        tagged.groupBy("cell")
        .applyInPandas(
            cell_pairs, "vec_id bigint, neighbor_id bigint, cosine double"
        )
        .groupBy("vec_id", "neighbor_id")
        .agg(F.min("cosine").alias("cosine"))
    )
    w_top = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= k)
        .select("vec_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# L5 — multimodal columns flow through relational ops.
# ---------------------------------------------------------------------------

_L5_ORACLE = """
SELECT
  d.lang,
  e.label,
  COUNT(*) AS n,
  ROUND(AVG(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS avg_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.lang, e.label
"""


@register("l5_multimodal_join", oracle=_L5_ORACLE, tags=("L5", "J1"))
def l5_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding columns as first-class relational citizens: join docs
    to their vectors, aggregate a vector expression (L2 norm) per
    (lang, label).

    Scale: array columns ride the shuffle like any other column; the
    norm is computed pre-aggregation (projection), so the groupBy only
    carries a double. avg rounded to 6 dp (f64 fold order).
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select("lang", "label", V.norm(F.col("embedding")).alias("nrm"))
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# L6 — per-label centroids: posexplode → per-dim avg → ordered repack.
# ---------------------------------------------------------------------------

_L6_ORACLE = """
SELECT label, i AS dim, ROUND(AVG(embedding[i]::DOUBLE), 6) AS c
FROM embeddings, generate_series(1, 64) t(i)
GROUP BY label, i
"""


@register("l6_centroids", oracle=_L6_ORACLE, tags=("L6", "A1"))
def l6_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors in long form: explode to
    (label, dim, value), average per dim.

    The graded output is the long (label, dim, c) relation rather than a
    re-packed array column: array-typed output columns crash the
    driver's pandas canonicalizer (round-1 `err`). The array repack
    (array_sort ∘ collect_list, the A8 idiom) lives in a8_collect_list
    and in l6_centroid_distances' consumers; the math here is identical.

    Scale: the explode-shuffle carries (label, dim) keys — 64×|labels|
    groups, perfectly parallel and skew-free. This is the
    shuffle-friendly formulation of columnar mean — no per-partition
    vector accumulation needed. Rounded to 6 dp per dimension on both
    sides.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )


# ---------------------------------------------------------------------------
# L4/L2 — winnowing document fingerprint (true rolling-hash scheme).
# ---------------------------------------------------------------------------

_WINNOW_K = 8  # k-gram width (characters)
_WINNOW_W = 4  # winnowing window (grams)
_WINNOW_MOD = 2147483647
_POW31 = [31**p for p in range(_WINNOW_K - 1, -1, -1)]

_WINNOW_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - {_WINNOW_K} + 2), i ->
           ({" + ".join(f"CAST(ascii(text[i+{j}]) AS BIGINT)*{p}" for j, p in enumerate(_POW31))})
           % {_WINNOW_MOD}) AS grams
  FROM documents WHERE len(text) >= {_WINNOW_K + _WINNOW_W - 1}
)
SELECT doc_id,
       len(grams) AS n_grams,
       unnest(list_distinct(list_transform(
         range(1, len(grams) - {_WINNOW_W} + 2),
         p -> list_min(grams[p:p+{_WINNOW_W - 1}])))) AS fp
FROM g
"""


@register("l4_winnow_fingerprint", oracle=_WINNOW_ORACLE, tags=("L4", "L2", "F5"))
def l4_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint (the MOSS scheme): polynomial rolling hash
    of every 8-char gram, then the minimum of each 4-gram sliding
    window, deduplicated and sorted. Two documents sharing a long-enough
    substring share fingerprint members regardless of position — the
    classic plagiarism/near-dup primitive, here with full oracle parity
    because both engines evaluate the identical base-31 integer
    arithmetic (codepoints agree cross-engine even for the zh docs).
    Graded output is the exploded (doc_id, n_grams, fp) long form — one
    row per distinct fingerprint member — because array-typed output
    columns crash the driver's pandas canonicalizer (round-1 `err`).

    Scale: pure per-row higher-order-function arithmetic — no Python,
    and the one exchange is `spread` (optimization r13: the heavy
    rolling-hash projection sat on the fixture's single-row-group scan,
    so it ran on one task — the r12 single-row-group pattern, guide
    §2.5); at 100 TB, explode the fingerprint and group by member
    to build the candidate-pair index (the winnowed analogue of the
    MinHash band join in l2_minhash_lsh).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")

    # One split to a codepoint array, then O(1) element_at per term:
    # substr(i, 1) re-scans the UTF-8 string from the start (O(i)), so
    # the previous per-gram substr form was O(L²) per document —
    # measured 14.1 s warm for 5 000 docs at sf0.1; this form is 4.3 s
    # (vs DuckDB's 4.7 s on the identical arithmetic).
    cps = F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long"))

    def gram_hash(i: Column) -> Column:
        total = F.lit(0).cast("long")
        for j, p in enumerate(_POW31):
            total = total + F.element_at(F.col("cps"), i + F.lit(j)) * F.lit(p)
        return total % _WINNOW_MOD

    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("cps")) - _WINNOW_K + 1), gram_hash
    )
    docs = (
        docs.filter(F.length(t) >= _WINNOW_K + _WINNOW_W - 1)
        .select("doc_id", cps.alias("cps"))
        .select("doc_id", grams.alias("grams"))
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size(F.col("grams")) - _WINNOW_W + 1),
        lambda p: F.array_min(F.slice(F.col("grams"), p, _WINNOW_W)),
    )
    return docs.select(
        "doc_id",
        F.size(F.col("grams")).alias("n_grams"),
        F.explode(F.array_distinct(wins)).alias("fp"),
    )


# ---------------------------------------------------------------------------
# L4 — Gopher-style repetition filters: duplicate-word fraction and
# top-bigram mass per document, with a keep/drop verdict.
# ---------------------------------------------------------------------------

_REP_ORACLE = f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
tokstats AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct
  FROM t WHERE len(toks) >= 2
),
bg0 AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks)-1),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg0 GROUP BY doc_id, bigram),
bg AS (SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_bigrams
       FROM bgc GROUP BY doc_id)
SELECT tokstats.doc_id,
       n_tokens,
       1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac,
       CAST(top_c AS DOUBLE) / n_bigrams AS top_bigram_frac,
       (1.0 - CAST(n_distinct AS DOUBLE) / n_tokens <= 0.75
        AND CAST(top_c AS DOUBLE) / n_bigrams <= 0.10) AS keep
FROM tokstats JOIN bg USING (doc_id)
"""


@register("l4_repetition_stats", oracle=_REP_ORACLE, tags=("L4", "F5"))
def l4_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters (the Gopher/C4 pretraining-data
    recipe): per document, the duplicate-word fraction
    (1 − distinct/total tokens) and the mass of the single most
    frequent word bigram, plus a keep/drop verdict at the classic
    thresholds. Documents dominated by one repeated phrase — boilerplate,
    scraped menus, keyword stuffing — fail exactly these two tests.

    Scale: tokenization and bigram construction are per-row projections
    (JVM higher-order functions); the only shuffle groups by
    (doc_id, bigram), whose cardinality is bounded by total token count
    — linear, skew-free, and partial-aggregated map-side. All ratios
    are exact integer-ratio doubles, so both engines agree bit-for-bit
    with no rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    t = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    tokstats = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks)-1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"
    )
    bg = (
        t.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    dup_frac = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_frac = F.col("top_c").cast("double") / F.col("n_bigrams")
    return tokstats.join(bg, "doc_id").select(
        "doc_id",
        "n_tokens",
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_frac <= 0.75) & (top_frac <= 0.10)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# L4 — TF-IDF top terms per document.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest({_ORACLE_TOKS}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, tok,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN df USING (tok) CROSS JOIN n
QUALIFY row_number() OVER (
  PARTITION BY doc_id
  ORDER BY ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, tok
) <= 3
"""


@register("l4_tfidf_topk", oracle=_TFIDF_ORACLE, tags=("L4", "W2", "A1"))
def l4_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf × ln(N/df), the classic
    salient-term extraction over a corpus.

    Scale: tf is a (doc_id, tok) groupBy (linear in tokens, map-side
    combined); df is a (tok) groupBy over distinct pairs; the corpus
    size N is a one-row aggregate broadcast into the join — no driver
    action, no collect. The per-doc top-3 is a bounded window.
    Cross-engine floats: ln() is libm on DuckDB and java.lang.Math on
    Spark — agreeing to ≤1 ulp — so the score is rounded to 6 dp on
    BOTH sides and the window orders by the ROUNDED score with a token
    tiebreak, making rank deterministic on each engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    ndf = docs.agg(F.count("*").alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(ndf))
        .select("doc_id", "tok", score.alias("tfidf"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


# ---------------------------------------------------------------------------
# L2/L1 — duplicate-cluster resolution: connected components over the
# near-dup pair graph (transitive closure), canonical survivor = min id.
# ---------------------------------------------------------------------------

_DUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_L2_NGRAM_ORACLE}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM edges
          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_canonical
FROM comp
"""


@register("l2_dup_clusters", oracle=_DUP_CLUSTERS_ORACLE, tags=("L2", "L1"))
def l2_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: pairwise near-dup evidence
    (l2_ngram_jaccard's ≥0.8 trigram pairs) is transitively closed into
    connected components via iterative min-label propagation; each
    document gets its component's minimum doc_id as cluster_id, and the
    minimum itself is flagged canonical — the survivor a dedup pipeline
    keeps. Pairwise thresholds alone under-merge (A≈B, B≈C, A≉C);
    training-data dedup needs the component, not the pair list.

    The DuckDB oracle computes the same components by recursive
    transitive closure — engine-independent ground truth for an
    iterative distributed algorithm.

    Scale: each round is one (edge ⋈ label) shuffle + min-aggregate —
    the Pregel pattern as plain DataFrames; rounds ≤ graph diameter
    (dup clusters are shallow; 17-doc clusters here converge in ≤4).
    At 100 TB: edges come from the LSH/MinHash candidate stage, labels
    localCheckpoint per round to cut lineage, and the large-star/
    small-star variant bounds rounds to O(log n). The convergence
    check is one count per round, not a collect of the labels.
    """
    pairs = l2_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # Edges are persisted so the 7-shuffle candidate pipeline runs once,
    # not once per round; labels localCheckpoint per round (the g3
    # pattern below) so the returned plan is a scan of the final
    # checkpointed round — without it the plan embeds every round's
    # joins (~810 exchange nodes by convergence at sf0.001, VERDICT r4)
    # and Catalyst pays the tree walk even though the data is cached.
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .transform(iter_ckpt)
    )
    try:
        for _ in range(20):  # ≥ any realistic dup-cluster diameter
            nbr_min = (
                edges.join(labels, edges.dst == labels.doc_id)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                    ).alias("label"),
                )
                .transform(iter_ckpt)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            (F.col("doc_id") == F.col("label")).alias("is_canonical"),
        )
    finally:
        edges.unpersist()


# ---------------------------------------------------------------------------
# L4 — PII redaction (regex scrub, the pre-training privacy pass).
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._]+@[a-z][a-z0-9.]*\.[a-z]+"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH notes AS (
  SELECT c_custkey,
         'Reach ' || c_name
         || CASE WHEN c_custkey % 3 > 0
                 THEN ' via user' || CAST(c_custkey AS VARCHAR) || '@'
                      || lower(c_mktsegment) || '.example.com'
                 ELSE '' END
         || CASE WHEN c_custkey % 2 = 0
                 THEN ' or +1-'
                      || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0')
                      || '-'
                      || lpad(CAST(c_custkey * 31 % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || ' before Friday' AS note
  FROM customer)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(note, '{_EMAIL_RE}', '[EMAIL]', 'g'),
         '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
       len(regexp_extract_all(note, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(note, '{_PHONE_RE}')) AS n_phones
FROM notes
"""


@register("l4_pii_redact", oracle=_PII_ORACLE, tags=("L4", "F2", "P4"))
def l4_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the regex scrub every pre-training pipeline runs
    before text leaves quarantine: find email addresses and phone
    numbers, replace them with typed placeholder tags, and count what
    was removed per record (the redaction audit trail).

    The corpus fixture carries no organic PII, so the input is
    synthesized deterministically from the customer dimension (key-
    derived addresses/numbers, with ~1/3 of rows email-free and 1/2
    phone-free so the zero-match path is graded too); the graded
    operator is the scrub itself.

    Scale: pure per-row projection — regexp_replace/regexp_count are
    JVM codegen'd, no shuffle, no UDF; at 100 TB this is a map-only
    pass fused into whatever scan precedes it. Patterns are anchored
    simple character classes (identical semantics in Java regex and
    RE2), counts are small ints — engine-identical output.
    """
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    email = F.concat(
        F.lit(" via user"),
        key.cast("string"),
        F.lit("@"),
        F.lower(F.col("c_mktsegment")),
        F.lit(".example.com"),
    )
    phone = F.concat(
        F.lit(" or +1-"),
        F.lpad((key * 7 % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((key * 31 % 10000).cast("string"), 4, "0"),
    )
    note = F.concat(
        F.lit("Reach "),
        F.col("c_name"),
        F.when(key % 3 > 0, email).otherwise(""),
        F.when(key % 2 == 0, phone).otherwise(""),
        F.lit(" before Friday"),
    )
    notes = cust.select("c_custkey", note.alias("note"))
    return notes.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("note"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
        F.regexp_count(F.col("note"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("note"), F.lit(_PHONE_RE)).alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# L4 — Gopher/C4-style quality-rule battery (named filters, per-language
# funnel counts).
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = f"""
WITH m AS (
  SELECT lang,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / len(toks) AS mean_word_len,
         CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE)
           / len(toks) AS stop_frac,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
  FROM (SELECT lang, {_ORACLE_TOKS} AS toks FROM documents)
  WHERE len(toks) > 0)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_words BETWEEN 30 AND 1000 THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_word_count,
       CAST(SUM(CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_mean_word_len,
       CAST(SUM(CASE WHEN stop_frac >= 0.01 THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_stopword,
       CAST(SUM(CASE WHEN ttr >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_ttr,
       CAST(SUM(CASE WHEN n_words BETWEEN 30 AND 1000
                      AND mean_word_len BETWEEN 3.0 AND 10.0
                      AND stop_frac >= 0.01
                      AND ttr >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM m GROUP BY lang
"""


@register("l4_gopher_rules", oracle=_GOPHER_ORACLE, tags=("L4", "P6", "A1"))
def l4_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality-rule battery: the NAMED document filters
    a pre-training corpus pass applies — word-count bounds, mean word
    length bounds, minimum stopword fraction, minimum type-token ratio
    — evaluated per document and rolled up as a per-language funnel
    (docs passing each rule, docs passing all). Complements
    l4_quality_score (one scalar) and l4_repetition_stats (repetition
    rules) with the length/lexical battery from the published recipes.

    Scale: every rule is a JVM higher-order-function projection over
    the token array (no explode, no Python); the only shuffle is the
    low-cardinality groupBy(lang) with map-side partial aggregation.
    All ratios are exact integer-ratio doubles, and rule thresholds
    compare those exact values — engine-identical booleans, so counts
    match bit-for-bit with no rounding anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len.cast("double") / n
    stop_frac = (
        F.size(F.filter(toks, lambda t: t.isin("a", "the"))).cast("double") / n
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    m = docs.select(
        "lang",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_frac.alias("stop_frac"),
        ttr.alias("ttr"),
    ).filter(F.col("n_words") > 0)
    r_words = F.col("n_words").between(30, 1000)
    r_mwl = F.col("mean_word_len").between(3.0, 10.0)
    r_stop = F.col("stop_frac") >= 0.01
    r_ttr = F.col("ttr") >= 0.2
    as_cnt = lambda c, name: F.sum(c.cast("long")).alias(name)  # noqa: E731
    return m.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        as_cnt(r_words, "pass_word_count"),
        as_cnt(r_mwl, "pass_mean_word_len"),
        as_cnt(r_stop, "pass_stopword"),
        as_cnt(r_ttr, "pass_ttr"),
        as_cnt(r_words & r_mwl & r_stop & r_ttr, "n_keep"),
    )


# ---------------------------------------------------------------------------
# L2 — cross-document shingle contamination: per-doc fraction of 5-gram
# shingles that also occur in other documents.
# ---------------------------------------------------------------------------

_SHINGLE_DUP_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(toks) - 3),
           i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS shs
  FROM (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 5),
s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
c AS (SELECT sh, COUNT(*) AS ndocs FROM s GROUP BY sh)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(SUM(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS shared_frac
FROM s JOIN c USING (sh)
GROUP BY s.doc_id
"""


@register("l2_shingle_dup_frac", oracle=_SHINGLE_DUP_ORACLE, tags=("L2", "L4"))
def l2_shingle_dup_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shingle contamination — for every document, the
    fraction of its distinct word 5-grams that occur in at least one
    OTHER document. This is the corpus-level statistic behind
    exact-substring dedup decisions (RefinedWeb-style): near-1 means
    the document is assembled from boilerplate the corpus already has;
    near-0 means novel text. Pairwise ops (l2_*_jaccard) say WHO the
    duplicate partner is; this says HOW MUCH of each doc is recycled,
    without enumerating pairs at all.

    Scale: distinct-shingles is a per-row projection; the plan is two
    hash shuffles on the shingle string (document frequency, then the
    join back) plus one on doc_id — all linear in total shingle count
    with map-side partial aggregation, never O(n²) in documents. At
    100 TB, join on xxhash64(shingle) instead of the raw 5-gram to cut
    shuffle width ~10×; a hot boilerplate shingle is bounded by its
    own document frequency and AQE skew-split covers the tail.
    shared_frac is an exact integer ratio — engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 5
    )
    sh5 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.array_join(F.slice("toks", i, 5), " "),
        )
    )
    s = t.select("doc_id", F.explode(sh5).alias("sh"))
    c = s.groupBy("sh").agg(F.count("*").alias("ndocs"))
    shared = (F.col("ndocs") > 1).cast("long")
    return (
        s.join(c, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(shared).alias("n_shared"),
            (F.sum(shared).cast("double") / F.count("*")).alias("shared_frac"),
        )
    )


# ---------------------------------------------------------------------------
# L6 — int8 embedding quantization, graded as a reconstruction-error
# contract (the 4x storage/bandwidth cut every vector store applies).
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH b AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
  FROM embeddings),
s AS (
  SELECT vec_id, label, xd,
         list_max(list_transform(xd, x -> abs(x))) AS scale
  FROM b),
e AS (
  SELECT vec_id, label, scale,
         list_max(list_transform(
           xd, x -> abs(x - round(x * 127.0 / scale) * scale / 127.0)))
           AS max_err
  FROM s WHERE scale > 0)
SELECT vec_id, label,
       ROUND(scale, 6) AS scale_r,
       ROUND(max_err, 8) AS max_abs_err,
       max_err <= scale * (0.5000001 / 127.0) AS within_half_step
FROM e
"""


@register("l6_int8_quantize", oracle=_QUANT_ORACLE, tags=("L6", "L5"))
def l6_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column —
    q_i = round(x_i · 127 / max|x|) — graded as a reconstruction-error
    CONTRACT: the query emits each vector's scale and worst-element
    dequantization error plus the verdict that the error is within the
    half-step bound scale/254 that correct rounding guarantees. This is
    the 4× storage/shuffle-bandwidth cut (fp32 → int8) a 100 TB vector
    corpus takes before ANN indexing; the contract breaks the hash if
    the quantizer ever stops rounding correctly.

    Scale: pure per-row higher-order-function projection — no shuffle,
    no Python; at 100 TB this fuses into the scan that feeds the ANN
    build. Cross-engine: both engines evaluate the identical IEEE
    double expression tree element-wise (float→double widening is
    exact), so even the error floats are bit-identical; outputs are
    still rounded (6/8 dp) for belt-and-braces.
    """
    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", "label", xd.alias("xd"))
    scale = F.array_max(F.transform(F.col("xd"), lambda x: F.abs(x)))
    s = base.select("vec_id", "label", "xd", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    sc = F.col("scale")
    max_err = F.array_max(
        F.transform(
            F.col("xd"),
            lambda x: F.abs(x - F.round(x * 127.0 / sc) * sc / 127.0),
        )
    )
    return s.select(
        "vec_id",
        "label",
        F.round(sc, 6).alias("scale_r"),
        F.round(max_err, 8).alias("max_abs_err"),
        (max_err <= sc * (0.5000001 / 127.0)).alias("within_half_step"),
    )


# ---------------------------------------------------------------------------
# L4/S3 — deterministic train/valid/test split (the hash-split every
# training pipeline applies before anything else).
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT lang,
         CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
              WHEN (doc_id * 2654435761) % 100 < 90 THEN 'valid'
              ELSE 'test' END AS split,
         len({_ORACLE_TOKS}) AS n_toks
  FROM documents)
SELECT lang, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM assigned
GROUP BY lang, split
"""


@register("s7_train_test_split", oracle=_SPLIT_ORACLE, tags=("S3", "L4", "P6"))
def s7_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by multiplicative
    key hash — the assignment every training pipeline needs to be (a)
    stable across runs and engines, (b) a pure projection (no
    sampling state, no shuffle), and (c) disjoint and exhaustive by
    construction. Graded as the per-(lang, split) doc/token census; a
    Knuth-style odd multiplier decorrelates the split from any key
    ordering, so stratification comes out proportional per language.

    Scale: split assignment is one integer expression in the scan
    projection; the census is a 15-group aggregate. At 100 TB the same
    expression feeds ``partitionBy(split)`` at write time — stable
    splits with zero extra passes. All-integer → engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 2654435761) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(T.tokens(F.col("text"))).alias("n_toks"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# L2 — benchmark decontamination: flag training docs sharing 8-gram
# shingles with a held-out benchmark set.
# ---------------------------------------------------------------------------

_DECON_GRAMS = (
    "list_distinct(list_transform(range(1, len(toks) - 6),"
    " i -> array_to_string(list_slice(toks, i, i + 7), ' ')))"
)

_DECON_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id, unnest({_DECON_GRAMS}) AS g
  FROM toks WHERE len(toks) >= 8),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0),
hits AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM train t LEFT JOIN bench b USING (g)
  GROUP BY t.doc_id)
SELECT doc_id, n_grams, n_hits, (n_hits > 0) AS contaminated
FROM hits
"""


@register("l2_benchmark_decontam", oracle=_DECON_ORACLE, tags=("L2", "L4", "J3"))
def l2_benchmark_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the n-gram overlap check every
    training pipeline runs before a corpus ships: every 50th document
    plays the held-out benchmark set, and each remaining training
    document is flagged if ANY of its 8-gram shingles appears verbatim
    in the benchmark (the GPT-3/PaLM 8-to-13-gram collision rule).
    Distinct from l2_shingle_dup_frac: that measures symmetric
    corpus-internal recycling; this is an asymmetric membership test
    against a small protected set.

    Scale: training-side shingles join the (comparatively tiny,
    distinct) benchmark gram set — at 100 TB the benchmark grams
    broadcast (or become a Bloom filter pushed into the scan), so the
    pass is map-only with one doc_id re-aggregation; nothing ever
    pairs documents. All-integer output → engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 8
    )
    g8 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 7),
            lambda i: F.array_join(F.slice("toks", i, 8), " "),
        )
    )
    grams = t.select("doc_id", F.explode(g8).alias("g"))
    bench = (
        grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# L2 — exact-substring dedup at the span level (round 11, VERDICT r10
# §Next 7): the Lee et al. train-dedup shape — document pairs sharing a
# contiguous token run of ≥ SPAN_K tokens, with the LONGEST shared span
# measured, via sorted shingle anchoring instead of a suffix array.
# ---------------------------------------------------------------------------

_SPAN_K = 8  # anchor shingle width: a shared span of ≥ K tokens ⇔ a shared K-gram
_SPAN_DF_CAP = 50  # drop grams in more docs — boilerplate carries no pair signal

_SPAN_ORACLE = f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i:i + {_SPAN_K} - 1], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - {_SPAN_K} + 1)) AS u(i)
  WHERE len(toks) >= {_SPAN_K}),
dfreq AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
  WHERE nd BETWEEN 2 AND {_SPAN_DF_CAP}),
occ AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gram,
         a.pos AS pa, b.pos AS pb
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  JOIN dfreq d ON a.gram = d.gram),
runs AS (
  SELECT doc_a, doc_b, gram,
         pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                 ORDER BY pa) AS grp,
         pa - pb AS diag
  FROM occ),
spans AS (
  SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM runs GROUP BY doc_a, doc_b, diag, grp)
SELECT o.doc_a, o.doc_b,
       CAST(COUNT(DISTINCT o.gram) AS BIGINT) AS n_shared_grams,
       CAST(MAX(s.max_run) + {_SPAN_K} - 1 AS BIGINT) AS longest_span_tokens,
       MIN(o.gram) AS witness_gram
FROM occ o
JOIN (SELECT doc_a, doc_b, MAX(run_len) AS max_run
      FROM spans GROUP BY doc_a, doc_b) s USING (doc_a, doc_b)
GROUP BY o.doc_a, o.doc_b
"""


@register(
    "l2_substring_span_pairs",
    oracle=_SPAN_ORACLE,
    tags=("L2", "L1", "J8", "W1"),
)
def l2_substring_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (token-span) dedup pairs — the Lee et al.
    'Deduplicating Training Data' shape re-expressed relationally:
    two documents share a contiguous run of ≥ K tokens iff they share
    a K-token shingle, so K-gram ANCHORS replace the suffix array.
    Each anchor keeps its ORIGINAL position; matching anchor
    occurrences of a pair lie on diagonals (pa − pb constant), and a
    gaps-and-islands pass per diagonal (row_number over pa, unique
    within the diagonal by construction) measures the LONGEST shared
    span exactly: max consecutive run + K − 1 tokens. Output per pair:
    distinct shared anchors, longest span, and the lexicographic-min
    witness gram — the report a dedup pipeline acts on (truncate the
    span / drop the doc).

    Boilerplate control: grams appearing in > {cap} documents are
    dropped on BOTH engines before the pair join (the df-cap trick the
    l2 n-gram family already grades) — they carry no pair signal and
    their df² fan-out is the naive formulation's entire cost.

    Scale: gram construction is a map-side projection over the token
    array (slice + join per position — at 100 TB swap the string gram
    for the Karp–Rabin rolling hash already graded in
    l4_winnow_fingerprint to shrink shuffle bytes; collisions then need
    one verify pass). The pair join shuffles on the gram with per-gram
    fan-out ≤ cap², the islands window partitions by (pair, diagonal) —
    never global — and the final rollup is one hash aggregate. A true
    suffix-array pass (arbitrary-length spans without the K floor) is
    per-shard imperative work Spark would run via mapPartitions; the
    anchored form keeps everything in Catalyst and is the standard
    distributed approximation (exact for spans ≥ K).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= _SPAN_K
    )
    g = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - _SPAN_K + 1),
                lambda i: F.array_join(F.slice(F.col("toks"), i, _SPAN_K), " "),
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    dfreq = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= _SPAN_DF_CAP))
        .select(F.col("gram").alias("kept_gram"))
    )
    # df-cap BELOW the self-join: both join legs shrink to kept grams
    # first, and the kept-gram join shares the self-join's gram-hash
    # partitioning, so the exchange is planned once and reused.
    kept = g.join(dfreq, g.gram == dfreq.kept_gram).select(
        "doc_id", "pos", "gram"
    )
    a, b = kept.alias("a"), kept.alias("b")
    # Shared by the gram rollup AND the islands pass — ckpt'd so the
    # self-join subtree plans once (dimension tier: O(anchor occurrence
    # pairs), ≤ cap² per kept gram by the df-cap — far below the corpus,
    # but it does grow with the near-dup mass; the ckpt trades one
    # bounded materialization for a duplicated shuffle pipeline).
    occ = ckpt(
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.gram").alias("gram"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = occ.select(
        "doc_a", "doc_b", (F.col("pa") - F.col("pb")).alias("diag"), "pa"
    ).withColumn("grp", F.col("pa") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count("*").alias("run_len"))
        .groupBy("doc_a", "doc_b")
        .agg(F.max("run_len").alias("max_run"))
    )
    return (
        occ.groupBy("doc_a", "doc_b")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.min("gram").alias("witness_gram"),
        )
        .join(spans, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "n_shared_grams",
            (F.col("max_run") + _SPAN_K - 1).cast("bigint").alias(
                "longest_span_tokens"
            ),
            "witness_gram",
        )
    )


_SCRUB_ORACLE = f"""
WITH tt AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i:i + {_SPAN_K} - 1], ' ') AS gram
  FROM tt, LATERAL unnest(generate_series(1, len(toks) - {_SPAN_K} + 1)) AS u(i)
  WHERE len(toks) >= {_SPAN_K}),
stats AS (
  SELECT gram, MIN(doc_id) AS first_doc, COUNT(DISTINCT doc_id) AS nd
  FROM g GROUP BY gram),
dup AS (
  SELECT g.doc_id, g.pos, g.gram
  FROM g JOIN stats USING (gram)
  WHERE nd BETWEEN 2 AND {_SPAN_DF_CAP} AND g.doc_id > first_doc),
cov AS (
  SELECT DISTINCT doc_id, tk FROM (
    SELECT doc_id,
           unnest(generate_series(pos, pos + {_SPAN_K} - 1)) AS tk
    FROM dup)),
sc AS (SELECT doc_id, COUNT(*) AS tokens_scrubbed FROM cov GROUP BY doc_id),
gr AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_dup_grams FROM dup GROUP BY doc_id)
SELECT sc.doc_id,
       CAST(len(tt.toks) AS BIGINT) AS n_tokens,
       CAST(sc.tokens_scrubbed AS BIGINT) AS tokens_scrubbed,
       CAST(len(tt.toks) - sc.tokens_scrubbed AS BIGINT) AS tokens_kept,
       CAST(gr.n_dup_grams AS BIGINT) AS n_dup_grams
FROM sc JOIN gr USING (doc_id) JOIN tt USING (doc_id)
"""


@register(
    "l1_span_scrub_census",
    oracle=_SCRUB_ORACLE,
    tags=("L1", "L2", "L4"),
)
def l1_span_scrub_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION on top of l2_substring_span_pairs' report: a
    keep-first span scrub. A token position of doc d is scrubbed when
    some K-gram anchor covering it also occurs in a LOWER-doc_id
    document (the kept copy) — the Lee et al. remove-duplicated-spans
    transform expressed as set algebra: anchor occurrences → per-gram
    (first_doc, df) stats → duplicate-side occurrences → DISTINCT
    covered token positions → per-doc census (total / scrubbed / kept
    tokens, distinct duplicated anchors). Deterministic keep-first
    policy (min doc_id owns each gram), same df-cap as the pair report
    so boilerplate never scrubs. One row per affected document.

    Scale: two shuffles on the gram (stats + re-join — the second
    reuses the first's hash partitioning), one explode that fans out
    ≤ K× the duplicate-side occurrences (bounded by the df-cap), and
    two doc-keyed aggregates. No windows, no driver state; the actual
    text rewrite at 100 TB is a map-side `filter(tokens, (t, i) -> NOT
    covered(i))` against this relation broadcast per doc-shard or
    joined on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("toks")
    )
    sized = toks.select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    g = (
        sized.filter(F.col("n_tokens") >= _SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - _SPAN_K + 1),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i, _SPAN_K), " "
                    ),
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    stats = (
        g.groupBy("gram")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter((F.col("nd") >= 2) & (F.col("nd") <= _SPAN_DF_CAP))
        .select(F.col("gram").alias("kept_gram"), "first_doc")
    )
    dup = (
        g.join(stats, g.gram == stats.kept_gram)
        .filter(F.col("doc_id") > F.col("first_doc"))
        .select("doc_id", "pos", "gram")
    )
    cov = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + _SPAN_K - 1)
        ).alias("tk"),
    ).distinct()
    sc = cov.groupBy("doc_id").agg(F.count("*").alias("tokens_scrubbed"))
    gr = dup.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_dup_grams")
    )
    return (
        sc.join(gr, "doc_id")
        .join(sized.select("doc_id", "n_tokens"), "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "tokens_scrubbed",
            (F.col("n_tokens") - F.col("tokens_scrubbed"))
            .cast("bigint")
            .alias("tokens_kept"),
            "n_dup_grams",
        )
    )


# ---------------------------------------------------------------------------
# L1/L2 — INCREMENTAL span scrub (round 12, VERDICT r11 §Next 7b): the
# ingestion-time image of l1_span_scrub_census — an arriving batch is
# scrubbed against the KEPT corpus's K-gram anchor index, composing
# l1_cross_corpus_dedup's corpus/incoming split (doc-level) with the
# round-11 span machinery (span-level). Same parity convention: even
# doc_ids = established corpus, odd = the incoming snapshot.
# ---------------------------------------------------------------------------

_INCR_SCRUB_ORACLE = f"""
WITH tt AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i:i + {_SPAN_K} - 1], ' ') AS gram
  FROM tt, LATERAL unnest(generate_series(1, len(toks) - {_SPAN_K} + 1)) AS u(i)
  WHERE len(toks) >= {_SPAN_K}),
idx AS (
  SELECT gram FROM g WHERE doc_id % 2 = 0
  GROUP BY gram HAVING COUNT(DISTINCT doc_id) <= {_SPAN_DF_CAP}),
hit AS (
  SELECT g.doc_id, g.pos, g.gram
  FROM g JOIN idx USING (gram) WHERE g.doc_id % 2 = 1),
cov AS (
  SELECT DISTINCT doc_id, tk FROM (
    SELECT doc_id, unnest(generate_series(pos, pos + {_SPAN_K} - 1)) AS tk
    FROM hit)),
src AS (
  SELECT h.doc_id, COUNT(DISTINCT c.doc_id) AS n_src_docs
  FROM (SELECT DISTINCT doc_id, gram FROM hit) h
  JOIN (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 2 = 0) c
    USING (gram)
  GROUP BY h.doc_id),
sc AS (SELECT doc_id, COUNT(*) AS tokens_scrubbed FROM cov GROUP BY doc_id),
gr AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_hit_grams FROM hit GROUP BY doc_id)
SELECT sc.doc_id,
       CAST(len(tt.toks) AS BIGINT) AS n_tokens,
       CAST(sc.tokens_scrubbed AS BIGINT) AS tokens_scrubbed,
       CAST(len(tt.toks) - sc.tokens_scrubbed AS BIGINT) AS tokens_kept,
       CAST(gr.n_hit_grams AS BIGINT) AS n_hit_grams,
       CAST(src.n_src_docs AS BIGINT) AS n_src_docs
FROM sc JOIN gr USING (doc_id) JOIN src USING (doc_id) JOIN tt USING (doc_id)
"""


@register(
    "l1_incremental_span_scrub",
    oracle=_INCR_SCRUB_ORACLE,
    tags=("L1", "L2", "J1"),
)
def l1_incremental_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time span scrub: an arriving snapshot (odd doc_ids)
    is scrubbed against the KEPT corpus's (even doc_ids) K-gram anchor
    index — a token position of an arriving document is scrubbed when
    some K-gram covering it already exists in the corpus. Per affected
    arrival: token census (total / scrubbed / kept), distinct index
    hits, and how many corpus documents those anchors trace back to
    (the provenance count a contamination report needs). The corpus
    always wins (arrivals never scrub each other — that is the WITHIN-
    batch job, l1_span_scrub_census); the same df-cap as the span
    family keeps corpus boilerplate out of the index.

    Scale: the anchor index is the PERSISTED artifact of this design —
    at 100 TB it lives as a bucketed table keyed by the gram (or its
    Karp–Rabin hash, shrinking shuffle bytes), built once and appended
    after each admission, so an arriving batch joins stream-static
    against it (exactly the st6 shape under readStream) and only the
    batch's grams ever shuffle. Per-batch cost: one equi-join on the
    gram, one K-bounded explode, one DISTINCT, three doc-keyed
    aggregates — nothing rescans the corpus text. The streaming image
    is PROVEN, not just claimed: tests/test_round12_props.py::
    test_incremental_scrub_streaming_image replays the arrival
    snapshot through a 3-micro-batch file stream, joins stream-static
    against the batch-built index, and reproduces this operator's
    census exactly with one stateful aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    sized = toks.select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    g = (
        sized.filter(F.col("n_tokens") >= _SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tokens") - _SPAN_K + 1),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), i, _SPAN_K), " "
                    ),
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    corp_g = g.filter(F.col("doc_id") % 2 == 0)
    idx = (
        corp_g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") <= _SPAN_DF_CAP)
        .select(F.col("gram").alias("kept_gram"))
    )
    hit = (
        g.filter(F.col("doc_id") % 2 == 1)
        .join(idx, g.gram == idx.kept_gram)
        .select("doc_id", "pos", "gram")
    )
    cov = hit.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + _SPAN_K - 1)
        ).alias("tk"),
    ).distinct()
    src = (
        hit.select("doc_id", "gram")
        .distinct()
        .join(
            corp_g.select(F.col("doc_id").alias("src_doc"), "gram").distinct(),
            "gram",
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("src_doc").alias("n_src_docs"))
    )
    sc = cov.groupBy("doc_id").agg(F.count("*").alias("tokens_scrubbed"))
    gr = hit.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_hit_grams")
    )
    return (
        sc.join(gr, "doc_id")
        .join(src, "doc_id")
        .join(sized.select("doc_id", "n_tokens"), "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "tokens_scrubbed",
            (F.col("n_tokens") - F.col("tokens_scrubbed"))
            .cast("bigint")
            .alias("tokens_kept"),
            "n_hit_grams",
            "n_src_docs",
        )
    )


# ---------------------------------------------------------------------------
# L2 — INCREMENTAL MinHash-LSH near-dup gate (round 12): the
# ingestion-time image of l2_minhash_lsh, composing the corpus/arrival
# split of l1_incremental_span_scrub (even doc_ids = kept corpus, odd =
# arriving snapshot) with the oracle-exact MinHash band index. The
# admission decision a training-data pipeline makes per arriving doc.
# ---------------------------------------------------------------------------

# Band buckets holding more corpus docs than this are boilerplate
# (identical headers/footers, empty shells) — they cannot separate
# near-dups and their |bucket|² candidate fan-out is the entire
# worst-case cost, so both engines drop them BEFORE the candidate join
# (the span family's df-cap, applied to LSH buckets).
_MH_BUCKET_CAP = 50
# is_dup threshold: Jaccard ≥ 0.7, decided by integer cross-
# multiplication (10·common ≥ 7·union) — no float comparison on the
# graded path.
_INCR_MH_NUM, _INCR_MH_DEN = 7, 10

_INCR_MINHASH_ORACLE = f"""
WITH t AS (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks) - 1),
                                  i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         END AS shs
  FROM t),
hs AS (
  SELECT doc_id, list_transform(shs, s -> {_MH_BASE_HASH_SQL}) AS hv
  FROM sh),
sig AS (
  SELECT doc_id,
         {", ".join(f"list_min(list_transform(hv, h -> ({_MH_A[i]} * h + {_MH_B[i]}) % {_MH_P})) AS s{i}" for i in range(16))}
  FROM hs),
banded AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_mh_band_key_sql(b)} AS key FROM sig" for b in range(4))}
),
live AS (
  SELECT band, key FROM banded WHERE doc_id % 2 = 0
  GROUP BY band, key HAVING COUNT(*) <= {_MH_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id, c.doc_id AS cand_doc
  FROM banded a
  JOIN live USING (band, key)
  JOIN banded c ON a.band = c.band AND a.key = c.key
  WHERE a.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
ss AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
nsz AS (SELECT doc_id, COUNT(*) AS n FROM ss GROUP BY doc_id),
com0 AS (
  SELECT cand.doc_id, cand.cand_doc, COUNT(*) AS common
  FROM cand
  JOIN ss x ON x.doc_id = cand.doc_id
  JOIN ss y ON y.doc_id = cand.cand_doc AND y.s = x.s
  GROUP BY 1, 2),
scored AS (
  SELECT cand.doc_id, cand.cand_doc,
         COALESCE(com0.common, 0) AS common,
         na.n + nc.n - COALESCE(com0.common, 0) AS u
  FROM cand
  LEFT JOIN com0 ON com0.doc_id = cand.doc_id AND com0.cand_doc = cand.cand_doc
  JOIN nsz na ON na.doc_id = cand.doc_id
  JOIN nsz nc ON nc.doc_id = cand.cand_doc),
ranked AS (
  SELECT doc_id, cand_doc, common, u,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY (1000000000 * common) // u DESC,
                                     cand_doc ASC) AS rn
  FROM scored),
ncand AS (SELECT doc_id, COUNT(*) AS n_candidates FROM cand GROUP BY doc_id)
SELECT r.doc_id,
       CAST(ncand.n_candidates AS BIGINT) AS n_candidates,
       r.cand_doc AS best_match,
       CAST((1000000 * r.common) // r.u AS BIGINT) AS best_jaccard_ppm,
       CAST({_INCR_MH_DEN} * r.common >= {_INCR_MH_NUM} * r.u AS INTEGER) AS is_dup
FROM ranked r JOIN ncand USING (doc_id) WHERE r.rn = 1
"""


@register(
    "l2_incremental_minhash_dedup",
    oracle=_INCR_MINHASH_ORACLE,
    tags=("L2", "W2", "J1"),
)
def l2_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup admission gate: each arriving document
    (odd doc_ids) is looked up in the KEPT corpus's (even doc_ids)
    MinHash-LSH band index (the oracle-exact 16-hash / 4-band family of
    l2_minhash_lsh via the shared ``_mh_banded`` projection); every
    band collision is then VERIFIED with exact shingle-set Jaccard.
    Per affected arrival: candidate count, best-matching corpus doc,
    its Jaccard (exact integer parts-per-million), and the admission
    verdict at the 0.7 threshold.

    Determinism: NO floating point on the graded path — candidates are
    ranked by the exact integer ``(10⁹·common) div union`` (equal
    rationals compare equal on both engines; sub-ppb distinctions
    collapse into the unique ``cand_doc`` tiebreak identically on both
    engines), ``best_jaccard_ppm`` is exact integer division, and
    ``is_dup`` is the integer cross-multiplication 10·common ≥ 7·union
    (the ROUND-half-tie gotcha never arises).

    Scale: the band index is the PERSISTED artifact — at 100 TB it
    lives bucketed by (band, key), appended after each admission; an
    arriving batch computes signatures map-side and joins
    stream-static against it, so only the batch's band rows ever
    shuffle (the st6 shape under readStream, like
    l1_incremental_span_scrub). The corpus-side bucket cap (50) bounds
    candidate fan-out at |bucket|·cap regardless of corpus size —
    boilerplate shells that defeat LSH separation are dropped on BOTH
    engines before the join. Verification joins touch only candidate
    docs' shingle sets (semi-join pushdown via the candidate list),
    keyed by (doc, shingle): cost ∝ candidate pairs × avg shingles,
    never corpus².
    """
    docs = load_table(spark, sf_dir, "documents")
    banded = _mh_banded(docs)
    live = (
        banded.filter(F.col("doc_id") % 2 == 0)
        .groupBy("band", "key")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") <= _MH_BUCKET_CAP)
        .select("band", "key")
    )
    arr = banded.filter(F.col("doc_id") % 2 == 1).alias("a")
    corp = banded.filter(F.col("doc_id") % 2 == 0).alias("c")
    cand = (
        arr.join(live, ["band", "key"])
        .join(corp, ["band", "key"])
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("c.doc_id").alias("cand_doc"),
        )
        .distinct()
    )
    ss = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.shingles(F.col("text"), k=3))
        ).alias("s"),
    )
    nsz = ss.groupBy("doc_id").agg(F.count("*").alias("n"))
    com0 = (
        cand.join(
            ss.select(F.col("doc_id").alias("doc_id"), F.col("s")), "doc_id"
        )
        .join(
            ss.select(F.col("doc_id").alias("cand_doc"), F.col("s")),
            ["cand_doc", "s"],
        )
        .groupBy("doc_id", "cand_doc")
        .agg(F.count("*").alias("common"))
    )
    scored = (
        cand.join(com0, ["doc_id", "cand_doc"], "left")
        .withColumn("common", F.coalesce(F.col("common"), F.lit(0)))
        .join(nsz.select(F.col("doc_id"), F.col("n").alias("na")), "doc_id")
        .join(
            nsz.select(F.col("doc_id").alias("cand_doc"), F.col("n").alias("nc")),
            "cand_doc",
        )
        .withColumn("u", F.col("na") + F.col("nc") - F.col("common"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.expr("(1000000000 * common) DIV u").desc(), F.col("cand_doc").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    ncand = cand.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    return ranked.join(ncand, "doc_id").select(
        "doc_id",
        "n_candidates",
        F.col("cand_doc").alias("best_match"),
        F.expr("CAST((1000000 * common) DIV u AS BIGINT)").alias(
            "best_jaccard_ppm"
        ),
        (
            F.lit(_INCR_MH_DEN) * F.col("common")
            >= F.lit(_INCR_MH_NUM) * F.col("u")
        )
        .cast("int")
        .alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# L4 — sequence packing census: concat-then-chunk assignment of docs to
# fixed token-budget bins (the pre-training batch-construction step).
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512

_PACK_ORACLE = f"""
WITH d AS (
  SELECT lang, doc_id, len({_ORACLE_TOKS}) AS n FROM documents),
c AS (
  SELECT lang, doc_id, n,
         SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM d)
SELECT lang,
       CAST((cum - n) // {_PACK_BUDGET} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY lang, CAST((cum - n) // {_PACK_BUDGET} AS BIGINT)
"""


@register("l4_sequence_packing", oracle=_PACK_ORACLE, tags=("L4", "W4", "A1"))
def l4_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing census — the concat-then-chunk batch
    construction GPT-style pre-training uses: documents stream in a
    deterministic order (doc_id) per language, token counts accumulate,
    and each document is assigned to the 512-token bin where its first
    token lands. The graded output is the per-(lang, bin)
    census: docs, token mass, first/last doc — the manifest a packing
    writer needs.

    Scale: the prefix sum here is a per-language window — fine while
    partitions are bounded; at 100 TB a single ordered window would
    serialize, so the same assignment is computed as a two-phase
    distributed prefix sum: per-partition token subtotals, an exclusive
    scan over the (tiny) subtotal list to get partition offsets, then a
    map-side cumsum with the offset added — identical bins, no global
    sort. All-integer arithmetic → engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "doc_id", F.size(T.tokens(F.col("text"))).alias("n")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.withColumn("cum", F.sum("n").over(w))
    bin_ = F.floor((F.col("cum") - F.col("n")) / _PACK_BUDGET).cast("long")
    return (
        c.select("lang", bin_.alias("bin"), "doc_id", "n")
        .groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# L3/L4 — BM25 retrieval scoring (the lexical ranking function behind
# corpus search / retrieval-based curation).
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("spark", "table", "query")

_BM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM d),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM d),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
  WHERE tok IN {_BM25_QUERY!r}
  GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({_BM25_K1} + 1.0))
           / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
         ) AS score
  FROM tf JOIN df USING (tok)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT 10
"""


@register("l3_bm25_topk", oracle=_BM25_ORACLE, tags=("L3", "L4", "O2"))
def l3_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 — the lexical retrieval scorer (Okapi BM25,
    k1=1.2 b=0.75) for a fixed query, the ranking half of every
    retrieval-based curation loop (hybrid search pairs it with
    l3_cosine_topk). idf uses the +1-smoothed form so scores stay
    positive; tf saturates via k1 and long documents are damped by the
    b·dl/avgdl length normalization.

    Scale: tokens are filtered to the query's terms BEFORE the
    (doc, term) groupBy, so the shuffled volume is query-sized, not
    corpus-sized; df and the global (N, avgdl) are tiny broadcast
    aggregates; the final top-10 compiles to TakeOrderedAndProject.
    Cross-engine: ln() agrees to ≤1 ulp, so the score is rounded to
    6 dp on BOTH sides and ranked on the rounded value with a doc_id
    tiebreak.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# L4/S3 — class-balanced downsampling: cap each class at K docs chosen
# by deterministic hash order (the language-rebalancing step).
# ---------------------------------------------------------------------------

_BALANCE_CAP = 40

_BALANCE_ORACLE = f"""
SELECT lang, doc_id,
       row_number() OVER (
         PARTITION BY lang
         ORDER BY (doc_id * 2654435761) % 10000, doc_id
       ) AS rk
FROM documents
QUALIFY rk <= {_BALANCE_CAP}
"""


@register("s3c_class_balanced_sample", oracle=_BALANCE_ORACLE, tags=("S3", "L4", "W2"))
def s3c_class_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps at most
    40 documents, chosen by deterministic multiplicative-hash order
    — the rebalancing step that stops a head language from dominating
    a training mix while staying reproducible across runs and engines
    (no RNG state; the hash IS the sample). Complements s3b's
    proportional stratified sample: this one EQUALIZES classes instead
    of preserving their shares.

    Scale: one window per class ordered by the hash — the shuffle keys
    on lang, so heavily skewed class sizes make this the textbook
    place for the two-phase variant: per-partition top-K first (K rows
    survive each partition), then the global per-class top-K —
    identical output, bounded memory. All-integer hash + unique
    doc_id tiebreak → engine-identical selection.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 2654435761) % 10000
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BALANCE_CAP)
    )


# ---------------------------------------------------------------------------
# L3 — hybrid retrieval: reciprocal-rank fusion of BM25 (lexical) and
# cosine (dense) rankings.
# ---------------------------------------------------------------------------

_RRF_K = 60

_RRF_ORACLE = f"""
WITH bm25_ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM ({_BM25_ORACLE.strip()})),
cos_ranked AS (
  SELECT b.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY ROUND(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                    b.vec_id) AS r
  FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
  WHERE a.vec_id = 0
  QUALIFY r <= 10),
fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         COALESCE(1.0 / ({_RRF_K} + b.r), 0.0)
           + COALESCE(1.0 / ({_RRF_K} + c.r), 0.0) AS rrf
  FROM bm25_ranked b FULL OUTER JOIN cos_ranked c USING (doc_id))
SELECT doc_id, ROUND(rrf, 6) AS rrf_score
FROM fused
ORDER BY ROUND(rrf, 6) DESC, doc_id
LIMIT 10
"""


@register("l3_hybrid_rrf", oracle=_RRF_ORACLE, tags=("L3", "J2", "O2"))
def l3_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 top-10
    (lexical, l3_bm25_topk's fixed query) and the cosine top-10 against
    a fixed query embedding (vec_id 0) are fused as
    Σ 1/(60 + rank) — the standard RRF that needs no score calibration
    between the two retrievers, only their RANKS, which is why it's the
    default hybrid combiner in production search. Docs found by both
    lists outrank docs found by one; the full outer join keeps
    single-retriever hits.

    Scale: each branch is already scale-shaped (BM25's query-sized
    shuffle; dense retrieval over a broadcast query vector is one
    map-side pass + TakeOrderedAndProject); the fusion itself joins two
    k-row lists — negligible. Ranks are exact integers, so the
    reciprocal sums are IEEE-identical across engines; the fused score
    is rounded at 6 dp with a doc_id tiebreak for deterministic order.
    """
    bm = l3_bm25_topk(spark, sf_dir)
    w_bm = Window.orderBy(F.col("bm25").desc(), "doc_id")
    bm_ranked = bm.select("doc_id", F.row_number().over(w_bm).alias("r_bm"))

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    cos = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias(
                "cos"
            ),
        )
    )
    # Pre-truncate BEFORE ranking: orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-10, merged on the driver
    # — never a global sort), so the row_number window below runs over
    # 10 rows, not the full corpus. Identical output (same key, same
    # tiebreak); this is the scale-safe primary form (VERDICT r2 #3).
    cos_top = cos.orderBy(F.col("cos").desc(), "doc_id").limit(10)
    w_cos = Window.orderBy(F.col("cos").desc(), "doc_id")
    cos_ranked = cos_top.select(
        "doc_id", F.row_number().over(w_cos).alias("r_cos")
    )
    fused = bm_ranked.join(cos_ranked, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("r_cos")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.select("doc_id", F.round("rrf", 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# L2 — MinHash-LSH recall CONTRACT. Historically this made the then-
# rows-only xxhash64 sketch gradable; since round 6 l2_minhash_lsh's
# candidate set is itself hash-graded (universal hash family above),
# and this contract remains as the complementary ACCURACY grade: every
# pair whose true shingle-Jaccard clears the sketch's design threshold
# must surface as an LSH candidate. The oracle computes the exact
# hi-similarity pair count in pure SQL and expects the recall verdict
# true, so the hash breaks iff the sketch parameterization regresses —
# the same accuracy-contract pattern as a4's HLL. The contract is
# hash-family-agnostic: it joins against l2_minhash_lsh's ACTUAL
# candidates, so it now grades the round-6 universal family's recall
# (still 1.0 on the fixture — all 25 hi pairs surface).
# ---------------------------------------------------------------------------

_MH_RECALL_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS ts
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
         ELSE list_transform(generate_series(1, len(ts) - 2),
                             i -> array_to_string(ts[i:i+2], ' '))
    END) AS sh
  FROM toks
),
pairs AS (
  SELECT len(list_intersect(a.sh, b.sh)) AS c,
         len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hi_pairs, TRUE AS recall_ge_09
FROM pairs WHERE CAST(c AS DOUBLE) / u >= 0.9
"""


@register("l2_minhash_recall", oracle=_MH_RECALL_ORACLE, tags=("L2", "A4"))
def l2_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for l2_minhash_lsh: recall of true
    shingle-Jaccard ≥ 0.9 pairs among the LSH candidates must be ≥ 0.9
    (theory for 4 bands × 4 rows at s = 0.9: 1-(1-s⁴)⁴ ≈ 0.986;
    measured 1.0 at sf0.01 — candidates are exactly the 25 hi pairs).

    The true hi pairs are computed in-plan with PREFIX FILTERING at the
    0.9 threshold (optimization r13, VERDICT r12 §Next #4 — exact, the
    classic set-similarity-join bound): order every doc's distinct
    shingles by one global (lexicographic) order; J(A,B) ≥ 0.9 forces
    |A∩B| ≥ α = ⌈0.9·max(|A|,|B|)⌉, and two sets whose intersection is
    ≥ α must share an element inside their first |X|−α+1 shingles (if
    all common shingles sat outside X's prefix, the intersection would
    fit in the last α−1 slots). Each side prunes with its own (longer)
    bound |X|−⌈0.9·|X|⌉+1 — a superset of the lemma's prefixes — so the
    candidate set provably contains every hi pair. Candidates are then
    verified EXACTLY on the full shingle arrays (array_intersect size =
    the old join-count integer; identical double comparison). The r12
    form exploded every shingle into the self-join; the prefix explodes
    ~|X|/10+1 of them, cutting the candidate shuffle ~100× at this
    threshold. The ceil is integer ((9n+9) div 10) — no float on the
    pruning path.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.sort_array(
            F.array_distinct(T.shingles(F.col("text"), k=3))
        ).alias("sh"),
    )
    plen = F.col("n") - F.expr("(9 * n + 9) div 10") + 1
    g = sh.select(
        "doc_id", F.size("sh").alias("n"), F.col("sh")
    ).select("doc_id", F.explode(F.slice("sh", F.lit(1), plen)).alias("s"))
    a, b = g.alias("a"), g.alias("b")
    pcand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    verified = pcand.join(sa, "doc_a").join(sb, "doc_b")
    c = F.size(F.array_intersect("sha", "shb"))
    jac = c.cast("double") / (F.size("sha") + F.size("shb") - c)
    hi = verified.filter(jac >= 0.9).select("doc_a", "doc_b")
    cand = l2_minhash_lsh(spark, sf_dir)
    recalled = hi.join(cand, ["doc_a", "doc_b"], "left_semi")
    stats = hi.agg(F.count("*").alias("n_hi")).crossJoin(
        recalled.agg(F.count("*").alias("n_rec"))
    )
    return stats.select(
        F.col("n_hi").alias("n_hi_pairs"),
        F.coalesce(
            F.col("n_rec").cast("double") / F.col("n_hi") >= 0.9, F.lit(True)
        ).alias("recall_ge_09"),
    )


# ---------------------------------------------------------------------------
# L2 — SimHash invariance CONTRACT: the fingerprint is a majority vote
# over the token MULTISET, so reordering a document's tokens must not
# change it — a non-vacuous property checked on every document (unlike
# identical-text pairs, which the sf0.01 fixture has none of).
# ---------------------------------------------------------------------------

_SIMHASH_INV_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       TRUE AS order_invariant,
       TRUE AS all_nonzero
FROM documents
"""


@register("l2_simhash_invariance", oracle=_SIMHASH_INV_ORACLE, tags=("L2",))
def l2_simhash_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract for l2_simhash: simhash64(tokens) == simhash64(reversed
    tokens) for every document (vote sums are order-free), and no
    fingerprint collapses to 0 (P ≈ 2⁻⁶⁴ under uniform hash bits — a 0
    would mean the vote pipeline broke). The oracle pins the document
    count and expects both verdicts true.

    Scale: two map-side projections and one global bool_and; `spread`
    parallelizes the 124-lane vote projection past the fixture's
    single-row-group scan (12.8 → ~1 s at sf0.1, optimization r12) —
    the only shuffle carries the raw text once.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens(F.col("text"))
    per_doc = docs.select(
        T.simhash64(toks).alias("h1"),
        T.simhash64(F.reverse(toks)).alias("h2"),
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.bool_and(F.col("h1") == F.col("h2")).alias("order_invariant"),
        F.bool_and(F.col("h1") != 0).alias("all_nonzero"),
    )


# ---------------------------------------------------------------------------
# L3 — ANN recall CONTRACT: grades both approximate-NN paths (LSH
# buckets, IVF cells) against the exact top-5, as a driver-checkable
# verdict. DuckDB cannot express meet-in-bucket search, but it can pin
# the query count and expect the recall floor to hold.
# ---------------------------------------------------------------------------

_ANN_RECALL_ORACLE = """
SELECT 'ivf' AS method, CAST(COUNT(*) AS BIGINT) AS n_queries,
       TRUE AS recall_ge_070
FROM embeddings
UNION ALL
SELECT 'lsh', CAST(COUNT(*) AS BIGINT), TRUE FROM embeddings
"""


@register("l3_ann_recall_contract", oracle=_ANN_RECALL_ORACLE, tags=("L3", "A4"))
def l3_ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for l3_ann_lsh and l3_ann_ivf: top-5 recall
    against the exact broadcast-matmul k-NN (q10) must stay ≥ 0.70 per
    method (floor raised from 0.45 in round 12 per VERDICT r11 §Next 7
    after tuning: LSH 12 tables × 4 planes measures 0.812 at sf0.01 /
    0.855 at sf0.1; IVF 32 cells, nprobe=8, nassign=2 measures 0.830 /
    0.818 — both deterministic under their fixed seeds, both with
    ≥ 0.11 margin at both graded SFs). Recall here is micro-averaged:
    |ANN ∩ exact| / |exact| over all (query, neighbor) pairs.

    Scale: the contract reuses each method's own plan; the comparison
    itself is two left-semi joins on (vec_id, neighbor_id) int pairs —
    negligible next to the searches.
    """
    # localCheckpoint: exact feeds two semi-joins and two aggregates —
    # each reuse would re-run the full Arrow matmul top-k otherwise
    # (11 shuffles without truncation; O(queries x 5) storage).
    exact = (
        q10_cosine_topk(spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .transform(ckpt)
    )
    out = None
    for method, fn in (("ivf", l3_ann_ivf), ("lsh", l3_ann_lsh)):
        ann = fn(spark, sf_dir).select("vec_id", "neighbor_id")
        matched = exact.join(ann, ["vec_id", "neighbor_id"], "left_semi")
        row = (
            exact.agg(
                (F.count("*") / 5).cast("long").alias("n_queries"),
                F.count("*").alias("n_exact"),
            )
            .crossJoin(matched.agg(F.count("*").alias("n_match")))
            .select(
                F.lit(method).alias("method"),
                "n_queries",
                (
                    F.col("n_match").cast("double") / F.col("n_exact") >= 0.70
                ).alias("recall_ge_070"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# S3/L4 — temperature resampling (T=2): the multilingual data-mixing
# standard. Sampling shares ∝ n_s^(1/T) = sqrt(n_s) flatten the language
# distribution without equalizing it (s3c) or preserving it (s7's
# stratified split) — head languages shrink, tail languages keep
# everything they can. Selection is the same deterministic
# multiplicative-hash order as s3c: the hash IS the sample.
# ---------------------------------------------------------------------------

_TEMP_RESAMPLE_ORACLE = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
st AS (SELECT ROUND(SUM(sqrt(n)), 6) AS s, MIN(n) AS n_min FROM c),
q AS (
  SELECT lang,
         FLOOR(ROUND(FLOOR(s * sqrt(n_min)) * sqrt(n) / s, 6)) AS quota
  FROM c, st
),
rk AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 10000, doc_id
         ) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang FROM rk r JOIN q USING (lang) WHERE r.rk <= q.quota
"""


@register("s9_temperature_resample", oracle=_TEMP_RESAMPLE_ORACLE, tags=("S3", "L4", "W2"))
def s9_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-T=2 language rebalancing: per-language quotas ∝
    sqrt(n_lang), scaled to the largest total budget for which every
    quota is feasible (T_total = floor(Σsqrt · sqrt(min n)) — the min
    language is the binding constraint and keeps ~everything). At
    sf0.01 this keeps 383 of 500 docs: en 218→117 while fr keeps 63 of
    64. Share math is double sqrt/divide with the SAME expression tree
    on both engines (IEEE ops are correctly rounded, so identical
    shapes give identical bits), rounded at 6 dp before the floor;
    selection per language is the multiplicative-hash window with
    doc_id tiebreak.

    Scale: one tiny aggregate (|langs| rows, broadcast back) + one
    window keyed on lang — same two-phase-top-K escape as s3c if a
    language's quota is huge.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    st = c.agg(
        F.round(F.sum(F.sqrt(F.col("n"))), 6).alias("s"),
        F.min("n").alias("n_min"),
    )
    q = (
        c.crossJoin(F.broadcast(st))
        .select(
            "lang",
            F.floor(
                F.round(
                    F.floor(F.col("s") * F.sqrt(F.col("n_min")))
                    * F.sqrt(F.col("n"))
                    / F.col("s"),
                    6,
                )
            ).alias("quota"),
        )
    )
    h = (F.col("doc_id") * 2654435761) % 10000
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(q), "lang")
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# L4 — corpus-trained unigram LM scoring (the CCNet-style quality
# filter shape: score every document by how typical its tokens are of
# the corpus, then gate on the score). Two passes: global token
# frequencies, then per-document mean log-probability.
# ---------------------------------------------------------------------------

_UNIGRAM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS tok
  FROM documents
),
freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(ln(CAST(f.c AS DOUBLE) / CAST(tot.n AS DOUBLE))), 6) AS avg_logprob
FROM toks t JOIN freq f USING (tok), tot
GROUP BY t.doc_id
"""


@register("l4_unigram_logprob", oracle=_UNIGRAM_ORACLE, tags=("L4", "A1", "J1"))
def l4_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability per document under the corpus's own
    unigram LM: mean over the document's tokens of ln(count(token) /
    total tokens). Documents full of rare tokens score low — the cheap
    stand-in for the KenLM perplexity gate in CCNet-style pipelines
    (no smoothing needed: every scored token is in the vocabulary by
    construction). Mean rounds at 6 dp — the log-sum fold order
    differs between engines at ~1e-14.

    Scale: frequency table is a token-keyed aggregate (hot stopwords
    partial-aggregate map-side); the score join broadcasts it when the
    vocab is small and shuffle-joins on token otherwise — either way
    the document text itself is never shuffled, only (doc_id, token)
    pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(
                    F.log(
                        F.col("c").cast("double") / F.col("n").cast("double")
                    )
                ),
                6,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# L4 — DSIR-style importance selection (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling" — public
# method): score every candidate document by how much more likely its
# tokens are under a TARGET-domain unigram LM than under the general
# corpus LM, and keep the top-k. Here the target domain is the English
# sub-corpus and candidates are the non-English docs (the cross-lingual
# form: which zh/es/de/fr docs look most like the en distribution).
# ---------------------------------------------------------------------------

_DSIR_K = 50
_DSIR_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS tok
  FROM documents
),
tgt AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks WHERE lang = 'en' GROUP BY tok
),
tgt_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tgt),
corp AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
corp_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM corp),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM corp),
scored AS (
  SELECT t.doc_id,
         ROUND(AVG(
           ln((COALESCE(g.c, 0) + 1.0) / (tgt_tot.n + vocab.v))
           - ln((cp.c + 1.0) / (corp_tot.n + vocab.v))
         ), 6) AS importance
  FROM toks t
  LEFT JOIN tgt g USING (tok)
  JOIN corp cp USING (tok), tgt_tot, corp_tot, vocab
  WHERE t.lang <> 'en'
  GROUP BY t.doc_id
)
SELECT doc_id, importance
FROM scored
ORDER BY importance DESC, doc_id
LIMIT {_DSIR_K}
"""


@register("l4_dsir_selection", oracle=_DSIR_ORACLE, tags=("L4", "J2", "O2"))
def l4_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection: per candidate (non-en) document, the
    mean per-token log-likelihood ratio between the en-trained and the
    corpus-trained unigram LMs (both add-one smoothed over the shared
    vocabulary), top-{k} kept with a doc_id tiebreak. High scorers use
    tokens the target domain over-represents — the cheap importance
    weight the DSIR paper feeds to resampling.

    Scale: two frequency aggregates over the same exploded token
    stream (one filtered), both broadcast to the scoring join — the
    token stream is read once and only (doc_id, token) pairs shuffle.
    The top-k compiles to TakeOrderedAndProject. The ratio's AVG
    rounds at 6 dp (fold order); smoothing constants are exact
    integers on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    tgt = toks.filter(F.col("lang") == "en").groupBy("tok").agg(
        F.count("*").alias("gc")
    )
    corp = toks.groupBy("tok").agg(F.count("*").alias("cc"))
    consts = corp.agg(
        F.sum("cc").alias("corp_n"), F.count("*").alias("vocab_v")
    ).crossJoin(tgt.agg(F.sum("gc").alias("tgt_n")))
    llr = F.log(
        (F.coalesce(F.col("gc"), F.lit(0)) + 1.0)
        / (F.col("tgt_n") + F.col("vocab_v"))
    ) - F.log((F.col("cc") + 1.0) / (F.col("corp_n") + F.col("vocab_v")))
    scored = (
        toks.filter(F.col("lang") != "en")
        .join(F.broadcast(tgt), "tok", "left")
        .join(F.broadcast(corp), "tok")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(F.round(F.avg(llr), 6).alias("importance"))
    )
    return scored.orderBy(F.col("importance").desc(), "doc_id").limit(_DSIR_K)


# ---------------------------------------------------------------------------
# L2/graph — PageRank over the near-duplicate graph (3 unrolled
# iterations). Iterative algorithms are where engines usually diverge
# (float accumulation order per iteration compounds); here every
# iteration is EXACT integer arithmetic — rank in micro-units, floored
# integer division for each neighbor contribution — so both engines
# walk bit-identical states. The standard "which documents sit at the
# center of a duplication cluster" centrality signal.
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000  # rank 1.0 in integer micro-units

_PAGERANK_ORACLE = rf"""
WITH g0 AS (
  SELECT doc_id, unnest(gs) AS gram FROM (
    SELECT doc_id, {_CHARGRAMS} AS gs FROM documents)
),
dfreq AS (SELECT gram, count(*) AS df FROM g0 GROUP BY gram),
g AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN dfreq USING(gram)
      WHERE df <= {_NGRAM_DF_CAP}),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
cpairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY da, db
),
pairs AS (
  SELECT da AS doc_a, db AS doc_b
  FROM cpairs
  JOIN sizes sa ON sa.doc_id = da
  JOIN sizes sb ON sb.doc_id = db
  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
r0 AS (SELECT src AS id, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg),
it1 AS (
  SELECT e.dst AS id,
         CAST(150000 + (85 * SUM(r0.r // deg.d)) // 100 AS BIGINT) AS r
  FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
it2 AS (
  SELECT e.dst AS id,
         CAST(150000 + (85 * SUM(it1.r // deg.d)) // 100 AS BIGINT) AS r
  FROM e JOIN it1 ON e.src = it1.id JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
it3 AS (
  SELECT e.dst AS id,
         CAST(150000 + (85 * SUM(it2.r // deg.d)) // 100 AS BIGINT) AS r
  FROM e JOIN it2 ON e.src = it2.id JOIN deg ON e.src = deg.src
  GROUP BY e.dst
)
SELECT id AS doc_id, ROUND(r / {_PR_SCALE}.0, 6) AS pagerank
FROM it3
ORDER BY r DESC, id
LIMIT 20
"""


@register("g1_pagerank_neardup", oracle=_PAGERANK_ORACLE, tags=("L2", "J1", "A1", "O2"))
def g1_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank centrality over the df-capped trigram-Jaccard
    ≥ 0.8 near-duplicate graph (l2_ngram_jaccard's bounded pair join —
    the token-Jaccard graph degenerates to ~O(n²) edges on this
    fixture's 31-word vocabulary), 3 unrolled iterations, damping 0.85.
    Rank lives in integer micro-units: each neighbor contribution is
    `r DIV deg` (floored integer division) and the damped update is
    `150000 + (85·Σ) DIV 100` — every iteration is an exact integer
    state identical on both engines, immune to the float accumulation
    ordering that usually makes iterative algorithms ungradable. The
    ~1e-6 quantization per step is noise for a centrality ranking.

    Scale: each iteration is one shuffle (groupBy dst) joined against
    an edge list partitioned by src — textbook distributed PageRank; 3
    static iterations unroll into one Catalyst plan with no
    driver-side loop state. At 100 TB the same loop runs
    checkpoint-per-iteration to cut lineage; the edge list's df cap
    already bounds per-gram join fan-out, and the LSH candidate stage
    can replace it wholesale without touching the rank loop.
    """
    pairs = l2_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    e = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # The edge list is checkpointed ONCE before the rank loop: without
    # it each of the 3 unrolled iterations re-embeds the 7-shuffle
    # ngram-Jaccard candidate subtree in the plan (108 in-plan
    # exchanges, VERDICT r4) — exchange reuse saved the runtime but
    # Catalyst still walked the tree. Post-checkpoint the loop sees a
    # leaf scan; blocks are released by the ContextCleaner when the
    # result goes out of scope.
    e = e.transform(iter_ckpt)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(_PR_SCALE).cast("long").alias("r")
    )
    for _ in range(3):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .join(deg, "src")
            .select("dst", F.expr("r DIV d").alias("c"))
        )
        ranks = contrib.groupBy("dst").agg(
            (F.lit(150000) + F.expr("85 * sum(c) DIV 100"))
            .cast("long")
            .alias("r")
        ).select(F.col("dst").alias("id"), "r")
    return (
        ranks.select(
            F.col("id").alias("doc_id"),
            F.round(F.col("r") / _PR_SCALE, 6).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# L6 — embedding covariance matrix (the input to PCA/whitening/ZCA —
# what a feature-decorrelation stage consumes). Upper triangle only:
# 64·65/2 = 2080 (dim_i, dim_j) cells from one pass over the vectors.
# ---------------------------------------------------------------------------

_COV_ORACLE = """
WITH cells AS (
  SELECT i.i AS dim_i, j.j AS dim_j,
         SUM(e.embedding[i.i]::DOUBLE * e.embedding[j.j]::DOUBLE) AS sxy,
         SUM(e.embedding[i.i]::DOUBLE) AS sx,
         SUM(e.embedding[j.j]::DOUBLE) AS sy,
         COUNT(*) AS n
  FROM embeddings e, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
  WHERE j.j >= i.i
  GROUP BY i.i, j.j
)
SELECT dim_i, dim_j,
       ROUND((sxy - sx * sy / n) / (n - 1), 6) + 0 AS cov
FROM cells
"""


@register("l6_covariance_matrix", oracle=_COV_ORACLE, tags=("L6", "A11", "F5"))
def l6_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance of the 64-d embedding space, upper triangle as
    (dim_i, dim_j, cov) rows — the sufficient statistics for PCA /
    whitening computed without ever collecting a vector. Each row emits
    its 2080 upper-triangle products as struct rows in one projection;
    the groupBy partial-aggregates map-side, so the shuffle carries
    2080 cells × partitions, not 2080 × rows. cov = (Σxy − ΣxΣy/n)/
    (n−1) is the same expression tree on both engines, rounded at 6 dp
    (double fold order differs at ~1e-13).

    Optimization r12: the r1–r11 form emitted all 2080 upper-triangle
    cells as 5-field struct rows through nested interpreted HOF
    transforms (4.16M structs at sf0.1 — 21 s, almost all lambda
    interpretation). Now one ``posexplode`` emits (dim_i, x, vec) rows
    and the 64 per-dim_j products are 64 plain whole-stage-codegen'd
    SUM aggregates (sx and n ride the same groupBy; sy is dim_j's sx,
    re-attached by a 64-row broadcast self-join); the full d×d product
    matrix costs 2× the triangle's multiplies but every op is codegen
    — measured ~14× faster. Identical cov expression, same 6-dp
    rounding.

    Scale: one pass, one narrow shuffle — the classic distributed
    second-moment pattern; at 1000 dims the per-group aggregate list
    grows to d columns (the shuffle still carries d² cells ×
    partitions, not × rows), and the eigen-solve on the 64×64 (or
    1000×1000) result is a driver-side O(d³) afterthought.
    """
    d = 64
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    ex = e.select(F.posexplode(v).alias("pos", "x"), v.alias("vec"))
    m = ex.groupBy((F.col("pos") + 1).alias("dim_i")).agg(
        F.sum("x").alias("sx"),
        F.count("*").alias("n"),
        *[
            F.sum(F.col("x") * F.element_at(F.col("vec"), j)).alias(f"_s{j}")
            for j in range(1, d + 1)
        ],
    )
    long = (
        m.select(
            "dim_i",
            "sx",
            "n",
            F.posexplode(F.array(*[F.col(f"_s{j}") for j in range(1, d + 1)])).alias(
                "pos_j", "sxy"
            ),
        )
        .withColumn("dim_j", F.col("pos_j") + 1)
        .filter(F.col("dim_j") >= F.col("dim_i"))
    )
    sy = m.select(F.col("dim_i").alias("dim_j"), F.col("sx").alias("sy"))
    agg = long.join(F.broadcast(sy), "dim_j")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    # `+ 0.0` normalizes IEEE negative zero: a cell whose true cov sits
    # just below 0 can round to -0.0 on one engine and 0.0 on the other
    # (observed: one cell at sf0.01), and the driver hashes the strings.
    return agg.select(
        "dim_i", "dim_j", (F.round(cov, 6) + F.lit(0.0)).alias("cov")
    )


# ---------------------------------------------------------------------------
# J8/L2 — blocked fuzzy string join: entity-resolution's bread and
# butter (match near-identical names without the O(n²) cross product).
# Blocking is PART OF THE SPEC — candidates must share word 1 or
# word 2 — so both engines compute identical semantics and the pair
# set grades exactly; Levenshtein is integer DP, bit-identical
# cross-engine.
# ---------------------------------------------------------------------------

_FUZZY_ED = 2

_FUZZY_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, p_name,
         string_split(p_name, ' ')[1] AS w1,
         string_split(p_name, ' ')[2] AS w2
  FROM part
),
cand AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM p a JOIN p b ON a.w1 = b.w1 AND a.p_partkey < b.p_partkey
  UNION
  SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
  FROM p a JOIN p b ON a.w2 = b.w2 AND a.p_partkey < b.p_partkey
)
SELECT key_a, key_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {_FUZZY_ED}
"""


@register("j9_fuzzy_name_join", oracle=_FUZZY_ORACLE, tags=("J8", "L2", "F1"))
def j9_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join on part names: pairs within Levenshtein distance
    {ed} that share their first or second word — the word-blocked form
    of entity resolution. Candidates meet in per-word buckets (two
    equi-joins, unioned, deduped), then the exact distance filters —
    never the n² cross product. Pairs whose edits change BOTH words
    are out of scope by definition (the blocking is the spec; PassJoin
    segment blocking is the lossless generalization when needed).

    Optimization r12 (55 s → per-block map-side at sf0.1): the name
    vocabulary is 16 words, so each word block holds ~1/16 of all
    parts and the two blocks generate ~25M candidates — the cost was
    never the DP but UNION+DISTINCT shuffling 25M wide (two-name) rows
    twice before filtering. Now each block is a BroadcastHashJoin
    (the name table broadcasts at this tier), candidates prune
    map-side by the exact length bound (|len a − len b| ≤ ed ⇐
    levenshtein ≤ ed), the DP is the THRESHOLDED form
    (levenshtein(a, b, ed): banded O(len·ed) instead of O(len²),
    returns −1 above the bound — values ≤ ed are the exact distance),
    and only surviving (key, key, dist) rows — the result set ×2 —
    reach the union+distinct. Distance is deterministic per pair, so
    dedup-after-filter is set-identical to the oracle's
    dedup-then-filter.

    Scale: shuffle keys are single words — the hot-word skew cap from
    l2_ngram_jaccard applies verbatim (drop words with df above a
    bound, or salt); past the broadcast tier the same code runs as
    shuffled equi-joins. Both engines run the identical integer DP on
    survivors, so edit_dist grades exactly with no tolerance.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0).alias("w1"),
        F.split(F.col("p_name"), " ").getItem(1).alias("w2"),
    )
    # The fixture writes part.parquet as one row group → a 1-task scan;
    # without a spread the broadcast join evaluates all ~25M candidate
    # DPs on that one task (measured: 45 s). Round-robin the stream
    # side across the session's parallelism — at 100 TB multi-row-group
    # files make this a no-op-sized exchange relative to the scan.
    a = p.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = F.broadcast(p.alias("b"))
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), _FUZZY_ED)

    def block(word: str):
        return (
            a.join(
                b,
                (F.col(f"a.{word}") == F.col(f"b.{word}"))
                & (F.col("a.p_partkey") < F.col("b.p_partkey"))
                & (
                    F.abs(
                        F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))
                    )
                    <= _FUZZY_ED
                ),
            )
            .filter(dist >= 0)
            .select(
                F.col("a.p_partkey").alias("key_a"),
                F.col("b.p_partkey").alias("key_b"),
                dist.cast("long").alias("edit_dist"),
            )
        )

    return block("w1").union(block("w2")).distinct()


# ---------------------------------------------------------------------------
# A14 — frequent co-occurrence mining (market-basket pairs): which part
# pairs appear together in the same order more often than chance. The
# association-rule primitive (support + lift) as one bounded self-join —
# per-basket item counts cap the fan-out, so this is NOT an n² join.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Shared co-purchase pipeline: distinct (order, part) baskets self-join
# into id-ordered pair counts. ONE definition of the edge/rule base for
# a14 (rules), g2 (triangles), g3 (BFS) and q31 (top-k lift) — the four
# operators must agree on what "co-purchased" means or they silently
# diverge.
# ---------------------------------------------------------------------------


def co_purchase_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) basket membership."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def co_purchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int
) -> DataFrame:
    """(u, v, n_uv): parts co-purchased in ≥ min_support shared baskets,
    id-ordered u < v so each pair counts once. One bounded-fan-out
    self-join per basket — never all-parts²."""
    li = co_purchase_baskets(spark, sf_dir)
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("n_uv"))
        .filter(F.col("n_uv") >= min_support)
    )


def oracle_co_edges(min_support: int) -> str:
    """The DuckDB CTE twin of co_purchase_edges: defines ``li`` and
    ``e(u, v, n_uv)`` for interpolation into a WITH clause."""
    return f"""li AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS n_uv
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
)"""


_COPURCHASE_MIN_SUP = 3

_COPURCHASE_ORACLE = f"""
WITH {oracle_co_edges(_COPURCHASE_MIN_SUP)},
n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
item_cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY l_partkey)
SELECT u AS part_a, v AS part_b, n_uv AS support,
       ROUND(CAST(n_uv AS DOUBLE) * n_orders.n
             / (ca.c * cb.c), 6) AS lift
FROM e
JOIN item_cnt ca ON ca.l_partkey = u
JOIN item_cnt cb ON cb.l_partkey = v, n_orders
"""


@register("a14_copurchase_pairs", oracle=_COPURCHASE_ORACLE, tags=("A1", "J8", "A3"))
def a14_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: distinct (order, part) baskets
    self-join on the order key, pair support counted, kept at support ≥
    {sup}, with lift = support·N / (count_a·count_b) — the association
    strength that separates genuinely coupled items from popular ones.
    Lift is one double expression over exact integers, identical on
    both engines, rounded at 6 dp.

    Scale: the self-join fans out only within a basket (≤13 items in
    this fixture ⇒ ≤78 pairs per order), so cost is Σ basket², not n² —
    the reason every production frequent-itemset pass starts from the
    basket-grouped form. The support HAVING partial-aggregates before
    its exchange; item counts broadcast to the final lift join.
    """
    li = co_purchase_baskets(spark, sf_dir)
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n"))
    item_cnt = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    pairs = co_purchase_edges(spark, sf_dir, _COPURCHASE_MIN_SUP).select(
        F.col("u").alias("part_a"),
        F.col("v").alias("part_b"),
        F.col("n_uv").alias("support"),
    )
    ca = item_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("ca")
    )
    cb = item_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("cb")
    )
    lift = F.round(
        F.col("support").cast("double") * F.col("n") / (F.col("ca") * F.col("cb")), 6
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select("part_a", "part_b", "support", lift.alias("lift"))
    )


# ---------------------------------------------------------------------------
# S3/L3 — deterministic negative sampling for contrastive training:
# every anchor embedding gets K pseudo-random negatives drawn by
# multiplicative hashing over the id rank space — no RNG state, the
# hash IS the sample (same rule as s3c/s9), so the pairing reproduces
# bit-for-bit across runs, engines, and partitionings.
# ---------------------------------------------------------------------------

_NEG_K = 4

_NEG_SAMPLE_ORACLE = f"""
WITH r AS (
  SELECT vec_id, label,
         row_number() OVER (ORDER BY vec_id) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM embeddings
),
drawn AS (
  SELECT a.vec_id AS anchor_id, k.k AS k, a.label AS a_label,
         (a.rk * 2654435761 + k.k * 40503) % a.n AS neg_rk0,
         a.rk, a.n
  FROM r a, generate_series(1, {_NEG_K}) k(k)
),
fixed AS (
  SELECT anchor_id, k, a_label,
         CASE WHEN neg_rk0 = rk THEN (neg_rk0 + 1) % n ELSE neg_rk0 END AS neg_rk
  FROM drawn
)
SELECT f.anchor_id, f.k, b.vec_id AS neg_id,
       (f.a_label = b.label) AS same_label
FROM fixed f JOIN r b ON f.neg_rk = b.rk
"""


@register("s10_negative_sampling", oracle=_NEG_SAMPLE_ORACLE, tags=("S3", "L3", "J1"))
def s10_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K={k} negatives per anchor for contrastive training: anchor rank
    r draws negative ranks (r·2654435761 + k·40503) mod n (bumped by
    one when it lands on itself), resolved back to vec_ids by an
    equi-join on rank. `same_label` flags collisions with the anchor's
    own class — downstream losses either drop or weight them; the flag
    makes the false-negative rate auditable.

    Distinctness caveat (documented by design): two draws for one
    anchor can collide — k≠k' may hash to the same rank mod n
    (~K²/2n of anchors), and the self-collision +1 bump can land on
    another k's draw — so the K negatives are not guaranteed distinct.
    Contrastive losses tolerate (and reweight) repeated negatives;
    callers needing distinct draws should dedup (anchor_id, neg_id)
    downstream. Oracle and operator share the exact same draw rule, so
    parity is unaffected.

    Scale: the rank spine uses ``scalable_row_number`` (bucket-local
    sort + tiny offsets window — never a global single-partition sort;
    VERDICT r2 #3); the draw is a projection and the resolve is a
    shuffle-join on an int key, uniformly distributed by construction
    — no hot keys, no RNG coordination across executors.
    """
    from ._helpers import scalable_row_number

    e = load_table(spark, sf_dir, "embeddings")
    spine = scalable_row_number(
        e.select("vec_id", "label"), "vec_id", bucket_width=256
    )
    r = spine.select(
        "vec_id", "label", (F.col("rn") - 1).alias("rk")
    ).crossJoin(F.broadcast(e.agg(F.count("*").alias("n"))))
    ks = spark.range(1, _NEG_K + 1).select(F.col("id").cast("int").alias("k"))
    drawn = r.crossJoin(F.broadcast(ks)).select(
        F.col("vec_id").alias("anchor_id"),
        "k",
        F.col("label").alias("a_label"),
        ((F.col("rk") * 2654435761 + F.col("k") * 40503) % F.col("n")).alias(
            "neg_rk0"
        ),
        "rk",
        "n",
    )
    fixed = drawn.select(
        "anchor_id",
        "k",
        "a_label",
        F.when(
            F.col("neg_rk0") == F.col("rk"), (F.col("neg_rk0") + 1) % F.col("n")
        )
        .otherwise(F.col("neg_rk0"))
        .alias("neg_rk"),
    )
    b = r.select(
        F.col("rk").alias("neg_rk"),
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("b_label"),
    )
    return fixed.join(b, "neg_rk").select(
        "anchor_id",
        "k",
        "neg_id",
        (F.col("a_label") == F.col("b_label")).alias("same_label"),
    )


# ---------------------------------------------------------------------------
# L4 — bigram LM scoring: the conditional-probability upgrade of
# l4_unigram_logprob (fluency, not just vocabulary typicality — word
# ORDER now matters). Add-one smoothing over the corpus vocabulary
# keeps unseen transitions finite without a backoff table.
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS ts
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts)-1),
                i -> ts[i] || ' ' || ts[i+1])) AS bigram,
         unnest(list_transform(generate_series(1, len(ts)-1), i -> ts[i])) AS w1
  FROM t WHERE len(ts) >= 2
),
bgc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY bigram),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu
  FROM (SELECT unnest(ts) AS tok FROM t) GROUP BY tok
),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln((bgc.cb + 1.0) / (uni.cu + vocab.v))), 6) AS avg_bigram_logprob
FROM bg b
JOIN bgc USING (bigram)
JOIN uni ON uni.tok = b.w1, vocab
GROUP BY b.doc_id
"""


@register("l4_bigram_logprob", oracle=_BIGRAM_ORACLE, tags=("L4", "A1", "J1"))
def l4_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram log-probability per document under
    the corpus's own bigram LM: ln((C(w1 w2)+1)/(C(w1)+V)) averaged
    over the document's transitions. Where the unigram gate scores
    vocabulary typicality, this scores FLUENCY — shuffled or
    glitch-concatenated text collapses even when every word is common
    (the next rung toward CCNet's KenLM gate). 6 dp round on the mean
    (fold order); the probability ratio itself is exact-integer in
    double.

    Scale: bigram and unigram count tables are token-keyed aggregates
    over one exploded pass; both broadcast to the scoring join at this
    vocab (shuffle-join on the bigram key when they outgrow it) — the
    document text never shuffles, only (doc_id, bigram) pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ts)-1), i -> struct(concat(ts[i-1], ' ', ts[i]) AS bigram, ts[i-1] AS w1))")
        ).alias("p"),
    ).select("doc_id", "p.bigram", "p.w1")
    bgc = bg.groupBy("bigram").agg(F.count("*").alias("cb"))
    uni = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cu"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    return (
        bg.join(F.broadcast(bgc), "bigram")
        .join(F.broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("v")))), 6
            ).alias("avg_bigram_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# L1/L2 — incremental cross-corpus dedup: the ingestion-time form of
# dedup (every crawl snapshot is cleaned AGAINST the corpus you already
# kept, not just within itself). Splitting the fixture by doc_id parity
# stands in for (existing corpus, incoming batch).
# ---------------------------------------------------------------------------

_XDEDUP_ORACLE = r"""
WITH keyed AS (
  SELECT doc_id, lang,
         array_to_string(list_sort(list_distinct(
           list_filter(string_split_regex(text, '\s+'), x -> x != ''))), ' ')
           AS tokenset_key
  FROM documents
),
corpus AS (SELECT * FROM keyed WHERE doc_id % 2 = 0),
incoming AS (SELECT * FROM keyed WHERE doc_id % 2 = 1)
SELECT i.lang,
       CAST(COUNT(*) AS BIGINT) AS n_incoming,
       CAST(SUM(CASE WHEN c.tokenset_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_vs_corpus,
       CAST(SUM(CASE WHEN c.tokenset_key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_admitted
FROM incoming i
LEFT JOIN (SELECT DISTINCT tokenset_key FROM corpus) c USING (tokenset_key)
GROUP BY i.lang
"""


@register("l1_cross_corpus_dedup", oracle=_XDEDUP_ORACLE, tags=("L1", "L2", "J4"))
def l1_cross_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup audit: incoming docs (odd ids) whose
    canonical token-set fingerprint already exists in the kept corpus
    (even ids) are rejected; per-language admit/reject counts. The
    within-batch form is l1_exact_dedup — this is the ACROSS-snapshots
    form every recurring crawl needs, shaped as a left join against
    the corpus's distinct fingerprint set (anti-join semantics with an
    audit trail).

    Scale: the corpus side reduces to distinct fingerprints before the
    join — at 100 TB that set lives as a bucketed/sorted table keyed
    by xxhash64(fingerprint) so each snapshot's join is co-located and
    incremental (append new fingerprints after admission); the
    incoming batch never shuffles its text, only its keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "lang", T.token_set_key(F.col("text")).alias("tokenset_key")
    )
    corpus_keys = (
        keyed.filter(F.col("doc_id") % 2 == 0).select("tokenset_key").distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    incoming = keyed.filter(F.col("doc_id") % 2 == 1)
    return (
        incoming.join(F.broadcast(corpus_keys), "tokenset_key", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(
                F.when(F.col("in_corpus").isNotNull(), 1).otherwise(0)
            ).alias("n_dup_vs_corpus"),
            F.sum(F.when(F.col("in_corpus").isNull(), 1).otherwise(0)).alias(
                "n_admitted"
            ),
        )
    )


# ---------------------------------------------------------------------------
# L3 — MMR (maximal marginal relevance) diversified re-ranking: the
# standard fix for near-duplicate retrieval results (RAG context
# stuffing, search page diversity). Greedy is inherently sequential —
# here the 5 picks unroll into a static plan (and a matching CTE
# chain), with every score a rounded-6dp expression and a unique id
# tiebreak, so both engines select the identical sequence.
# ---------------------------------------------------------------------------

_MMR_K = 5
_MMR_POOL = 20
_MMR_LAMBDA = 0.7
_MMR_MU = 0.3  # NOT computed as 1-λ: double(1-0.7)=0.30000000000000004 ≠ double(0.3)


def _mmr_oracle() -> str:
    head = f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT b.vec_id AS id,
         ROUND(list_cosine_similarity(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS rel
  FROM embeddings b, q WHERE b.vec_id <> 0
  ORDER BY rel DESC, id LIMIT {_MMR_POOL}
),
sims AS (
  SELECT a.id AS ia, b.id AS ib,
         ROUND(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim
  FROM cand a JOIN cand b ON a.id <> b.id
  JOIN embeddings ea ON ea.vec_id = a.id
  JOIN embeddings eb ON eb.vec_id = b.id
),
s1 AS (SELECT id, rel, 1 AS pick FROM cand ORDER BY rel DESC, id LIMIT 1)"""
    ctes = [head]
    for k in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(f"SELECT id FROM s{i}" for i in range(1, k))
        ctes.append(f""",
s{k} AS (
  SELECT c.id, c.rel, {k} AS pick
  FROM cand c JOIN sims ON sims.ia = c.id AND sims.ib IN ({prev})
  WHERE c.id NOT IN ({prev})
  GROUP BY c.id, c.rel
  ORDER BY {_MMR_LAMBDA} * c.rel - {_MMR_MU} * MAX(sims.sim) DESC, c.id
  LIMIT 1
)""")
    union = " UNION ALL ".join(
        f"SELECT pick, id AS vec_id, rel FROM s{i}" for i in range(1, _MMR_K + 1)
    )
    return "".join(ctes) + "\n" + union


@register("l3_mmr_rerank", oracle=_mmr_oracle(), tags=("L3", "O2", "W2"))
def l3_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking of the query-0 cosine top-{pool}: greedily pick
    {k} results maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-picked (λ={lam}). The first pick is pure relevance; each
    later pick penalizes redundancy against everything selected so far
    — near-duplicate hits that dominate plain top-k drop out.

    Determinism: relevance and pairwise sims round at 6 dp BEFORE the
    greedy loop, the MMR score is one identical double expression, and
    every argmax carries the id tiebreak — both engines walk the same
    5-step selection path.

    Scale: the pool is a TakeOrderedAndProject over one broadcast-query
    scan; the {pool}×{pool} sim matrix and the 5 unrolled argmaxes are
    driver-trivial by construction (MMR cost is quadratic in the POOL,
    never in the corpus — that's the point of re-ranking a candidate
    pool instead of the collection).
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            "embedding",
            "nrm",
            F.round(
                V.dot(F.col("embedding"), F.col("q_emb"))
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "id")
        .limit(_MMR_POOL)
    )
    a, b = cand.alias("a"), cand.alias("b")
    sims = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.col("a.id").alias("ia"),
        F.col("b.id").alias("ib"),
        F.round(
            V.dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.nrm") * F.col("b.nrm")),
            6,
        ).alias("sim"),
    )
    # Pool relevances and the pool×pool sim matrix are computed
    # DISTRIBUTED (identical rounded expressions to the oracle), then
    # collected — ≤ pool + pool² tiny rows — and the greedy argmax runs
    # driver-side, the same documented pattern as q10's index build:
    # MMR cost is quadratic in the POOL, never the corpus.
    pool = cand.select("id", "rel").collect()
    sim_rows = sims.collect()
    sim = {(r.ia, r.ib): r.sim for r in sim_rows}
    rel = {r.id: r.rel for r in pool}
    remaining = sorted(rel)
    selected: list[int] = []
    out_rows = []
    for k in range(1, _MMR_K + 1):
        if k == 1:
            best = max(remaining, key=lambda i: (rel[i], -i))
        else:
            def mmr_score(i: int) -> float:
                return _MMR_LAMBDA * rel[i] - _MMR_MU * max(
                    sim[(i, s)] for s in selected
                )

            best = max(remaining, key=lambda i: (mmr_score(i), -i))
        selected.append(best)
        remaining.remove(best)
        out_rows.append((k, best, rel[best]))
    return spark.createDataFrame(out_rows, "pick int, vec_id bigint, rel double")


# ---------------------------------------------------------------------------
# L4 — quality-score decile calibration: equal-frequency bins over the
# corpus's quality distribution, the lookup a mixing pipeline uses to
# turn raw scores into sampling tiers ("take everything above decile 8,
# downsample deciles 4–7, drop the rest") without trusting the score's
# absolute scale.
# ---------------------------------------------------------------------------

_QDECILE_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id,
         LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
           * (CASE WHEN len({_ORACLE_TOKS}) > 0
                   THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE) / len({_ORACLE_TOKS})
                   ELSE 0.0 END) AS quality
  FROM documents
),
binned AS (
  SELECT quality,
         ntile(10) OVER (ORDER BY quality, doc_id) AS decile
  FROM scored
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(quality), 6) AS mean_quality,
       MIN(quality) AS lo,
       MAX(quality) AS hi
FROM binned
GROUP BY decile
"""


@register("l4_quality_deciles", oracle=_QDECILE_ORACLE, tags=("L4", "W1", "A1"))
def l4_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile bins over l4_quality_score's distribution:
    per decile, the document count and the score range — the empirical
    CDF a data-mixing config quotes its thresholds against. The
    (quality, doc_id) order carries a unique tiebreak, so bin
    assignment (and thus lo/hi edges) is engine-identical; the raw
    scores are integer-ratio doubles needing no rounding, only the
    fold-ordered mean rounds.

    Scale: EXACT ntile(10) without a global sort (VERDICT r2 #3) —
    ``scalable_row_number`` in its distribution-FREE range-bucketed
    form (round 7, VERDICT r6 what's-wrong #1: the previous coarse
    bucket floor(quality·50) collapsed into ONE bucket whenever a
    single score dominates the corpus — a data-dependent score must
    never be the bucketing key; range bounds sampled over
    (quality, doc_id) stay balanced even then). The ntile bucket
    boundaries are pure arithmetic on (rn, n): the
    first n%10 deciles take ⌈n/10⌉ rows, the rest ⌊n/10⌋ — Spark's
    ntile definition, reproduced exactly. The approx twin
    (approx_percentile t-digest edges) stays the cheap screening path;
    this is now both the graded AND the scale-safe exact form.
    """
    from ._helpers import scalable_row_number

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    )
    ranked = scalable_row_number(
        scored,
        order_cols=["quality", "doc_id"],
    ).crossJoin(F.broadcast(scored.agg(F.count("*").alias("n"))))
    big = F.floor(F.col("n") / 10) + 1  # rows in each of the first n%10 deciles
    small = F.floor(F.col("n") / 10)  # rows in each remaining decile
    r = F.col("n") % 10
    cut = r * big  # rank of the last row in the oversized deciles
    decile = F.when(
        F.col("rn") <= cut, F.floor((F.col("rn") - 1) / big) + 1
    ).otherwise(
        r + F.floor((F.col("rn") - cut - 1) / F.greatest(small, F.lit(1))) + 1
    )
    return (
        ranked.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
            F.min("quality").alias("lo"),
            F.max("quality").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# L4 — k-anonymity audit: equivalence-class sizes over quasi-identifier
# columns, flagging classes below k — the tabular-privacy gate that runs
# next to l4_pii_redact before a corpus (or its metadata sidecar) ships.
# ---------------------------------------------------------------------------

_K_ANON = 5

_KANON_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) < {_K_ANON} AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register("l4_k_anonymity", oracle=_KANON_ORACLE, tags=("L4", "A1", "P6"))
def l4_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the (nation, market-segment)
    quasi-identifier pair: every equivalence class with fewer than k
    members is re-identifiable by linking those two public attributes,
    so it must be suppressed or generalized before release. The
    operator emits every class with its size and an at_risk flag —
    the shape a suppression pass consumes directly.

    Scale: one partial-aggregated groupBy on the QID columns — class
    count is bounded by the QID domain product (25×5 here), so the
    reduce side is tiny at any input size. Generalization ladders
    (nation → region) just re-run the same agg on the coarser column.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size"),
        (F.count("*") < _K_ANON).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# S11 — temporal train/test split with leakage audit: unlike s7's hash
# split, a TEMPORAL holdout trains on the past and evaluates on the
# future — and the audit column makes cross-boundary users (the ones
# whose behavior leaks across the cutoff) explicit instead of silent.
# ---------------------------------------------------------------------------

_S11_CUTOFF = "2024-01-22"

_S11_ORACLE = f"""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{_S11_CUTOFF}') AS BIGINT) AS n_train,
       CAST(COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_S11_CUTOFF}') AS BIGINT) AS n_test,
       CASE
         WHEN COUNT(*) FILTER (WHERE ts < TIMESTAMP '{_S11_CUTOFF}') > 0
          AND COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{_S11_CUTOFF}') > 0
           THEN 'both'
         WHEN COUNT(*) FILTER (WHERE ts < TIMESTAMP '{_S11_CUTOFF}') > 0
           THEN 'train_only'
         ELSE 'test_only'
       END AS split_class
FROM events
GROUP BY user_id
"""


@register("s11_temporal_split", oracle=_S11_ORACLE, tags=("S3", "A7", "P6"))
def s11_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout at a fixed cutoff with a per-user leakage
    audit: events before the cutoff are train, at-or-after are test,
    and each user is classified train_only / test_only / both — the
    'both' class is where entity-level leakage lives (a model that
    memorized a user's past is evaluated on that same user's future),
    so evaluation pipelines either drop it or report it separately.

    Scale: a single conditional aggregation over one shuffle on
    user_id — the cutoff predicate also prunes cleanly when events are
    date-partitioned (d1's layout), making the train-side scan skip
    future partitions entirely.
    """
    ev = load_table(spark, sf_dir, "events")
    is_train = F.col("ts") < F.lit(_S11_CUTOFF).cast("timestamp_ntz")
    n_train = F.count(F.when(is_train, 1))
    n_test = F.count(F.when(~is_train, 1))
    return ev.groupBy("user_id").agg(
        n_train.alias("n_train"),
        n_test.alias("n_test"),
        F.when((n_train > 0) & (n_test > 0), "both")
        .when(n_train > 0, "train_only")
        .otherwise("test_only")
        .alias("split_class"),
    )


# ---------------------------------------------------------------------------
# L4 — corpus report ("corpus card"): the per-source summary table a
# dataset release ships — volume, token mass, duplication, language
# spread, and quality — in one pass over the documents table.
# ---------------------------------------------------------------------------

_CORPUS_REPORT_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len({_ORACLE_TOKS})) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_dup_texts,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       ROUND(AVG(
         LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
           * (CASE WHEN len({_ORACLE_TOKS}) > 0
                   THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE) / len({_ORACLE_TOKS})
                   ELSE 0.0 END)), 6) AS mean_quality
FROM documents
GROUP BY source
"""


@register("l4_corpus_report", oracle=_CORPUS_REPORT_ORACLE, tags=("L4", "A1", "A3"))
def l4_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus card: per source, document count, whitespace-token mass,
    language spread, exact duplicate count (docs minus distinct
    texts), char-length range, and mean quality score — the one-table
    summary a dataset release documents itself with (and the drift
    monitor an ingestion pipeline diffs between snapshots).

    Scale: one shuffle on source; COUNT(DISTINCT text) is the one
    heavy part — Spark expands distinct aggregates into a two-phase
    plan automatically, and at 100 TB the text column would first be
    projected to xxhash64(text) so the distinct count shuffles 8-byte
    keys instead of documents (same count, hash collisions
    negligible at 2⁻⁶⁴). Everything else is map-side arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count("*") - F.countDistinct("text")).alias("n_dup_texts"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(T.quality_score(F.col("text"))), 6).alias("mean_quality"),
    )


# ---------------------------------------------------------------------------
# L1 — corpus snapshot diff: the added/removed/changed/unchanged ledger
# between two corpus versions — what an ingestion pipeline publishes
# with every release so downstream training jobs know exactly what
# moved. v2 is derived deterministically from the fixture (no second
# snapshot exists): drop every 31st doc, edit every 17th, add a new doc
# for every 101st.
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH v2 AS (
  SELECT doc_id, text || ' [rev2]' AS text
  FROM documents WHERE doc_id % 31 <> 0 AND doc_id % 17 = 0
  UNION ALL
  SELECT doc_id, text FROM documents
  WHERE doc_id % 31 <> 0 AND doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new in v2 #' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 101 = 0
)
SELECT
  COALESCE(a.doc_id, b.doc_id) AS doc_id,
  CASE WHEN b.doc_id IS NULL THEN 'removed'
       WHEN a.doc_id IS NULL THEN 'added'
       WHEN a.text <> b.text THEN 'changed'
       ELSE 'unchanged' END AS diff_status
FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
"""


@register("l1_corpus_diff", oracle=_DIFF_ORACLE, tags=("L1", "J2", "P6"))
def l1_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between corpus v1 (the documents table) and a
    deterministically derived v2: every doc keyed and classified
    removed / added / changed / unchanged by a full-outer join on
    doc_id with a content comparison — the release ledger that makes
    corpus updates auditable (and incremental re-training possible:
    only 'added' + 'changed' need re-processing).

    Scale: one full-outer shuffle join on the id. The content equality
    here compares text directly; at 100 TB both sides project to
    xxhash64(text) first so the join compares 8-byte fingerprints and
    the texts never ride the shuffle — same ledger, collision odds
    2⁻⁶⁴.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = docs.filter(F.col("doc_id") % 31 != 0)
    v2 = (
        kept.filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"))
        .unionByName(kept.filter(F.col("doc_id") % 17 != 0).select("doc_id", "text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 101 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.lit("new in v2 #"), F.col("doc_id").cast("string")).alias(
                    "text"
                ),
            )
        )
    )
    a = docs.alias("a")
    b = v2.alias("b")
    j = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        F.when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("a.text") != F.col("b.text"), "changed")
        .otherwise("unchanged")
        .alias("diff_status"),
    )


# ---------------------------------------------------------------------------
# L4 — blocklist filter: the unsafe-content gate. Token-set semantics
# (unigram terms + consecutive-bigram phrases), evaluated map-side with
# literal arrays — the formulation that at 100 TB needs no join at all
# for a fixed blocklist, and a broadcast join when the list is a table.
# ---------------------------------------------------------------------------

_BLOCK_UNIGRAMS = ("spill", "skew")
_BLOCK_BIGRAMS = ("slow shuffle", "driver oom")

_BLOCKLIST_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS ts FROM documents
),
b AS (
  SELECT doc_id, ts,
         list_transform(generate_series(1, greatest(len(ts) - 1, 0)),
                        i -> ts[i] || ' ' || ts[i+1]) AS bgs
  FROM t
)
SELECT doc_id,
       list_has_any(ts, ['spill', 'skew']) AS has_term,
       list_has_any(bgs, ['slow shuffle', 'driver oom']) AS has_phrase,
       (list_has_any(ts, ['spill', 'skew'])
          OR list_has_any(bgs, ['slow shuffle', 'driver oom'])) AS blocked
FROM b
"""


@register("l4_blocklist_filter", oracle=_BLOCKLIST_ORACLE, tags=("L4", "F5", "P6"))
def l4_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist gate: flag documents containing any blocklisted term
    (token match) or any blocklisted two-word phrase (consecutive-token
    match) — the safety filter every corpus release runs. Token-set
    semantics, not substring: 'skew' matches the word, never 'skewer',
    with no regex engine in the hot path.

    Scale: tokens and bigrams are HOF projections; the membership tests
    are `arrays_overlap` against LITERAL arrays — pure map-side codegen
    with zero shuffle and zero join for a fixed list. A blocklist
    maintained as a table instead broadcasts and semi-joins on exploded
    tokens; phrase lists beyond bigrams build the n-gram array at width
    n the same way.
    """
    docs = load_table(spark, sf_dir, "documents")
    ts = T.tokens(F.col("text"))
    d = docs.select("doc_id", ts.alias("ts"))
    idxs = F.sequence(
        F.lit(0), F.greatest(F.size("ts") - 2, F.lit(-1))
    )
    bgs = F.when(F.size("ts") >= 2, F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("ts"), i + 1), F.element_at(F.col("ts"), i + 2)
        ),
    )).otherwise(F.array().cast("array<string>"))
    uni_lit = F.array(*[F.lit(t) for t in _BLOCK_UNIGRAMS])
    bi_lit = F.array(*[F.lit(t) for t in _BLOCK_BIGRAMS])
    b = d.select(
        "doc_id",
        F.arrays_overlap(F.col("ts"), uni_lit).alias("has_term"),
        F.arrays_overlap(bgs, bi_lit).alias("has_phrase"),
    )
    return b.select(
        "doc_id",
        "has_term",
        "has_phrase",
        (F.col("has_term") | F.col("has_phrase")).alias("blocked"),
    )


# ---------------------------------------------------------------------------
# L1 — survivorship dedup: keep the BEST duplicate, not the first.
# Exact-dup groups resolved by a quality policy (max quality score,
# doc_id as the deterministic tiebreak) — what a production pipeline
# actually ships when duplicates differ in upstream cleaning.
# ---------------------------------------------------------------------------

_SURVIVOR_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id, text, lang, source,
         LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
           * (CASE WHEN len({_ORACLE_TOKS}) > 0
                   THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE) / len({_ORACLE_TOKS})
                   ELSE 0.0 END) AS q
  FROM documents
)
SELECT doc_id, lang, source
FROM scored
QUALIFY row_number() OVER (PARTITION BY text ORDER BY q DESC, doc_id) = 1
"""


@register("l1_survivorship_dedup", oracle=_SURVIVOR_ORACLE, tags=("L1", "L4", "W2"))
def l1_survivorship_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven exact dedup: within each duplicate-text group the
    survivor is the HIGHEST-quality copy (quality score, doc_id
    tiebreak) instead of l1_exact_dedup's min-id — survivorship is how
    real pipelines resolve duplicates whose metadata or cleaning
    differs. Integer-ratio quality needs no rounding, so the per-group
    argmax is engine-identical.

    Scale: identical shape to l1 — one shuffle hash-partitioned by
    text (xxhash64 key at 100 TB), per-group window over colocated
    duplicates. The policy is just the window's ORDER BY; swapping
    policies (longest, newest, most-linked) never changes the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text", "lang", "source",
        T.quality_score(F.col("text")).alias("q"),
    )
    w = Window.partitionBy("text").orderBy(F.col("q").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# L6 — dominant eigenvector by power iteration: the PCA/whitening
# primitive on top of l6_covariance_matrix. Three fixed matrix-vector
# products from e₁ with NO intermediate normalization (norms divide out
# at the end), so both engines run identical arithmetic on the same
# 6-dp-rounded covariance cells and only the final components round.
# ---------------------------------------------------------------------------

_POWER_ORACLE = """
WITH upper_c AS (
  SELECT i.i AS dim_i, j.j AS dim_j,
         ROUND((SUM(e.embedding[i.i]::DOUBLE * e.embedding[j.j]::DOUBLE)
                 - SUM(e.embedding[i.i]::DOUBLE) * SUM(e.embedding[j.j]::DOUBLE)
                   / COUNT(*))
               / (COUNT(*) - 1), 6) + 0 AS cov
  FROM embeddings e, generate_series(1, 64) i(i), generate_series(1, 64) j(j)
  WHERE j.j >= i.i
  GROUP BY i.i, j.j
),
c AS (
  SELECT dim_i, dim_j, cov FROM upper_c
  UNION ALL
  SELECT dim_j, dim_i, cov FROM upper_c WHERE dim_i <> dim_j
),
v1 AS (SELECT dim_i AS d, cov AS x FROM c WHERE dim_j = 1),
v2 AS (SELECT c.dim_i AS d, SUM(c.cov * v1.x) AS x
       FROM c JOIN v1 ON c.dim_j = v1.d GROUP BY 1),
v3 AS (SELECT c.dim_i AS d, SUM(c.cov * v2.x) AS x
       FROM c JOIN v2 ON c.dim_j = v2.d GROUP BY 1),
nrm AS (SELECT SQRT(SUM(x * x)) AS n FROM v3)
SELECT v3.d AS dim, ROUND(v3.x / nrm.n, 6) + 0 AS component
FROM v3, nrm
"""


@register("l6_power_iteration", oracle=_POWER_ORACLE, tags=("L6", "A11", "J1"))
def l6_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding covariance via three
    power-iteration steps (v₃ = C³e₁, normalized once at the end) —
    the iterative linear-algebra primitive behind PCA projection,
    whitening, and spectral embedding quality checks, expressed
    entirely as join-aggregates over the LONG-FORM matrix (no local
    matrices, no driver). Deferring normalization keeps every
    intermediate a pure float expression over the 6-dp-rounded
    covariance cells, so engines agree before the final round; three
    iterations on a spectral-gapped covariance already align v₃ with
    the dominant eigenvector to ~λ₂/λ₁³.

    Scale: covariance is one partial-aggregated pass (l6_covariance's
    shape); each iteration is a 64²-row broadcast join against a
    64-row vector — constant-size work per step regardless of corpus
    size. Higher dims d: cells grow d², still tiny next to the corpus;
    more iterations chain the same two-line step.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", (F.col("pos") + 1).alias("d"), F.col("col").alias("x"))
    a, b = x.alias("a"), x.alias("b")
    upper = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.d") <= F.col("b.d")))
        .groupBy(F.col("a.d").alias("dim_i"), F.col("b.d").alias("dim_j"))
        .agg(
            F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
            F.sum(F.col("a.x")).alias("sx"),
            F.sum(F.col("b.x")).alias("sy"),
            F.count("*").alias("n"),
        )
        .select(
            "dim_i",
            "dim_j",
            (
                F.round(
                    (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                    / (F.col("n") - 1),
                    6,
                )
                + 0
            ).alias("cov"),
        )
    )
    # localCheckpoint: c (64² rows) feeds the v seed plus one join per
    # power step — each reuse would re-run the full covariance pass over
    # the exploded corpus (16 exchanges without truncation).
    c = upper.unionByName(
        upper.filter(F.col("dim_i") != F.col("dim_j")).select(
            F.col("dim_j").alias("dim_i"),
            F.col("dim_i").alias("dim_j"),
            "cov",
        )
    ).transform(ckpt)
    v = c.filter(F.col("dim_j") == 1).select(
        F.col("dim_i").alias("d"), F.col("cov").alias("x")
    )
    for _ in range(2):
        v = (
            c.join(F.broadcast(v), c.dim_j == v.d)
            .groupBy(F.col("dim_i").alias("d2"))
            .agg(F.sum(F.col("cov") * F.col("x")).alias("x"))
            .select(F.col("d2").alias("d"), "x")
        )
    nrm = v.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n"))
    return v.crossJoin(F.broadcast(nrm)).select(
        F.col("d").alias("dim"),
        (F.round(F.col("x") / F.col("n"), 6) + 0).alias("component"),
    )


# ---------------------------------------------------------------------------
# L2 — containment join: the ASYMMETRIC near-dup measure. Jaccard
# misses a short doc quoted wholesale inside a long one (union dwarfs
# the intersection); containment |A∩B|/|A| catches exactly that —
# quotes, boilerplate inclusion, copypasta-with-additions.
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.9

_CONTAINMENT_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, {_ORACLE_DTOKS} AS ts FROM documents
)
SELECT
  a.doc_id AS contained_doc,
  b.doc_id AS container_doc,
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts) AS containment
FROM toks a JOIN toks b ON a.doc_id <> b.doc_id
WHERE len(a.ts) > 0
  AND CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts) >= {_CONTAIN_T}
  AND len(a.ts) < len(b.ts)
"""


@register("l2_containment_join", oracle=_CONTAINMENT_ORACLE, tags=("L2", "J8", "F5"))
def l2_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs: doc A is ≥90% contained in a
    STRICTLY LARGER doc B (by distinct tokens) — the asymmetric
    near-dup relation symmetric Jaccard cannot see (a tweet quoted
    inside an article has Jaccard ≈ 0 but containment = 1). Output is
    directed (contained → container); integer-ratio math needs no
    rounding.

    Regime split (optimization r12, same probe as l2_jaccard_pairs —
    the r1–r11 inverted-index form measured 133 s at sf0.1 on the
    dense 31-word fixture vocabulary): when the global vocab fits 64
    bits the containment evaluates as a broadcast mask pair scan
    (common = bit_count(a & b), na = bit_count(a)), identical result,
    no token explode and no pair-count shuffle.

    Scale (sparse regime): the same inverted-index shape as
    l2_jaccard_pairs (explode distinct tokens → equi-join on token →
    count common per pair) — never the O(n²) cross product. The
    size-asymmetry predicate (|A| < |B|) is also the classic
    prefix-filter accelerant: at 100 TB, candidates additionally prune
    on the smallest (1−t)·|A|+1 tokens of each doc, and hot tokens
    df-cap exactly as the Jaccard twin documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    masks = T.dense_token_masks(docs, "doc_id")
    if masks is not None:
        # The id-ordered pair scan visits each unordered pair once; the
        # DIRECTION comes from the strict size asymmetry (the smaller
        # set is the contained side — both directions can never hold),
        # so a conditional swap recovers the oracle's (a.id <> b.id,
        # |a| < |b|) enumeration exactly.
        a_small = F.col("a.__n") < F.col("b.__n")
        common = F.bit_count(F.col("a.__mask").bitwiseAND(F.col("b.__mask")))
        cont = common.cast("double") / F.least(F.col("a.__n"), F.col("b.__n"))
        return (
            T.mask_pair_scan(masks, "doc_id", spark)
            .filter((F.col("a.__n") != F.col("b.__n")) & (cont >= _CONTAIN_T))
            .select(
                F.when(a_small, F.col("a.doc_id"))
                .otherwise(F.col("b.doc_id"))
                .alias("contained_doc"),
                F.when(a_small, F.col("b.doc_id"))
                .otherwise(F.col("a.doc_id"))
                .alias("container_doc"),
                cont.alias("containment"),
            )
        )
    toks = docs.select(
        F.col("doc_id"),
        F.size(T.distinct_tokens(F.col("text"))).alias("n_toks"),
        F.explode(T.distinct_tokens(F.col("text"))).alias("tok"),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.col("a.n_toks") < F.col("b.n_toks")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained_doc"),
            F.col("b.doc_id").alias("container_doc"),
            F.col("a.n_toks").alias("na"),
        )
        .agg(F.count("*").alias("common"))
    )
    cont = F.col("common").cast("double") / F.col("na")
    return (
        common.withColumn("containment", cont)
        .filter(F.col("containment") >= _CONTAIN_T)
        .select("contained_doc", "container_doc", "containment")
    )


# ---------------------------------------------------------------------------
# L2 — sub-document (paragraph-level) dedup: exact dedup at a finer
# granularity than the document. Boilerplate paragraphs repeat across
# docs while the docs themselves stay unique, so document-level dedup
# never fires; the production fix chunks, dedups chunks corpus-wide,
# and reassembles. The fixture has no paragraph breaks, so the chunker
# is a fixed 10-token window — the pipeline shape is the real thing.
# ---------------------------------------------------------------------------

_PARA_W = 10

_PARA_DEDUP_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS ts FROM documents
),
chunks AS (
  SELECT doc_id, c.c AS chunk_idx,
         array_to_string(ts[(c.c * {_PARA_W} + 1):((c.c + 1) * {_PARA_W})], ' ') AS chunk
  FROM t, LATERAL (
    SELECT unnest(generate_series(0,
             CAST(ceil(len(ts) / {_PARA_W}.0) AS INT) - 1)) AS c) c
  WHERE len(ts) > 0
),
keep AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) = 1 AS first_copy
  FROM chunks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE first_copy) AS BIGINT) AS n_kept,
       COALESCE(array_to_string(list(chunk ORDER BY chunk_idx)
                                  FILTER (WHERE first_copy), ' '), '')
         AS dedup_text
FROM keep
GROUP BY doc_id
"""


@register("l2_paragraph_dedup", oracle=_PARA_DEDUP_ORACLE, tags=("L2", "L1", "F5"))
def l2_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular exact dedup: every document splits into
    10-token chunks, chunks dedup CORPUS-WIDE keeping the first copy
    (doc_id, chunk_idx order), and each document reassembles from its
    surviving chunks — repeated boilerplate vanishes from later
    documents while first occurrences keep their text. Output is the
    per-doc chunk accounting plus the reassembled text, all
    hash-graded.

    Scale: chunking is a HOF projection; the dedup is one shuffle
    hash-partitioned by chunk text (xxhash64 at 100 TB) — identical
    shape to l1_exact_dedup, just at chunk grain (rows × ~L/10).
    Reassembly groups by doc_id: a second shuffle, but of surviving
    chunks only. The window ORDER BY carries (doc_id, chunk_idx), so
    the survivor is deterministic on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    ts = T.tokens(F.col("text"))
    d = docs.select("doc_id", ts.alias("ts")).filter(F.size("ts") > 0)
    n_chunks = F.ceil(F.size("ts") / float(_PARA_W)).cast("int")
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda c: F.concat_ws(
                    " ", F.slice(F.col("ts"), c * _PARA_W + 1, _PARA_W)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    keep = chunks.withColumn(
        "first_copy", F.row_number().over(w) == 1
    )
    return (
        keep.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("first_copy"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("first_copy"),
                                    F.struct("chunk_idx", "chunk"),
                                )
                            )
                        ),
                        lambda s: F.array(s["chunk"]),
                    )
                ),
            ).alias("dedup_text"),
        )
    )


# ---------------------------------------------------------------------------
# G2 — triangle census of the co-purchase graph: triangle count +
# global clustering coefficient, the graph-cohesion statistics that
# separate genuinely clustered product communities from hub-and-spoke
# noise (and, on near-dup graphs, dense boilerplate clusters from
# chains of coincidental pairs).
# ---------------------------------------------------------------------------

_G2_MIN_SUP = 2

_G2_ORACLE = f"""
WITH {oracle_co_edges(_G2_MIN_SUP)},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3
    ON e3.u = e1.u AND e3.v = e2.v
),
wedge AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       wedge.n_wedges AS n_wedges,
       tri.n_triangles AS n_triangles,
       CASE WHEN wedge.n_wedges = 0 THEN 0.0
            ELSE ROUND(3.0 * tri.n_triangles / wedge.n_wedges, 6)
       END AS clustering_coeff
FROM tri, wedge
"""


@register("g2_triangle_count", oracle=_G2_ORACLE, tags=("A1", "J8", "A2"))
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count and global clustering coefficient of the
    co-purchase graph (edges = part pairs sharing ≥2 orders, id-ordered
    u < v). Triangles enumerate as E ⋈ E ⋈ E with u < v < w — each
    triangle counted exactly once; wedges are Σ d(d−1)/2 over degrees;
    the coefficient 3Δ/wedges rounds at 6 dp (pure integer inputs).

    Scale: the id-ordered two-path join is the baseline enumerator; its
    worst case is Σ d(v)² on the JOIN KEY side, so production triangle
    counting directs each edge from its LOWER-degree endpoint first
    (degree ordering caps wedge fan-out at O(m^1.5) total — the
    node-iterator bound) and the id order only breaks ties. The plan
    is two shuffle joins on single int keys either way; degree
    ordering changes the key assignment, not the shape. Edge
    construction reuses a14's basket self-join, bounded per order.
    """
    # localCheckpoint: e feeds five branches (deg union, the three-way
    # triangle join, n_edges) — without truncation each re-derives the
    # basket self-join (22 exchanges; 6 after; O(edges) storage).
    # ckpt tier-2 (O(edges)): see _helpers.ckpt size contract.
    e = co_purchase_edges(spark, sf_dir, _G2_MIN_SUP).select("u", "v").transform(ckpt)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    coeff = F.when(F.col("n_wedges") == 0, 0.0).otherwise(
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6)
    )
    return (
        n_edges.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            coeff.alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# L4 — Zipf slope: least-squares fit of log(freq) ~ log(rank) over the
# word-frequency distribution. Natural corpora sit near slope −1;
# generated/templated text (like this fixture) flattens — the cheapest
# corpus-naturalness check a pipeline can run.
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = rf"""
WITH freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest({_ORACLE_TOKS}) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
),
pts AS (SELECT ln(r) AS x, ln(f) AS y FROM ranked),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT n AS n_types,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
FROM s
"""


@register("l4_zipf_slope", oracle=_ZIPF_ORACLE, tags=("L4", "A1", "W1"))
def l4_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus word-frequency distribution: rank types
    by frequency (unique token tiebreak), fit log f = a + b·log r by
    closed-form least squares, report b at 6 dp. Natural language sits
    near −1; the fixture's 31-word synthetic vocabulary is far flatter
    — exactly the deviation this monitor exists to flag.

    Scale: the frequency table is one token shuffle (l4_word_freq's
    shape); ranking the TYPE table is over vocabulary size (≤ a few
    million rows even at 100 TB — types, not tokens), here ranked by a
    partitioned-safe global window via TakeOrdered semantics on the
    tiny aggregated side; the regression is a five-sum global agg.
    Float log sums fold-order-differ at ~1e-13 relative, far under the
    6 dp round.
    """
    from ._helpers import scalable_row_number

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    # rank over the TYPE table (vocabulary-sized): two-level rank with a
    # frequency-bucket coarsening — monotonic in the (-f, tok) order.
    ranked = scalable_row_number(
        freq.withColumn("negf", -F.col("f")),
        order_cols=["negf", "tok"],
        bucket=F.col("negf"),
        out="r",
    )
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_types"), F.round(slope, 6).alias("zipf_slope")
    )


# ---------------------------------------------------------------------------
# L6 — prefix energy (Matryoshka readiness): how much of each
# embedding's norm the first d dimensions capture. cos(full, zero-pad
# prefix) reduces to ‖prefix‖/‖full‖, so the truncation-quality curve
# is pure norm ratios — the metric that decides whether 64-d vectors
# can serve 16-d ANN shards without re-embedding.
# ---------------------------------------------------------------------------

_PREFIX_ENERGY_ORACLE = """
WITH per_vec AS (
  SELECT e.vec_id, d.d AS dim_budget,
         sqrt(list_sum(list_transform(e.embedding[1:d.d],
                                      x -> x::DOUBLE * x::DOUBLE)))
           / sqrt(list_sum(list_transform(e.embedding,
                                          x -> x::DOUBLE * x::DOUBLE)))
           AS energy
  FROM embeddings e, (SELECT unnest([8, 16, 32, 64]) AS d) d
)
SELECT dim_budget,
       ROUND(AVG(energy), 6) AS mean_energy,
       ROUND(MIN(energy), 6) AS min_energy
FROM per_vec
GROUP BY dim_budget
"""


@register("l6_prefix_energy", oracle=_PREFIX_ENERGY_ORACLE, tags=("L6", "F5", "A1"))
def l6_prefix_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per dimension budget (8/16/32/64), the mean and worst-case
    fraction of embedding norm captured by the prefix — the
    Matryoshka-truncation audit. ‖prefix‖/‖full‖ IS the cosine between
    the full vector and its zero-padded truncation, so this one number
    bounds the retrieval error of serving truncated vectors.

    Scale: pure map-side HOF arithmetic (slice → square-sum → ratio)
    exploded only 4× for the budget axis, then a 4-group aggregate.
    Per-vector ratios are float-identical across engines (sequential
    HOF folds in both); only the mean rounds.
    """
    e = load_table(spark, sf_dir, "embeddings")
    budgets = F.array(*[F.lit(d) for d in (8, 16, 32, 64)])
    vec = F.col("embedding").cast("array<double>")
    sq_sum = lambda arr: F.aggregate(  # noqa: E731
        F.zip_with(arr, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    per = e.select(
        "vec_id",
        F.explode(budgets).alias("dim_budget"),
        vec.alias("v"),
    ).select(
        "vec_id",
        "dim_budget",
        (
            F.sqrt(sq_sum(F.slice(F.col("v"), 1, F.col("dim_budget"))))
            / F.sqrt(sq_sum(F.col("v")))
        ).alias("energy"),
    )
    return per.groupBy("dim_budget").agg(
        F.round(F.avg("energy"), 6).alias("mean_energy"),
        F.round(F.min("energy"), 6).alias("min_energy"),
    )


# ---------------------------------------------------------------------------
# L4 — token-count parity companion: hash-grades the REAL lookaround
# tokenizer. DuckDB's RE2 cannot run the boundary regex itself, but on
# a corpus with no punctuation (chars ⊆ [a-z ] — asserted in tests,
# the m4b precondition pattern) the regex provably degenerates to
# whitespace splitting, so the oracle can state the expected counts
# exactly and the Spark side still executes the production regex path.
# ---------------------------------------------------------------------------

_TOKCOUNT_ORACLE = rf"""
SELECT doc_id,
       CAST(len({_ORACLE_TOKS}) AS INT) AS ws_tokens,
       CAST(len({_ORACLE_TOKS}) AS INT) AS bpe_ish_tokens
FROM documents
"""


@register("l4_token_counts_parity", oracle=_TOKCOUNT_ORACLE, tags=("L4", "F2"))
def l4_token_counts_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded twin of l4_token_counts (minus the xxhash
    fingerprint, which has no DuckDB image): both tokenizers run their
    REAL Spark code paths — whitespace split and the BPE-flavored
    lookaround-boundary regex — and the oracle pins both counts.
    Valid because the fixture corpus contains only [a-z ] (tested, the
    same precondition pattern as m4b): with no word/punctuation
    boundaries inside tokens, the boundary regex splits exactly at
    whitespace. If a future fixture adds punctuation, the precondition
    test (not a silent hash drift) fails first.

    Scale: identical to l4_token_counts — pure map-side projections.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("ws_tokens"),
        F.size(T.bpe_ish_tokens(F.col("text"))).alias("bpe_ish_tokens"),
    )


# ---------------------------------------------------------------------------
# L4 — URL canonicalization (web-corpus dedup prerequisite): scheme/host
# case-folding, www/default-port stripping, fragment drop, tracking-
# param removal, query-param sort. The Spark side runs the REAL
# parse_url builtin; the oracle re-derives each component with regexps.
# ---------------------------------------------------------------------------

# Messy-URL construction shared by both engines: deterministic per-doc
# case noise, an explicit default port, utm/ref tracking params, and a
# fragment — all of which canonicalization must erase, plus a real
# param (page=2 on every 5th doc) it must keep and sort.
_URL_SPARK = (
    "concat("
    " CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' WHEN doc_id % 3 = 1 THEN"
    "      'https://www.' ELSE 'https://' END,"
    " source,"
    " CASE WHEN doc_id % 3 = 0 THEN '.Example.COM' ELSE '.example.com' END,"
    " CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END,"
    " '/docs/', CAST(doc_id AS STRING),"
    " '?utm_source=feed&id=', CAST(doc_id AS STRING), '&ref=tw',"
    " CASE WHEN doc_id % 5 = 0 THEN '&page=2' ELSE '' END,"
    " '#top')"
)
_URL_DUCK = _URL_SPARK.replace("AS STRING", "AS VARCHAR")

_L4_URL_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS authority,
         regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM raw
),
norm AS (
  SELECT doc_id, scheme, path,
         regexp_replace(lower(regexp_replace(authority, ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(authority, ':([0-9]+)$', 1) AS port,
         array_to_string(
           list_sort(list_filter(string_split(query, '&'),
             p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=')))), '&') AS params
  FROM parts
)
SELECT doc_id,
       host,
       scheme || '://' || host ||
       CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                 OR (scheme = 'http' AND port = '80')
            THEN '' ELSE ':' || port END ||
       path ||
       CASE WHEN params = '' THEN '' ELSE '?' || params END AS url_norm
FROM norm
"""


@register("l4_url_normalize", oracle=_L4_URL_ORACLE, tags=("L4", "F2", "F1"))
def l4_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize messy URLs with Spark's ``parse_url`` builtin plus
    HOF query-param surgery: lowercase scheme/host, strip ``www.`` and
    default ports, drop the fragment, remove ``utm_*``/``ref`` tracking
    params, and sort what survives — the normalization a web-scale
    corpus needs before URL-level dedup (two crawls of one page must
    collide). Graded against a regexp re-derivation of every component.

    Scale: pure map-side JVM projection (parse_url + array HOFs) — no
    shuffle, no Python; downstream URL-dedup is l1's hash-groupBy on
    url_norm.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    return _canonical_url(raw).select("doc_id", "host", "url_norm")


def _canonical_url(raw: DataFrame) -> DataFrame:
    """(doc_id, url) → (doc_id, host, url_norm): the shared parse_url
    normalization program (docstring: l4_url_normalize). Map-side only."""
    authority = F.parse_url(F.col("url"), F.lit("AUTHORITY"))
    scheme = F.lower(F.parse_url(F.col("url"), F.lit("PROTOCOL")))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    query = F.parse_url(F.col("url"), F.lit("QUERY"))
    parts = raw.select(
        "doc_id",
        scheme.alias("scheme"),
        path.alias("path"),
        F.regexp_replace(
            F.lower(F.regexp_replace(authority, ":[0-9]+\\z", "")), r"^www\.", ""
        ).alias("host"),
        F.regexp_extract(authority, ":([0-9]+)\\z", 1).alias("port"),
        F.array_join(
            F.sort_array(
                F.filter(
                    F.split(query, "&"),
                    lambda p: ~(p.startswith("utm_") | p.startswith("ref=")),
                )
            ),
            "&",
        ).alias("params"),
    )
    default_port = (
        (F.col("port") == "")
        | ((F.col("scheme") == "https") & (F.col("port") == "443"))
        | ((F.col("scheme") == "http") & (F.col("port") == "80"))
    )
    url_norm = F.concat(
        F.col("scheme"),
        F.lit("://"),
        F.col("host"),
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), F.col("port"))),
        F.col("path"),
        F.when(F.col("params") == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.col("params"))
        ),
    )
    return parts.select("doc_id", "host", url_norm.alias("url_norm"))


# ---------------------------------------------------------------------------
# L6 — product quantization (PQ): the storage/ANN workhorse at 100 TB —
# a 64-dim float vector compresses to M=8 one-byte codes. Deterministic
# codebook (the first K vectors as "trained" centroids) + integer-exact
# distances make the assignment hash-gradable across engines.
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUB = 8  # dims per subspace (8×8 = the fixture's 64 dims)
_PQ_K = 16  # codebook entries per subspace

_PQ_QUANT_DUCK = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000 + 0) AS BIGINT))"
)


def _quantize_embedding():
    """The Spark twin of _PQ_QUANT_DUCK — the ONE integer-quantization
    expression (round(x·1e6), '+ 0' for negative-zero) every
    integer-exact embedding family (PQ, k-means, SemDeDup) shares."""
    return F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000 + 0).cast("long"),
    )

_L6_PQ_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
subs AS (
  SELECT vec_id, CAST(j AS INT) AS subspace,
         qv[j*{_PQ_SUB}+1 : j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM q, generate_series(0, {_PQ_M - 1}) t(j)
),
cb AS (SELECT vec_id AS code, subspace, sv AS csv FROM subs WHERE vec_id < {_PQ_K}),
dists AS (
  SELECT s.vec_id, s.subspace, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_SUB}),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
  FROM subs s JOIN cb c ON s.subspace = c.subspace
)
SELECT vec_id, subspace,
       CAST(min([dist, code])[2] AS BIGINT) AS code,
       CAST(min([dist, code])[1] AS BIGINT) AS dist
FROM dists GROUP BY vec_id, subspace
"""


@register("l6_pq_codes", oracle=_L6_PQ_ORACLE, tags=("L6", "F5"))
def l6_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize every embedding: split 64 dims into 8 subspaces,
    assign each subvector to its nearest of 16 codebook centroids
    (deterministically "trained" = the first 16 vectors, standing in
    for a sampled k-means — l3_ann_ivf trains the real one). Output is
    long-form (vec_id, subspace, code, dist): 8 small ints replace 64
    floats — 32× compression, and ADC search scans codes, not floats.

    Determinism: coordinates are scaled to integers (round(x·1e6), the
    int8-quantize recipe) BEFORE distance math, so distances are exact
    BIGINT sums on both engines and argmin cannot flip on float ulps;
    ties break lexicographically by (dist, code) via min-of-struct.

    Scale: the codebook side of the join is K·M tiny rows — broadcast;
    the argmin groupBy key (vec_id, subspace) is uniform by
    construction (no skew). One shuffle of M rows per vector; at 100 TB
    the codebook is still KBs and the shape is unchanged.
    """
    return _pq_assign(spark, sf_dir)[2]


def _pq_subs_cb(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(subvectors, codebook): integer-quantized 8-dim slices of every
    embedding, and the K×M centroid slices (vec_id < K)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _quantize_embedding()
    slices = F.array(
        *[F.slice(F.col("qv"), j * _PQ_SUB + 1, _PQ_SUB) for j in range(_PQ_M)]
    )
    subs = (
        emb.select("vec_id", qv.alias("qv"))
        .select("vec_id", F.posexplode(slices).alias("subspace", "sv"))
    )
    cb = subs.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("code"),
        F.col("subspace").alias("cb_subspace"),
        F.col("sv").alias("csv"),
    )
    return subs, cb


def _pq_sqdist(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_assign(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(subvectors, codebook, code assignment): nearest-centroid code
    per (vec_id, subspace) with lexicographic (dist, code) tiebreak."""
    subs, cb = _pq_subs_cb(spark, sf_dir)
    dists = subs.join(
        F.broadcast(cb), F.col("subspace") == F.col("cb_subspace")
    ).select("vec_id", "subspace", "code", _pq_sqdist("sv", "csv").alias("dist"))
    best = (
        dists.groupBy("vec_id", "subspace")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select(
            "vec_id",
            "subspace",
            F.col("best.code").cast("long").alias("code"),
            F.col("best.dist").cast("long").alias("dist"),
        )
    )
    return subs, cb, best


# ---------------------------------------------------------------------------
# L3 — PQ ADC search: approximate top-k over the PQ codes via
# asymmetric distance computation (query stays full-precision, corpus
# is codes). The complete PQ read path for l6_pq_codes' write path.
# ---------------------------------------------------------------------------

_PQ_Q_LO, _PQ_Q_HI = _PQ_K, _PQ_K + 2  # query vec_ids: first 3 past the codebook
_PQ_TOPK = 5

_L3_PQ_ADC_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
subs AS (
  SELECT vec_id, CAST(j AS INT) AS subspace,
         qv[j*{_PQ_SUB}+1 : j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM q, generate_series(0, {_PQ_M - 1}) t(j)
),
cb AS (SELECT vec_id AS code, subspace, sv AS csv FROM subs WHERE vec_id < {_PQ_K}),
dists AS (
  SELECT s.vec_id, s.subspace, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_SUB}),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
  FROM subs s JOIN cb c ON s.subspace = c.subspace
),
best AS (
  SELECT vec_id, subspace, CAST(min([dist, code])[2] AS BIGINT) AS code
  FROM dists GROUP BY vec_id, subspace
),
lut AS (
  SELECT vec_id AS qid, subspace, code, dist AS qdist
  FROM dists WHERE vec_id BETWEEN {_PQ_Q_LO} AND {_PQ_Q_HI}
),
adc AS (
  SELECT l.qid, b.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
  FROM best b JOIN lut l ON b.subspace = l.subspace AND b.code = l.code
  GROUP BY l.qid, b.vec_id
)
SELECT qid, vec_id, adist FROM adc
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) <= {_PQ_TOPK}
"""


@register("l3_pq_adc_topk", oracle=_L3_PQ_ADC_ORACLE, tags=("L3", "L6", "W2"))
def l3_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors over PQ codes: each query keeps its
    full-precision subvectors, precomputes a (subspace × code) distance
    lookup table against the codebook, and every corpus vector's
    approximate distance is just the SUM of 8 LUT entries selected by
    its codes — no float math per candidate. Top-5 per query with a
    (adist, vec_id) tiebreak.

    This is the read path PQ exists for: at 100 TB the corpus is a
    BIGINT code table (32× smaller than the floats), the LUT is
    queries × M × K rows — KBs, broadcast — and the scan is a map-side
    broadcast-hash join + one groupBy(qid, vec_id) whose key space is
    queries × corpus, uniformly distributed. The per-query top-k window
    partitions by qid. Same integer-exact arithmetic as l6_pq_codes, so
    both engines agree bit-for-bit.
    """
    subs, cb, best = _pq_assign(spark, sf_dir)
    lut = (
        subs.filter(F.col("vec_id").between(_PQ_Q_LO, _PQ_Q_HI))
        .join(F.broadcast(cb), F.col("subspace") == F.col("cb_subspace"))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("subspace").alias("lut_subspace"),
            F.col("code").alias("lut_code"),
            _pq_sqdist("sv", "csv").alias("qdist"),
        )
    )
    adc = (
        best.join(
            F.broadcast(lut),
            (F.col("subspace") == F.col("lut_subspace"))
            & (F.col("code") == F.col("lut_code")),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("qdist").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy("adist", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("qid", "vec_id", "adist")
    )


# ---------------------------------------------------------------------------
# S18 — deterministic epoch shuffle: the stable pseudo-random training
# order + shard assignment every epoch of a data-parallel run needs.
# Reproducibility is the point: the same (corpus, seed) must give every
# worker the same order, with no RNG state shared across executors.
# ---------------------------------------------------------------------------

_S18_MULT = 2654435761
_S18_ADD = 12345
_S18_MOD = 1_000_003  # prime; collisions broken by doc_id
_S18_SHARDS = 8


_S18_ORACLE = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY (doc_id * {_S18_MULT} + {_S18_ADD}) % {_S18_MOD}, doc_id
       ) AS BIGINT) AS shuffle_pos,
       CAST((row_number() OVER (
         ORDER BY (doc_id * {_S18_MULT} + {_S18_ADD}) % {_S18_MOD}, doc_id
       ) - 1) % {_S18_SHARDS} AS BIGINT) AS shard_id
FROM documents
"""


@register("s18_epoch_shuffle", oracle=_S18_ORACLE, tags=("S3", "W1"))
def s18_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-stable corpus shuffle: each doc's sort key is a
    multiplicative hash of its id (seed folded into the constants), the
    global position comes from the scale-safe two-level rank, and the
    shard is position mod world-size — so every data-parallel worker
    derives the identical order from the parquet alone, and changing
    the seed constants reshuffles without touching the data.

    Scale: ``scalable_row_number`` buckets the hash domain, so rows
    sort only within ~4k-wide buckets and the single-partition work is
    the O(#buckets) offset table (VERDICT r2 #3 recipe) — never a
    global sort of the corpus. The hash is uniform by construction:
    shards are balanced to ±1 row deterministically, not in
    expectation.
    """
    from ._helpers import scalable_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hkey = (F.col("doc_id") * _S18_MULT + _S18_ADD) % _S18_MOD
    ranked = scalable_row_number(
        docs.withColumn("hkey", hkey),
        key="hkey",
        bucket_width=4096,
        order_cols=[F.col("hkey"), F.col("doc_id")],
        out="rn",
    )
    return ranked.select(
        "doc_id",
        F.col("rn").cast("long").alias("shuffle_pos"),
        ((F.col("rn") - 1) % _S18_SHARDS).cast("long").alias("shard_id"),
    )


# ---------------------------------------------------------------------------
# L4 — HTML boilerplate strip: the first transform of every web-crawl
# pipeline (WARC → text). Deterministic markup is wrapped around the
# fixture text so both engines run the SAME extraction regexes over
# the same noisy input — script/style drop, tag strip, entity
# unescape, whitespace collapse.
# ---------------------------------------------------------------------------

_HTML_SPARK = (
    "concat('<html><head><title>Doc ', CAST(doc_id AS STRING),"
    " '</title><style>p{margin:0}</style></head><body>',"
    " '<script>track(', CAST(doc_id AS STRING), ');</script>',"
    " '<h1>', source, '</h1>',"
    " '<p class=\"c\">', text, '</p>',"
    " '<p>tags &amp; entities &lt;kept&gt;&nbsp;inline</p>',"
    " '</body></html>')"
)
_HTML_DUCK = _HTML_SPARK.replace("AS STRING", "AS VARCHAR")

# Extraction stages (applied in order on BOTH engines):
#   1. drop <script>/<style> ELEMENTS including content
#   2. replace every remaining tag with one space
#   3. unescape the common entities
#   4. collapse whitespace runs, trim
# NB: one pattern per element, NOT `<(script|style)…</\1>` — DuckDB's
# RE2 has no backreferences and silently never matches that form.
# Explicit classes, not `.`/`\s` (Java-vs-RE2 divergence: Java's `.`
# additionally excludes \r/NEL/LSEP and Java's \s adds \x0B) —
# `[^\n]` IS RE2's `.`, spelled identically in both engines.
_STRIP_SCRIPT = r"<script[^>]*>[^\n]*?</script>"
_STRIP_STYLE = r"<style[^>]*>[^\n]*?</style>"
_STRIP_TAGS = r"<[^>]+>"
_WS_RUNS = r"[\t\n\f\r ]+"

_L4_HTML_ORACLE = f"""
WITH raw AS (SELECT doc_id, {_HTML_DUCK} AS html FROM documents),
stripped AS (
  SELECT doc_id,
         trim(regexp_replace(
           replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '{_STRIP_SCRIPT}', ' ', 'g'),
                 '{_STRIP_STYLE}', ' ', 'g'),
               '{_STRIP_TAGS}', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
           '{_WS_RUNS}', ' ', 'g')) AS clean
  FROM raw
)
SELECT doc_id, clean,
       CAST(length(clean) AS BIGINT) AS n_chars
FROM stripped
"""


@register("l4_html_extract", oracle=_L4_HTML_ORACLE, tags=("L4", "F2", "P4"))
def l4_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-to-text extraction: script/style elements dropped WITH
    their content (non-greedy per-element block regexes — RE2-safe, no
    backreferences), remaining tags become spaces, the four dominant
    entities unescape, and whitespace runs collapse — recovering the
    document text plus the kept inline fragments from the synthetic
    page. The oracle runs the identical regex program in DuckDB.

    Scale: a fixed chain of regexp_replace/replace projections —
    map-side, codegen, no shuffle; exactly how a WARC-scale text
    extraction runs (the regexes are per-row, the corpus never
    re-partitions). Real crawls add an HTML5 parser behind the same
    interface for pathological markup; the regex program is the
    splittable fast path.
    """
    docs = load_table(spark, sf_dir, "documents")
    html = F.expr(_HTML_SPARK)
    detagged = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(html, _STRIP_SCRIPT, " "),
            _STRIP_STYLE,
            " ",
        ),
        _STRIP_TAGS,
        " ",
    )
    unescaped = F.replace(
        F.replace(
            F.replace(
                F.replace(detagged, F.lit("&nbsp;"), F.lit(" ")),
                F.lit("&lt;"),
                F.lit("<"),
            ),
            F.lit("&gt;"),
            F.lit(">"),
        ),
        F.lit("&amp;"),
        F.lit("&"),
    )
    clean = F.trim(F.regexp_replace(unescaped, _WS_RUNS, " "))
    return docs.select(
        "doc_id",
        clean.alias("clean"),
        F.length(clean).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# L1 — URL-level dedup: l4_url_normalize's pipeline feeding the
# keep-min dedup — the two-crawls-of-one-page collapse. The messy URLs
# here COLLIDE by construction (doc_id % 50 pages), with per-doc noise
# (case, www, default port, doc-unique tracking params, fragments)
# that normalization must erase for the groups to reassemble; the
# oracle derives each canonical URL algebraically from the page id and
# never sees the messy strings. Any normalization step that leaks
# per-doc noise splits a group and flips the hash.
# ---------------------------------------------------------------------------

_URLDUP_PAGES = 50

_URLDUP_SPARK = (
    "concat("
    " CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' WHEN doc_id % 3 = 1 THEN"
    "      'https://www.' ELSE 'https://' END,"
    " CASE WHEN doc_id % 4 = 0 THEN 'Pages.Example.COM' ELSE 'pages.example.com' END,"
    " CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END,"
    f" '/docs/', CAST(doc_id % {_URLDUP_PAGES} AS STRING),"
    " '?utm_content=', CAST(doc_id AS STRING),"
    f" '&id=', CAST(doc_id % {_URLDUP_PAGES} AS STRING),"
    " '&ref=crawl', '#sec', CAST(doc_id AS STRING))"
)

_L1_URLDUP_ORACLE = f"""
SELECT 'https://pages.example.com/docs/' || CAST(doc_id % {_URLDUP_PAGES} AS VARCHAR)
         || '?id=' || CAST(doc_id % {_URLDUP_PAGES} AS VARCHAR) AS url_norm,
       CAST(COUNT(*) AS BIGINT) AS n_crawls,
       CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id
FROM documents
GROUP BY doc_id % {_URLDUP_PAGES}
"""


@register("l1_url_dedup", oracle=_L1_URLDUP_ORACLE, tags=("L1", "L4", "F2"))
def l1_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl dedup by canonical URL: run the full parse_url-based
    normalization (l4_url_normalize's program) over per-doc-noisy URLs
    of shared pages, then keep-min-doc_id per canonical URL with crawl
    counts. The oracle constructs each canonical URL from the page id
    alone — so the grade is "normalization erased exactly the noise
    and nothing else".

    Scale: map-side normalization + one hash-partitioned groupBy on
    url_norm (the same one-shuffle shape as l1_exact_dedup; at web
    scale the group key is xxhash64(url_norm) to keep shuffle rows
    narrow).
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_URLDUP_SPARK).alias("url"))
    return (
        _canonical_url(raw)
        .groupBy("url_norm")
        .agg(
            F.count("*").alias("n_crawls"),
            F.min("doc_id").alias("kept_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# L0 — the end-to-end cleaning pipeline: exact dedup → quality gate →
# per-(source, lang) corpus rollup, in ONE registered query. Each stage
# is an operator graded elsewhere (l1_exact_dedup, l4_quality_score,
# l4_corpus_report); this composite grades their COMPOSITION — the
# actual shape of a production pre-training data job.
# ---------------------------------------------------------------------------

_L0_MIN_QUALITY = 0.5
_L0_MIN_TOKENS = 5
_L0_MAX_TOKENS = 1000

_L0_ORACLE = rf"""
WITH survivors AS (
  SELECT doc_id, source, lang, text
  FROM documents
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
scored AS (
  SELECT source, lang,
         len({_ORACLE_TOKS}) AS n_tokens,
         LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
           * (CASE WHEN len({_ORACLE_TOKS}) > 0
                   THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE) / len({_ORACLE_TOKS})
                   ELSE 0.0 END) AS quality
  FROM survivors
),
flagged AS (
  SELECT source, lang, n_tokens, quality,
         quality >= {_L0_MIN_QUALITY}
           AND n_tokens BETWEEN {_L0_MIN_TOKENS} AND {_L0_MAX_TOKENS} AS keep
  FROM scored
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_surviving,
       CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT) AS kept_tokens,
       COALESCE(ROUND(AVG(CASE WHEN keep THEN quality END), 6), 0.0) AS mean_quality
FROM flagged
GROUP BY source, lang
"""


@register("l0_clean_pipeline", oracle=_L0_ORACLE, tags=("L1", "L4", "A1"))
def l0_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training data job in one plan: drop duplicate texts (keep
    min doc_id), score survivors (length × type-token ratio), gate on
    quality ≥ 0.5 and a 5–1000 token band, and roll the kept set up
    per (source, lang) next to the surviving-population counts — the
    release table a data team ships with every corpus cut.

    Scale: the dedup window shuffles once on text (xxhash64(text) at
    100 TB to keep shuffle rows narrow); scoring is map-side on the
    survivors; the rollup is ONE conditional aggregate carrying both
    the surviving-population and kept-subset measures, so the corpus
    is scanned and deduplicated exactly once (the two-branch join
    formulation re-runs the dedup per branch — measured in this plan
    before the rewrite). Stage order matters at scale and is the cheap
    one: dedup FIRST (hash compare) so quality math runs once per
    unique text, not once per copy.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    survivors = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "lang", "text")
    )
    scored = survivors.select(
        "source",
        "lang",
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
    )
    keep = (F.col("quality") >= _L0_MIN_QUALITY) & F.col("n_tokens").between(
        _L0_MIN_TOKENS, _L0_MAX_TOKENS
    )
    flagged = scored.withColumn("keep", keep)
    return flagged.groupBy("source", "lang").agg(
        F.count("*").alias("n_surviving"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_tokens"))), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
        F.coalesce(
            F.round(F.avg(F.when(F.col("keep"), F.col("quality"))), 6), F.lit(0.0)
        ).alias("mean_quality"),
    )


# ---------------------------------------------------------------------------
# L6 — one full Lloyd's k-means refinement (init → assign → recompute
# centroids → reassign) with exact cross-engine parity: assignment #1
# runs on integer-quantized coordinates (exact BIGINT distances);
# recomputed centroids are exact-integer-sum / count divisions
# (bit-identical doubles); assignment #2 folds (x − m)² sequentially
# per row on both engines (Spark F.aggregate and DuckDB list_sum are
# both in-order folds — pinned by this oracle at three scale factors).
# The from-scratch twin of the sampled KMeans l3_ann_ivf takes from
# pyspark.ml.
# ---------------------------------------------------------------------------

_KM_K = 8


def _km_quant_assign(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(quantized vectors, first assignment): integer-exact nearest of
    the first-K seed centroids with a (dist, centroid) struct-min
    tiebreak — the coarse quantization shared by l6_kmeans_step's pass
    1 and l2_semdedup's cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _quantize_embedding()
    q = emb.select("vec_id", qv.alias("qv"))
    init = q.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("c"), F.col("qv").alias("cv")
    )
    d1 = q.crossJoin(F.broadcast(init)).select(
        "vec_id", "c", _pq_sqdist("qv", "cv").alias("d")
    )
    a1 = (
        d1.groupBy("vec_id")
        .agg(F.min(F.struct("d", "c")).alias("best"))
        .select("vec_id", F.col("best.c").alias("c1"))
    )
    return q, a1


_L6_KMEANS_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
init AS (SELECT vec_id AS c, qv AS cv FROM q WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT q.vec_id, i.c,
         list_sum(list_transform(generate_series(1, 64),
                  k -> (q.qv[k] - i.cv[k]) * (q.qv[k] - i.cv[k]))) AS d
  FROM q CROSS JOIN init i
),
a1 AS (SELECT vec_id, min([d, c])[2] AS c1 FROM d1 GROUP BY vec_id),
dimsum AS (
  SELECT a1.c1 AS c, t.dim AS dim, SUM(q.qv[t.dim]) AS s, COUNT(*) AS cnt
  FROM q JOIN a1 USING (vec_id) CROSS JOIN generate_series(1, 64) t(dim)
  GROUP BY a1.c1, t.dim
),
m AS (SELECT c, list(CAST(s AS DOUBLE) / cnt ORDER BY dim) AS mv FROM dimsum GROUP BY c),
d2 AS (
  SELECT q.vec_id, m.c,
         list_sum(list_transform(generate_series(1, 64),
                  k -> (CAST(q.qv[k] AS DOUBLE) - m.mv[k])
                       * (CAST(q.qv[k] AS DOUBLE) - m.mv[k]))) AS d
  FROM q CROSS JOIN m
),
a2 AS (SELECT vec_id, min([d, c])[2] AS cluster FROM d2 GROUP BY vec_id)
SELECT a2.vec_id,
       CAST(a1.c1 AS BIGINT) AS init_cluster,
       CAST(a2.cluster AS BIGINT) AS cluster
FROM a2 JOIN a1 ON a1.vec_id = a2.vec_id
"""


@register("l6_kmeans_step", oracle=_L6_KMEANS_ORACLE, tags=("L6", "L3", "A1"))
def l6_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's iteration: seed centroids = the first K
    vectors, assign every vector (exact integer distances, (d, c)
    struct-min tiebreak), recompute per-cluster per-dimension means as
    one partial-aggregated groupBy, reassign against the refined
    centroids. Output (vec_id, init_cluster, cluster) shows the
    reassignment the refinement causes.

    Scale: this IS production Lloyd's — per-round cost is one broadcast
    of k·d centroid doubles (collected driver-side: 512 values,
    bounded, the same pattern pyspark.ml's KMeans uses every iteration)
    plus one map-side assignment pass and one (cluster, dim)-keyed agg
    whose key space is k·d, uniform. No all-pairs joins, no global
    sorts. Determinism: centroid means are exact integer-sum/count
    divisions, and both engines fold the reassignment distance
    sequentially, so even the double arithmetic is order-pinned.
    """
    q, a1 = _km_quant_assign(spark, sf_dir)
    dims = (
        q.join(a1, "vec_id")
        .select("c1", F.posexplode("qv").alias("dim0", "val"))
        .groupBy("c1", "dim0")
        .agg(F.sum("val").alias("s"), F.count("*").alias("cnt"))
    )
    # k·d bounded collect — the per-iteration centroid broadcast every
    # Lloyd implementation performs (documented driver-side bounded).
    rows = dims.collect()
    by_c: dict[int, list[float]] = {}
    for r in rows:
        by_c.setdefault(r.c1, [0.0] * 64)[r.dim0] = r.s / r.cnt
    dist2 = [
        F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.array(*[F.lit(v) for v in mv]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d_{c}")
        for c, mv in sorted(by_c.items())
    ]
    best2 = F.least(
        *[
            F.struct(F.col(f"d_{c}").alias("d"), F.lit(c).cast("long").alias("c"))
            for c in sorted(by_c)
        ]
    )
    return (
        q.select("vec_id", *dist2)
        .select("vec_id", best2.alias("best"))
        .join(a1, "vec_id")
        .select(
            "vec_id",
            F.col("c1").cast("long").alias("init_cluster"),
            F.col("best.c").alias("cluster"),
        )
    )


# ---------------------------------------------------------------------------
# L2 — SemDeDup-style semantic dedup: cluster FIRST (the coarse
# quantization from the k-means seed centroids), then prune
# near-duplicates only WITHIN each cluster. The pruning cost drops from
# O(n²) to Σ|cell|² — the published trick that makes embedding-level
# dedup run at corpus scale; cross-cell duplicates are the documented
# miss (l2_embedding_neardup is the exact all-pairs reference).
# ---------------------------------------------------------------------------

_SEMDEDUP_COS = 0.4

_L2_SEMDEDUP_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
init AS (SELECT vec_id AS c, qv AS cv FROM q WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT q.vec_id, i.c,
         list_sum(list_transform(generate_series(1, 64),
                  k -> (q.qv[k] - i.cv[k]) * (q.qv[k] - i.cv[k]))) AS d
  FROM q CROSS JOIN init i
),
a1 AS (SELECT vec_id, min([d, c])[2] AS cell FROM d1 GROUP BY vec_id),
cells AS (
  SELECT e.vec_id, a1.cell, e.embedding
  FROM embeddings e JOIN a1 USING (vec_id)
),
dropped AS (
  SELECT DISTINCT y.vec_id
  FROM cells x JOIN cells y
    ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6)
        >= {_SEMDEDUP_COS}
)
SELECT a1.vec_id,
       CAST(a1.cell AS BIGINT) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM a1 LEFT JOIN dropped d ON d.vec_id = a1.vec_id
"""


@register("l2_semdedup", oracle=_L2_SEMDEDUP_ORACLE, tags=("L2", "L6", "L3"))
def l2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, cluster-then-prune: assign every embedding to
    its nearest seed centroid (integer-exact, shared with
    l6_kmeans_step), form near-dup pairs ONLY within a cell
    (cosine ≥ 0.4, rounded 6 both engines), and keep the lowest vec_id
    of every duplicate chain. Output (vec_id, cell, keep).

    Scale: the join key is the cell id, so pair formation is bounded
    by the largest cell, not the corpus — with balanced cells this is
    n²/k work sharded across k independent groups (and each cell's
    pairs shuffle only that cell's rows). Cross-cell near-dups are
    missed by design; raise k to shrink cells, or run
    l2_embedding_neardup as the exact audit on a sample.
    """
    _, a1 = _km_quant_assign(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    cells = e.join(a1, "vec_id").select(
        "vec_id", F.col("c1").alias("cell"), "embedding", "nrm"
    )

    # Optimization r13: the within-cell pair join scored Σ|cell|² pairs
    # through the interpreted zip_with/aggregate HOF dot (the exact
    # class the r12 ANN kernels left this operator in — measured 4.4 s
    # at sf0.1). One tiled Arrow matmul per cell now marks dropped ids
    # directly (guide §4.2); scores are np.round of the gemm against
    # the identical dot/(nrm·nrm) formula — the established
    # q10/l2_embedding_neardup numeric-exact precedent, pinned by the
    # unchanged golden + oracle parity at three SFs. Cells partition
    # the vectors, so per-group-distinct dropped ids need no global
    # DISTINCT exchange.
    def drop_kernel(pdf):
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        N = pdf["nrm"].to_numpy().astype(np.float64)
        return _semdedup_dropped_frame(ids, E, N, _SEMDEDUP_COS)

    dropped = cells.groupBy("cell").applyInPandas(drop_kernel, "vec_id bigint")
    return (
        a1.join(dropped.withColumn("is_dup", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("c1").cast("long").alias("cell"),
            F.when(F.col("is_dup").isNull(), 1).otherwise(0).cast("long").alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# L4 — overlapping chunking (RAG / long-context prep): fixed-size token
# windows with stride < size so context is never cut mid-thought.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48

_L4_CHUNK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, {_ORACLE_TOKS} AS ts, len({_ORACLE_TOKS}) AS n FROM documents
),
exploded AS (
  -- list-valued generate_series + unnest: DuckDB's table-function form
  -- cannot take a correlated bound
  SELECT doc_id, ts,
         unnest(generate_series(0, CAST(floor((n - 1) / {_CHUNK_STRIDE}) AS BIGINT))) AS cid
  FROM toks WHERE n > 0
)
SELECT doc_id,
       CAST(cid AS BIGINT) AS chunk_id,
       CAST(len(ts[cid*{_CHUNK_STRIDE}+1 : cid*{_CHUNK_STRIDE}+{_CHUNK_SIZE}]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(ts[cid*{_CHUNK_STRIDE}+1 : cid*{_CHUNK_STRIDE}+{_CHUNK_SIZE}], ' ')
         AS chunk_text
FROM exploded
"""


@register("l4_chunk_overlap", oracle=_L4_CHUNK_ORACLE, tags=("L4", "F5", "U5"))
def l4_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into 64-token windows advancing 48 tokens
    at a time (16-token overlap): chunk i covers tokens
    [i·48+1, i·48+64], the final window is allowed to run short, and
    empty documents produce no chunks. The retrieval-index prep that
    keeps answers from being split across chunk boundaries.

    Scale: pure per-row explode of ⌈n/stride⌉ slices — map-side, no
    shuffle; output row count is (overlap factor)× the token mass,
    which is the known storage price of overlap (size/stride = 4/3
    here). Token positions come from one split; no re-tokenization per
    chunk.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("ts"), F.size(T.tokens(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0)
    cids = F.sequence(F.lit(0), F.floor((F.col("n") - 1) / _CHUNK_STRIDE).cast("long"))
    chunked = toks.select(
        "doc_id", "ts", F.explode(cids).alias("chunk_id")
    )
    window = F.slice(
        F.col("ts"), F.col("chunk_id").cast("int") * _CHUNK_STRIDE + 1, _CHUNK_SIZE
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# L4 — mixture planning: turn per-source token inventories + target
# shares into concrete sampling rates under a global token budget —
# the arithmetic between "we have this corpus" and "train on this mix".
# ---------------------------------------------------------------------------

_MIX_BUDGET_NUM, _MIX_BUDGET_DEN = 1, 2  # train on half the corpus' tokens

_L4_MIX_ORACLE = rf"""
WITH inv AS (
  SELECT source,
         CAST(SUM(len({_ORACLE_TOKS})) AS BIGINT) AS tokens_available
  FROM documents GROUP BY source
),
tot AS (SELECT COUNT(*) AS n_sources, SUM(tokens_available) AS corpus_tokens FROM inv)
SELECT source,
       tokens_available,
       CAST(corpus_tokens * {_MIX_BUDGET_NUM} AS DOUBLE)
         / ({_MIX_BUDGET_DEN} * n_sources) AS target_tokens,
       LEAST(1.0,
             (CAST(corpus_tokens * {_MIX_BUDGET_NUM} AS DOUBLE)
               / ({_MIX_BUDGET_DEN} * n_sources)) / tokens_available) AS sample_rate,
       CAST(CASE
         WHEN CAST(tokens_available AS DOUBLE)
                <= CAST(corpus_tokens * {_MIX_BUDGET_NUM} AS DOUBLE)
                   / ({_MIX_BUDGET_DEN} * n_sources)
         THEN tokens_available
         ELSE CAST(floor(CAST(corpus_tokens * {_MIX_BUDGET_NUM} AS DOUBLE)
                         / ({_MIX_BUDGET_DEN} * n_sources)) AS BIGINT)
       END AS BIGINT) AS tokens_planned
FROM inv CROSS JOIN tot
"""


@register("l4_mixture_plan", oracle=_L4_MIX_ORACLE, tags=("L4", "A1", "A2"))
def l4_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target mixture plan under a half-corpus token budget:
    each source's target is budget / n_sources; the sampling rate is
    min(1, target/available) so under-resourced sources are taken whole
    (their shortfall is NOT redistributed — single-pass planning, the
    redistribution round would iterate this same query on the
    remainder). tokens_planned floors the fractional target.

    Scale: one groupBy(source) inventory + a broadcast 1-row totals
    join — the plan itself is dimension-sized no matter the corpus;
    the expensive part (the actual per-doc sampling) is s3/s7/s9's
    deterministic hash machinery keyed on these rates.
    """
    docs = load_table(spark, sf_dir, "documents")
    inv = docs.groupBy("source").agg(
        F.sum(F.size(T.tokens(F.col("text")))).cast("long").alias("tokens_available")
    )
    tot = inv.agg(
        F.count("*").alias("n_sources"),
        F.sum("tokens_available").alias("corpus_tokens"),
    )
    joined = inv.crossJoin(F.broadcast(tot))
    target = (
        (F.col("corpus_tokens") * _MIX_BUDGET_NUM).cast("double")
        / (F.lit(_MIX_BUDGET_DEN) * F.col("n_sources"))
    )
    rate = F.least(F.lit(1.0), target / F.col("tokens_available"))
    planned = F.when(
        F.col("tokens_available").cast("double") <= target,
        F.col("tokens_available"),
    ).otherwise(F.floor(target).cast("long"))
    return joined.select(
        "source",
        "tokens_available",
        target.alias("target_tokens"),
        rate.alias("sample_rate"),
        planned.cast("long").alias("tokens_planned"),
    )


# ---------------------------------------------------------------------------
# L4 — lexicon sentiment scoring (the EDBT'16 large-scale-sentiment-
# on-Spark shape): token-level lexicon hits → per-doc polarity →
# per-source rollup. The lexicon uses corpus-vocabulary words so the
# scores are non-degenerate on the fixture.
# ---------------------------------------------------------------------------

_SENT_POS = ("fast", "big", "value")
_SENT_NEG = ("slow", "dup", "small")

_L4_SENT_ORACLE = rf"""
WITH scored AS (
  SELECT source,
         len(list_filter({_ORACLE_TOKS}, t -> t IN {_SENT_POS!r})) AS pos_hits,
         len(list_filter({_ORACLE_TOKS}, t -> t IN {_SENT_NEG!r})) AS neg_hits,
         len({_ORACLE_TOKS}) AS n_tokens
  FROM documents
)
SELECT source,
       CAST(SUM(pos_hits) AS BIGINT) AS pos_hits,
       CAST(SUM(neg_hits) AS BIGINT) AS neg_hits,
       CAST(COUNT(CASE WHEN pos_hits > neg_hits THEN 1 END) AS BIGINT) AS n_positive,
       CAST(COUNT(CASE WHEN neg_hits > pos_hits THEN 1 END) AS BIGINT) AS n_negative,
       ROUND(AVG(CASE WHEN n_tokens > 0
                      THEN CAST(pos_hits - neg_hits AS DOUBLE) / n_tokens
                      ELSE 0.0 END), 6) AS mean_polarity
FROM scored GROUP BY source
"""


@register("l4_lexicon_sentiment", oracle=_L4_SENT_ORACLE, tags=("L4", "F5", "A1"))
def l4_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based polarity per source: count positive/negative
    lexicon hits per document with HOF filters (counting REPEATS — a
    doc saying "fast" twice is more positive than once, hence filter
    not intersect), classify docs by majority polarity, and roll up
    hit mass and length-normalized mean polarity per source.

    Scale: the lexicon inlines as a literal IN-list (broadcast-free for
    fixed lexica; a 100k-term lexicon becomes a broadcast join against
    exploded tokens instead); everything before the one
    groupBy(source) shuffle is a map-side projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    pos = F.size(F.filter(toks, lambda t: t.isin(*_SENT_POS)))
    neg = F.size(F.filter(toks, lambda t: t.isin(*_SENT_NEG)))
    scored = docs.select(
        "source",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        F.size(toks).alias("n_tokens"),
    )
    polarity = F.when(
        F.col("n_tokens") > 0,
        (F.col("pos_hits") - F.col("neg_hits")).cast("double") / F.col("n_tokens"),
    ).otherwise(0.0)
    return scored.groupBy("source").agg(
        F.sum("pos_hits").cast("long").alias("pos_hits"),
        F.sum("neg_hits").cast("long").alias("neg_hits"),
        F.count(F.when(F.col("pos_hits") > F.col("neg_hits"), 1)).alias("n_positive"),
        F.count(F.when(F.col("neg_hits") > F.col("pos_hits"), 1)).alias("n_negative"),
        F.round(F.avg(polarity), 6).alias("mean_polarity"),
    )


# ---------------------------------------------------------------------------
# J13 — trajectory similarity (the REPOSE/ICDE'21 problem shape):
# users whose event trajectories visit near-identical ZONE SETS, found
# by a zone-blocked inverted-index join — meet-in-bucket, never the
# all-pairs matrix. Zones are synthesized deterministically per event
# (the fixture has no organic coordinates — f9's recipe).
# ---------------------------------------------------------------------------

_TRAJ_ZONES = 40
_TRAJ_MIN_JAC = 0.7

_J13_ORACLE = f"""
WITH cells AS (
  SELECT DISTINCT user_id,
         (event_id * 2654435761 + user_id * 7) % {_TRAJ_ZONES} AS zone
  FROM events
),
sizes AS (SELECT user_id, COUNT(*) AS n FROM cells GROUP BY user_id),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS common
  FROM cells a JOIN cells b ON a.zone = b.zone AND a.user_id < b.user_id
  GROUP BY ua, ub
)
SELECT ua AS user_a, ub AS user_b,
       CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS zone_jaccard
FROM pairs
JOIN sizes sa ON sa.user_id = ua
JOIN sizes sb ON sb.user_id = ub
WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= {_TRAJ_MIN_JAC}
"""


@register("j13_trajectory_similarity", oracle=_J13_ORACLE, tags=("J8", "F9", "L2"))
def j13_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with near-identical movement footprints: each user's
    trajectory reduces to its DISTINCT visited-zone set, and set-
    Jaccard ≥ 0.7 keeps the matches — exact integer-ratio math, no
    rounding.

    The zone universe is FIXED at ``_TRAJ_ZONES`` = 40 < 64, so each
    user's zone set folds into ONE 64-bit mask (``bit_or(1 << zone)``
    — duplicates vanish in the OR, so no pre-distinct shuffle is paid)
    and |A∩B| is a single ``bit_count(mask_a & mask_b)``. The r1–r11
    inverted-index form (meet-in-zone self-join) degenerates on this
    dense tiny universe: ~32 of 40 zones per user meant every zone
    bucket held ~80% of all users, exploding ~30M candidate rows into
    a pair-count aggregate (measured 6.09 s warm at sf0.1). The mask
    form evaluates the same |users|²/2 pairs as a broadcast pair scan
    of 1 500 mask rows — one AND+POPCOUNT each, no explode, no
    pair-count shuffle (optimization r12; 5 exchanges → 1).

    Scale: the deliberate pair scan is right while DISTINCT USERS fit
    a broadcast (~10⁷ rows of 16 B); past that, block the pair grid
    (QB×IB on user hash, l3_knn_block_matmul's shape) — still
    O(users²) bit-ops but distributed, which a 40-zone universe makes
    unavoidable: with zones ≪ users, ANY two dense users collide in
    some zone, so inverted-index candidate generation is itself
    Ω(users²) rows (and ~40× that in duplicates). A LARGE sparse zone
    universe (real geohash grids) inverts the trade and the
    meet-in-zone form (git history, r11) wins again; REPOSE-style
    local reference points are exactly a smarter zone blocking.
    """
    ev = load_table(spark, sf_dir, "events")
    zone = (F.col("event_id") * 2654435761 + F.col("user_id") * 7) % _TRAJ_ZONES
    masks = (
        ev.select("user_id", zone.cast("int").alias("zone"))
        .groupBy("user_id")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), zone)")).alias("mask"))
        .select("user_id", "mask", F.bit_count("mask").alias("n"))
    )
    a, b = masks.alias("a"), masks.alias("b")
    common = F.bit_count(F.col("a.mask").bitwiseAND(F.col("b.mask")))
    jac = common.cast("double") / (F.col("a.n") + F.col("b.n") - common)
    return (
        a.join(F.broadcast(b), F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            jac.alias("zone_jaccard"),
        )
        .filter(F.col("zone_jaccard") >= _TRAJ_MIN_JAC)
    )


# ---------------------------------------------------------------------------
# L4 — readability profile: Flesch reading-ease from whitespace words,
# vowel-group syllables, and terminal-punctuation sentences — the
# classic corpus-quality heuristic (prose difficulty) next to
# l4_quality_score's spam heuristics.
# ---------------------------------------------------------------------------

_L4_READ_ORACLE = f"""
WITH d AS (
  SELECT lang,
         len({_ORACLE_TOKS}) AS w,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s
  FROM documents
),
agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS total_words,
         CAST(SUM(sy) AS BIGINT) AS total_syllables,
         CAST(SUM(s) AS BIGINT) AS total_sentences
  FROM d GROUP BY lang
)
SELECT lang, n_docs, total_words, total_syllables, total_sentences,
       CASE WHEN total_words = 0 THEN 0.0
            ELSE ROUND(206.835
                       - 1.015 * (CAST(total_words AS DOUBLE) / total_sentences)
                       - 84.6 * (CAST(total_syllables AS DOUBLE) / total_words)
                       + 0, 6)
       END AS flesch
FROM agg
"""


@register("l4_readability", oracle=_L4_READ_ORACLE, tags=("L4", "F2", "A1"))
def l4_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Flesch reading-ease over the corpus: words are
    whitespace tokens, syllables are maximal vowel-group runs
    ([aeiouy]+ on the lowercased text — word boundaries can't merge
    groups since spaces aren't vowels), sentences are terminal-
    punctuation runs (floored at 1). The score computes ONCE per
    language from exact integer totals — never averaged per-document
    doubles — so the two engines evaluate the identical double
    expression on identical integers (round 6, negative-zero
    guarded).

    Scale: three regex/split counts in the scan projection, one
    ~30-group aggregate with map-side partials. Regex classes this
    simple compile identically under Java regex and RE2; no
    backreferences (DuckDB's RE2 would silently drop them).
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(T.tokens(F.col("text"))).alias("w"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ).alias("sy"),
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        ).alias("s"),
    )
    agg = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("total_words"),
        F.sum("sy").alias("total_syllables"),
        F.sum("s").alias("total_sentences"),
    )
    # an all-empty-docs language has zero words; 0.0 sentinel instead
    # of an ANSI divide-by-zero (sentences are already floored at 1).
    flesch = F.when(F.col("total_words") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("total_words").cast("double") / F.col("total_sentences"))
            - F.lit(84.6)
            * (F.col("total_syllables").cast("double") / F.col("total_words"))
            + F.lit(0),
            6,
        )
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_words",
        "total_syllables",
        "total_sentences",
        flesch.alias("flesch"),
    )


# ---------------------------------------------------------------------------
# G3 — BFS shortest hops over the co-purchase graph (g2's edge set,
# undirected): frontier-style min-distance propagation from the
# smallest node id, graded as the hop-distance histogram against a
# DuckDB recursive CTE.
# ---------------------------------------------------------------------------

_G3_MAX_HOPS = 8
_G3_MIN_SUP = 2

_G3_ORACLE = f"""
WITH RECURSIVE
{oracle_co_edges(2)},
ud AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v AS s, u AS d FROM e),
walk(node, hops) AS (
  SELECT MIN(u), 0 FROM e
  UNION
  SELECT ud.d, w.hops + 1
  FROM walk w JOIN ud ON ud.s = w.node
  WHERE w.hops < {_G3_MAX_HOPS}
),
dist AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY node)
SELECT CAST(hops AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM dist GROUP BY hops
"""


@register("g3_shortest_hops", oracle=_G3_ORACLE, tags=("A1", "J1", "A2"))
def g3_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the undirected co-purchase graph: hop
    distance from the smallest node id, reported as the distance
    histogram (hops → node count, hop cap 8). The Spark form is
    the iterative DataFrame frontier: each round joins current
    distances to the edge list, takes the element-wise min, and stops
    when a round adds/changes nothing — Pregel-as-DataFrames, the same
    loop discipline as l2_dup_clusters (persist per round, convergence
    via count, unpersist behind).

    Scale: each round is one shuffle join on node id + one min-agg;
    rounds ≤ graph diameter (capped). At 100 TB the frontier join
    stays hash-partitioned on node — no broadcast of the distance
    table, no driver materialization; the histogram is the only small
    output. The oracle's recursive CTE dedups (node, hops) pairs via
    UNION, bounding it at V·(cap+1) rows.
    """
    # localCheckpoint: e feeds the symmetrized union twice plus the
    # source pick — truncate once, O(edges) storage.
    # ckpt tier-2 (O(edges)): see _helpers.ckpt size contract.
    e = co_purchase_edges(spark, sf_dir, _G3_MIN_SUP).select("u", "v").transform(ckpt)
    ud = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    ud = ud.persist()
    src = e.agg(F.min("u").alias("node")).select("node", F.lit(0).alias("hops"))
    # localCheckpoint per round truncates the loop's logical lineage —
    # without it the plan tree doubles every iteration (union-of-join of
    # the previous round) and plan analysis itself OOMs by round ~8.
    dist = src.transform(iter_ckpt)
    n_prev = dist.count()
    for _ in range(_G3_MAX_HOPS):
        grown = (
            dist.join(ud, dist.node == ud.s)
            .select(F.col("d").alias("node"), (F.col("hops") + 1).alias("hops"))
            .unionByName(dist.select("node", "hops"))
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        ).transform(iter_ckpt)
        n_now = grown.count()
        dist = grown
        if n_now == n_prev:
            # No new node reached; min-hops of reached nodes are final
            # (BFS layers only ever add nodes, never improve old ones).
            break
        n_prev = n_now
    out = dist.groupBy("hops").agg(F.count("*").alias("n_nodes")).select(
        F.col("hops").cast("long").alias("hops"), "n_nodes"
    )
    ud.unpersist()
    return out



# ---------------------------------------------------------------------------
# L3 — IVF + PQ: the full billion-scale ANN read path in one plan —
# coarse inverted-file cells prune the corpus, PQ ADC scores only the
# survivors. Deterministic coarse codebook + integer-exact distances
# make the ENTIRE composite DuckDB-oracle-expressible (unlike the
# sampled-k-means l3_ann_ivf, which grades via the recall contract).
# ---------------------------------------------------------------------------

_IVF_C = 8  # coarse cells (centroids = the first C vectors, quantized)
_IVF_NPROBE = 2

_L3_IVF_PQ_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
subs AS (
  SELECT vec_id, CAST(j AS INT) AS subspace,
         qv[j*{_PQ_SUB}+1 : j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM q, generate_series(0, {_PQ_M - 1}) t(j)
),
cb AS (SELECT vec_id AS code, subspace, sv AS csv FROM subs WHERE vec_id < {_PQ_K}),
dists AS (
  SELECT s.vec_id, s.subspace, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_SUB}),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
  FROM subs s JOIN cb c ON s.subspace = c.subspace
),
best AS (
  SELECT vec_id, subspace, CAST(min([dist, code])[2] AS BIGINT) AS code
  FROM dists GROUP BY vec_id, subspace
),
coarse AS (SELECT vec_id AS cell, qv AS cqv FROM q WHERE vec_id < {_IVF_C}),
fdist AS (
  SELECT f.vec_id, c.cell,
         list_sum(list_transform(generate_series(1, {_PQ_M * _PQ_SUB}),
                  i -> (f.qv[i] - c.cqv[i]) * (f.qv[i] - c.cqv[i]))) AS fd
  FROM q f CROSS JOIN coarse c
),
assign AS (
  SELECT vec_id, CAST(min([fd, cell])[2] AS BIGINT) AS cell
  FROM fdist GROUP BY vec_id
),
probes AS (
  SELECT vec_id AS qid, cell FROM fdist
  WHERE vec_id BETWEEN {_PQ_Q_LO} AND {_PQ_Q_HI}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY fd, cell)
          <= {_IVF_NPROBE}
),
lut AS (
  SELECT vec_id AS qid, subspace, code, dist AS qdist
  FROM dists WHERE vec_id BETWEEN {_PQ_Q_LO} AND {_PQ_Q_HI}
),
cand AS (
  SELECT p.qid, a.vec_id
  FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id <> p.qid
),
adc AS (
  SELECT c.qid, c.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
  FROM cand c
  JOIN best b ON b.vec_id = c.vec_id
  JOIN lut l ON l.qid = c.qid AND l.subspace = b.subspace AND l.code = b.code
  GROUP BY 1, 2
)
SELECT qid, vec_id, adist FROM adc
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) <= {_PQ_TOPK}
"""


@register("l3_ivf_pq_topk", oracle=_L3_IVF_PQ_ORACLE, tags=("L3", "L6", "J5", "W2"))
def l3_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN composite: IVF cells prune, PQ codes score.
    Every vector is assigned to its nearest of 8 coarse cells (argmin
    of exact integer full-vector distance; centroids = the first 8
    quantized vectors, standing in for the sampled k-means that
    l3_ann_ivf trains); each query probes its 2 nearest cells; only
    the candidates in probed cells are scored — by ADC over the
    l6_pq_codes code table, never by full-precision math. Top-5 per
    query with the (adist, vec_id) tiebreak. All distances are exact
    BIGINT sums, so the full pipeline hash-matches DuckDB.

    Scale: this is the shape ANN serving actually runs at 10⁹+
    vectors — the corpus persists as (cell, 8 codes) ≈ 9 small ints
    per vector; a query touches nprobe cells (~n·nprobe/C candidates,
    a 4× prune here, arbitrarily sharper with more cells), and the
    scoring join is broadcast-LUT + groupBy exactly like
    l3_pq_adc_topk. Coarse assignment is one broadcast nested-loop
    over C centroid rows. Nothing ever collects the corpus; raising
    (C, nprobe) trades prune ratio against recall with the same plan.
    """
    subs, cb, best = _pq_assign(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qfull = emb.select("vec_id", _quantize_embedding().alias("qv"))
    coarse = qfull.filter(F.col("vec_id") < _IVF_C).select(
        F.col("vec_id").alias("cell"), F.col("qv").alias("cqv")
    )
    fdist = qfull.crossJoin(F.broadcast(coarse)).select(
        "vec_id", "cell", _pq_sqdist("qv", "cqv").alias("fd")
    )
    assign = (
        fdist.groupBy("vec_id")
        .agg(F.min(F.struct("fd", "cell")).alias("b"))
        .select("vec_id", F.col("b.cell").cast("long").alias("cell"))
    )
    w_probe = Window.partitionBy("vec_id").orderBy("fd", "cell")
    probes = (
        fdist.filter(F.col("vec_id").between(_PQ_Q_LO, _PQ_Q_HI))
        .withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), F.col("cell").cast("long").alias("cell"))
    )
    cand = probes.join(assign, "cell").filter(
        F.col("vec_id") != F.col("qid")
    ).select("qid", "vec_id")
    lut = (
        subs.filter(F.col("vec_id").between(_PQ_Q_LO, _PQ_Q_HI))
        .join(F.broadcast(cb), F.col("subspace") == F.col("cb_subspace"))
        .select(
            F.col("vec_id").alias("lut_qid"),
            F.col("subspace").alias("lut_subspace"),
            F.col("code").alias("lut_code"),
            _pq_sqdist("sv", "csv").alias("qdist"),
        )
    )
    adc = (
        cand.join(best, "vec_id")
        .join(
            F.broadcast(lut),
            (F.col("qid") == F.col("lut_qid"))
            & (F.col("subspace") == F.col("lut_subspace"))
            & (F.col("code") == F.col("lut_code")),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("qdist").alias("adist"))
    )
    w_top = Window.partitionBy("qid").orderBy("adist", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("qid", "vec_id", "adist")
    )


# ---------------------------------------------------------------------------
# L6 — triplet mining: for each anchor, the most-similar SAME-label
# vector (positive) and the most-similar DIFFERENT-label vector (the
# hard negative) — the contrastive-training data every embedding
# fine-tune needs. Integer-quantized dot products keep the ranking
# engine-exact.
# ---------------------------------------------------------------------------

_L6_HN_LO, _L6_HN_HI = _PQ_Q_LO, _PQ_Q_HI  # anchors: the PQ query trio

_L6_HN_COS = (
    "ROUND(CAST(list_sum(list_transform(generate_series(1, 64),"
    " i -> aq[i] * q[i])) AS DOUBLE)"
    " / (sqrt(CAST(list_sum(list_transform(generate_series(1, 64),"
    " i -> aq[i] * aq[i])) AS DOUBLE))"
    " * sqrt(CAST(list_sum(list_transform(generate_series(1, 64),"
    " i -> q[i] * q[i])) AS DOUBLE))) + 0, 6)"
)

_L6_HN_ORACLE = f"""
WITH qv AS (SELECT vec_id, label, {_PQ_QUANT_DUCK} AS q FROM embeddings),
a AS (
  SELECT vec_id AS aid, label AS albl, q AS aq
  FROM qv WHERE vec_id BETWEEN {_L6_HN_LO} AND {_L6_HN_HI}
),
c AS (
  SELECT a.aid, a.albl, v.vec_id, (v.label = a.albl) AS same,
         {_L6_HN_COS} AS cos
  FROM qv v CROSS JOIN a WHERE v.vec_id <> a.aid
),
r AS (
  SELECT * FROM c
  QUALIFY row_number() OVER (PARTITION BY aid, same ORDER BY cos DESC, vec_id) = 1
)
SELECT aid AS anchor_id, albl AS anchor_label,
       MAX(CASE WHEN same THEN vec_id END) AS pos_id,
       MAX(CASE WHEN same THEN cos END) AS pos_cos,
       MAX(CASE WHEN NOT same THEN vec_id END) AS neg_id,
       MAX(CASE WHEN NOT same THEN cos END) AS neg_cos
FROM r GROUP BY 1, 2
"""


def _int_dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register("l6_hard_negatives", oracle=_L6_HN_ORACLE, tags=("L6", "L3", "J5"))
def l6_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive training: each anchor gets its
    best same-label neighbor (positive) and best different-label
    neighbor (hard negative) by cosine over integer-quantized
    coordinates — exact BIGINT dot products, one identical closing
    double expression, 6-dp rounding, (cos, vec_id) tiebreak. Hard
    negatives — near misses across the label boundary — are what make
    triplet losses learn; random negatives teach nothing.

    Scale: anchors broadcast against the corpus (the q10 "small query
    side" regime — here genuinely small by construction); per-anchor
    top-1s are partitioned windows over the anchor key. At training
    scale the corpus side routes through the IVF/PQ candidates
    (l3_ivf_pq_topk) instead of the full scan — same downstream
    top-1-per-(anchor, side) shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", "label", _quantize_embedding().alias("q"))
    a = qv.filter(F.col("vec_id").between(_L6_HN_LO, _L6_HN_HI)).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("q").alias("aq"),
    )
    c = (
        qv.crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            "albl",
            "vec_id",
            (F.col("label") == F.col("albl")).alias("same"),
            F.round(
                _int_dot("aq", "q").cast("double")
                / (
                    F.sqrt(_int_dot("aq", "aq").cast("double"))
                    * F.sqrt(_int_dot("q", "q").cast("double"))
                )
                + F.lit(0),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("aid", "same").orderBy(F.col("cos").desc(), "vec_id")
    r = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return r.groupBy(
        F.col("aid").alias("anchor_id"), F.col("albl").alias("anchor_label")
    ).agg(
        F.max(F.when(F.col("same"), F.col("vec_id"))).alias("pos_id"),
        F.max(F.when(F.col("same"), F.col("cos"))).alias("pos_cos"),
        F.max(F.when(~F.col("same"), F.col("vec_id"))).alias("neg_id"),
        F.max(F.when(~F.col("same"), F.col("cos"))).alias("neg_cos"),
    )


# ---------------------------------------------------------------------------
# L6 — centroid drift: per label, the cosine between the even-half and
# odd-half centroids — "did this class's embedding distribution move
# between snapshots?", the vector-space twin of dq6's PSI.
# ---------------------------------------------------------------------------

_DRIFT_SCALE = 10_000  # coarser than PQ's 1e6: Σ(se·so) must stay in BIGINT

_L6_DRIFT_ORACLE = f"""
WITH q AS (
  SELECT vec_id % 2 AS parity, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {_DRIFT_SCALE} + 0) AS BIGINT))
           AS qv
  FROM embeddings
),
lf AS (
  SELECT parity, label, u.dim, u.v
  FROM q, LATERAL (
    SELECT unnest(generate_series(1, len(qv))) AS dim, unnest(qv) AS v
  ) u
),
s AS (
  SELECT label, dim,
         CAST(SUM(CASE WHEN parity = 0 THEN v ELSE 0 END) AS BIGINT) AS se,
         CAST(SUM(CASE WHEN parity = 1 THEN v ELSE 0 END) AS BIGINT) AS so
  FROM lf GROUP BY 1, 2
),
g AS (
  SELECT label,
         CAST(SUM(se * so) AS BIGINT) AS dot,
         CAST(SUM(se * se) AS BIGINT) AS ne,
         CAST(SUM(so * so) AS BIGINT) AS no
  FROM s GROUP BY label
),
cnt AS (
  SELECT label,
         CAST(SUM(CASE WHEN parity = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
         CAST(SUM(CASE WHEN parity = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
  FROM q GROUP BY label
)
SELECT g.label, cnt.n_even, cnt.n_odd,
       CASE WHEN ne = 0 OR no = 0 THEN 0.0
            ELSE ROUND(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(ne AS DOUBLE)) * sqrt(CAST(no AS DOUBLE)))
                       + 0, 6)
       END AS centroid_cos
FROM g JOIN cnt ON cnt.label = g.label
"""


@register("l6_centroid_drift", oracle=_L6_DRIFT_ORACLE, tags=("L6", "A2", "F5"))
def l6_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cosine between the even- and odd-id halves of
    the embedding table: the mean vectors' cosine equals the cosine of
    the per-dimension SUM vectors (scale factors cancel), so the whole
    statistic is exact integer sums of quantized coordinates up to one
    identical closing double. Cosine near 1 = the class's embedding
    mass did not move between the two "snapshots"; a drop is the
    retrain/reindex trigger. Quantization is 10⁴ (not PQ's 10⁶)
    so Σ se·so stays far inside BIGINT at any plausible corpus size.

    Scale: long-form explode → (label, dim) sums is the l6_centroids
    shape — shuffle keys are (label × 64 dims), tiny and uniform;
    nothing ever materializes a matrix. Snapshot halves generalize to
    (corpus_version, label) keys with the same plan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * _DRIFT_SCALE + 0).cast("long"),
    )
    q = emb.select(
        (F.col("vec_id") % 2).alias("parity"), "label", qv.alias("qv")
    )
    lf = q.select(
        "parity", "label", F.posexplode(F.col("qv")).alias("dim", "v")
    )
    s = lf.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("parity") == 0, F.col("v")).otherwise(0)).alias("se"),
        F.sum(F.when(F.col("parity") == 1, F.col("v")).otherwise(0)).alias("so"),
    )
    g = s.groupBy("label").agg(
        F.sum(F.col("se") * F.col("so")).alias("dot"),
        F.sum(F.col("se") * F.col("se")).alias("ne"),
        F.sum(F.col("so") * F.col("so")).alias("no"),
    )
    cnt = q.groupBy("label").agg(
        F.sum(F.when(F.col("parity") == 0, 1).otherwise(0)).alias("n_even"),
        F.sum(F.when(F.col("parity") == 1, 1).otherwise(0)).alias("n_odd"),
    )
    # one-sided labels (all vectors in one parity half) zero a norm;
    # the 0.0 sentinel keeps ANSI mode from throwing on the division.
    cos = F.when((F.col("ne") == 0) | (F.col("no") == 0), F.lit(0.0)).otherwise(
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("ne").cast("double"))
                * F.sqrt(F.col("no").cast("double"))
            )
            + F.lit(0),
            6,
        )
    )
    return g.join(cnt, "label").select(
        "label", "n_even", "n_odd", cos.alias("centroid_cos")
    )


# ---------------------------------------------------------------------------
# G5 — power-law degree fit: the continuous-MLE α over the co-purchase
# degree distribution — "is this graph scale-free or random?", the
# graph-health statistic next to g2's clustering coefficient.
# ---------------------------------------------------------------------------

_G5_ORACLE = f"""
WITH {{co_edges}},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(MAX(d) AS BIGINT) AS max_degree,
         list_sort(list([node, d])) AS ds
  FROM deg
)
SELECT n_nodes,
       CAST(COALESCE(max_degree, 0) AS BIGINT) AS max_degree,
       CASE WHEN n_nodes = 0 THEN 0.0
            ELSE ROUND(1.0 + n_nodes
                       / list_sum(list_transform(ds,
                           x -> ln(CAST(x[2] AS DOUBLE) / 0.5))) + 0, 6)
       END AS alpha
FROM g
"""


@register("g5_powerlaw_alpha", oracle=_G5_ORACLE.format(co_edges=oracle_co_edges(2)), tags=("A1", "A2", "F4"))
def g5_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clauset–Shalizi–Newman continuous MLE for the power-law exponent
    of the co-purchase degree distribution: α = 1 + n / Σ ln(dᵢ/(dmin−½))
    with dmin = 1 (every node in the edge set has degree ≥ 1, so the
    ½-shifted denominator is the standard continuous correction). The
    ln terms fold in node-sorted order (a25's recipe) from exact
    integer degrees; α ≈ 2–3 is the scale-free regime.

    Scale: degrees are one aggregation over the shared edge table
    (co_purchase_edges — the same base as g2/g3/q31); the fold array
    is bounded by the node count of the EDGE SET, which min-support
    already prunes. For web-scale graphs the fold becomes a two-level
    sum of per-bucket partial logs — same integers, no array.
    """
    # localCheckpoint: the endpoint union derives e twice.
    # ckpt tier-2 (O(edges), not O(keys)): one local-disk edge list vs
    # >=3 fact re-scans; job re-runs on executor loss (helper contract).
    e = co_purchase_edges(spark, sf_dir, 2).select("u", "v").transform(ckpt)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    g = deg.agg(
        F.count("*").alias("n_nodes"),
        F.max("d").alias("max_degree"),
        F.array_sort(F.collect_list(F.array(F.col("node"), F.col("d")))).alias("ds"),
    )
    lsum = F.aggregate(
        F.col("ds"),
        F.lit(0.0),
        lambda acc, x: acc + F.log(x[1].cast("double") / F.lit(0.5)),
    )
    # an empty pruned edge set still emits ONE global-agg row
    # (n_nodes=0, empty fold = 0.0) — sentinel, not an ANSI divide.
    return g.select(
        "n_nodes",
        F.coalesce(F.col("max_degree"), F.lit(0)).alias("max_degree"),
        F.when(F.col("n_nodes") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.lit(1.0) + F.col("n_nodes") / lsum + F.lit(0), 6)
        )
        .alias("alpha"),
    )


# ---------------------------------------------------------------------------
# L4 — vocabulary coverage: what share of all token OCCURRENCES the
# top-k word types cover — the curve that sizes a tokenizer's vocab
# (and explains why 1k types can cover 90% of a corpus).
# ---------------------------------------------------------------------------

_L4_VOCAB_KS = (10, 100, 1000)

_L4_VOCAB_ORACLE = f"""
WITH w AS (
  SELECT unnest({_ORACLE_TOKS}) AS word FROM documents
),
wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY word),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_types FROM wc),
rk AS (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word) AS rn
  FROM wc
)
SELECT k, covered, total, n_types,
       ROUND(CAST(covered AS DOUBLE) / total + 0, 6) AS coverage
FROM (
  SELECT CAST(u.k AS BIGINT) AS k,
         CAST(SUM(CASE WHEN rk.rn <= u.k THEN rk.cnt ELSE 0 END) AS BIGINT)
           AS covered,
         t.total, t.n_types
  FROM rk CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _L4_VOCAB_KS)}]) AS k) u
  CROSS JOIN t
  GROUP BY u.k, t.total, t.n_types
)
"""


@register("l4_vocab_coverage", oracle=_L4_VOCAB_ORACLE, tags=("L4", "O2", "A1"))
def l4_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of the top-{10,100,1000} word types:
    word counts rank by (count, word), and each k reports how much of
    the corpus its vocabulary prefix covers — exact integers plus one
    6-dp ratio. The l4_zipf_slope twin in CURVE form: Zipf says
    coverage grows like log k, and this measures it.

    Scale: the word count is l4_word_freq's partial-aggregated
    shuffle; the rank over DISTINCT TYPES uses the two-level
    scalable row number (negated-key descending form) — the type
    table is sub-linear in corpus size (Heaps' law), and the rank
    never single-partition-sorts it anyway. Coverage
    sums are conditional aggregates over the ranked table — no
    per-k re-scan of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
    wc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    t = wc.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_types")
    )
    from ._helpers import scalable_row_number

    # descending rank via the negated-key two-level row number — the
    # CLAUDE.md rule is "never a bare Window.orderBy", even over the
    # (Heaps-law-sublinear) distinct-type aggregate.
    rk = scalable_row_number(
        wc.withColumn("neg", -F.col("cnt")),
        key="neg",
        bucket_width=64,
        order_cols=[F.col("neg"), F.col("word")],
        out="rn",
    )
    ks = spark.createDataFrame([(k,) for k in _L4_VOCAB_KS], "k long")
    per_k = (
        rk.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("rn") <= F.col("k"), F.col("cnt")).otherwise(0)
            ).alias("covered")
        )
    )
    return per_k.crossJoin(F.broadcast(t)).select(
        "k",
        "covered",
        "total",
        "n_types",
        F.round(
            F.col("covered").cast("double") / F.col("total") + F.lit(0), 6
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# L6 — Johnson–Lindenstrauss signed random projection (round 4): 64-d
# float embeddings down to 8 dims via a deterministic ±1 projection
# matrix derived from a multiplicative hash — the cheap dimensionality
# reduction that preserves pairwise distances within (1±ε) and feeds
# coarse clustering / visualization / LSH seeding at corpus scale.
# ---------------------------------------------------------------------------

_L6_RP_ORACLE = """
SELECT vec_id,
       CAST(d AS INTEGER) AS dim,
       round(list_sum(list_transform(
         range(1, len(embedding) + 1),
         i -> CAST(embedding[i] AS DOUBLE)
              * (1 - 2 * ((((i - 1) * 73 + d * 151) * 2654435761 >> 13) % 2))
       )), 6) + 0 AS proj
FROM embeddings, generate_series(0, 7) AS t(d)
"""


@register("l6_random_projection", oracle=_L6_RP_ORACLE, tags=("L6", "F5", "F4"))
def l6_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto 8 signed-sum axes: output dim d is
    Σᵢ emb[i]·s(i,d) with s(i,d) = ±1 from bit 13 of a multiplicative
    hash of (i, d) — a deterministic stand-in for the JL Gaussian
    matrix (±1 entries satisfy the lemma per Achlioptas 2003). Both
    engines fold the products IN ORDER (Spark `aggregate` and DuckDB
    `list_sum` are sequential folds), so the double sums are
    bit-identical before the 6-dp round; the hash is exact BIGINT
    arithmetic.

    Scale: pure per-row projection — no shuffle, no Python crossing,
    no driver state; the 8×64 "matrix" is an expression, so nothing is
    broadcast. The long-form (vec_id, dim, proj) output explodes 8×
    inside the scan projection.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = V.as_double(F.col("embedding"))

    def signed_sum(d):
        def term(v, i):
            h = (i.cast("long") * 73 + d.cast("long") * 151) * F.lit(2654435761)
            sign = 1 - 2 * (F.shiftright(h, 13) % 2)
            return v * sign

        # Index comes from transform's two-arg lambda (0-based), not a
        # separate sequence(0, size-1) array: for an empty embedding
        # that sequence is the DESCENDING [0, -1] and zip_with would
        # null-pad — parity with DuckDB's NULL list_sum([]) held only
        # by accident. The empty case is now NULL by design (the fold's
        # 0.0 init would otherwise surface).
        fold = F.aggregate(
            F.transform(emb, term), F.lit(0.0), lambda a, x: a + x
        )
        return F.when(F.size(emb) == 0, F.lit(None).cast("double")).otherwise(
            F.round(fold, 6) + 0
        )

    projs = F.transform(F.sequence(F.lit(0), F.lit(7)), signed_sum)
    return e.select(
        "vec_id", F.posexplode(projs).alias("dim", "proj")
    ).select("vec_id", F.col("dim").cast("int").alias("dim"), "proj")


# ---------------------------------------------------------------------------
# L3 — PQ shortlist + exact re-rank (round 4): the standard two-stage
# retrieval — ADC over the code table proposes a wide shortlist, the
# exact integer distance re-orders just those candidates. Completes
# the PQ family: l6_pq_codes (write path), l3_pq_adc_topk (read path),
# this (read path with recall repair).
# ---------------------------------------------------------------------------

_PQ_SHORTLIST = 32

_L3_PQ_RERANK_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
subs AS (
  SELECT vec_id, CAST(j AS INT) AS subspace,
         qv[j*{_PQ_SUB}+1 : j*{_PQ_SUB}+{_PQ_SUB}] AS sv
  FROM q, generate_series(0, {_PQ_M - 1}) t(j)
),
cb AS (SELECT vec_id AS code, subspace, sv AS csv FROM subs WHERE vec_id < {_PQ_K}),
dists AS (
  SELECT s.vec_id, s.subspace, c.code,
         list_sum(list_transform(generate_series(1, {_PQ_SUB}),
                  i -> (s.sv[i] - c.csv[i]) * (s.sv[i] - c.csv[i]))) AS dist
  FROM subs s JOIN cb c ON s.subspace = c.subspace
),
best AS (
  SELECT vec_id, subspace, CAST(min([dist, code])[2] AS BIGINT) AS code
  FROM dists GROUP BY vec_id, subspace
),
lut AS (
  SELECT vec_id AS qid, subspace, code, dist AS qdist
  FROM dists WHERE vec_id BETWEEN {_PQ_Q_LO} AND {_PQ_Q_HI}
),
shortlist AS (
  SELECT qid, vec_id FROM (
    SELECT l.qid, b.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adist
    FROM best b JOIN lut l ON b.subspace = l.subspace AND b.code = l.code
    GROUP BY l.qid, b.vec_id
  )
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id)
          <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT sh.qid, sh.vec_id,
         CAST(SUM(list_sum(list_transform(generate_series(1, {_PQ_SUB}),
              i -> (qs.sv[i] - cs.sv[i]) * (qs.sv[i] - cs.sv[i])))) AS BIGINT)
           AS exact_dist
  FROM shortlist sh
  JOIN subs qs ON qs.vec_id = sh.qid
  JOIN subs cs ON cs.vec_id = sh.vec_id AND cs.subspace = qs.subspace
  GROUP BY sh.qid, sh.vec_id
)
SELECT qid, vec_id, exact_dist FROM exact
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY exact_dist, vec_id)
        <= {_PQ_TOPK}
"""


@register("l3_pq_rerank", oracle=_L3_PQ_RERANK_ORACLE, tags=("L3", "L6", "W2"))
def l3_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ retrieval: ADC proposes the top-32
    codes per query (cheap, approximate), then the EXACT quantized
    distance — computed only for shortlist pairs — picks the final
    top-5. This is how production PQ serving repairs ADC's
    quantization error without ever scanning floats corpus-wide.
    Integer-exact end to end (same quantization as the whole PQ
    family), so both engines agree bit-for-bit including tiebreaks.

    Scale: stage 1 is l3_pq_adc_topk's broadcast-LUT scan; stage 2
    touches only queries×32 pairs — the exact-distance
    join is a per-pair lookup into the subvector table, partitioned by
    corpus vec_id (no full-corpus float scan at any point). The
    shortlist window partitions by qid; nothing is global.
    """
    subs, cb, best = _pq_assign(spark, sf_dir)
    lut = (
        subs.filter(F.col("vec_id").between(_PQ_Q_LO, _PQ_Q_HI))
        .join(F.broadcast(cb), F.col("subspace") == F.col("cb_subspace"))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("subspace").alias("lut_subspace"),
            F.col("code").alias("lut_code"),
            _pq_sqdist("sv", "csv").alias("qdist"),
        )
    )
    adc = (
        best.join(
            F.broadcast(lut),
            (F.col("subspace") == F.col("lut_subspace"))
            & (F.col("code") == F.col("lut_code")),
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("qdist").alias("adist"))
    )
    short_w = Window.partitionBy("qid").orderBy("adist", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(short_w))
        .filter(F.col("rn") <= _PQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    qsubs = subs.filter(F.col("vec_id").between(_PQ_Q_LO, _PQ_Q_HI)).select(
        F.col("vec_id").alias("q_vid"),
        F.col("subspace").alias("q_subspace"),
        F.col("sv").alias("qsv"),
    )
    csubs = subs.select(
        F.col("vec_id").alias("c_vid"),
        F.col("subspace").alias("c_subspace"),
        F.col("sv").alias("csv2"),
    )
    exact = (
        shortlist.join(csubs, shortlist.vec_id == csubs.c_vid)
        .join(
            F.broadcast(qsubs),
            (F.col("qid") == F.col("q_vid"))
            & (F.col("c_subspace") == F.col("q_subspace")),
        )
        .select("qid", "vec_id", _pq_sqdist("qsv", "csv2").alias("subdist"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("subdist").cast("long").alias("exact_dist"))
    )
    final_w = Window.partitionBy("qid").orderBy("exact_dist", "vec_id")
    return (
        exact.withColumn("rn", F.row_number().over(final_w))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("qid", "vec_id", "exact_dist")
    )


# ---------------------------------------------------------------------------
# G7 — degree assortativity (round 4): do high-degree parts co-purchase
# with other high-degree parts? Pearson correlation of endpoint degrees
# over the symmetrized edge list — the Newman assortativity
# coefficient, from exact integer moments. Completes the co-purchase
# graph-stat family (g2 triangles, g3 BFS, g5 power-law slope).
# ---------------------------------------------------------------------------

_G7_ORACLE = """
WITH {co_edges},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
j AS (
  SELECT du.deg AS du, dv.deg AS dv
  FROM e
  JOIN deg du ON e.u = du.node
  JOIN deg dv ON e.v = dv.node
),
m AS (
  SELECT CAST(2 * COUNT(*) AS BIGINT) AS m,
         CAST(SUM(du + dv) AS BIGINT) AS sx,
         CAST(2 * SUM(du * dv) AS BIGINT) AS sxy,
         CAST(SUM(du * du + dv * dv) AS BIGINT) AS sxx
  FROM j
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       CASE WHEN m * sxx - sx * sx = 0 THEN 0.0
            ELSE round(CAST(m * sxy - sx * sx AS DOUBLE)
                       / CAST(m * sxx - sx * sx AS DOUBLE), 6) + 0
       END AS assortativity
FROM m
"""


@register(
    "g7_degree_assortativity",
    oracle=_G7_ORACLE.format(co_edges=oracle_co_edges(2)),
    tags=("A11", "J1", "A2"),
)
def g7_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the co-purchase graph
    (min-support 2): Pearson r of (deg(u), deg(v)) over the
    SYMMETRIZED edge list — with both orientations counted, Σx = Σy
    and Σx² = Σy², so r = (M·Σxy − Σx²)/(M·Σx² − Σx²) from five exact
    BIGINT moments; one double division, 6-dp round (`+ 0` for -0.0),
    explicit 0.0 when the graph is degree-regular (zero variance —
    DuckDB's x/0 is NULL, Spark ANSI throws).

    Scale: degrees are one groupBy over the edge endpoints; the
    degree-annotation joins hash-partition on node id (broadcast when
    the degree table fits); moments are a single global agg. Degree
    products bound the BIGINT at deg ≤ ~10⁶ per node at Σ ≤ 10¹²
    edges — beyond that, shard the moment sums per degree bucket and
    decimal-merge.
    """
    # localCheckpoint: e feeds the degree union (twice) and the
    # double degree-annotation join — 19 exchanges without it.
    # ckpt tier-2 (O(edges), not O(keys)): one local-disk edge list vs
    # >=3 fact re-scans; job re-runs on executor loss (helper contract).
    e = co_purchase_edges(spark, sf_dir, 2).select("u", "v").transform(ckpt)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u_node"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v_node"), F.col("deg").alias("dv"))
    j = e.join(du, e.u == du.u_node).join(dv, e.v == dv.v_node)
    m = j.agg(
        (2 * F.count("*")).alias("m"),
        F.sum(F.col("du") + F.col("dv")).alias("sx"),
        (2 * F.sum(F.col("du") * F.col("dv"))).alias("sxy"),
        F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv")).alias("sxx"),
    )
    var = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    r = F.when(var == 0, F.lit(0.0)).otherwise(
        F.round(cov.cast("double") / var.cast("double"), 6) + 0
    )
    return m.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        r.alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# G8 — clustering coefficient BY DEGREE (round 4): how clustered are
# hubs vs leaves — the per-degree rollup of the local clustering
# coefficient. g2 grades the one global coefficient; this grades the
# curve (degree, avg LCC), every point an exact integer quotient.
# ---------------------------------------------------------------------------

_G8_ORACLE = """
WITH {co_edges},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tri_nodes AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t
  FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  )
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
per_node AS (
  SELECT deg.node, deg.d, COALESCE(tri_nodes.t, 0) AS t
  FROM deg LEFT JOIN tri_nodes ON deg.node = tri_nodes.node
  WHERE deg.d >= 2
)
SELECT d AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(t) AS BIGINT) AS sum_triangles,
       round(2.0 * SUM(t) / (COUNT(*) * d * (d - 1)), 6) + 0 AS avg_lcc
FROM per_node
GROUP BY d
"""


@register(
    "g8_clustering_by_degree",
    oracle=_G8_ORACLE.format(co_edges=oracle_co_edges(2)),
    tags=("A11", "J1", "A1"),
)
def g8_clustering_by_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average local clustering coefficient per degree class of the
    co-purchase graph: per node, LCC = 2·T(v)/(d(v)·(d(v)−1)); rolled
    up BY DEGREE the average becomes 2·ΣT/(n_d·d·(d−1)) — one exact
    integer quotient per output row, so no float summation order can
    differ between engines (a per-node double AVG would). Nodes in no
    triangle contribute T=0 through the left join's coalesce.

    Scale: the id-ordered triangle enumeration is g2's two-join shape
    (degree-direct the edges to cap wedge fan-out at O(m^1.5) in
    production); attribution explodes each triangle to its 3 corners —
    linear in triangles; degrees and the final rollup are bounded-key
    aggregations.
    """
    # localCheckpoint: e feeds five branches and tri three — the worst
    # re-derivation blowup in the registry (45 exchanges; single digits
    # after). Both checkpoints are O(edges)/O(triangles) storage.
    # ckpt tier-2 (O(edges), not O(keys)): one local-disk edge list vs
    # >=3 fact re-scans; job re-runs on executor loss (helper contract).
    e = co_purchase_edges(spark, sf_dir, 2).select("u", "v").transform(ckpt)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    ).transform(ckpt)
    tri_nodes = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    per_node = (
        deg.filter(F.col("d") >= 2)
        .join(tri_nodes, "node", "left")
        .select("d", F.coalesce("t", F.lit(0)).alias("t"))
    )
    return per_node.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_nodes"),
        F.sum("t").cast("bigint").alias("sum_triangles"),
        (
            F.round(
                2.0
                * F.sum("t")
                / (F.count("*") * F.col("d") * (F.col("d") - 1)),
                6,
            )
            + 0
        ).alias("avg_lcc"),
    )


# ---------------------------------------------------------------------------
# G9 — k-core peeling of the co-purchase graph: iteratively delete
# nodes of degree < k until the survivor set is stable. THE iterative
# graph primitive after connected components (l2_dup_clusters): cores
# locate the dense boilerplate/template region of a near-dup graph,
# the part worth human review before mass deletion.
# ---------------------------------------------------------------------------

_G9_K = 3
_G9_ROUNDS = 16  # fixture converges in ≤10 at sf0.01 (test-pinned);
# post-fixpoint rounds are no-ops, so 16 unrolled oracle rounds and a
# ≤16-round Spark loop agree for ANY input (both compute peel^16).


def _g9_oracle() -> str:
    # every round CTE is MATERIALIZED: each e{i} is referenced three
    # times by round i+1, so an inlining planner would expand the chain
    # 3^rounds-fold (DuckDB hit EMFILE re-opening the parquet scan
    # before the fix); materialization makes the oracle exactly the
    # rounds-many linear passes the Spark loop runs.
    parts = [oracle_co_edges(2), "e0 AS MATERIALIZED (SELECT u, v FROM e)"]
    prev = "e0"
    for i in range(1, _G9_ROUNDS + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM "
            f"(SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}) "
            f"GROUP BY node)"
        )
        parts.append(
            f"n{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {_G9_K})"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM {prev} "
            f"WHERE u IN (SELECT node FROM n{i}) "
            f"AND v IN (SELECT node FROM n{i}))"
        )
        prev = f"e{i}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM "
        f"(SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}) "
        f"GROUP BY node"
    )


_G9_ORACLE = _g9_oracle()


@register("g9_kcore_peeling", oracle=_G9_ORACLE, tags=("A1", "J3", "A2"))
def g9_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the co-purchase graph (same edge base as g2/g3,
    min_support 2): repeatedly drop nodes with fewer than {k} surviving
    neighbors and their incident edges until stable; emit each core
    member with its within-core degree. Peeling is idempotent at the
    fixpoint, so the Spark loop (early-break on edge-count
    convergence, ≤{r} rounds) and the {r}-round unrolled DuckDB oracle
    compute the identical peel^{r} for any input — no convergence-gap
    hazard by construction; the fixture converges in ≤10 rounds at
    sf0.01 (test-pinned).

    Scale: each round is one degree aggregation plus two semi-joins on
    single int keys — the keep-set carries only node ids, never
    payloads. Per-round ``localCheckpoint`` truncates the loop lineage
    (the l2_dup_clusters discipline, VERDICT r4), so the returned plan
    is a scan of the final round, not {r} unrolled join trees; the
    sweep's exchange-count cap enforces it. At 100 TB the edge list
    comes from the LSH candidate stage and rounds bound by core depth,
    typically ≪ diameter.
    """.format(k=_G9_K, r=_G9_ROUNDS)
    cur = co_purchase_edges(spark, sf_dir, 2).select("u", "v").transform(iter_ckpt)
    prev_cnt = cur.count()
    for _ in range(_G9_ROUNDS):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= _G9_K).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .transform(iter_ckpt)
        )
        cnt = nxt.count()
        cur = nxt
        if cnt == prev_cnt:
            break
        prev_cnt = cnt
    return (
        cur.select(F.col("u").alias("node"))
        .unionByName(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
    )


# ---------------------------------------------------------------------------
# L4 — tokenizer vocabulary coverage (OOV rate): build the top-500
# document-frequency vocabulary from the corpus itself, then measure
# what fraction of each language's token OCCURRENCES falls outside it —
# the number that decides whether a tokenizer/vocab pairing is usable
# for a corpus before any training run.
# ---------------------------------------------------------------------------

_L4_VOCAB_N = 500

_L4_OOV_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, lang, unnest({_ORACLE_TOKS}) AS tok FROM documents
),
dfreq AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS dfreq FROM occ GROUP BY tok
),
vocab AS (
  SELECT tok FROM dfreq ORDER BY dfreq DESC, tok LIMIT {_L4_VOCAB_N}
),
per AS (
  SELECT o.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM occ o LEFT JOIN vocab v ON o.tok = v.tok
  GROUP BY o.lang
)
SELECT lang, n_tok AS total_tokens, n_oov AS oov_tokens,
       ROUND(CAST(n_oov AS DOUBLE) / n_tok, 6) AS oov_rate
FROM per
"""


@register("l4_oov_rate", oracle=_L4_OOV_ORACLE, tags=("L4", "O2", "J2"))
def l4_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a corpus-derived
    vocabulary: the top-{n} tokens by DOCUMENT frequency (ties broken
    by token text, so the cut is deterministic) form the vocab; every
    token occurrence outside it counts as OOV. Both engines build the
    identical vocab from identical integer document frequencies and
    divide the same integers for the rate (round 6).

    Scale: document frequencies are one (token, doc)-distinct shuffle;
    the top-{n} cut is TakeOrdered on the O(|token types|) table; the
    vocab then BROADCASTS to the occurrence stream (500 rows — never a
    shuffle join), so the scan-side cost is one pass over tokens. At
    100 TB with a real 100k-entry BPE vocab the same broadcast holds.
    """.format(n=_L4_VOCAB_N)
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    dfreq = occ.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfreq"))
    vocab = (
        dfreq.orderBy(F.col("dfreq").desc(), "tok")
        .limit(_L4_VOCAB_N)
        .select("tok")
    )
    j = occ.join(
        F.broadcast(vocab.withColumnRenamed("tok", "vtok")),
        occ.tok == F.col("vtok"),
        "left",
    )
    per = j.groupBy("lang").agg(
        F.count("*").alias("total_tokens"),
        F.sum(F.when(F.col("vtok").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("oov_tokens"),
    )
    return per.select(
        "lang",
        "total_tokens",
        "oov_tokens",
        F.round(
            F.col("oov_tokens").cast("double") / F.col("total_tokens"), 6
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# L6 — feature standardization FIT: per-dimension mean/std over the
# embedding corpus plus the standardized extrema — the μ/σ table a
# training pipeline persists so that serving can z-score features with
# the exact constants training saw.
# ---------------------------------------------------------------------------

_L6_STD_ORACLE = """
WITH x AS (
  SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
         CAST(unnest(generate_series(1, len(embedding))) AS INT) AS dim
  FROM embeddings
),
fit AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(AVG(v), 6) AS mu,
         ROUND(stddev_pop(v), 6) AS sigma,
         MIN(v) AS lo, MAX(v) AS hi
  FROM x GROUP BY dim
)
SELECT dim, n, mu, sigma,
       CASE WHEN sigma > 0 THEN ROUND((lo - mu) / sigma, 6) + 0 END AS min_z,
       CASE WHEN sigma > 0 THEN ROUND((hi - mu) / sigma, 6) + 0 END AS max_z
FROM fit
"""


@register("l6_feature_standardize", oracle=_L6_STD_ORACLE, tags=("L6", "A2", "F5"))
def l6_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization constants over the embedding
    corpus: posexplode to long form, one aggregation for n/μ/σ
    (population std — the fit statistic)/extrema, then the z-scored
    extrema from the ROUNDED μ/σ so both engines divide identical
    doubles (round 6 + 0 on both sides — the negative-zero guard,
    since min_z is negative by construction and can round to -0.0).

    Scale: long form is |vectors|·dim rows but aggregates map-side to
    O(dim) groups before the shuffle; nothing else moves. The fit
    table broadcasts to the transform pass (not shown — it's a
    projection), exactly like l6_kmeans' centroid broadcast.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    ).select((F.col("pos") + 1).cast("int").alias("dim"), "v")
    fit = x.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_pop("v"), 6).alias("sigma"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    # sigma can round to exactly 0.0 for a (near-)constant dimension —
    # a z-score is undefined there, and the engines disagree on x/0.0
    # (ANSI error vs inf), so the guard is part of the contract (review
    # r5; the q43 n>1 precedent).
    z = lambda bound: F.when(
        F.col("sigma") > 0,
        F.round((F.col(bound) - F.col("mu")) / F.col("sigma"), 6) + 0,
    )
    return fit.select(
        "dim",
        "n",
        "mu",
        "sigma",
        z("lo").alias("min_z"),
        z("hi").alias("max_z"),
    )


# ---------------------------------------------------------------------------
# L4/L2 — trigram NOVELTY curve: what fraction of each document's
# distinct word trigrams is INTRODUCED by it (no earlier doc_id has
# them) — the corpus-growth diagnostic that tells you when additional
# crawl stops contributing new text (l2_shingle_dup_frac is the
# symmetric contamination view; novelty is the ordered, marginal one).
# ---------------------------------------------------------------------------

_L4_NOVELTY_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shs
  FROM (SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3),
s AS (SELECT doc_id, unnest(shs) AS sh FROM g),
f AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty
FROM s JOIN f USING (sh)
GROUP BY s.doc_id
"""


@register("l4_trigram_novelty", oracle=_L4_NOVELTY_ORACLE, tags=("L4", "L2", "A1"))
def l4_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal novelty per document under corpus order: a distinct
    word trigram is NOVEL for the document with the minimum doc_id
    that contains it; each document reports its trigram count, novel
    count, and novelty ratio (exact integer division, round 6). A
    corpus whose late documents trend toward novelty 0 has saturated —
    further ingestion buys deduplication work, not information.

    Scale: one shuffle to (trigram, min doc) — the inverted index the
    dedup family already builds. Optimization r12: the r1–r11 plan
    joined that table BACK to the exploded shingles on the trigram key
    (a second 750k-string-row shuffle) only to re-count what is
    already known — |doc's distinct trigrams| is size(shs) map-side,
    and a doc's novel count is just ``f`` grouped by first_doc (an
    O(docs) aggregate that broadcasts back). Identical output
    (the joined count per doc WAS |shs|; the conditional sum WAS the
    first_doc multiplicity), measured 16.8 s → ~3 s. The arrival
    order is doc_id here; a real pipeline substitutes crawl
    timestamp, same plan.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = T.tokens(F.col("text"))
    g = docs.select(
        "doc_id", F.array_distinct(T.shingles(F.col("text"), 3)).alias("shs")
    ).filter(F.size(toks) >= 3)
    s = g.select("doc_id", F.explode("shs").alias("sh"))
    f = s.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel_counts = f.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("_nn")
    )
    n_novel = F.coalesce(F.col("_nn"), F.lit(0)).cast("bigint")
    return (
        # no broadcast hint: novel_counts is O(docs) — fixture-tiny (AQE
        # auto-broadcasts it) but unbounded at 100 TB, where this is a
        # doc-keyed shuffle join of two O(docs) relations
        g.select("doc_id", F.size("shs").cast("bigint").alias("n_trigrams"))
        .join(novel_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_trigrams",
            n_novel.alias("n_novel"),
            F.round(
                n_novel.cast("double") / F.col("n_trigrams"), 6
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# g13 — common-neighbor link prediction (round 5+): the classic graph
# completion primitive. On the part co-purchase graph (parts sharing
# an order), pairs that are NOT yet edges but share many neighbors are
# the predicted next links ("customers who bought these together also
# bought…"). Scores: raw common-neighbor count + Jaccard over the
# union of neighborhoods.
# ---------------------------------------------------------------------------

# df-cap for middle vertices: candidate volume is Σ_(deg(m)≤cap) deg(m)²,
# so the cap IS the memory knob. 64 keeps the sf0.1 candidate set
# (~10⁷ pairs) inside a default-1g 8-thread local session — cap 200
# produced ~10⁸ and OOMed the round-6 sf0.1 sweep even with spilling.
# Production sizes this to executor memory; the semantics (drop hub
# middles — quadratic candidates, logarithmic evidence) are unchanged
# and the constant is shared verbatim with the DuckDB oracle.
_G13_CAP = 64
_G13_K = 20

_G13_ORACLE = f"""
WITH {oracle_co_edges(1)},
pairs AS (SELECT u AS a, v AS b FROM e),
adj AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY u),
mid AS (SELECT adj.u AS m, adj.v AS x
        FROM adj JOIN deg ON adj.u = deg.u WHERE deg.deg <= {_G13_CAP}),
cand AS (
  SELECT m1.x AS a, m2.x AS b, CAST(COUNT(*) AS BIGINT) AS cn
  FROM mid m1 JOIN mid m2 ON m1.m = m2.m AND m1.x < m2.x
  GROUP BY m1.x, m2.x),
new_links AS (
  SELECT c.a, c.b, c.cn FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.a = c.a AND p.b = c.b))
SELECT n.a AS part_a, n.b AS part_b, n.cn,
       da.deg AS deg_a, db.deg AS deg_b,
       CAST((n.cn * 1000000) // (da.deg + db.deg - n.cn) AS BIGINT)
         AS jaccard_micro
FROM new_links n
JOIN deg da ON n.a = da.u
JOIN deg db ON n.b = db.u
ORDER BY n.cn DESC, jaccard_micro DESC, part_a, part_b
LIMIT {_G13_K}
"""


@register("g13_link_prediction", oracle=_G13_ORACLE, tags=("J8", "A1", "O2"))
def g13_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links on the part co-purchase graph: for every
    non-edge pair sharing ≥1 common neighbor, count common neighbors
    through middle vertices of degree ≤ 200 (the df-cap: hub middles
    contribute candidates quadratically but evidence logarithmically,
    so production link predictors drop them — same cap on both
    engines, so parity is exact) and score Jaccard over the FULL
    degree union in integer micro-units (``cn*1e6 div (deg_a+deg_b-cn)``
    — positive operands, truncating div == DuckDB ``//``). Non-edge
    filter is a left-anti join on the edge list; final top-k orders by
    (cn, jaccard, pair) with the unique pair tiebreak.

    Scale: candidate volume is Σ_(deg(m)≤cap) deg(m)² — the cap turns
    the quadratic hub blowup into a tunable bound; everything is
    equi-join + groupBy (hash-partitioned on part ids), and the top-k
    compiles to TakeOrderedAndProject (no global sort). The edge list
    itself is one self-join of lineitem on l_orderkey (orders are
    ≤7 items in this schema, so per-order pair fan-out is bounded).
    """
    # Reuse the shared basket self-join (CLAUDE.md reuse rule): edges
    # with min_support=1 ARE the distinct co-purchase pairs.
    # localCheckpoints: pairs feeds the symmetrize union (x2) and the
    # non-edge anti join; deg feeds the cap filter and both endpoint
    # annotations; mid self-joins. 48 exchanges without truncation.
    pairs = co_purchase_edges(spark, sf_dir, 1).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).transform(ckpt)
    adj = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))).toDF(
        "u", "v"
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg")).transform(ckpt)
    mid = (
        adj.join(deg, "u")
        .where(F.col("deg") <= _G13_CAP)
        .select(F.col("u").alias("m"), F.col("v").alias("x"))
    ).transform(ckpt)
    m1 = mid.alias("m1")
    m2 = mid.alias("m2")
    cand = (
        m1.join(
            m2,
            (F.col("m1.m") == F.col("m2.m")) & (F.col("m1.x") < F.col("m2.x")),
        )
        .groupBy(F.col("m1.x").alias("a"), F.col("m2.x").alias("b"))
        .agg(F.count("*").alias("cn"))
    )
    new_links = cand.join(pairs, ["a", "b"], "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        new_links.join(da, "a")
        .join(db, "b")
        .withColumn(
            "jaccard_micro",
            F.expr("(cn * 1000000) div (deg_a + deg_b - cn)"),
        )
    )
    return (
        scored.select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "cn",
            "deg_a",
            "deg_b",
            "jaccard_micro",
        )
        .orderBy(
            F.desc("cn"), F.desc("jaccard_micro"), "part_a", "part_b"
        )
        .limit(_G13_K)
    )



# ---------------------------------------------------------------------------
# l2f — LSH bucket-health diagnostic (round 5+): the tuning report for
# the MinHash band join. Like l2_minhash_lsh (oracle-exact since round
# 6), this builds a 16-hash signature from the SAME oracle-exact
# base-31 gram hash winnowing uses, so every bucket statistic is
# value-graded: bucket counts, singleton share, max bucket size, and
# the candidate-pair volume Σ s·(s−1)/2 per band — the number that
# decides whether a banding is safe to run at 100 TB.
# ---------------------------------------------------------------------------

_LSH_P = 2147483647
_LSH_AB = [(7 * j + 3, 101 * j + 13) for j in range(16)]

_L2F_SIG_SQL = ",\n         ".join(
    f"list_min(list_transform(grams, x -> ({a} * x + {b}) % {_LSH_P}))"
    f" AS m{j}"
    for j, (a, b) in enumerate(_LSH_AB)
)
_L2F_KEYS_SQL = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, {band} AS band,"
    f" (m{4 * band} * 29791 + m{4 * band + 1} * 961"
    f" + m{4 * band + 2} * 31 + m{4 * band + 3}) % {_LSH_P} AS key FROM sig"
    for band in range(4)
)

_L2F_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - {_WINNOW_K} + 2), i ->
           ({" + ".join(f"CAST(ascii(text[i+{j}]) AS BIGINT)*{p}" for j, p in enumerate(_POW31))})
           % {_WINNOW_MOD}) AS grams
  FROM documents WHERE len(text) >= {_WINNOW_K}
),
sig AS (
  SELECT doc_id,
         {_L2F_SIG_SQL}
  FROM g),
keys AS (
  {_L2F_KEYS_SQL}),
buckets AS (
  SELECT band, key, CAST(COUNT(*) AS BIGINT) AS s FROM keys GROUP BY 1, 2)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(s) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singletons,
       CAST(MAX(s) AS BIGINT) AS max_bucket,
       CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS candidate_pairs
FROM buckets GROUP BY band
"""


@register("l2_lsh_bucket_health", oracle=_L2F_ORACLE, tags=("L2", "A1", "F5"))
def l2_lsh_bucket_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket census over a 16-hash MinHash signature
    (4 bands × 4 rows): signature hash j is min over 8-char base-31
    gram hashes of ``(aⱼ·g + bⱼ) mod 2³¹−1`` (aⱼ·g < 2.4e11 — exact
    BIGINT), band keys the base-31 combine of each row group. Reports
    bucket count, singleton share, largest bucket, and the exact
    candidate-pair volume Σ s·(s−1)/2 — the pre-flight check that
    tells you whether a skewed bucket would quadratically blow up the
    band join BEFORE you run it. Every number is integer-exact and
    hash-graded against DuckDB evaluating the identical arithmetic.

    Scale: signature construction is one codepoint-array projection
    (the l4_winnow_fingerprint O(L) recipe — no substr-in-HOF O(L²))
    feeding a gram explode + 16 whole-stage-codegen MIN aggregates
    (optimization r13, the l6_covariance r12 pattern: the r5–r12 form
    evaluated 16 interpreted affine `transform` copies of each gram
    array — 16 array allocations per document; the exploded aggregate
    computes the identical integer minima on primitive longs, and
    partial aggregation collapses each task to |docs|×16 longs before
    the doc_id exchange). `spread` first: the per-row gram build is the
    heavy projection and the fixture scan is one row group. The band
    groupBy is unchanged. The census is O(buckets) — this diagnostic
    costs a scan even when the banding it audits would not.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    cps = F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long"))

    def gram_hash(i: Column) -> Column:
        total = F.lit(0).cast("long")
        for j, p in enumerate(_POW31):
            total = total + F.element_at(F.col("cps"), i + F.lit(j)) * F.lit(p)
        return total % _WINNOW_MOD

    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("cps")) - _WINNOW_K + 1), gram_hash
    )
    sig = (
        docs.filter(F.length(t) >= _WINNOW_K)
        .select("doc_id", cps.alias("cps"))
        .select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min((F.col("g") * a + b) % _LSH_P).alias(f"m{j}")
                for j, (a, b) in enumerate(_LSH_AB)
            ]
        )
    )
    band_keys = F.array(
        *[
            (
                F.col(f"m{4 * band}") * 29791
                + F.col(f"m{4 * band + 1}") * 961
                + F.col(f"m{4 * band + 2}") * 31
                + F.col(f"m{4 * band + 3}")
            )
            % _LSH_P
            for band in range(4)
        ]
    )
    keys = sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "key")
    )
    buckets = keys.groupBy("band", "key").agg(F.count("*").alias("s"))
    return buckets.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum("s").alias("n_docs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.max("s").alias("max_bucket"),
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias("candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# l6 — cluster separation report (round 5+): the quality gate for the
# SemDeDup/k-means family. For every vector: exact integer squared
# distance to its nearest centroid (cohesion, "a") and to the nearest
# OTHER centroid (separation, "b"); per cluster, the aggregated margin
# (Σb−Σa)/Σb and the count of boundary members (b < 2a) — the numbers
# that say whether the clustering is tight enough for SemDeDup's
# within-cell pruning to be safe.
# ---------------------------------------------------------------------------

_L6_SEP_ORACLE = f"""
WITH q AS (SELECT vec_id, {_PQ_QUANT_DUCK} AS qv FROM embeddings),
init AS (SELECT vec_id AS c, qv AS cv FROM q WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT q.vec_id, i.c,
         list_sum(list_transform(generate_series(1, 64),
                  k -> (q.qv[k] - i.cv[k]) * (q.qv[k] - i.cv[k]))) AS d
  FROM q CROSS JOIN init i),
amin AS (
  SELECT vec_id, min([d, c])[1] AS a, min([d, c])[2] AS c1
  FROM d1 GROUP BY vec_id),
bmin AS (
  SELECT d1.vec_id, MIN(d1.d) AS b
  FROM d1 JOIN amin ON d1.vec_id = amin.vec_id AND d1.c <> amin.c1
  GROUP BY d1.vec_id)
SELECT CAST(amin.c1 AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(amin.a) AS DOUBLE) AS sum_intra,
       CAST(SUM(bmin.b) AS DOUBLE) AS sum_nearest,
       ROUND((CAST(SUM(bmin.b) AS DOUBLE) - CAST(SUM(amin.a) AS DOUBLE))
             / CAST(SUM(bmin.b) AS DOUBLE), 6) + 0 AS margin,
       CAST(SUM(CASE WHEN bmin.b < 2 * amin.a THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundary
FROM amin JOIN bmin ON amin.vec_id = bmin.vec_id
GROUP BY amin.c1
"""


@register("l6_cluster_separation", oracle=_L6_SEP_ORACLE, tags=("L6", "L2", "A1"))
def l6_cluster_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette report over the k-means init assignment
    (centroids = first 8 vectors, the l6_kmeans_step convention): a =
    exact integer squared distance to the assigned centroid, b = to
    the runner-up; cluster margin = (Σb−Σa)/Σb from sums accumulated
    in HUGEINT/DECIMAL-safe form and divided as identical doubles
    (round 6, ``+ 0``); boundary members satisfy b < 2a — an INTEGER
    comparison, so the boundary census is tie-proof by construction.

    Scale: distances compute against the k·d broadcast centroid list
    (the kmeans pattern — nothing quadratic); per-vector argmin and
    runner-up are one aggregation each keyed on vec_id, the report
    keys on k=8 clusters. Sums ride DECIMAL(38,0) before the double
    cast, so no member count overflows BIGINT at any corpus size.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", _quantize_embedding().alias("qv"))
    init = q.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("c"), F.col("qv").alias("cv")
    )
    d = (
        q.crossJoin(F.broadcast(init))
        .select(
            "vec_id",
            "c",
            F.aggregate(
                F.zip_with(
                    "qv", "cv", lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d"),
        )
    )
    amin = d.groupBy("vec_id").agg(
        F.min(F.struct("d", "c")).alias("m")
    ).select("vec_id", F.col("m.d").alias("a"), F.col("m.c").alias("c1"))
    bmin = (
        d.join(amin, "vec_id")
        .where(F.col("c") != F.col("c1"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("b"))
    )
    j = amin.join(bmin, "vec_id")
    sum_a = F.sum(F.col("a").cast("decimal(38,0)")).cast("double")
    sum_b = F.sum(F.col("b").cast("decimal(38,0)")).cast("double")
    return j.groupBy(F.col("c1").cast("long").alias("cluster")).agg(
        F.count("*").alias("n_members"),
        sum_a.alias("sum_intra"),
        sum_b.alias("sum_nearest"),
        (F.round((sum_b - sum_a) / sum_b, 6) + 0).alias("margin"),
        F.sum(F.when(F.col("b") < 2 * F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("n_boundary"),
    )


# ---------------------------------------------------------------------------
# g14 — modularity audit (round 5+): Newman's Q for a candidate
# community assignment over the co-purchase graph, in EXACT integer
# arithmetic. Q_i = e_ii/m − (d_i/2m)² per community; the audit emits
# each community's contribution in micro-units of the common
# denominator 4m², so Q = Σ q_micro / 1e6 with zero float drift —
# the metric that decides whether a partition (here the deterministic
# partkey mod 8) beats random assignment (Q ≈ 0).
# ---------------------------------------------------------------------------

_G14_ORACLE = f"""
WITH {oracle_co_edges(1)},
pairs AS (SELECT u AS a, v AS b FROM e),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
adj AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT u, u % 8 AS com, CAST(COUNT(*) AS BIGINT) AS d
        FROM adj GROUP BY 1, 2),
coms AS (
  SELECT com, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d) AS BIGINT) AS degree_sum
  FROM deg GROUP BY 1),
internal AS (
  SELECT a % 8 AS com, CAST(COUNT(*) AS BIGINT) AS e_in
  FROM pairs WHERE a % 8 = b % 8 GROUP BY 1)
SELECT coms.com AS community, n_nodes,
       COALESCE(internal.e_in, 0) AS internal_edges,
       degree_sum,
       CAST((4 * m.m * COALESCE(internal.e_in, 0)
             - degree_sum * degree_sum) * 1000000
            // (4 * m.m * m.m) AS BIGINT) AS q_micro
FROM coms LEFT JOIN internal ON coms.com = internal.com, m
"""


@register("g14_modularity", oracle=_G14_ORACLE, tags=("A1", "J8", "F4"))
def g14_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity contribution of the partkey-mod-8
    assignment on the co-purchase graph: with m total edges, community
    internal-edge count e and degree sum d, the contribution is
    (4m·e − d²)/(4m²) — emitted as ``num·1e6 div 4m²`` (num is
    SIGNED — safe because DuckDB's integer ``//`` and Spark's ``div``
    BOTH truncate toward zero, verified ``-7//2 = -3`` on both; all
    magnitudes stay under 2⁶³ for edge counts into the billions). A
    random assignment sums to ≈0; positive sums mean real community
    structure worth exploiting for co-purchase blocking.

    Scale: the edge list is the one lineitem self-join (bounded
    per-order fan-out); everything downstream aggregates on node or
    community keys. The exact-rational trick means the audit is
    hash-gradeable — no float modularity drift across partitionings.
    """
    # Reuse the shared basket self-join (CLAUDE.md reuse rule): edges
    # with min_support=1 ARE the distinct co-purchase pairs.
    # localCheckpoint: pairs feeds m, the symmetrize union (x2) and the
    # internal-edge filter — O(edges) storage, 15 exchanges without it.
    pairs = co_purchase_edges(spark, sf_dir, 1).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).transform(ckpt)
    m = pairs.agg(F.count("*").alias("m"))
    adj = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).toDF("u", "v")
    deg = adj.groupBy("u", (F.col("u") % 8).alias("com")).agg(
        F.count("*").alias("d")
    )
    coms = deg.groupBy("com").agg(
        F.count("*").alias("n_nodes"),
        F.sum("d").cast("long").alias("degree_sum"),
    )
    internal = (
        pairs.where(F.col("a") % 8 == F.col("b") % 8)
        .groupBy((F.col("a") % 8).alias("com"))
        .agg(F.count("*").alias("e_in"))
    )
    j = (
        coms.join(internal, "com", "left")
        .crossJoin(F.broadcast(m))
        .withColumn("e_in", F.coalesce("e_in", F.lit(0)))
    )
    q_micro = F.expr(
        "(4 * m * e_in - degree_sum * degree_sum) * 1000000"
        " div (4 * m * m)"
    )
    return j.select(
        F.col("com").alias("community"),
        "n_nodes",
        F.col("e_in").alias("internal_edges"),
        "degree_sum",
        q_micro.alias("q_micro"),
    )


# ---------------------------------------------------------------------------
# g15 — degree assortativity (round 5+): Newman's r — the Pearson
# correlation of endpoint degrees over the (symmetrized) edge list.
# Positive r: hubs prefer hubs (social-style graph); negative:
# hub-and-spoke (catalog-style). All five moment sums are exact
# BIGINTs over integer degrees, so the final correlation double is
# engine-identical before the 6-dp round.
# ---------------------------------------------------------------------------

_G15_ORACLE = f"""
WITH {oracle_co_edges(1)},
pairs AS (SELECT u AS a, v AS b FROM e),
adj AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
ed AS (
  SELECT du.d AS x, dv.d AS y
  FROM adj JOIN deg du ON adj.u = du.u JOIN deg dv ON adj.v = dv.u),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ed)
SELECT n AS n_edge_ends,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0
         AS assortativity
FROM s
"""


@register("g15_assortativity", oracle=_G15_ORACLE, tags=("A2", "J8", "F4"))
def g15_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: join each
    directed edge end to its endpoint degrees and correlate. By
    symmetry Σx = Σy here, but both moment sets are computed
    independently (the formula stays correct for directed or bipartite
    variants). Output is one row: edge-end count and r.

    Scale: two hash joins of the edge list against the O(nodes) degree
    table (both sides key-partitioned on part ids), one global moment
    reduction — the whole statistic is three shuffles regardless of
    graph size, and the moment magnitudes stay under 2⁶³ for degree
    sums into the billions.
    """
    # Reuse the shared basket self-join (CLAUDE.md reuse rule): edges
    # with min_support=1 ARE the distinct co-purchase pairs.
    # localCheckpoints: pairs symmetrizes twice; adj feeds deg plus the
    # double degree-annotation join — 22 exchanges without truncation.
    pairs = co_purchase_edges(spark, sf_dir, 1).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).transform(ckpt)
    adj = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).toDF("u", "v").transform(ckpt)
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    du = deg.select(F.col("u").alias("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("y"))
    ed = adj.join(du, "u").join(dv, "v").select("x", "y")
    s = ed.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        F.col("n").alias("n_edge_ends"),
        (F.round(num / den, 6) + 0).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# l3f — FILTERED vector search (round 5+): top-k among only the
# vectors whose document passes a metadata predicate — the feature
# that separates a vector database from a similarity kernel. This is
# the PRE-filter strategy (restrict candidates, then rank): exact
# recall under any selectivity, vs post-filtering which silently
# under-fills k when the predicate is selective.
# ---------------------------------------------------------------------------

_L3F_ORACLE = """
WITH en AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = 'en'),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0)
SELECT q.vec_id AS query_id, en.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                    en.embedding::DOUBLE[]), 6) AS cosine
FROM q JOIN en ON q.vec_id <> en.vec_id
QUALIFY row_number() OVER (
  PARTITION BY q.vec_id
  ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                        en.embedding::DOUBLE[]), 6) DESC,
           en.vec_id) <= 3
"""


@register("l3_filtered_topk", oracle=_L3F_ORACLE, tags=("L3", "J3", "W2"))
def l3_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine neighbors restricted to English-language documents
    (semi-join of the vector table against the metadata predicate
    BEFORE any distance math), for the vec_id % 50 == 0 query set.
    Rounded-score + neighbor-id tiebreak, the q10 convention.

    Scale: pre-filtering is the only strategy with exact recall —
    and it also SHRINKS the candidate side before the O(q·n·d) rank
    work. The metadata predicate travels as a semi-join on the shared
    id (pushed to the documents scan); at IVF scale the same filter
    applies to the posting lists before ADC. Post-filtering the global
    top-k would return <k for selective predicates.
    """
    e = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    en = (
        e.join(
            docs.where(F.col("lang") == "en").select("doc_id"),
            e.vec_id == F.col("doc_id"),
            "left_semi",
        )
        .select("vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm"))
    )
    q = e.where(F.col("vec_id") % 50 == 0).select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("nrm")
    )
    a, b = q.alias("a"), en.alias("b")
    cos = F.round(
        V.dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# l4k — keyness / log-likelihood ratio (round 5+): Dunning's G² for
# "which words distinguish the English corpus from the rest" — the
# corpus-comparison statistic (keyword extraction, domain-shift
# detection, contamination forensics) that raw frequency ratios get
# wrong for rare words. Counts are exact integers; G² assembles from
# ln() of integer-ratio doubles identically on both engines.
# ---------------------------------------------------------------------------

_L4K_MIN_COUNT = 20
_L4K_TOPK = 20

_L4K_ORACLE = f"""
WITH t AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         unnest({_ORACLE_TOKS}) AS word
  FROM documents),
wc AS (
  SELECT word,
         CAST(SUM(is_en) AS BIGINT) AS a,
         CAST(SUM(1 - is_en) AS BIGINT) AS b
  FROM t GROUP BY word),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
  FROM wc),
g AS (
  SELECT word, a, b,
         ROUND(2 * (
           CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * (na + nb)
                                       / (CAST(na AS DOUBLE) * (a + b)))
                ELSE 0 END
           + CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE) * (na + nb)
                                         / (CAST(nb AS DOUBLE) * (a + b)))
                  ELSE 0 END), 6) + 0 AS g2
  FROM wc, tot WHERE a + b >= {_L4K_MIN_COUNT})
SELECT word, a AS en_count, b AS other_count, g2
FROM g ORDER BY g2 DESC, word LIMIT {_L4K_TOPK}
"""


@register("l4_keyness_llr", oracle=_L4K_ORACLE, tags=("L4", "A1", "O2"))
def l4_keyness_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 keywords by Dunning G² between the English and
    non-English sub-corpora: per-word observed counts vs expectations
    under the pooled rate, 2·Σ O·ln(O/E) with zero-count terms
    dropping out exactly. Words under 20 total occurrences are
    excluded (G² is unstable there and the cut bounds the ranked set);
    ordering is (rounded G² desc, word) — the unique-tiebreak rule.

    Scale: one explode + one word-grain aggregation (the l4_word_freq
    shuffle), a two-scalar broadcast for the totals, and a
    TakeOrderedAndProject top-k — no per-word state beyond the count
    pair, so the statistic runs at full-corpus scale for the cost of
    a word count.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        F.explode(T.tokens(F.col("text"))).alias("word"),
    )
    wc = t.groupBy("word").agg(
        F.sum("is_en").cast("long").alias("a"),
        F.sum(1 - F.col("is_en")).cast("long").alias("b"),
    )
    tot = wc.agg(
        F.sum("a").cast("long").alias("na"),
        F.sum("b").cast("long").alias("nb"),
    )
    j = wc.where(F.col("a") + F.col("b") >= _L4K_MIN_COUNT).crossJoin(
        F.broadcast(tot)
    )
    n_all = F.col("na") + F.col("nb")
    term_a = F.when(
        F.col("a") > 0,
        F.col("a")
        * F.log(
            F.col("a").cast("double")
            * n_all
            / (F.col("na").cast("double") * (F.col("a") + F.col("b")))
        ),
    ).otherwise(0.0)
    term_b = F.when(
        F.col("b") > 0,
        F.col("b")
        * F.log(
            F.col("b").cast("double")
            * n_all
            / (F.col("nb").cast("double") * (F.col("a") + F.col("b")))
        ),
    ).otherwise(0.0)
    g2 = F.round(2 * (term_a + term_b), 6) + 0
    return (
        j.select(
            "word",
            F.col("a").alias("en_count"),
            F.col("b").alias("other_count"),
            g2.alias("g2"),
        )
        .orderBy(F.desc("g2"), "word")
        .limit(_L4K_TOPK)
    )


# ---------------------------------------------------------------------------
# l1h — duplicate-family size histogram (round 5+): the shape report
# dedup tuning reads before choosing survivorship policy. How much of
# the corpus sits in singletons vs pairs vs heavy families? Family =
# exact-text group (the l1 keep-min convention); the histogram keys
# on family size, so the output is O(max family size) regardless of
# corpus volume.
# ---------------------------------------------------------------------------

_L1H_ORACLE = """
WITH fam AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS size
  FROM documents GROUP BY text)
SELECT size AS family_size,
       CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM fam GROUP BY size
"""


@register("l1_dup_size_histogram", oracle=_L1H_ORACLE, tags=("L1", "A1"))
def l1_dup_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of exact-duplicate family sizes with the document
    mass and removable-copy count per size class — Σ n_removable is
    exactly the row savings l1_exact_dedup realizes, and a heavy tail
    here is the signal to switch survivorship from keep-min to
    quality-ranked (l1_survivorship_dedup).

    Scale: two hash aggregations (text-hash grain, then size grain);
    the first shuffle moves digests at 100 TB (group by a hash of the
    text, the m10 trick) — family sizes are identical because the
    grouping key is injective on content.
    """
    docs = load_table(spark, sf_dir, "documents")
    fam = docs.groupBy("text").agg(F.count("*").alias("size"))
    return fam.groupBy(F.col("size").alias("family_size")).agg(
        F.count("*").alias("n_families"),
        (F.col("family_size") * F.count("*")).cast("long").alias("n_docs"),
        ((F.col("family_size") - 1) * F.count("*"))
        .cast("long")
        .alias("n_removable"),
    )


# ---------------------------------------------------------------------------
# l6q — quantile (rank-uniform) feature transform (round 5+): map a
# raw feature to its empirical quantile (rank − ½)/n — the
# distribution-free normalization (first half of rank-gauss) that
# makes heavy-tailed features comparable across shards and training
# runs. Exact integer micro-units: q = (2·rank − 1)·10⁶ div 2n.
# ---------------------------------------------------------------------------

_L6Q_ORACLE = """
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER () AS n
  FROM documents)
SELECT doc_id, n_chars,
       CAST(((2 * rk - 1) * 1000000) // (2 * n) AS BIGINT) AS q_micro
FROM r
"""


@register("l6_quantile_transform", oracle=_L6Q_ORACLE, tags=("L6", "W1", "F4"))
def l6_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-quantile transform of the document-length feature:
    global rank by (n_chars, doc_id) — the unique tiebreak makes the
    transform a bijection — then q = (2·rank − 1)/2n in exact integer
    micro-units (positive operands, trunc div == DuckDB ``//``).
    Downstream, Φ⁻¹(q) completes rank-gauss; the quantile itself is
    the engine-exact part and the one that needs the corpus.

    Scale: the global rank is _helpers.scalable_row_number over coarse
    n_chars buckets — no single-partition sort at any corpus size; the
    transform then is a pure projection. The oracle's window form is
    the semantic spec, not the 100 TB plan.
    """
    from ._helpers import scalable_row_number

    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.count("*").alias("n"))
    ranked = scalable_row_number(
        docs.select("doc_id", "n_chars"),
        key="n_chars",
        bucket_width=64,
        order_cols=[F.col("n_chars"), F.col("doc_id")],
        out="rk",
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_chars",
        F.expr("((2 * rk - 1) * 1000000) div (2 * n)").alias("q_micro"),
    )


# ---------------------------------------------------------------------------
# l4c — quality-score calibration against duplication (round 5+): does
# the heuristic quality score actually separate duplicated boilerplate
# from original text? Bin documents by score decile and measure the
# exact-duplicate rate per bin — the reliability-diagram cut that
# validates (or indicts) a filter before it gates a 100 TB corpus.
# ---------------------------------------------------------------------------

_L4C_ORACLE = rf"""
WITH q AS (
  SELECT doc_id, text,
         LEAST(1.0, len({_ORACLE_TOKS}) / 50.0)
           * (CASE WHEN len({_ORACLE_TOKS}) > 0
                   THEN CAST(len({_ORACLE_DTOKS}) AS DOUBLE)
                        / len({_ORACLE_TOKS})
                   ELSE 0.0 END) AS quality
  FROM documents),
fam AS (SELECT text, COUNT(*) AS fam_size FROM documents GROUP BY text),
j AS (
  SELECT LEAST(CAST(floor(q.quality * 10) AS INT), 9) AS score_decile,
         CASE WHEN fam.fam_size > 1 THEN 1 ELSE 0 END AS is_dup
  FROM q JOIN fam ON q.text = fam.text)
SELECT score_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       CAST((SUM(is_dup) * 10000) // COUNT(*) AS BIGINT) AS dup_rate_bp
FROM j GROUP BY score_decile
"""


@register("l4_score_calibration", oracle=_L4C_ORACLE, tags=("L4", "L1", "A1"))
def l4_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rate per quality-score decile (score = the
    l4_quality_score heuristic; label = exact-text family size > 1).
    A well-calibrated score shows dup_rate_bp falling as the decile
    rises; a flat curve means the filter is noise against duplication.
    The decile floor runs on engine-identical doubles (integer-ratio
    arithmetic), rates are integer basis points.

    Scale: family sizes join back on the text hash (digest shuffle,
    the m10 trick); the score is a per-row projection; the calibration
    table keys on 10 deciles. This is the evaluation loop every
    quality gate needs BEFORE it deletes anything.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_t = F.size(toks)
    n_d = F.size(F.array_distinct(toks))
    quality = F.least(F.lit(1.0), n_t / 50.0) * F.when(
        n_t > 0, n_d.cast("double") / n_t
    ).otherwise(0.0)
    q = docs.select("text", quality.alias("quality"))
    fam = docs.groupBy("text").agg(F.count("*").alias("fam_size"))
    j = q.join(fam, "text").select(
        F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9)).alias(
            "score_decile"
        ),
        F.when(F.col("fam_size") > 1, 1).otherwise(0).alias("is_dup"),
    )
    return j.groupBy("score_decile").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup"),
        F.expr("(sum(is_dup) * 10000) div count(*)").alias("dup_rate_bp"),
    )


# ---------------------------------------------------------------------------
# l1b — fixed-block chunk-dedup census (round 5+): the storage-layer
# question under every content-addressed store — if documents split
# into fixed 256-char blocks addressed by digest, how much of the
# corpus is block-level redundant? Catches PARTIAL duplication
# (shared boilerplate headers/footers) that whole-document dedup
# (l1/m10) cannot see.
# ---------------------------------------------------------------------------

_L1B_CHUNK = 256

_L1B_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(ceil(len(text) / {_L1B_CHUNK}.0) AS BIGINT)),
           i -> sha256(text[i * {_L1B_CHUNK} + 1 : (i + 1) * {_L1B_CHUNK}])
         )) AS block_digest
  FROM documents WHERE len(text) > 0),
blocks AS (
  SELECT block_digest, CAST(COUNT(*) AS BIGINT) AS refs
  FROM chunks GROUP BY block_digest)
SELECT CAST(SUM(refs) AS BIGINT) AS total_blocks,
       CAST(COUNT(*) AS BIGINT) AS unique_blocks,
       CAST(SUM(refs - 1) AS BIGINT) AS dedupable_blocks,
       CAST((SUM(refs - 1) * 10000) // SUM(refs) AS BIGINT)
         AS dedup_ratio_bp,
       CAST(MAX(refs) AS BIGINT) AS hottest_block_refs
FROM blocks
"""


@register("l1_block_dedup_census", oracle=_L1B_ORACLE, tags=("L1", "F1", "A2"))
def l1_block_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide fixed-block dedup ratio: every document splits into
    256-CHARACTER blocks (character slicing — identical positions on
    both engines regardless of UTF-8 byte widths), each block keys by
    its SHA-256, and the census reports total vs unique vs dedupable
    blocks plus the hottest block's reference count. One number —
    dedup_ratio_bp — is the storage savings a block-level CAS would
    realize over this corpus.

    Scale: blocks explode map-side (O(total chars) work), the shuffle
    moves 64-hex digests only, and the census is a global aggregate.
    Character (not byte) blocks keep the oracle exact; a production
    store would chunk bytes — same plan, different slicer.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_blocks = F.ceil(F.length("text") / F.lit(float(_L1B_CHUNK))).cast("int")
    chunks = (
        docs.where(F.length("text") > 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_blocks - 1),
                    lambda i: F.sha2(
                        F.encode(
                            F.substring(
                                F.col("text"),
                                (i * _L1B_CHUNK + 1).cast("int"),
                                _L1B_CHUNK,
                            ),
                            "utf-8",
                        ),
                        256,
                    ),
                )
            ).alias("block_digest")
        )
    )
    blocks = chunks.groupBy("block_digest").agg(F.count("*").alias("refs"))
    return blocks.agg(
        F.sum("refs").cast("long").alias("total_blocks"),
        F.count("*").alias("unique_blocks"),
        F.sum(F.col("refs") - 1).cast("long").alias("dedupable_blocks"),
        F.expr("(sum(refs - 1) * 10000) div sum(refs)").alias(
            "dedup_ratio_bp"
        ),
        F.max("refs").alias("hottest_block_refs"),
    )


# ---------------------------------------------------------------------------
# l4a — exact AUC of the quality score (round 5+): discrimination to
# l4_score_calibration's reliability. AUC = P(score_unique >
# score_dup) with ½ credit for ties — computed EXACTLY via the
# Mann-Whitney rank identity in doubled-rank integer units (every
# tie-averaged rank ×2 is an integer), so the one number that
# summarizes the filter is hash-exact, not a float estimate.
# ---------------------------------------------------------------------------

_L4A_TOKS_D = _ORACLE_TOKS.replace("text", "d.text")
_L4A_DTOKS_D = f"list_distinct({_L4A_TOKS_D})"

_L4A_ORACLE = rf"""
WITH q AS (
  SELECT LEAST(1.0, len({_L4A_TOKS_D}) / 50.0)
           * (CASE WHEN len({_L4A_TOKS_D}) > 0
                   THEN CAST(len({_L4A_DTOKS_D}) AS DOUBLE)
                        / len({_L4A_TOKS_D})
                   ELSE 0.0 END) AS score,
         CASE WHEN fam.fam_size > 1 THEN 0 ELSE 1 END AS is_unique
  FROM documents d
  JOIN (SELECT text, COUNT(*) AS fam_size FROM documents GROUP BY text) fam
    ON d.text = fam.text),
g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(is_unique) AS BIGINT) AS pos
  FROM q GROUP BY score),
c AS (
  SELECT score, cnt, pos,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM g),
s AS (
  SELECT SUM(CAST(pos AS HUGEINT) * (2 * below + cnt + 1)) AS rank2_sum,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
  FROM c)
SELECT n_pos, n_neg,
       CASE WHEN n_pos * n_neg > 0
            THEN CAST(((rank2_sum - CAST(n_pos AS HUGEINT) * (n_pos + 1))
                       * 500000)
                      // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
       END AS auc_micro
FROM s
"""


@register("l4_score_auc", oracle=_L4A_ORACLE, tags=("L4", "W1", "A2"))
def l4_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of the quality score for predicting "document is unique"
    (vs exact-duplicate): per distinct score, tie-averaged rank ×2 =
    2·below + cnt + 1 (integer); U = (Σ₊rank − n₊(n₊+1)/2); AUC =
    U/(n₊·n₋) in exact integer micro-units via ``·5·10⁵ div`` (the ×2
    and ÷2 fold together; sums ride DECIMAL(38,0)/HUGEINT so nothing
    overflows at corpus scale). Positive operands, trunc == ``//``.

    One-class corpora (no duplicates at all, as at tiny fixture
    scales) report NULL — AUC is undefined without both classes, and
    the ANSI guard is the same CASE on both engines.

    Scale: scores reduce to their distinct values first (bounded by
    the token-count grid, but not provably small — so the cumulative
    count uses _helpers.scalable_running_sum over coarse score
    buckets, never a bare global window); everything after is O(distinct
    scores). The same shape scores ANY classifier column at 100 TB.
    """
    from ._helpers import scalable_running_sum

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_t = F.size(toks)
    n_d = F.size(F.array_distinct(toks))
    score = F.least(F.lit(1.0), n_t / 50.0) * F.when(
        n_t > 0, n_d.cast("double") / n_t
    ).otherwise(0.0)
    fam = docs.groupBy("text").agg(F.count("*").alias("fam_size"))
    q = docs.join(fam, "text").select(
        score.alias("score"),
        F.when(F.col("fam_size") > 1, 0).otherwise(1).alias("is_unique"),
    )
    g = q.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("is_unique").cast("long").alias("pos")
    )
    c = scalable_running_sum(
        g,
        order_cols=[F.col("score")],
        value="cnt",
        bucket=F.floor(F.col("score") * 64).cast("long"),
        out="cum_incl",
    ).withColumn("below", F.coalesce(F.col("cum_incl") - F.col("cnt"), F.lit(0)))
    # Rank sums and their ×5·10⁵ product accumulate in DECIMAL(38,0)/
    # HUGEINT — BIGINT overflows near ~4M docs (round-4 Σu² rule).
    s = c.agg(
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("below") + F.col("cnt") + 1)
        ).alias("rank2_sum"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos * n_neg > 0 THEN CAST("
            " ((rank2_sum - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
            "  * 500000)"
            " div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"
        ).alias("auc_micro"),
    )


# ---------------------------------------------------------------------------
# l2g — b-bit minwise hashing, b=1 (round 5+): Li & König's storage
# trick — keep only the LOWEST BIT of each minhash; 64 hashes cost 8
# bytes per document instead of 256. Estimator Ĵ = 2·agree/64 − 1.
# Because the 64 permutations reuse the oracle-exact (aⱼ·g + bⱼ) mod p
# family, BOTH the estimate and the true trigram Jaccard are integer-
# exact and the per-pair estimation error is hash-graded — a measured
# accuracy curve, not a citation.
# ---------------------------------------------------------------------------

_L2G_AB = [(7 * j + 3, 101 * j + 13) for j in range(64)]
_L2G_SAMPLE = 20  # doc_id % 20 == 0 → ~5 % systematic sample

_L2G_SIG_SQL = ",\n         ".join(
    f"list_min(list_transform(grams, x -> ({a} * x + {b}) % {_LSH_P})) % 2"
    f" AS bit{j}"
    for j, (a, b) in enumerate(_L2G_AB)
)
_L2G_AGREE_SQL = " + ".join(
    f"CASE WHEN a.bit{j} = b.bit{j} THEN 1 ELSE 0 END" for j in range(64)
)

_L2G_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {_L2G_SAMPLE} = 0 AND len(text) >= {_WINNOW_K}),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(text) - {_WINNOW_K} + 2), i ->
           ({" + ".join(f"CAST(ascii(text[i+{j}]) AS BIGINT)*{p}" for j, p in enumerate(_POW31))})
           % {_WINNOW_MOD}) AS grams
  FROM d),
sig AS (
  SELECT doc_id,
         list_distinct(grams) AS gset,
         {_L2G_SIG_SQL}
  FROM g),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.gset, b.gset)) AS BIGINT) AS inter,
         CAST(len(a.gset) + len(b.gset)
              - len(list_intersect(a.gset, b.gset)) AS BIGINT) AS uni,
         CAST({_L2G_AGREE_SQL} AS BIGINT) AS agree
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST((inter * 1000) // uni AS BIGINT) AS j_true_milli,
       CAST(((2 * agree - 64) * 1000) // 64 AS BIGINT) AS j_est_milli,
       agree
FROM pairs
WHERE inter > 0 OR agree >= 48
"""


@register("l2_bbit_minhash", oracle=_L2G_ORACLE, tags=("L2", "F5", "J8"))
def l2_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit minwise signatures over a 5 % systematic sample: per pair,
    the exact trigram Jaccard (integer milli-units from set
    intersection) next to the b-bit estimate ``(2·agree − 64)·1000 div
    64`` (negative allowed — both engines truncate toward zero). Pairs
    with no overlap AND a sub-48 bit agreement are dropped to keep the
    graded set informative. Identical texts agree on all 64 bits by
    construction; unrelated pairs hover near agree ≈ 32 (Ĵ ≈ 0).

    Scale: signatures are one exploded (gram × 64-seed broadcast) pass
    through a NARROW codegen MIN aggregate keyed (doc_id, seed), then a
    bit_or pack (optimization r13 — the r5–r12 form ran 64 interpreted
    affine `transform` copies of each gram array; identical integer
    minima, the l6_covariance long-format pattern; a 64-WIDE min
    aggregate was measured onto a codegen cliff and rejected — see the
    in-code note). The low bits pack
    into ONE BIGINT, so per-pair agreement is a single XOR + POPCOUNT —
    64 − bit_count(pack_a ^ pack_b) ≡ the 64 CASE-WHEN bit compares by
    construction. The pack collapses each document to 64 BITS — the
    point of the technique: at 100 TB the pair phase ships 8-byte
    sketches, not gram sets. The all-pairs join here is bounded by the
    sample; production pairs come from LSH buckets
    (l2_lsh_bucket_health audits those). The exact intersection is
    projected ONCE per pair (uni derives from it) — the r12 form
    evaluated array_intersect twice per pair.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    cps = F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long"))

    def gram_hash(i: Column) -> Column:
        total = F.lit(0).cast("long")
        for j, p in enumerate(_POW31):
            total = total + F.element_at(F.col("cps"), i + F.lit(j)) * F.lit(p)
        return total % _WINNOW_MOD

    grams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("cps")) - _WINNOW_K + 1), gram_hash
    )
    cbase = docs.filter(
        (F.col("doc_id") % _L2G_SAMPLE == 0) & (F.length(t) >= _WINNOW_K)
    ).select("doc_id", cps.alias("cps"))
    gsets = cbase.select("doc_id", F.array_distinct(grams).alias("gset"))
    # LONG-format signature build: (gram × 64-seed broadcast) → one
    # NARROW min aggregate keyed (doc_id, j) → bit_or-pack; all codegen
    # primitive work, partial aggregation collapses each task to
    # |docs|×64 rows before the exchange. Identical integer minima and
    # bits. TWO plan hazards measured and dodged here (r13): a 64-WIDE
    # min aggregate runs ~5.6 ms/ROW (44 s for 7 775 exploded grams at
    # sf0.01 — far off the codegen path), and `explode` of a
    # COLUMN-projected grams array lets InferFiltersFromGenerate push a
    # size()>0 filter below the exchange with the whole gram expression
    # INLINED — transform(split(text)) re-evaluated per element_at,
    # O(L²·split) per document (437 s at sf0.1). Exploding the
    # EXPRESSION directly (the l2_lsh_bucket_health shape) defeats the
    # inference: the rule only fires on attribute inputs.
    seeds = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(_L2G_AB)], "j int, a long, b long"
    )
    packs = (
        cbase.select("doc_id", F.explode(grams).alias("g"))
        .crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "j",
            ((F.col("g") * F.col("a") + F.col("b")) % _LSH_P).alias("h"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("m"))
        .groupBy("doc_id")
        .agg(F.expr("bit_or(shiftleft(m % 2, j))").alias("pack"))
    )
    sig = gsets.join(packs, "doc_id")
    a, b = sig.alias("a"), sig.alias("b")
    agree = F.lit(64).cast("long") - F.bit_count(
        F.col("a.pack").bitwiseXOR(F.col("b.pack"))
    )
    inter = F.size(F.array_intersect(F.col("a.gset"), F.col("b.gset"))).cast(
        "long"
    )
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("inter"),
            (F.size(F.col("a.gset")) + F.size(F.col("b.gset")))
            .cast("long")
            .alias("stot"),
            agree.cast("long").alias("agree"),
        )
        .withColumn("uni", F.col("stot") - F.col("inter"))
    )
    return pairs.where(
        (F.col("inter") > 0) | (F.col("agree") >= 48)
    ).select(
        "doc_a",
        "doc_b",
        F.expr("(inter * 1000) div uni").alias("j_true_milli"),
        F.expr("((2 * agree - 64) * 1000) div 64").alias("j_est_milli"),
        "agree",
    )
