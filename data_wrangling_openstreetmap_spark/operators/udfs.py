"""Python UDF surface (SURVEY.md §2.8 U1–U5): the intentional
JVM↔Python crossings, Arrow-batched, for logic built-ins can't express.

Fully oracle-graded since round 2: each Python-side computation is
paired with a DuckDB SQL formulation of the identical math. String
logic (U1, U5) is NOT "trivially" engine-identical — Python str
methods and regexes differ from RE2 on Unicode case mapping, \\d/\\s
classes, $-anchors, and int64 overflow (three latent instances fixed
in round 11) — so every text-transforming body here is a module-level
named function adversarially battery-pinned against its DuckDB mirror
in tests/test_udf_battery.py, and every crossing is frozen in
tests/test_plan_shapes.py::UDF_CROSSING_SITES. U3's z-score uses an
exact integer recipe — z = (cents·n − Σcents) / √(n·Σcents² − (Σcents)²)
evaluated with arbitrary-precision integers Python-side and HUGEINT
SQL-side, so the one double division and sqrt are bit-identical on
both engines, no rounding needed. U2 rounds its sigmoid to 6 dp on
both sides (numpy exp and libm exp agree to ~1 ulp; a 6-dp boundary
hit needs a ~1e-10 coincidence per row). Tests additionally
cross-check each against an equivalent built-in formulation. The
design rule stands: these exist as the *surface* for custom logic —
every §2 relational operator stays UDF-free.
"""

from __future__ import annotations

import math
import re

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import register
from ._helpers import oracle_cents

# ---------------------------------------------------------------------------
# U2 — vectorized scalar pandas_udf.
# ---------------------------------------------------------------------------


def _sigmoid_balance_udf():
    # pandas_udf resolves its return type against the ACTIVE session, so
    # the decorator must run inside a query call, not at import time.
    @pandas_udf("double")
    def sigmoid_balance(bal: pd.Series) -> pd.Series:
        """Arbitrary per-row Python math (a stand-in for model scoring):
        sigmoid of the scaled account balance."""
        import numpy as np

        return 1.0 / (1.0 + np.exp(-bal / 1000.0))

    return sigmoid_balance


_U2_ORACLE = """
SELECT c_custkey,
       ROUND(1.0 / (1.0 + exp(-c_acctbal / 1000.0)), 6) AS score
FROM customer
"""


@register("u2_pandas_udf_score", oracle=_U2_ORACLE, tags=("U2",))
def u2_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over customer balances: rows stream through the
    Python worker in Arrow batches (~10-100× row-at-a-time UDFs).
    Graded at 6 dp on both sides (numpy vs libm exp differ ≤ ~1 ulp;
    score is strictly positive so Spark HALF_UP and DuckDB ROUND agree).

    Scale: pure projection — parallel per partition, no shuffle, no
    state; batch size bounded by arrow.maxRecordsPerBatch.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.round(_sigmoid_balance_udf()(F.col("c_acctbal")), 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# U3/U4 — grouped-map applyInPandas (per-group normalization; also the
# Python-UDAF escape hatch: the group lands in one pandas frame).
# ---------------------------------------------------------------------------


_U3_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment, {oracle_cents('c_acctbal')} AS cents
  FROM customer
),
s AS (
  SELECT c_mktsegment, COUNT(*) AS n, SUM(cents) AS sx,
         SUM(cents * cents) AS sxx
  FROM c GROUP BY c_mktsegment
)
SELECT c_custkey, c.c_mktsegment,
       CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
            ELSE (cents * n - sx) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       END AS z
FROM c JOIN s USING (c_mktsegment)
"""


@register("u3_grouped_map_zscore", oracle=_U3_ORACLE, tags=("U3", "U4"))
def u3_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment z-score of account balances via
    applyInPandas — the reference's 'learn a normalization per city'
    shape (U3), and the way to write a Python UDAF (U4): the whole
    group arrives as one pandas frame.

    Exact cross-engine recipe: balances are 2-decimal money, so in
    integer cents z = (x·n − Σx) / √(n·Σx² − (Σx)²) — the moments are
    computed as arbitrary-precision Python ints here and HUGEINTs in
    the oracle, leaving exactly one double division and one sqrt, both
    IEEE-correctly-rounded, hence bit-identical. (The naive
    pandas mean()/std() uses numpy pairwise summation whose fold order
    differs from SQL engines — that formulation can't hash-match.)

    Scale: one shuffle on the group key; each group must fit a worker's
    memory — for huge groups, pre-aggregate the moments with built-ins
    instead (tests cross-check this exact equivalence).
    """
    customer = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        n = len(pdf)
        sx = int(cents.sum())
        sxx = int((cents * cents).sum())
        den = n * sxx - sx * sx  # exact: python ints never overflow
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        if den == 0:
            out["z"] = 0.0
        else:
            out["z"] = (cents * n - sx).astype("float64") / math.sqrt(float(den))
        return out

    return customer.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey bigint, c_mktsegment string, z double"
    )


# ---------------------------------------------------------------------------
# U5 — Python UDTF (one row → many), Spark 4 surface.
# ---------------------------------------------------------------------------


def _split_tag_parts(key: str):
    """u5's row generator: (part, position) per colon segment — the
    Python mirror of DuckDB's parallel ``unnest(string_split(key, ':'))
    / generate_series`` zip (literal-separator split, empties KEPT —
    battery-pinned)."""
    if key is None:
        return
    for i, part in enumerate(key.split(":")):
        yield (part, i)


def _make_tag_splitter():
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, position int")
    class TagSplitter:
        """Split a colon-namespaced tag key into ordered parts —
        the reference's 'addr:street → (addr, street)' shaping rule as
        a generator UDTF."""

        def eval(self, key: str):
            yield from _split_tag_parts(key)

    return TagSplitter


_U5_ORACLE = """
WITH k AS (
  SELECT concat_ws(':', 'brand', p_brand, p_type) AS key FROM part
),
s AS (SELECT key, string_split(key, ':') AS parts FROM k)
SELECT key,
       unnest(parts) AS part,
       unnest(generate_series(0, len(parts) - 1)) AS position
FROM s
"""


@register("u5_udtf_tag_split", oracle=_U5_ORACLE, tags=("U5",))
def u5_udtf_tag_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding synthetic colon-namespaced keys built from
    part brands. Prefer `explode(split(...))` (same semantics, no
    Python) — registered to cover the UDTF surface; tests assert the
    explode formulation matches exactly. String-only logic → full
    oracle (DuckDB zips the parallel unnests positionally).
    """
    TagSplitter = _make_tag_splitter()
    spark.udtf.register("tag_splitter", TagSplitter)
    part = load_table(spark, sf_dir, "part")
    part.select(
        F.concat_ws(
            ":", F.lit("brand"), F.col("p_brand"), F.col("p_type")
        ).alias("key")
    ).createOrReplaceTempView("u5_keys")
    return spark.sql(
        "SELECT key, s.part, s.position "
        "FROM u5_keys, LATERAL tag_splitter(key) s"
    )


# ---------------------------------------------------------------------------
# U1 — row-at-a-time scalar Python UDF (the discouraged-but-supported
# surface; the reference's update_name()-style cleaning function).
# ---------------------------------------------------------------------------

_STREET_SUFFIX = {"St.": "Street", "St": "Street", "Ave": "Avenue", "Rd.": "Road"}


def _normalize_suffix_py(name: str) -> str:
    """The reference's dictionary-based last-word normalization as a
    plain Python function (shared by u1's pickled and u1b's Arrow
    transports, and battery-pinned against a DuckDB mirror in
    tests/test_udf_battery.py). Pure literal-space splitting — no
    Unicode-sensitive operation anywhere."""
    if name is None:
        return None
    words = name.split(" ")
    words[-1] = _STREET_SUFFIX.get(words[-1], words[-1])
    return " ".join(words)


def _make_normalize_suffix():
    from pyspark.sql.functions import udf

    return udf(_normalize_suffix_py, "string")


_U1_ORACLE = """
SELECT p_partkey,
       p_name || ' St.' AS raw_name,
       p_name || ' Street' AS clean_name
FROM part
"""


@register("u1_scalar_udf_normalize", oracle=_U1_ORACLE, tags=("U1", "P5"))
def u1_scalar_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar UDF applying the street-suffix mapping to
    synthetic addresses built from part names. Registered to complete
    the §2.8 surface; p5_dict_normalize is the production form
    (broadcast mapping join, stays in codegen) and tests assert this
    UDF agrees with it row-for-row. The synthetic address always ends
    in "St.", so the oracle is the closed-form string rewrite.

    Scale: the worst crossing — one pickle round trip per row. A 100 TB
    pipeline uses this only where semantics genuinely need arbitrary
    Python; here it exists to prove the surface works.
    """
    part = load_table(spark, sf_dir, "part")
    addr = F.concat_ws(" ", F.col("p_name"), F.lit("St."))
    return part.select(
        "p_partkey",
        addr.alias("raw_name"),
        _make_normalize_suffix()(addr).alias("clean_name"),
    )


# ---------------------------------------------------------------------------
# U1b — the same scalar UDF, Arrow-optimized (Spark 4's useArrow=True):
# identical Python function, but rows cross the boundary as Arrow
# batches instead of per-row pickles. The middle rung of the §2.8
# ladder: u1 (pickle rows) → u1b (Arrow batches, same scalar fn) →
# u2 (pandas_udf, vectorized pandas ops).
# ---------------------------------------------------------------------------


@register("u1b_arrow_udf_normalize", oracle=_U1_ORACLE, tags=("U1", "P5"))
def u1b_arrow_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar UDF (``useArrow=True``): the exact
    street-suffix function from u1, with serialization switched from
    per-row pickling to Arrow record batches — the one-flag migration
    Spark 4 offers existing row UDF code before a full pandas_udf
    rewrite (measured here: ~2× over pickled rows on the 2k-row
    fixture; the gap widens with row count since batch overhead
    amortizes). Same oracle as u1 proves the flag changes transport,
    never semantics.

    Scale: still one Python worker crossing per batch — prefer builtin
    expressions (p5) where expressible; this rung exists for logic that
    genuinely needs Python but is written per-row.
    """
    fn = F.udf(_normalize_suffix_py, "string", useArrow=True)
    part = load_table(spark, sf_dir, "part")
    addr = F.concat_ws(" ", F.col("p_name"), F.lit("St."))
    return part.select(
        "p_partkey",
        addr.alias("raw_name"),
        fn(addr).alias("clean_name"),
    )


# ---------------------------------------------------------------------------
# U4b — pandas_udf GROUPED_AGG: the UDAF-as-expression form. u3 covers
# custom aggregation via applyInPandas (whole-group DataFrame in,
# DataFrame out); GROUPED_AGG instead yields a SCALAR per group and
# composes inside ordinary groupBy(...).agg(...) next to built-ins —
# the right tool when the custom statistic is one column deep.
# ---------------------------------------------------------------------------

def _weighted_avg_pd(price: "pd.Series", weight: "pd.Series") -> float:
    """u4b's GROUPED_AGG body: Σ(p·w)/Σw rounded at 6 dp. Python
    round() is banker's and SQL ROUND half-away, but no double sits
    exactly on a 6-dp half boundary ((2k+1)·5·10⁻⁷ is never dyadic), so
    the two agree on every representable quotient; the float folds
    underneath are exact for the battery's dyadic values and
    error-below-the-round for fixture money (battery-pinned)."""
    return round(float((price * weight).sum() / weight.sum()), 6)


_U4B_ORACLE = """
SELECT o_orderpriority,
       ROUND(SUM(o_totalprice * (o_orderkey % 10 + 1))
               / SUM(o_orderkey % 10 + 1), 6) AS weighted_avg_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register("u4b_grouped_agg_udaf", oracle=_U4B_ORACLE, tags=("U4", "U2", "A1"))
def u4b_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean order price per priority via a GROUPED_AGG
    pandas_udf (weight = orderkey%10+1, a deterministic stand-in for a
    quantity weight): the custom aggregate sits INSIDE agg() beside a
    second pandas aggregate, proving UDAFs compose as expressions
    rather than replacing the whole aggregation (u3's applyInPandas
    form). Spark forbids MIXING pandas and non-pandas aggregates in
    one agg() (INVALID_PANDAS_UDF_PLACEMENT) — so the row count here
    is also a GROUPED_AGG UDF; a production query needing built-ins
    too computes them in a sibling agg and joins on the group key. The
    single float division rounds at 6 dp; the weighted sums themselves
    are float folds whose error is orders below the round.

    Scale: GROUPED_AGG ships each group's COLUMN (not its rows) through
    Arrow and cannot partial-aggregate — groups must fit in worker
    memory, and the shuffle carries raw values. For algebraic
    statistics like this one, the decomposed form (two built-in SUMs,
    map-side combined) is the 100 TB rewrite; GROUPED_AGG earns its
    keep for genuinely non-decomposable per-group math (trimmed means,
    robust fits) on bounded groups.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, weight: pd.Series) -> float:
        return _weighted_avg_pd(price, weight)

    @pandas_udf("long")
    def group_count(price: pd.Series) -> int:
        return len(price)

    orders = load_table(spark, sf_dir, "orders")
    w = (F.col("o_orderkey") % 10 + 1).cast("double")
    return orders.groupBy("o_orderpriority").agg(
        weighted_avg(F.col("o_totalprice"), w).alias("weighted_avg_price"),
        group_count(F.col("o_totalprice")).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# U6 — mapInArrow: the lowest-overhead Python crossing — raw pyarrow
# RecordBatches in and out, no pandas materialization at all. The top
# rung of the transport ladder (u1 pickled rows → u1b Arrow-batched
# scalar fn → u2 pandas series → u6 bare Arrow batches), for kernels
# that speak Arrow natively (tokenizers, codecs, vector libs).
# ---------------------------------------------------------------------------

_U6_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS disc_revenue_cents
FROM lineitem
GROUP BY l_returnflag
"""


@register("u6_map_in_arrow", oracle=_U6_ORACLE, tags=("U2", "F4"))
def u6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` crossing: each task hands the Python worker a
    stream of pyarrow RecordBatches; the kernel computes discounted
    revenue in integer cents with pyarrow.compute (vectorized C++, no
    pandas conversion) and returns batches. The groupBy above the
    crossing is ordinary JVM hash aggregation, and the integer-cents
    arithmetic matches the engine-wide money recipe so the oracle hashes
    exactly.

    Scale: Arrow-native crossings skip the pandas object layer that
    pandas_udf pays (per-batch boxing of strings/decimals); for binary
    or fixed-width columns this is the fastest possible Python path.
    Still a crossing — keep it out of plans that builtins can express.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            price = batch.column("l_extendedprice")
            disc = batch.column("l_discount")
            # round_mode must match SQL ROUND: half_towards_infinity is Arrow's
            # half-away-from-zero; the default banker's half-to-even drifts
            # the cents sum by parity of the half-cent cases.
            cents_ = pc.round(
                pc.multiply(
                    pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_returnflag"), cents_],
                names=["l_returnflag", "disc_cents"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    mapped = li.mapInArrow(kernel, "l_returnflag string, disc_cents long")
    return mapped.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("disc_cents").alias("disc_revenue_cents"),
    )


# ---------------------------------------------------------------------------
# U7 — SQL UDF (Spark 4 CREATE FUNCTION … RETURN expr): named, reusable
# business logic with ZERO crossing cost — the function body inlines
# into the plan and stays inside WholeStageCodegen. The answer to "we
# need a UDF" that should be tried before any Python rung above.
# ---------------------------------------------------------------------------

_U7_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS disc_revenue_cents,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
FROM lineitem
GROUP BY l_returnflag
"""


@register("u7_sql_udf", oracle=_U7_ORACLE, tags=("U1", "F4"))
def u7_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions: ``disc_cents`` (the engine-wide
    integer-cents money recipe as a named function) and ``is_bulk``
    (a business predicate), created with CREATE FUNCTION … RETURN and
    used like builtins. Same aggregate as the u6 mapInArrow kernel —
    the pair measures the ladder's endpoints: identical semantics, one
    crosses into Python per batch, this one inlines to codegen.

    Scale: zero-cost abstraction — the optimizer sees the inlined
    expression (pushdown/pruning/codegen all apply), and the function
    definition travels in the catalog, not the plan.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * (1 - d) * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE) "
        "RETURNS INT RETURN CASE WHEN q >= 30 THEN 1 ELSE 0 END"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("u7_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(disc_cents(l_extendedprice, l_discount)) AS disc_revenue_cents,
               SUM(is_bulk(l_quantity)) AS n_bulk
        FROM u7_lineitem
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# U8 — SQL table function (CREATE FUNCTION … RETURNS TABLE): u5's UDTF
# semantics with u7's zero-crossing execution — the set-returning
# function surface without Python.
# ---------------------------------------------------------------------------

_U8_ORACLE = """
WITH k AS (
  SELECT concat_ws(':', 'brand', p_brand, p_type) AS key FROM part
),
s AS (SELECT key, string_split(key, ':') AS parts FROM k)
SELECT key,
       unnest(parts) AS part,
       unnest(generate_series(0, len(parts) - 1)) AS position
FROM s
"""


@register("u8_sql_udtf", oracle=_U8_ORACLE, tags=("U5", "F5"))
def u8_sql_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function: the colon-key splitter from u5
    declared as ``CREATE FUNCTION … RETURNS TABLE(pos, part) RETURN
    SELECT posexplode(...)`` and invoked with LATERAL — identical rows
    to the Python UDTF, zero JVM↔Python crossings (the body inlines as
    a correlated generator; columns bind POSITIONALLY to the RETURNS
    TABLE signature). Same oracle as u5 pins the equivalence.

    Scale: explodes inline in the scan stage like explode(split(…)) —
    the set-returning abstraction is free, exactly as u7's scalar one.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION u8_split_tags(s STRING) "
        "RETURNS TABLE(position INT, part STRING) "
        "RETURN SELECT posexplode(split(s, ':'))"
    )
    part = load_table(spark, sf_dir, "part")
    part.select(
        F.concat_ws(":", F.lit("brand"), F.col("p_brand"), F.col("p_type")).alias("key")
    ).createOrReplaceTempView("u8_keys")
    return spark.sql(
        "SELECT key, t.part, t.position "
        "FROM u8_keys, LATERAL u8_split_tags(key) t"
    )


# ---------------------------------------------------------------------------
# U2b — iterator-form pandas_udf (SCALAR_ITER): same scoring math as
# u2, but the worker receives a batch ITERATOR, amortizing one-time
# per-task setup (model load, dictionary mmap) across all Arrow
# batches instead of paying it per batch.
# ---------------------------------------------------------------------------


def _sigmoid_balance_iter_udf():
    @pandas_udf("double")
    def sigmoid_balance_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # One-time per-task setup happens HERE (before the loop) —
        # the reason this rung exists. The "model" is the scale const.
        scale = 1000.0
        for bal in batches:
            yield 1.0 / (1.0 + np.exp(-bal / scale))

    return sigmoid_balance_iter


_U2B_ORACLE = """
SELECT c_custkey,
       ROUND(1.0 / (1.0 + exp(-c_acctbal / 1000.0)), 6) AS score
FROM customer
"""


@register("u2b_pandas_iter_udf", oracle=_U2B_ORACLE, tags=("U2",))
def u2b_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas_udf — the §2.8 transport rung between
    u2's per-batch Series form and u6's bare-Arrow mapInArrow: identical
    sigmoid scoring (and the identical oracle as u2), but the UDF owns
    the batch loop, so per-task initialization runs once per PARTITION
    rather than once per Arrow batch. Graded at 6 dp (numpy vs libm
    exp ≤ 1 ulp; strictly positive so both engines' ROUND agree).

    Scale: pure projection, no shuffle; with a real model the iterator
    form is the difference between loading weights once per task and
    once per 10k-row batch — at 100 TB that's the entire speedup of
    worker reuse. Arrow batch size stays bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.round(_sigmoid_balance_iter_udf()(F.col("c_acctbal")), 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# U9 — polymorphic Python UDTF: the analyze() static method computes
# the OUTPUT SCHEMA from the call-site arguments at plan time (Spark 4
# surface) — one UDTF serves any width without code changes.
# ---------------------------------------------------------------------------


# RE2's \s (the class DuckDB's string_split_regex compiles) is exactly
# [\t\n\f\r ] — NO \v (0x0b), no Unicode whitespace. Python str.split()
# splits on ALL Unicode whitespace (\xa0, \x85,  , \v, ...), so the
# obvious `text.split()` body is the u18 latency class: green on the
# space-only fixture, divergent on exotic text (probed live: 'a\xa0b'
# stays one token in DuckDB, two in Python). Mirror the oracle's
# operation, not its paraphrase. Pinned by tests/test_udf_battery.py.
_RE2_WS_SPLIT = re.compile(r"[\t\n\f\r ]+")


def _first_tokens_py(text: str) -> list:
    """u9's tokenizer: the Python mirror of DuckDB
    ``list_filter(string_split_regex(text, '\\s+'), x -> x != '')``."""
    return [t for t in _RE2_WS_SPLIT.split(text or "") if t]


def _make_first_tokens():
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        """Emit the first k whitespace tokens of a string as k NAMED
        COLUMNS (tok_1..tok_k, null-padded) — k is read from the call
        site's literal by analyze(), so the schema is decided per
        query, not per implementation."""

        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            if not k.isConstantExpression or k.value is None:
                raise Exception("k must be a constant integer literal")
            schema = StructType()
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            toks = _first_tokens_py(text)
            yield tuple(toks[i] if i < len(toks) else None for i in range(k))

    return udtf(FirstTokens)


_U9_K = 3

_U9_ORACLE = r"""
WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks FROM documents)
SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3
FROM t
"""


@register("u9_polymorphic_udtf", oracle=_U9_ORACLE, tags=("U5", "L4"))
def u9_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF end-to-end: ``first_tokens(text, 3)`` resolves
    to a 3-column schema inside analyze() AT PLAN TIME — change the
    literal and the same class yields a different table shape (the
    Spark 4 dynamic-schema UDTF surface; u5 covers the static
    returnType form). Lateral-joined per document, null-padded where
    the text is short; DuckDB's out-of-range list index supplies the
    same nulls.

    Scale: the crossing is one Python generator per row with a
    bounded (k-wide) output — same cost class as u5; everything
    around the LATERAL join is JVM. Prefer split()[i] projections
    when the schema is static; this surface exists for plan-time
    polymorphism (schema driven by config, not code).
    """
    ft = _make_first_tokens()
    spark.udtf.register("first_tokens", ft)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("u9_docs")
    return spark.sql(
        f"SELECT d.doc_id, t.* "
        f"FROM u9_docs d, LATERAL first_tokens(d.text, {_U9_K}) t"
    )


# ---------------------------------------------------------------------------
# U10 — grouped-map applyInArrow: u3's per-group normalization with the
# Python side receiving a bare pyarrow.Table (no pandas materialization)
# — the zero-copy top rung of the grouped-map ladder, same oracle as u3.
# ---------------------------------------------------------------------------


def _arrow_zscore(table):
    import numpy as np
    import pyarrow as pa

    bal = table.column("c_acctbal").to_numpy(zero_copy_only=False)
    cents = np.rint(bal * 100.0).astype(np.int64)
    n = len(cents)
    # moments in PYTHON ints (u3's recipe): numpy int64 sums wrap
    # silently near ~10^6 rows/group x 10^6 cents — exactness first.
    ints = [int(c) for c in cents]
    sx = sum(ints)
    sxx = sum(c * c for c in ints)
    denom = n * sxx - sx * sx
    if denom == 0:
        z = np.zeros(n, dtype=np.float64)
    else:
        # identical expression to u3's oracle: (cents·n − Σx) / √denom
        # cents*n <= ~1e12 and sx fit float64 exactly, so the per-row
        # arithmetic stays vectorized once the moments are exact.
        z = (cents.astype(np.float64) * n - float(sx)) / np.sqrt(float(denom))
    return pa.table(
        {
            "c_custkey": table.column("c_custkey"),
            "c_mktsegment": table.column("c_mktsegment"),
            "z": pa.array(z, type=pa.float64()),
        }
    )


_U10_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment, {oracle_cents('c_acctbal')} AS cents
  FROM customer
),
s AS (
  SELECT c_mktsegment, COUNT(*) AS n, SUM(cents) AS sx,
         SUM(cents * cents) AS sxx
  FROM c GROUP BY c_mktsegment
)
SELECT c_custkey, c.c_mktsegment,
       CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
            ELSE (cents * n - sx) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       END AS z
FROM c JOIN s USING (c_mktsegment)
"""


@register("u10_apply_in_arrow", oracle=_U10_ORACLE, tags=("U3", "U4", "U2"))
def u10_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score via ``applyInArrow``: each market segment
    lands in the worker as ONE pyarrow.Table and returns one — no
    pandas conversion on either side of the crossing (u3 is the same
    computation through applyInPandas; u6 is the ungrouped mapInArrow).
    The arithmetic reproduces u3's exact-integer-moment recipe in
    numpy int64, so the z-scores are bit-identical to the shared SQL
    oracle with no rounding step.

    Scale: one shuffle on the grouping key; each group must fit one
    Arrow batch (same contract as every grouped-map: salt or pre-agg
    beyond ~10⁶ rows/group). Arrow-native transforms skip the
    pandas Block consolidation entirely — on wide groups that is the
    difference between memcpy and DataFrame construction.
    """
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return customer.groupBy("c_mktsegment").applyInArrow(
        _arrow_zscore, schema="c_custkey long, c_mktsegment string, z double"
    )


# ---------------------------------------------------------------------------
# U11 — UDTF with a TABLE argument + PARTITION BY (Spark 4 surface):
# the UDTF consumes an entire partitioned relation — one instance per
# partition, eval() streamed the rows, terminate() emits the summary —
# i.e. a user-defined AGGREGATION owning the whole partition, callable
# straight from SQL.
# ---------------------------------------------------------------------------


def _make_type_stats():
    from pyspark.sql.functions import udtf

    class TypeStats:
        """Per-partition event summary: count, exact integer-cent value
        total, first/last event time. All state is order-independent
        (sum/count/min/max), so the unspecified intra-partition row
        order cannot change the output."""

        def __init__(self):
            self._key = None
            self._n = 0
            self._units = 0  # Python int: arbitrary precision, no wrap
            self._min_ts = None
            self._max_ts = None

        def eval(self, row):
            self._key = row["event_type"]
            self._n += 1
            # half-away-from-zero, matching F.round/DuckDB round
            # (battery-pinned shared rule — see _half_away_cents)
            self._units += _half_away_cents(row["value"])
            ts = row["ts"]
            if self._min_ts is None or ts < self._min_ts:
                self._min_ts = ts
            if self._max_ts is None or ts > self._max_ts:
                self._max_ts = ts

        def terminate(self):
            if self._key is not None:
                yield (
                    self._key,
                    self._n,
                    self._units / 100.0,
                    self._min_ts,
                    self._max_ts,
                )

    return udtf(
        TypeStats,
        returnType=(
            "event_type string, n_events bigint, total_value double, "
            "first_ts timestamp_ntz, last_ts timestamp_ntz"
        ),
    )


_U11_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
"""


@register("u11_udtf_table_arg", oracle=_U11_ORACLE, tags=("U5", "U4", "A1"))
def u11_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * FROM type_stats(TABLE(events) PARTITION BY
    event_type)`` — the Spark 4 table-argument UDTF: the engine
    partitions the relation, instantiates the class once per
    partition, streams rows through eval(), and collects terminate()'s
    summary row. This is the pure-Python UDAF-over-relation surface
    (u3/u10 reach it via the DataFrame grouped-map API; u5/u9 take
    scalar arguments only); the oracle is the plain SQL aggregate the
    partition summary must equal.

    Scale: one shuffle on the PARTITION BY key; per-partition state is
    five scalars. The crossing is row-at-a-time Python — for exactly
    this shape prefer JVM aggregates (q1) or a GROUPED_AGG pandas UDF
    (u4b); the surface is graded because users reach for it when the
    per-partition logic is genuinely imperative.
    """
    spark.udtf.register("type_stats", _make_type_stats())
    load_table(spark, sf_dir, "events").createOrReplaceTempView("u11_events")
    return spark.sql(
        "SELECT * FROM type_stats(TABLE(u11_events) PARTITION BY event_type)"
    )


# ---------------------------------------------------------------------------
# U12 — COGROUPED applyInPandas: the two-sided grouped-map surface
# (groupBy().cogroup().applyInPandas) — each user's purchases and
# clicks arrive as a PAIR of pandas frames and pandas' merge_asof does
# the per-user point-in-time matching. The oracle is DuckDB's NATIVE
# ASOF LEFT JOIN: an independent engine implements the same semantics,
# so the cogroup crossing (two Arrow streams, group alignment, empty
# sides) is value-graded end to end.
# ---------------------------------------------------------------------------

_U12_SCHEMA = (
    "user_id bigint, n_purchases bigint, n_matched bigint, total_gap_us bigint"
)

_U12_ORACLE = """
SELECT p.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(c.ts) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(epoch_us(p.ts) - epoch_us(c.ts)), 0) AS BIGINT)
         AS total_gap_us
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY p.user_id
"""


def _asof_match_cogroup(pdf_p: "pd.DataFrame", pdf_c: "pd.DataFrame") -> "pd.DataFrame":
    """Per-user as-of matcher: backward merge_asof of purchases onto
    clicks, aggregated to (counts, exact µs gap total). Either side can
    be empty — a clicks-only group contributes no output row (matching
    the oracle's purchase-driven grouping), purchases with no prior
    click count as unmatched."""
    if len(pdf_p) == 0:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in
             ("user_id", "n_purchases", "n_matched", "total_gap_us")}
        )
    p = pdf_p.sort_values(["ts", "event_id"]).reset_index(drop=True)
    c = (
        pdf_c.sort_values("ts")
        .rename(columns={"ts": "click_ts"})
        .reset_index(drop=True)[["click_ts"]]
    )
    if len(c):
        m = pd.merge_asof(
            p, c, left_on="ts", right_on="click_ts", direction="backward"
        )
    else:
        m = p.assign(click_ts=pd.NaT)
    matched = m["click_ts"].notna()
    # .value is integer nanoseconds; ntz µs arithmetic exactly as the
    # engines compute epoch_us differences
    gaps = (
        (m.loc[matched, "ts"].astype("int64") - m.loc[matched, "click_ts"].astype("int64"))
        // 1000
    )
    return pd.DataFrame(
        {
            "user_id": [int(p["user_id"].iloc[0])],
            "n_purchases": [len(p)],
            "n_matched": [int(matched.sum())],
            "total_gap_us": [int(gaps.sum()) if len(gaps) else 0],
        }
    )


@register("u12_cogrouped_asof", oracle=_U12_ORACLE, tags=("U3", "U2", "J7"))
def u12_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (the U-surface's two-sided rung): per
    user, the purchase and click streams arrive as paired pandas
    frames and `pd.merge_asof` performs backward point-in-time
    matching — counts and the exact µs gap total per user. Graded
    against DuckDB's NATIVE ASOF LEFT JOIN, so three independent
    implementations of as-of semantics now agree (this cogroup, the
    frontend/jvmext lowerings, and DuckDB's engine). Among clicks tied
    on ts, any winner yields the same gap, so the aggregate is
    tie-invariant by construction.

    Scale: cogroup shuffles BOTH sides once on the group key and
    zips matching groups into one Python worker call — the right
    pattern when per-key logic needs two tables at once (the
    alternative is a joined grouped-map that materializes the pair
    cross-product first). Arrow-batched; per-group state is the
    group's rows only.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_asof_match_cogroup, _U12_SCHEMA)
    )


# ---------------------------------------------------------------------------
# U13 — cogrouped applyInArrow (round 5+): the last unclaimed rung of
# the grouped-crossing ladder — u3/u12 cogroup through pandas, u10
# groups through Arrow; this cogroups through Arrow. Two fact tables
# meet per nation as raw pyarrow Tables and reconcile with
# pyarrow.compute only (no pandas object layer at all).
# ---------------------------------------------------------------------------

_U13_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS cust_cents
  FROM customer GROUP BY 1),
s AS (
  SELECT s_nationkey AS nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS supp_cents
  FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.cust_cents, 0) AS cust_cents,
       COALESCE(s.supp_cents, 0) AS supp_cents
FROM c FULL JOIN s ON c.nationkey = s.nationkey
"""


@register("u13_cogrouped_arrow", oracle=_U13_ORACLE, tags=("U3", "U2", "J2"))
def u13_cogrouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer/supplier balance reconciliation through
    ``cogroup(...).applyInArrow``: each nation's two row sets arrive
    as pyarrow Tables; counts and exact cents totals come from
    pyarrow.compute with ``half_towards_infinity`` rounding (the u6
    rule — Arrow's default banker's rounding drifts half-cent cases
    against SQL ROUND). Either side may be empty (full-outer cogroup
    semantics), matching the oracle's FULL JOIN of the two rollups.

    Scale: cogroup shuffles both tables once on the key and streams
    each pair of groups through the worker Arrow-natively — the shape
    for per-key reconciliation kernels (order-book vs ledger, crawl vs
    index) that need imperative logic across TWO inputs; everything
    stays columnar end to end.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_acctbal"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), "s_acctbal"
    )

    def _cents_sum(tbl: "pa.Table", col: str) -> int:
        if tbl.num_rows == 0:
            return 0
        c = pc.round(
            pc.multiply(tbl.column(col), pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        return pc.sum(c).as_py() or 0

    def reconcile(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        src = left if left.num_rows else right
        nk = src.column("nationkey")[0].as_py()
        return pa.table(
            {
                "nationkey": pa.array([nk], pa.int64()),
                "n_customers": pa.array([left.num_rows], pa.int64()),
                "n_suppliers": pa.array([right.num_rows], pa.int64()),
                "cust_cents": pa.array(
                    [_cents_sum(left, "c_acctbal")], pa.int64()
                ),
                "supp_cents": pa.array(
                    [_cents_sum(right, "s_acctbal")], pa.int64()
                ),
            }
        )

    return (
        cust.groupBy("nationkey")
        .cogroup(sup.groupBy("nationkey"))
        .applyInArrow(
            reconcile,
            schema=(
                "nationkey bigint, n_customers bigint, n_suppliers bigint,"
                " cust_cents bigint, supp_cents bigint"
            ),
        )
    )


# ---------------------------------------------------------------------------
# U14 — Arrow-optimized Python UDTF (round 5+): u5's row-expanding
# table function upgraded to the Arrow transport (``useArrow=True``),
# the 4.1 path that batches UDTF input/output through Arrow instead
# of pickled rows — the same ladder rung u1→u1b climbs for scalar
# UDFs, closed here for table functions.
# ---------------------------------------------------------------------------

def _split_space_words(text: str):
    """Literal-space word splitter, empties skipped — the Python mirror
    of ``unnest(string_split(text, ' ')) ... WHERE word <> ''`` shared
    by the u14/u18 splitters (battery-pinned)."""
    if text:
        for w in text.split(" "):
            if w:
                yield w


def _split_with_pos_py(text: str):
    """u16's row generator: (word, original split index), empties
    skipped AFTER enumeration — mirrors the oracle's parallel-unnest
    zip + WHERE word <> '' (the round-6 F.split gotcha;
    battery-pinned)."""
    if text:
        for i, w in enumerate(text.split(" ")):
            if w:
                yield (w, i)


_U14_ORACLE = """
WITH ex AS (
  SELECT p_partkey,
         unnest(string_split(p_type, ' ')) AS word
  FROM part)
SELECT word,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(p_partkey) AS BIGINT) AS first_part
FROM ex
WHERE word <> ''
GROUP BY word
"""


@register("u14_arrow_udtf", oracle=_U14_ORACLE, tags=("U5", "U2", "A1"))
def u14_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split part types into words with an ARROW-optimized Python UDTF
    (one eval per row, rows batched over Arrow both directions) and
    roll up word frequencies. Identical semantics to the pickled-row
    u5 form — the grade proves the Arrow transport changes nothing
    but the transfer cost.

    Scale: Arrow batching amortizes the per-row Python overhead that
    makes classic UDTFs unusable in hot paths (~10× on string-heavy
    expansion); the expansion itself stays partition-local, and the
    rollup above it is ordinary JVM aggregation. Lateral-join the UDTF
    so each task streams its own partition through the worker.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for w in _split_space_words(text):
                yield (w,)

    part = load_table(spark, sf_dir, "part")
    spark.udtf.register("u14_split_words", SplitWords)
    part.select("p_partkey", "p_type").createOrReplaceTempView("u14_parts")
    ex = spark.sql(
        "SELECT p.p_partkey, s.word FROM u14_parts p,"
        " LATERAL u14_split_words(p.p_type) s"
    )
    return ex.groupBy("word").agg(
        F.count("*").alias("n_parts"),
        F.min("p_partkey").alias("first_part"),
    )


# ---------------------------------------------------------------------------
# ROUND-7 U1+U4 twin (u1/u1b scalar rungs, u4b weighted-mean UDAF, u7
# SQL-registered UDF graded): the chained crossing — a scalar Python
# UDF DERIVES THE GROUP KEY that a GROUPED_AGG pandas UDAF then
# aggregates under. The graded carriers each cross once; this grades
# the two-stage plan (BatchEvalPython below the shuffle, AggregateInPandas
# above it) and a genuinely non-decomposable statistic (median).
# ---------------------------------------------------------------------------

def _median_float_pd(s: "pd.Series") -> float:
    """Shared GROUPED_AGG median body (u15/u17/u18): pandas
    Series.median vs DuckDB/SQL median agree bit-for-bit on int64
    inputs within the documented envelope — an odd-count median IS one
    of the values, an even-count median is the midpoint of two, exact
    in double below 2^53 (battery-pinned incl. ±2^50 and negatives)."""
    return float(s.median())


def _half_away_cents(v: float) -> int:
    """u11's per-row money rule: value·100 rounded HALF AWAY FROM ZERO
    — the Python mirror of SQL ``CAST(round(v * 100) AS BIGINT)``
    (built-in round() is banker's half-to-even, divergent on exact
    binary halves like 0.125·100; battery-pinned on those). Compare the
    FRACTION to 0.5 instead of the classic ``floor(u + 0.5)``: the
    addition rounds u = 0.49999999999999994 UP to 1.0 (its float
    neighbor), which SQL round() never does — floor and the subtraction
    below are exact for |u| < 2^52, so this form has no such boundary.
    """
    u = abs(v) * 100
    q = math.floor(u)
    mag = q + 1 if u - q >= 0.5 else q
    return int(-mag if v < 0 else mag)


def _cohort_of_py(name):
    """u15's cohort key: Python mirror of the oracle's
    ``TRY_CAST(NULLIF(regexp_extract(name, '(\\d+)$', 1), '') AS BIGINT)
    % 7``. Three RE2/BIGINT behaviors the naive ``re.search(r'(\\d+)$')
    ... int(...) % 7`` body silently diverges on (all probed live):
    RE2 \\d is ASCII [0-9] (Python \\d matches Unicode digits, and
    int() PARSES them); RE2 $ anchors at end-of-TEXT (Python $ also
    matches before a trailing newline — \\Z is the mirror); and
    TRY_CAST returns NULL past int64 range (Python ints never
    overflow). Pinned by tests/test_udf_battery.py."""
    if name is None:
        return None
    m = re.search(r"([0-9]+)\Z", name)
    if not m:
        return None
    v = int(m.group(1))
    if v > 0x7FFFFFFFFFFFFFFF:
        return None
    return v % 7


_U15_ORACLE = """
SELECT CAST(TRY_CAST(NULLIF(regexp_extract(c_name, '(\\d+)$', 1), '') AS BIGINT)
              % 7 AS BIGINT)
         AS cohort,
       CAST(median(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         AS median_bal_cents,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY 1
"""


@register("u15_udf_keyed_median_udaf", oracle=_U15_ORACLE, tags=("U1", "U4"))
def u15_udf_keyed_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = trailing digits of c_name parsed IN PYTHON (plain
    pickled scalar UDF — the U1 crossing) modulo 7; per cohort, the
    MEDIAN account balance in cents via a GROUPED_AGG pandas UDAF (the
    U4 crossing). Median is the canonical non-decomposable per-group
    statistic — no algebraic rewrite exists, so the UDAF is the honest
    tool, not a stand-in. Exactness: cents are exact BIGINTs; an
    odd-count median IS one of them, an even-count median is the
    midpoint of two (exact in double far below 2^53) — pandas
    Series.median and DuckDB median agree bit-for-bit. Spark forbids
    mixing pandas and built-in aggregates in one agg() — the count
    rides along as a second GROUPED_AGG (u4b's documented pattern).

    Scale: the scalar UDF crossing is per-row Python BELOW the shuffle
    (the part to replace with regexp_extract at 100 TB — kept Python
    here because grading U1 is the point); the UDAF ships each
    cohort's cents column as Arrow and cannot partial-aggregate, so
    cohort cardinality (7) bounds state, not input size.
    """
    from pyspark.sql.functions import udf

    cohort_of = udf(_cohort_of_py, "long")

    @pandas_udf("double")
    def median_cents(cents: pd.Series) -> float:
        return _median_float_pd(cents)

    @pandas_udf("long")
    def n_rows(cents: pd.Series) -> int:
        return len(cents)

    cust = load_table(spark, sf_dir, "customer")
    cents_col = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.select(cohort_of("c_name").alias("cohort"), cents_col.alias("bc"))
        .groupBy("cohort")
        .agg(
            median_cents("bc").alias("median_bal_cents"),
            n_rows("bc").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# ROUND-8 U5+U1 twin (u5/u8/u9/u11/u14 UDTF rungs, u1/u1b/u7/u15 scalar
# rungs — every carrier graded). The angle: the UDTF's EXPLODED rows
# feed a scalar Python UDF whose output is the AGGREGATION KEY — u14
# grades the Arrow UDTF transport, u15 grades scalar-UDF-derived keys
# over base rows; this grades the chain UDTF → scalar UDF → keyed agg,
# where a fan-out bug and a normalization bug are distinguishable.
# ---------------------------------------------------------------------------

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_LOWER_TABLE = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)


def _signature_py(word):
    """u16's devowelled signature: strip ASCII vowels (both cases),
    then ASCII-lowercase what remains — every step a codepoint-level
    operation both engines define identically. The previous
    ``re.sub('[aeiou]', '', word.lower())`` paired with DuckDB
    ``regexp_replace(lower(word), ...)`` was the u18 latency class:
    Python .lower() applies Unicode FULL case mapping ('İ' → 'i' +
    U+0307) while DuckDB's utf8proc applies SIMPLE mapping ('İ' → 'i'),
    so the signatures diverged on dotted-İ text (probed live; green on
    the ASCII fixture only). On pure ASCII the two formulations agree,
    so golden values are unchanged. Pinned by tests/test_udf_battery.py.
    """
    if word is None:
        return None
    return re.sub(r"[aeiouAEIOU]", "", word).translate(_ASCII_LOWER_TABLE)


_U16_SIGNATURE_SQL = (
    "translate(regexp_replace({col}, '[aeiouAEIOU]', '', 'g'), "
    f"'{_ASCII_UPPER}', '{_ASCII_LOWER}')"
)

_U16_ORACLE = f"""
WITH s AS (
  SELECT p_partkey, string_split(p_name, ' ') AS parts FROM part
), w AS (
  SELECT p_partkey,
         unnest(parts) AS word,
         unnest(generate_series(0, len(parts) - 1)) AS pos
  FROM s
)
SELECT {_U16_SIGNATURE_SQL.format(col='word')} AS signature,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(pos) AS BIGINT) AS pos_sum,
       CAST(MIN(p_partkey) AS BIGINT) AS first_part
FROM w
WHERE word <> ''
GROUP BY 1
"""


@register(
    "u16_udtf_signature_rollup",
    oracle=_U16_ORACLE,
    tags=("U5", "U1"),
)
def u16_udtf_signature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF → scalar-UDF chain: a Python UDTF explodes p_name into
    (word, pos) rows with the word's 0-based position (U5 — the
    fan-out and the positional state live in Python), then a pickled
    scalar UDF collapses each word to its devowelled ASCII-lowered
    signature (U1 — strip [aeiouAEIOU], then translate A–Z→a–z; see
    _signature_py for why a Unicode lower() can't sit on this path),
    which becomes the aggregation key for a count / position-mass /
    first-part rollup. A fan-out error shifts pos_sum, a normalization
    error reroutes whole groups — the two Python stages are separately
    observable in the result.

    Oracle: LATERAL unnest(string_split(...)) with ROW_NUMBER()-derived
    positions and the identical strip-then-translate normalization in
    SQL. The UDTF skips empty tokens exactly as the WHERE word <> ''
    does (F.split-style empty artifacts; the round-6 gotcha).

    Scale: the UDTF is one Python crossing streaming name-length rows
    (fan-out inside the worker, not an explode-shuffle); the scalar
    UDF is the second crossing — at 100 TB both fold into one
    mapInArrow pass; the rollup shuffles O(signatures) keys.
    """
    from pyspark.sql.functions import udf, udtf

    @udtf(returnType="word string, pos bigint")
    class SplitWithPos:
        def eval(self, text: str):
            yield from _split_with_pos_py(text)

    signature = udf(_signature_py, "string")

    part = load_table(spark, sf_dir, "part")
    spark.udtf.register("u16_split_pos", SplitWithPos)
    part.select("p_partkey", "p_name").createOrReplaceTempView("u16_parts")
    exploded = spark.sql(
        "SELECT p.p_partkey, s.word, s.pos FROM u16_parts p,"
        " LATERAL u16_split_pos(p.p_name) s"
    )
    return (
        exploded.select(
            "p_partkey", "pos", signature(F.col("word")).alias("signature")
        )
        .groupBy("signature")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("pos").alias("pos_sum"),
            F.min("p_partkey").alias("first_part"),
        )
    )


# ---------------------------------------------------------------------------
# ROUND-9 U1+U4+U5 twin (u15 graded scalar-UDF key → UDAF, u16 graded
# UDTF → scalar-UDF key → built-in rollup — every U-tag carrier holds
# a grade). The angle: ALL THREE Python crossings in one chain — UDTF
# fan-out, scalar-UDF-derived key, and a GROUPED_AGG pandas UDAF
# computing a non-decomposable statistic — so the full
# Python-boundary pipeline (fan-out → rekey → Arrow aggregate) is one
# graded observable rather than three pairwise ones.
# ---------------------------------------------------------------------------

def _shape_key_py(word: str):
    """u17's shape key: first letter of ``word.lower()`` + length capped
    at 6, the Python mirror of ``substring(lower(word), 1, 1) ||
    LEAST(length(word), 6)``. Cross-engine soundness argument (battery-
    pinned on dotted-İ/Kelvin/combining-mark inputs): Python .lower()
    applies Unicode FULL case mapping and DuckDB's utf8proc SIMPLE
    mapping, but the two can only differ by TRAILING combining marks on
    the first character (U+0130 → 'i'+U+0307 vs 'i'), so the FIRST code
    point — all this key reads — agrees; and both engines count length
    in code points of the ORIGINAL word."""
    if word is None:
        return None
    # [:1] not [0]: total on '' like SQL substring ('' → shape key '0'),
    # though u17's splitter never feeds an empty word
    return f"{word.lower()[:1]}{min(len(word), 6)}"


_U17_ORACLE = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS parts
  FROM documents WHERE doc_id < 150
), w AS (
  SELECT doc_id,
         unnest(parts) AS word,
         unnest(generate_series(0, len(parts) - 1)) AS pos
  FROM s
)
SELECT substring(lower(word), 1, 1)
         || CAST(LEAST(length(word), 6) AS VARCHAR) AS shape_key,
       CAST(median(pos) AS DOUBLE) AS median_pos,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM w
WHERE word <> ''
GROUP BY 1
"""


@register(
    "u17_udtf_keyed_median_chain",
    oracle=_U17_ORACLE,
    tags=("U5", "U1", "U4"),
)
def u17_udtf_keyed_median_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full three-crossing Python chain: a UDTF explodes document
    text into (word, pos) rows with original split positions (U5 —
    empties skipped AFTER enumeration, the round-6 F.split gotcha), a
    pickled scalar UDF collapses each word to its shape key — first
    letter + length capped at 6 — (U1), and per shape key a
    GROUPED_AGG pandas UDAF computes the MEDIAN word position (U4,
    non-decomposable; exact per the u15 argument: an odd-count median
    IS an integer position, an even-count median is a midpoint of two
    — exact in double far below 2^53), beside a pandas nunique doc
    count and a plain count riding as further GROUPED_AGGs (Spark
    forbids mixing pandas and built-in aggregates in one agg()).

    Scale: the UDTF is one streaming crossing (fan-out inside the
    worker, no explode-shuffle); the scalar UDF is the second (fold
    both into one mapInArrow pass at 100 TB); the UDAF ships each
    key's positions as Arrow and cannot partial-aggregate — key
    cardinality (≤ letters × 6), not input size, bounds its state.
    """
    from pyspark.sql.functions import udf, udtf

    @udtf(returnType="doc_id bigint, word string, pos bigint")
    class SplitDocWords:
        def eval(self, doc_id, text: str):
            for w, i in _split_with_pos_py(text):
                yield (doc_id, w, i)

    shape_key = udf(_shape_key_py, "string")

    @pandas_udf("double")
    def median_pos(pos: pd.Series) -> float:
        return _median_float_pd(pos)

    @pandas_udf("long")
    def n_distinct_docs(doc_ids: pd.Series) -> int:
        return int(doc_ids.nunique())

    @pandas_udf("long")
    def n_rows(pos: pd.Series) -> int:
        return len(pos)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    spark.udtf.register("u17_split_doc_words", SplitDocWords)
    docs.select("doc_id", "text").createOrReplaceTempView("u17_docs")
    exploded = spark.sql(
        "SELECT s.doc_id, s.word, s.pos FROM u17_docs d,"
        " LATERAL u17_split_doc_words(d.doc_id, d.text) s"
    )
    return (
        exploded.select(
            "doc_id", "pos", shape_key(F.col("word")).alias("shape_key")
        )
        .groupBy("shape_key")
        .agg(
            median_pos("pos").alias("median_pos"),
            n_distinct_docs("doc_id").alias("n_docs"),
            n_rows("pos").alias("n_words"),
        )
    )


# ---------------------------------------------------------------------------
# ROUND-10 U1+U2+U3+U4+U5 twin (u17 chained UDTF → scalar UDF →
# GROUPED_AGG; u2/u3 graded the pandas scalar and grouped-map alone).
# The angle: ALL FIVE Python crossings in ONE pipeline, each stage
# feeding the next — the full bridge surface a Python-heavy corpus
# pipeline actually exercises, value-graded end to end.
# ---------------------------------------------------------------------------

def _skeleton_py(word: str):
    """u18's a–z skeleton: strip FIRST, lower SECOND — the Python
    mirror of ``lower(regexp_replace(word, '[^a-zA-Z]', '', 'g'))``
    operation-for-operation. The lower-then-strip order is LATENTLY
    divergent: Python .lower() maps some non-ASCII points INTO [a-z]
    (Kelvin sign U+212A → 'k', 'İ' → 'i'+combining dot) which SQL's
    ASCII class strips — green on the fixture, wrong on exotic text
    (the j17 latency class, caught in round-10 self-review; now
    battery-pinned in tests/test_udf_battery.py). After the strip only
    ASCII letters remain, where Python and utf8proc lowercasing are
    identical."""
    if word is None:
        return None
    return re.sub(r"[^a-zA-Z]", "", word).lower()


def _vowel_score_pd(norm: "pd.Series") -> "pd.Series":
    """u18's integer word score — length + 2·vowels — the Python mirror
    of ``length(norm) + 2*(length(norm) - length(regexp_replace(norm,
    '[aeiou]', '', 'g')))``. Input is _skeleton_py output (pure a–z),
    where pandas str.len/str.count and SQL length/regexp agree exactly;
    battery-pinned on raw adversarial text as well."""
    return (norm.str.len() + 2 * norm.str.count("[aeiou]")).astype("int64")


_U18_ORACLE = """
WITH s AS (
  SELECT doc_id, lang, string_split(text, ' ') AS parts
  FROM documents WHERE doc_id < 120
), w AS (
  SELECT lang,
         unnest(parts) AS word
  FROM s
), n AS (
  SELECT lang,
         lower(regexp_replace(word, '[^a-zA-Z]', '', 'g')) AS norm
  FROM w WHERE word <> ''
), scored AS (
  SELECT lang,
         CAST(length(norm)
              + 2 * (length(norm)
                     - length(regexp_replace(norm, '[aeiou]', '', 'g')))
           AS BIGINT) AS score
  FROM n WHERE norm <> ''
), cent AS (
  SELECT lang,
         score * (COUNT(*) OVER (PARTITION BY lang))
           - (SUM(score) OVER (PARTITION BY lang)) AS centered
  FROM scored
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(median(centered) AS DOUBLE) AS median_centered
FROM cent
GROUP BY lang
"""


@register(
    "u18_five_crossing_bridge",
    oracle=_U18_ORACLE,
    tags=("U1", "U2", "U3", "U4", "U5"),
)
def u18_five_crossing_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every Python bridge in one chain: a UDTF explodes text into
    words (U5 — enumerate THEN skip empties), a pickled scalar UDF
    normalizes each word to its a–z skeleton (U1), a vectorized pandas
    scalar UDF scores it — length + 2·vowels, integer (U2), an
    applyInPandas grouped-map centers each score against its language
    group as score·n − Σscore, kept INTEGER so the crossing is exact
    (U3 — float means would drift cross-engine; integer centering
    cannot), and a GROUPED_AGG pandas UDAF takes the per-language
    median (U4 — midpoint of two int64s, exact in double).

    The oracle replays the identical pipeline relationally: parallel
    unnest + WHERE, regexp skeleton, vowel count by length difference,
    window-centered integers, median. Any crossing that mangles rows,
    order-buckets, or types breaks the hash.

    Scale: UDTF + scalar UDF + pandas UDF are three Arrow/pickle
    streaming crossings (fold into one mapInArrow pass at 100 TB); the
    grouped-map ships each language's words once (state O(group), and
    languages are few — for per-document grouping use a window
    instead); the UDAF's state is O(languages).
    """
    from pyspark.sql.functions import udf, udtf

    @udtf(returnType="lang string, word string")
    class SplitLangWords:
        def eval(self, lang, text: str):
            for w in _split_space_words(text):
                yield (lang, w)

    skeleton = udf(_skeleton_py, "string")

    @pandas_udf("long")
    def vowel_score(norm: pd.Series) -> pd.Series:
        return _vowel_score_pd(norm)

    def center(key, g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        total = int(g["score"].sum())
        return pd.DataFrame(
            {"lang": key[0], "centered": g["score"] * n - total}
        )

    @pandas_udf("double")
    def median_centered(c: pd.Series) -> float:
        return _median_float_pd(c)

    @pandas_udf("long")
    def n_rows(c: pd.Series) -> int:
        return len(c)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    spark.udtf.register("u18_split_lang_words", SplitLangWords)
    docs.select("lang", "text").createOrReplaceTempView("u18_docs")
    exploded = spark.sql(
        "SELECT s.lang, s.word FROM u18_docs d,"
        " LATERAL u18_split_lang_words(d.lang, d.text) s"
    )
    scored = (
        exploded.select("lang", skeleton(F.col("word")).alias("norm"))
        .filter(F.col("norm") != "")
        .select("lang", vowel_score(F.col("norm")).alias("score"))
    )
    centered = scored.groupBy("lang").applyInPandas(
        center, "lang string, centered long"
    )
    return centered.groupBy("lang").agg(
        n_rows("centered").alias("n_words"),
        median_centered("centered").alias("median_centered"),
    )
