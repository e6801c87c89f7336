"""Python UDF surface (SURVEY.md §2.8 U2–U5): the intentional
JVM↔Python crossings, Arrow-batched, for logic built-ins can't express.

Graded rows-only (Python-side float paths aren't oracle-hashable);
tests cross-check each against an equivalent built-in formulation.
The design rule stands: these exist as the *surface* for custom logic —
every §2 relational operator stays UDF-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table
from ..registry import register

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


@register("u2_pandas_udf_score", oracle=None, tags=("U2",))
def u2_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over customer balances: rows stream through the
    Python worker in Arrow batches (~10-100× row-at-a-time UDFs).

    Scale: pure projection — parallel per partition, no shuffle, no
    state; batch size bounded by arrow.maxRecordsPerBatch.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey", _sigmoid_balance_udf()(F.col("c_acctbal")).alias("score")
    )


# ---------------------------------------------------------------------------
# U3/U4 — grouped-map applyInPandas (per-group normalization; also the
# Python-UDAF escape hatch: the group lands in one pandas frame).
# ---------------------------------------------------------------------------


@register("u3_grouped_map_zscore", oracle=None, tags=("U3", "U4"))
def u3_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment z-score of account balances via
    applyInPandas — the reference's 'learn a normalization per city'
    shape (U3), and the way to write a Python UDAF (U4): the whole
    group arrives as one pandas frame.

    Scale: one shuffle on the group key; each group must fit a worker's
    memory — for huge groups, pre-aggregate the moments with built-ins
    instead (tests cross-check this exact equivalence).
    """
    customer = load_table(spark, sf_dir, "customer")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["c_acctbal"].mean()
        std = pdf["c_acctbal"].std(ddof=0)
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["z"] = 0.0 if std == 0 else (pdf["c_acctbal"] - mean) / std
        return out

    return customer.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey bigint, c_mktsegment string, z double"
    )


# ---------------------------------------------------------------------------
# U5 — Python UDTF (one row → many), Spark 4 surface.
# ---------------------------------------------------------------------------


def _make_tag_splitter():
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, position int")
    class TagSplitter:
        """Split a colon-namespaced tag key into ordered parts —
        the reference's 'addr:street → (addr, street)' shaping rule as
        a generator UDTF."""

        def eval(self, key: str):
            if key is None:
                return
            for i, part in enumerate(key.split(":")):
                yield (part, i)

    return TagSplitter


@register("u5_udtf_tag_split", oracle=None, tags=("U5",))
def u5_udtf_tag_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding synthetic colon-namespaced keys built from
    part brands. Prefer `explode(split(...))` (same semantics, no
    Python) — registered to cover the UDTF surface; tests assert the
    explode formulation matches exactly.
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


def _make_normalize_suffix():
    from pyspark.sql.functions import udf

    @udf("string")
    def normalize_suffix(name: str) -> str:
        """The reference's dictionary-based last-word normalization as a
        plain Python function — per-row pickle round trip, no Arrow."""
        if name is None:
            return None
        words = name.split(" ")
        words[-1] = _STREET_SUFFIX.get(words[-1], words[-1])
        return " ".join(words)

    return normalize_suffix


@register("u1_scalar_udf_normalize", oracle=None, tags=("U1", "P5"))
def u1_scalar_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar UDF applying the street-suffix mapping to
    synthetic addresses built from part names. Registered to complete
    the §2.8 surface; p5_dict_normalize is the production form
    (broadcast mapping join, stays in codegen) and tests assert this
    UDF agrees with it row-for-row.

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
