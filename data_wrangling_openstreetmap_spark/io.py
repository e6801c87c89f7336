"""Table loading and view registration for the graded star schema.

One parquet file per table per scale factor (TESTDATA.md). At 100 TB the
only change is the path layout: date-partitioned, ZSTD, ~128 MB files —
``spark.read.parquet`` and every downstream plan are unchanged, and
hive-style partition dirs give Catalyst partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every scale factor the
# reference schema supports (region/nation are fixed-size; supplier/part
# grow slowly). Used by operators to hint broadcast joins explicitly.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


# Scan-plan cache: building `spark.read.parquet` re-lists files and
# re-reads footers (~50-200 ms) on every query construction; the
# resulting DataFrame is just a plan, so reusing it never caches data.
# Keyed on the session OBJECT (not id(): address reuse after a stopped
# session is garbage-collected could alias a dead session's plans).
_scan_cache: dict[tuple[SparkSession, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark, sf_dir.rstrip("/"), name)
    df = _scan_cache.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        _scan_cache[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to µs-truncated timestamp_ntz across fixture
    generations. Round-1 testdata wrote parquet TIMESTAMP(NANOS), which
    Spark 4 refuses to read natively (PARQUET_TYPE_ILLEGAL) while DuckDB
    truncates to µs — that encoding is read as raw nanos (legacy conf,
    runtime-settable) and rebuilt. Round-2 testdata writes timestamp[us]
    directly, which Spark infers as TIMESTAMP_NTZ (parquet
    isAdjustedToUTC=false); only the ntz cast is needed there. Both
    paths land on identical values in both engines.

    ``ts DIV 1000`` is integer division — a double ``/1000`` would lose
    precision at 1.7e18 nanos (53-bit mantissa) and round some µs wrong.
    """
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        ts = F.col("ts")
    return raw.withColumn("ts", ts.cast("timestamp_ntz"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (SQL-string entry path E3)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
