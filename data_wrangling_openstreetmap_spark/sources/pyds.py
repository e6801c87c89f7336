"""Spark 4 Python Data Source API: a partition-aware custom source.

SURVEY §2's S-rows cover the built-in formats; this module exercises the
OTHER half of the source surface — Spark 4's ``pyspark.sql.datasource``
API for table formats Spark has no native reader for. The example
source synthesizes an event ledger from pure integer arithmetic so its
content is exactly reproducible in SQL (the DuckDB oracle regenerates
the same rows with ``generate_series``): what's graded is the data-
source machinery end-to-end — schema declaration, partition planning,
per-partition iteration, option handling — not the toy payload.

Scale posture: ``partitions()`` splits the keyspace into ``parts``
independent ``InputPartition``s; each executor reads only its slice
(``read`` is called once per partition, on the executor, in parallel).
A real deployment swaps the arithmetic for per-partition fetches
(object-store listing, REST cursor pages, an iterative XML chunk) and
keeps the identical planning shape — this is Spark's contract for
embarrassingly-parallel custom ingest. The Python crossing is the
source itself (Arrow-batched rows back to the JVM); everything
downstream of the scan is ordinary JVM DataFrame execution.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Mixing constants: Knuth multiplicative hash / MINSTD. All intermediate
# products stay far below 2^63 (i < 2^32), so Python, the JVM, and
# DuckDB BIGINT arithmetic agree bit-for-bit.
_USER_MULT = 2654435761
_AMT_MULT = 48271
_N_USERS = 1000
_AMT_MOD = 100_000


def _ledger_row(i: int) -> tuple:
    return (i, (i * _USER_MULT) % _N_USERS, (i * _AMT_MULT) % _AMT_MOD)


class LedgerPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class LedgerReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.parts = max(1, int(options.get("parts", 8)))

    def partitions(self) -> Sequence[InputPartition]:
        if self.n <= 0:
            # Spark requires at least one planned partition; an empty
            # ledger reads as one empty split, not a planning error.
            return [LedgerPartition(0, 0)]
        step = -(-self.n // self.parts)  # ceil-div: cover the whole range
        return [
            LedgerPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: LedgerPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _ledger_row(i)


class LedgerStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same ledger: offsets are plain row
    positions, so replay between two committed offsets is exact —
    the contract that makes a custom source exactly-once restartable
    (Spark re-calls readBetweenOffsets after recovery).

    A real deployment replaces the arithmetic with e.g. a queue cursor
    or an object-store listing watermark; the offset bookkeeping —
    initialOffset → read(start) → (rows, nextOffset) — is the part
    Spark owns and this class demonstrates.
    """

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.batch = max(1, int(options.get("batchsize", 1000)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n)
        return iter([_ledger_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_ledger_row(i) for i in range(int(start["pos"]), int(end["pos"]))])


class LedgerDataSource(DataSource):
    """``spark.read.format("synthetic_ledger").option("n", …)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ledger"

    def schema(self) -> str:
        return "entry_id BIGINT, user_id BIGINT, amount_cents BIGINT"

    def reader(self, schema) -> LedgerReader:
        return LedgerReader(self.options)

    def simpleStreamReader(self, schema) -> LedgerStreamReader:
        return LedgerStreamReader(self.options)


def register_ledger_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom format."""
    from ..operators._helpers import register_pyds
    register_pyds(spark, LedgerDataSource)


# The oracle-side regeneration of the same ledger, for graded queries.
def ledger_oracle_cte(n: int) -> str:
    return f"""
  SELECT i AS entry_id,
         (i * {_USER_MULT}) % {_N_USERS} AS user_id,
         (i * {_AMT_MULT}) % {_AMT_MOD} AS amount_cents
  FROM generate_series(0, {n - 1}) t(i)
"""
