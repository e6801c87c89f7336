"""Concurrency stress for the round-11 threaded-suite machinery
(VERDICT r11 §Next 5).

The parity/golden thread pool is load-bearing (suite 19:48 → 13:46)
and already surfaced one real PySpark hazard: JVM
``getActiveSession`` is THREAD-LOCAL under py4j pinned threads, so a
worker thread without an explicit bind cannot resolve Python
DataSource lookups (DATA_SOURCE_NOT_FOUND immediately after its own
registration). The production fix is ``_bind_active_session`` +
``_helpers.register_pyds`` (process lock + per-session memo).

This test hammers exactly that racy surface — concurrent FIRST-TIME
Python DataSource registrations (the memo is cleared each round, so
every round re-races the cloudpickle registerPython path) plus
embedded-Derby catalog DDL — 10 rounds × 6 workers, so a future Spark
upgrade that changes thread-local or registry behavior fails loudly
here instead of flaking the 490-query suite.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from data_wrangling_openstreetmap_spark.operators import _helpers as H
from data_wrangling_openstreetmap_spark.operators.relational import (
    JsonlSinkDataSource,
    SynthPushdownDataSource,
    SynthTelemetryDataSource,
)
from data_wrangling_openstreetmap_spark.sources.pyds import LedgerDataSource
from tests.test_oracle_parity import _bind_active_session

ROUNDS = 10
WORKERS = 6
READ_SOURCES = (
    (SynthTelemetryDataSource, {"partitions": 1, "rowsPerPartition": 3}),
    (SynthPushdownDataSource, {"partitions": 1, "rowsPerPartition": 3}),
    (LedgerDataSource, {"n": 3}),
)


def _register_and_read(spark, cls, opts):
    """First-time registration then an immediate lookup THROUGH the
    registry (the exact sequence that failed un-locked in round 11)."""
    H.register_pyds(spark, cls)
    df = spark.read.format(cls.name()).options(**opts).load()
    assert len(df.limit(3).collect()) >= 1


def _register_and_sink(spark, tmpdir):
    """The round-11 failure was observed on THIS sink's write path:
    DataFrameWriter.save resolves the Python source registry through
    the thread-local active session."""
    H.register_pyds(spark, JsonlSinkDataSource)
    path = f"{tmpdir}/sink"
    (
        spark.range(3)
        .selectExpr("id AS a")
        .write.format(JsonlSinkDataSource.name())
        .option("path", path)
        .mode("append")
        .save()
    )
    back = spark.read.schema("a bigint").json(path + "/*.jsonl")
    assert back.count() == 3


def _catalog_ddl(spark, table):
    """Embedded-Derby DDL — the one shared mutable catalog resource."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"CREATE TABLE {table} AS SELECT 1 AS v")
    try:
        assert spark.table(table).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_concurrent_asof_lowering_no_crosswire(spark):
    """Round-12 regression, found by the threaded suite itself: the
    extended-SQL ASOF lowering materialized its rewritten query through
    a temp view named only by the query's ALIASES (__asof_p_c) — shared
    by x1_asof_sql (inner) and x1b_asof_left_sql (left). Two workers
    constructing them concurrently could cross-wire the join mode
    inside the create-view→spark.sql window (observed: x1b returned
    x1's 178 inner rows against its 202-row left oracle). The fix is a
    per-invocation unique view name; this hammers the exact interleave
    10×."""
    from data_wrangling_openstreetmap_spark.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    want = {
        name: sorted(tuple(r) for r in REGISTRY[name].fn(spark, sf).collect())
        for name in ("x1_asof_sql", "x1b_asof_left_sql")
    }
    assert len(want["x1_asof_sql"]) != len(want["x1b_asof_left_sql"])

    def build_and_collect(name):
        _bind_active_session(spark)
        df = REGISTRY[name].fn(spark, sf)
        return sorted(tuple(r) for r in df.collect())

    for _ in range(10):
        with ThreadPoolExecutor(max_workers=2) as ex:
            futs = {
                name: ex.submit(build_and_collect, name) for name in want
            }
            for name, f in futs.items():
                assert f.result() == want[name], f"{name} cross-wired"


def test_concurrent_pyds_and_catalog_stress(spark, tmp_path):
    # s28's production prerequisite (session-global, set once there too)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for rnd in range(ROUNDS):
        # Re-race first-time registration: drop the memo, keep the lock.
        with H._PYDS_LOCK:
            H._PYDS_DONE.clear()
        with ThreadPoolExecutor(
            max_workers=WORKERS,
            initializer=_bind_active_session,
            initargs=(spark,),
        ) as ex:
            futs = [
                ex.submit(_register_and_read, spark, cls, opts)
                for cls, opts in READ_SOURCES
            ]
            futs.append(
                ex.submit(_register_and_sink, spark, f"{tmp_path}/r{rnd}")
            )
            futs += [
                ex.submit(_catalog_ddl, spark, f"stress_r{rnd}_w{w}")
                for w in range(2)
            ]
            for f in futs:
                f.result()  # raises on any worker failure
