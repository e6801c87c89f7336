"""Source/sink format coverage beyond parquet (SURVEY.md §2.1): ORC,
header CSV with declared schema, and line-delimited JSON each roundtrip
the same rows. The OSM demo covers CSV/JSON on wrangled output; this
pins the star schema itself through each format."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, tmp_path):
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    """CSV is schemaless — the read side must declare types (the
    reference's csv.DictWriter + cerberus-style validation analog)."""
    src = load_table(spark, SF, "region")
    path = str(tmp_path / "region_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(
        "r_regionkey int, r_name string"
    ).csv(path)
    assert _canon(back) == _canon(src)


def test_json_roundtrip_preserves_nested_structs(spark, tmp_path):
    nested = load_table(spark, SF, "customer").select(
        "c_custkey",
        F.struct("c_name", "c_acctbal").alias("profile"),
        F.array("c_nationkey").alias("keys"),
    )
    path = str(tmp_path / "cust_json")
    nested.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    got = {
        r.c_custkey: (r.profile.c_name, r.profile.c_acctbal, tuple(r.keys))
        for r in back.collect()
    }
    want = {
        r.c_custkey: (r.profile.c_name, r.profile.c_acctbal, tuple(r.keys))
        for r in nested.collect()
    }
    assert got == want


def test_python_datasource_batch_partitions(spark):
    """The custom Python source plans the requested number of input
    partitions and every row matches the arithmetic ground truth."""
    from data_wrangling_openstreetmap_spark.sources.pyds import (
        _ledger_row,
        register_ledger_source,
    )

    register_ledger_source(spark)
    df = (
        spark.read.format("synthetic_ledger")
        .option("n", 1000)
        .option("parts", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert _canon(df) == sorted(_ledger_row(i) for i in range(1000))


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """The simpleStreamReader form of the same source drains the full
    ledger through micro-batches (offset bookkeeping included) and
    converges to the batch read exactly."""
    from data_wrangling_openstreetmap_spark.sources.pyds import (
        _ledger_row,
        register_ledger_source,
    )

    register_ledger_source(spark)
    stream = (
        spark.readStream.format("synthetic_ledger")
        .option("n", 500)
        .option("batchsize", 123)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sink_pyds_ledger")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _canon(spark.table("sink_pyds_ledger"))
    assert got == sorted(_ledger_row(i) for i in range(500))


def test_python_datasource_empty_ledger(spark):
    """n=0 must read as an empty frame (one empty planned split), not a
    partition-planning error."""
    from data_wrangling_openstreetmap_spark.sources.pyds import register_ledger_source

    register_ledger_source(spark)
    df = spark.read.format("synthetic_ledger").option("n", 0).load()
    assert df.count() == 0


def test_csv_parse_mode_matrix(spark, tmp_path):
    """The three malformed-row policies behave as documented on one
    corrupt file: PERMISSIVE null-fills and keeps every row,
    DROPMALFORMED silently drops the bad ones, FAILFAST raises —
    p7's quarantine query builds on the first; this pins all three."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    path = tmp_path / "corrupt.csv"
    path.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    schema = "id int, qty int"

    permissive = spark.read.schema(schema).option("header", True).csv(str(path))
    rows = {r.id: r.qty for r in permissive.collect()}
    assert rows == {1: 10, 2: None, 3: 30}

    dropped = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(path))
    )
    assert {r.id for r in dropped.collect()} == {1, 3}

    with _pytest.raises((PySparkException, Py4JJavaError)):
        (
            spark.read.schema(schema)
            .option("header", True)
            .option("mode", "FAILFAST")
            .csv(str(path))
            .collect()
        )


def test_s28_reader_prunes_partitions_and_clamps_reads():
    """The pushdown reader's planning contract, tested at the class
    level (the end-to-end values are oracle-graded): absorbed seq
    bounds prune InputPartitions and clamp generators; non-seq filters
    come back for Spark to evaluate."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from data_wrangling_openstreetmap_spark.operators.relational import (
        _SynthPushdownReader,
    )

    r = _SynthPushdownReader({"partitions": "8", "rowsperpartition": "12500"})
    remaining = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("seq",), 30000),
                LessThan(("seq",), 70000),
                EqualTo(("status",), "ok"),
            ]
        )
    )
    # only the status filter returns to Spark
    assert [type(f).__name__ for f in remaining] == ["EqualTo"]
    # partitions 0-1 and 6-7 pruned (ranges disjoint from [30000, 69999])
    assert [p.value for p in r.partitions()] == [2, 3, 4, 5]
    # the edge partitions clamp their generators to the bounds
    first = [row[0] for row in r.read(type("P", (), {"value": 2})())]
    assert first[0] == 30000 and first[-1] == 37499
    last = [row[0] for row in r.read(type("P", (), {"value": 5})())]
    assert last[0] == 62500 and last[-1] == 69999
