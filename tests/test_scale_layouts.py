"""Storage-layout scale evidence (SURVEY.md §4.3): bucketed co-located
joins skip their shuffle; hive-partitioned layouts prune at the source.
Since round 2 the graded registry carries the same layouts as
d1_partition_pruned_scan / d2_bucketed_colocated_join (they write to
tempdirs per call); these tests pin the PLAN properties — pruned
PartitionFilters, exchange-free bucket join — that the value-level
oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.plans import plan_string
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF = "/root/testdata/sf0.001"


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Both sides bucketed+sorted on the join key ⇒ SortMergeJoin with
    no Exchange — the co-location that replaces per-query shuffles of
    a 100 TB fact table with a one-time layout cost."""
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) under unique names and are dropped afterwards.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, SF, "orders").write.bucketBy(4, "o_custkey").sortBy(
            "o_custkey"
        ).mode("overwrite").saveAsTable("orders_b")
        load_table(spark, SF, "customer").write.bucketBy(4, "c_custkey").sortBy(
            "c_custkey"
        ).mode("overwrite").saveAsTable("customer_b")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the join still produces every order row
        assert joined.count() == load_table(spark, SF, "orders").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partition_pruning_reads_one_day(spark, tmp_path):
    """Events written date-partitioned; a one-day filter must prune at
    planning time (PartitionFilters), not post-scan."""
    out = str(tmp_path / "events_parts")
    events = load_table(spark, SF, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    events.write.partitionBy("event_date").mode("overwrite").parquet(out)
    one_day = events.select(F.min(F.to_date("ts"))).collect()[0][0]
    df = spark.read.parquet(out).filter(F.col("event_date") == F.lit(one_day))
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    assert str(one_day) in plan or "event_date" in plan
    want = events.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert df.count() == want
    # pruning proof: scanned row count equals the single day's rows
    scanned = spark.read.parquet(out).filter(
        F.col("event_date") == F.lit(one_day)
    )
    assert scanned.count() == want


def test_d1_graded_query_prunes_partitions(spark):
    df = REGISTRY["d1_partition_pruned_scan"].fn(spark, SF)
    plan = plan_string(df)
    # the year filter must resolve to directory pruning, not a row filter
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]


def test_d2_graded_query_joins_without_exchange(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["d2_bucketed_colocated_join"].fn(spark, SF)
        plan = plan_string(df)
        assert "SortMergeJoin" in plan
        # the aggregation above the join may exchange on the group key;
        # the JOIN inputs must not — in the plan TREE (the part before
        # the node details), no Exchange may appear below the join node.
        tree = plan.split("\n\n", 1)[0].splitlines()
        join_line = next(i for i, l in enumerate(tree) if "SortMergeJoin" in l)
        assert not any("Exchange" in l for l in tree[join_line + 1 :]), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_zorder_layout_clusters_both_dims(spark, tmp_path):
    """Writing files in z-key order bounds every file's bounding box in
    BOTH grid dimensions, so min/max file stats can prune a filter on
    EITHER dim. A 1-D gy-sorted layout is perfect for gy filters and
    useless for gx filters (every file spans the full gx extent). The
    metric is the expected number of files a uniform single-dimension
    point filter must read: z-order beats the 1-D layout on the
    worst-case dimension AND on the two-dimension average.

    The grid here is decorrelated via multiplicative mixing (the
    fixture's f9 grid has gcd-induced gx↔gy correlation that would
    flatter the 1-D layout); the graded d3_zorder_curve keeps the f9
    grid, whose per-z-block tile bound is asserted at the end.
    """
    from data_wrangling_openstreetmap_spark.operators.scale import d3_zorder_curve

    sf = "/root/testdata/sf0.01"  # sf0.001 keys stay under one grid wrap
    cust = load_table(spark, sf, "customer")
    key = F.col("c_custkey")
    pts = cust.select(
        "c_custkey",
        ((key * 2654435761) % 256).alias("gx"),
        ((key * 40503 + 7) % 256).alias("gy"),
    )
    zkey = None
    for i in range(8):
        for col, off in (("gx", 0), ("gy", 1)):
            term = F.shiftleft(
                F.shiftright(F.col(col), i).bitwiseAND(F.lit(1)), 2 * i + off
            )
            zkey = term if zkey is None else zkey + term
    z = pts.withColumn("zkey", zkey.cast("long"))

    def expected_files_read(sort_col, out):
        """Per dimension: sum over files of (span+1)/256 = expected
        files a uniform random point filter on that dim reads."""
        (
            z.repartitionByRange(16, F.col(sort_col))
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .parquet(str(out))
        )
        back = spark.read.parquet(str(out)).withColumn(
            "file", F.input_file_name()
        )
        spans = (
            back.groupBy("file")
            .agg(
                (F.max("gx") - F.min("gx")).alias("sx"),
                (F.max("gy") - F.min("gy")).alias("sy"),
            )
            .collect()
        )
        ex = sum((r.sx + 1) / 256 for r in spans)
        ey = sum((r.sy + 1) / 256 for r in spans)
        return ex, ey

    zx, zy = expected_files_read("zkey", tmp_path / "zsorted")
    lx, ly = expected_files_read("gy", tmp_path / "gysorted")

    # 1-D layout: near-perfect on gy, near-total scan on gx.
    assert ly < 2.0 and lx > 12.0, (lx, ly)
    # z-order: bounded on BOTH dims — worst dim far better than the
    # 1-D layout's worst dim, and better on the two-dim average.
    assert max(zx, zy) < lx / 2, (zx, zy, lx)
    assert (zx + zy) / 2 < (lx + ly) / 2, (zx, zy, lx, ly)

    # And the graded query's own tile claim: a 1024-aligned z-range is
    # a 32x32 tile, whatever the data distribution.
    graded = d3_zorder_curve(spark, sf).collect()
    assert all(r.span_x <= 31 and r.span_y <= 31 for r in graded)


def test_cbo_uses_analyzed_stats_for_join_strategy(spark):
    """Cost-based decisions at 100 TB come from ANALYZE TABLE stats,
    not file sizes: a catalog table with computed statistics reports
    its row count / size to the optimizer, and the join side whose
    STATS (not its on-disk footprint) fit under
    autoBroadcastJoinThreshold is the one that broadcasts."""
    from data_wrangling_openstreetmap_spark.io import load_table
    from data_wrangling_openstreetmap_spark.plans import plan_string

    load_table(spark, SF, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats"
    )
    load_table(spark, SF, "orders").write.mode("overwrite").saveAsTable(
        "orders_stats"
    )
    try:
        spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE orders_stats COMPUTE STATISTICS")
        stats = spark.sql("DESCRIBE EXTENDED nation_stats").filter(
            "col_name = 'Statistics'"
        ).collect()
        assert stats and "rows" in stats[0].data_type  # stats recorded
        j = spark.table("orders_stats").join(
            spark.table("nation_stats"),
            spark.table("orders_stats").o_custkey % 25
            == spark.table("nation_stats").n_nationkey,
        )
        plan = plan_string(j)
        # the 25-row analyzed dimension broadcasts; the fact side doesn't
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats")
        spark.sql("DROP TABLE IF EXISTS orders_stats")


def test_small_file_compaction_preserves_data_and_cuts_files(spark, tmp_path):
    """The 100 TB maintenance op nobody skips: a streaming or
    per-partition writer leaves hundreds of tiny files whose per-file
    open/footer cost dominates scans; periodic compaction rewrites
    them into ~one-wave-sized files. Contract: file count collapses,
    bytes shrink-or-hold (shared dictionaries/footers), and the data
    is bit-identical."""
    import glob

    from data_wrangling_openstreetmap_spark.io import load_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, SF, "orders")
    orders.repartition(40).write.mode("overwrite").parquet(src)  # simulate drip writes
    n_small = len(glob.glob(f"{src}/*.parquet"))
    assert n_small == 40

    frag = spark.read.parquet(src)
    frag.coalesce(2).write.mode("overwrite").parquet(dst)  # compaction pass
    n_big = len(glob.glob(f"{dst}/*.parquet"))
    assert n_big == 2

    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: a heavy-hitter key funneling most rows into one
    shuffle partition is split at runtime (the automatic counterpart of
    j1_salted_skew_join's hand salting). Thresholds are lowered because
    the micro-fixture is KBs, not the 256 MB production default — the
    mechanism, not the trigger point, is what 100 TB inherits. Asserts
    the executed plan marks the join skew-handled AND the result is
    exactly the unskewed-join image."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # key 0 owns 90% of the fact side — one hot shuffle partition
        fact = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 97).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k")
        # collect() (not count()) so THIS df's own query execution runs —
        # count compiles a separate plan and the df would still explain
        # as isFinalPlan=false
        n = len(joined.collect())
        plan = plan_string(joined, mode="simple")
        assert "skew=true" in plan, plan
        # semantics unchanged by the split
        assert n == 20000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_results_identical_under_forced_spill(spark):
    """Spill-awareness: window and aggregation operators must produce
    IDENTICAL results when their in-memory buffers overflow to disk —
    at 100 TB every one of these operators spills routinely, and a
    spill path that changed results would be a silent corruption local
    tests never see. Thresholds forced to 1 row so every buffer takes
    the spill path; q3's window top-k, q1's aggregate, and j7's as-of
    carry-forward must match their in-memory images row for row."""
    spill_confs = {
        "spark.sql.windowExecBufferSpillThreshold": "1",
        "spark.sql.windowExecBufferInMemoryThreshold": "1",
        "spark.sql.sortMergeJoinExecBufferSpillThreshold": "1",
        "spark.sql.sortMergeJoinExecBufferInMemoryThreshold": "1",
        "spark.sql.cartesianProductExecBufferSpillThreshold": "1",
    }
    names = ["q3_topk_window", "q1_pricing_summary", "j7_asof_join"]
    before = {
        n: sorted(map(tuple, REGISTRY[n].fn(spark, SF).collect())) for n in names
    }
    old = {k: spark.conf.get(k, None) for k in spill_confs}
    try:
        for k, v in spill_confs.items():
            spark.conf.set(k, v)
        for n in names:
            spilled = sorted(map(tuple, REGISTRY[n].fn(spark, SF).collect()))
            assert spilled == before[n], f"{n}: results changed under spill"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_small_file_compaction_preserves_content(spark, tmp_path):
    """The small-files problem and its fix: a fragmented write (64
    splinter files) compacts to a bounded file count via repartition +
    maxRecordsPerFile, with byte-identical content. At 100 TB this is
    the nightly table-maintenance job — footer/open overhead per file
    makes thousand-splinter partitions slower to SCAN than to rewrite.
    """
    import glob

    src = load_table(spark, SF, "orders")
    frag_dir = str(tmp_path / "fragmented")
    src.repartition(64).write.mode("overwrite").parquet(frag_dir)
    n_frag = len(glob.glob(frag_dir + "/part-*.parquet"))
    assert n_frag == 64  # the pathology is real

    compact_dir = str(tmp_path / "compacted")
    (
        spark.read.parquet(frag_dir)
        .repartition(4)
        .write.option("maxRecordsPerFile", 500_000)
        .mode("overwrite")
        .parquet(compact_dir)
    )
    n_compact = len(glob.glob(compact_dir + "/part-*.parquet"))
    assert n_compact <= 4

    a = sorted(tuple(r) for r in spark.read.parquet(compact_dir).collect())
    b = sorted(tuple(r) for r in src.collect())
    assert a == b


def test_parquet_codec_matrix_roundtrips(spark, tmp_path):
    """Compression is a storage knob, not a semantics knob: the same
    frame written under snappy / gzip / zstd must read back identical
    (100 TB fleets mix codecs across table generations — readers must
    not care)."""
    from data_wrangling_openstreetmap_spark.io import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    want = sorted(tuple(r) for r in src.collect())
    for codec in ("snappy", "gzip", "zstd"):
        path = str(tmp_path / f"nation_{codec}")
        src.write.mode("overwrite").option("compression", codec).parquet(path)
        got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert got == want, f"codec {codec} corrupted the roundtrip"


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """The incremental-reprocess pattern at 100 TB: rewriting one
    lang's slice under dynamic partitionOverwriteMode must replace
    ONLY that partition — static mode would silently truncate every
    other lang."""
    from data_wrangling_openstreetmap_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(path)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    target = sorted(langs)[0]
    patched = docs.filter(F.col("lang") == target).withColumn(
        "n_chars", F.col("n_chars") + 1
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched.write.mode("overwrite").partitionBy("lang").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    got = spark.read.parquet(path)
    want = docs.withColumn(
        "n_chars",
        F.when(F.col("lang") == target, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    assert sorted(tuple(r) for r in got.select("doc_id", "lang", "n_chars").collect()) == \
        sorted(tuple(r) for r in want.collect())


def test_analyze_table_feeds_cbo_statistics(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS must surface rowCount/sizeInBytes
    to the cost-based optimizer — at 100 TB, stats-driven join planning
    (broadcast decisions, join reordering) is the difference between a
    plan and a guess. Pins that the engine integration actually records
    and exposes the numbers."""
    import contextlib
    import io

    from data_wrangling_openstreetmap_spark.io import load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    nation.write.saveAsTable("cbo_nation")
    try:
        spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
        stats = spark.sql("DESCRIBE EXTENDED cbo_nation").filter(
            "col_name = 'Statistics'"
        ).collect()
        assert stats and "rows" in stats[0].data_type, stats
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spark.table("cbo_nation").explain("cost")
            assert "rowCount=" in buf.getvalue(), "CBO saw no row stats"
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_recursive_lookup_and_glob_filter_discovery(spark, tmp_path):
    """File discovery knobs a 100 TB lake lives by: recursiveFileLookup
    must find nested non-partition layouts, and pathGlobFilter must
    prune files by name BEFORE any read — both without touching row
    content."""
    from data_wrangling_openstreetmap_spark.io import load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    base = tmp_path / "lake"
    for sub, rows in (("a/day1", 10), ("a/day2", 7), ("b/deep/day3", 8)):
        nation.limit(rows).write.parquet(str(base / sub / "part"))
    got = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(base))
    )
    assert got.count() == 25
    # a valid parquet data file under a NON-matching name: included
    # without the glob, pruned with it — so the filter assertion can't
    # pass vacuously if the option were silently ignored.
    import shutil

    a_day1 = base / "a" / "day1" / "part"
    src_part = next(p for p in a_day1.iterdir() if p.suffix == ".parquet")
    shutil.copyfile(src_part, base / "a" / "extra.dat")
    unfiltered = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(str(base / "a"))
    )
    assert unfiltered.count() == 27  # 17 + the 10-row .dat copy
    only_parquet = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(base / "a"))
    )
    assert only_parquet.count() == 17


def test_ignore_corrupt_files_skips_garbage(spark, tmp_path):
    """A 100 TB lake always contains a few truncated/garbage files;
    ignoreCorruptFiles must skip them and keep the good rows (and the
    default must FAIL loudly, not silently drop)."""
    import pytest as _pytest

    from data_wrangling_openstreetmap_spark.io import load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = tmp_path / "mixed"
    nation.write.parquet(str(path))
    (path / "zzz-corrupt.parquet").write_bytes(b"PAR1 this is not a parquet file")
    good = nation.count()
    got = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(str(path)).count()
    )
    assert got == good
    with _pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(
            str(path)
        ).count()
