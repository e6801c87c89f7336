"""Semantics cross-checks for the round-9 tag twins.

Each graded twin already has a DuckDB oracle (cross-ENGINE agreement)
and a golden snapshot; these tests add cross-FORMULATION agreement —
an independent Spark expression of the same semantics must produce the
identical frame — plus the structural facts a wrong implementation
would break (lattice consistency, sink-fidelity membership, grid
soundness vs brute force). Everything runs at sf0.001 so the module
stays fast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_a56_matches_unioned_groupbys(spark):
    """GROUPING SETS ((a,b),(a),(b)) == the UNION ALL of three plain
    groupBys with hand-assigned grouping_id bits (a,b)->0, (a)->1,
    (b)->2, HAVING applied after the union."""
    _ensure_loaded()
    twin = REGISTRY["a56_margin_lattice_contract"].fn(spark, SF)
    li = load_table(spark, SF, "lineitem")

    def leg(keys, lvl):
        g = li.groupBy(*keys).agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
            F.countDistinct("l_partkey").alias("n_exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_approx"),
        )
        for missing in {"l_returnflag", "l_linestatus"} - set(keys):
            g = g.withColumn(missing, F.lit(None).cast("string"))
        return g.select(
            "l_returnflag",
            "l_linestatus",
            F.lit(lvl).cast("bigint").alias("lvl"),
            "n_items",
            "total_qty",
            "revenue_cents",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.col("n_exact") * 0.05
            ).alias("hll_within_5pct"),
        )

    built = (
        leg(["l_returnflag", "l_linestatus"], 0)
        .unionAll(leg(["l_returnflag"], 1))
        .unionAll(leg(["l_linestatus"], 2))
        .filter(F.col("n_items") >= 50)
    )
    assert _rows(twin) == _rows(built)


def test_o11_membership_matches_handoff_free_formulation(spark):
    """The JSON exchange file must be lossless: the same set chain with
    NO sink roundtrip yields the identical (nation, band) frame."""
    _ensure_loaded()
    twin = REGISTRY["o11_supplier_roster_exchange"].fn(spark, SF)
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier")
    returners = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    rich = sup.filter(F.col("s_acctbal") >= 3000.0).select(
        F.col("s_suppkey").alias("sk")
    )
    act95 = (
        li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select(F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    taxfree = (
        li.filter(F.col("l_tax") == 0.0)
        .select(F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    roster = returners.union(rich).distinct().intersect(act95).subtract(taxfree)
    pairs = (
        roster.join(sup, roster.sk == sup.s_suppkey)
        .select(
            F.col("s_nationkey").alias("nationkey"),
            F.when(F.col("s_acctbal") >= 5000.0, F.lit("high"))
            .otherwise(F.lit("base"))
            .alias("band"),
        )
        .distinct()
        .orderBy("nationkey", "band")
    )
    assert [tuple(r) for r in twin.collect()] == [tuple(r) for r in pairs.collect()]


def test_p12_matches_sql_text_formulation(spark):
    """The column-per-stage shaping == the same expressions written as
    one spark.sql SELECT (independent parse path)."""
    _ensure_loaded()
    twin = REGISTRY["p12_customer_profile_shaping"].fn(spark, SF)
    load_table(spark, SF, "customer").createOrReplaceTempView("p12t_customer")
    alt = spark.sql(
        r"""
        SELECT c_custkey AS customer_key,
               upper(c_name) AS display_name,
               TRY_CAST(regexp_extract(c_name, '(\\d+)$', 1) AS BIGINT)
                 AS cust_num,
               CASE
                 WHEN c_mktsegment RLIKE '^(AUTO|MACH)' THEN 'industrial'
                 WHEN c_mktsegment RLIKE 'HOLD$' THEN 'consumer'
                 ELSE 'commercial'
               END AS seg_class,
               CASE c_mktsegment
                 WHEN 'BUILDING' THEN 'b2b'
                 WHEN 'FURNITURE' THEN 'b2b'
                 WHEN 'HOUSEHOLD' THEN 'b2c'
                 ELSE 'mixed'
               END AS channel,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM p12t_customer WHERE c_custkey < 400
        """
    )
    assert _rows(twin) == _rows(alt)


def test_f28_matches_flat_conditional_formulation(spark):
    """The map-combinator pipeline == the flat conditional-aggregation
    recompute (no maps anywhere)."""
    _ensure_loaded()
    twin = REGISTRY["f28_type_map_combinators"].fn(spark, SF)
    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 120)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    per_type = (
        ev.select("user_id", "event_type", k.alias("k"))
        .groupBy("user_id", "event_type")
        .agg(F.sum("k").alias("ksum"), F.count("*").alias("n"))
    )
    alt = per_type.groupBy("user_id").agg(
        F.count("*").cast("int").alias("n_types"),
        F.sum("ksum").alias("k_total"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("event_type") == "click",
                    F.expr("ksum div n"),
                )
            ),
            F.lit(-1).cast("bigint"),
        ).alias("click_mean_floor"),
        F.coalesce(
            F.max(F.when(F.col("event_type") == "error", F.col("n"))),
            F.lit(-1).cast("bigint"),
        ).alias("n_errors"),
    )
    assert _rows(twin) == _rows(alt)


def test_j18_matches_brute_force_distance_join(spark):
    """The 3x3 grid-bucketed EXISTS == the brute-force cross-join
    distance test (tractable at sf0.001), so the bucketing neither
    drops nor duplicates near-boundary members."""
    _ensure_loaded()
    twin = REGISTRY["j18_depot_proximity_semi"].fn(spark, SF)
    cust = load_table(spark, SF, "customer")
    sup = load_table(spark, SF, "supplier")
    li = load_table(spark, SF, "lineitem")
    active = sup.join(
        li.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45.0)
        ).select("l_suppkey"),
        sup.s_suppkey == F.col("l_suppkey"),
        "left_semi",
    ).select(
        ((F.col("s_suppkey") % 140) * 0.5 - 35.0).alias("d_lat"),
        ((F.col("s_suppkey") * 7 % 280) * 0.5 - 70.0).alias("d_lon"),
    )
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        "c_mktsegment",
        "c_acctbal",
        ((F.col("c_custkey") % 170) * 0.5 - 42.0).alias("lat"),
        ((F.col("c_custkey") % 355) * 0.5 - 88.0).alias("lon"),
    )
    dx = F.col("lat") - F.col("d_lat")
    dy = F.col("lon") - F.col("d_lon")
    brute_members = (
        pts.crossJoin(active)
        .filter(F.sqrt(dx * dx + dy * dy) <= 0.7)
        .select("id", "c_mktsegment", "c_acctbal")
        .distinct()
    )
    brute = brute_members.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_near"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("bal_cents"),
    )
    assert _rows(twin) == _rows(brute)


def test_u17_matches_builtin_formulation(spark):
    """UDTF fan-out + scalar-UDF key + pandas median == posexplode +
    builtin expressions + percentile(0.5) (linear-interpolated median
    is the same midpoint rule pandas uses)."""
    _ensure_loaded()
    twin = REGISTRY["u17_udtf_keyed_median_chain"].fn(spark, SF)
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 150)
    words = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.concat(
                F.substring(F.lower("word"), 1, 1),
                F.least(F.length("word"), F.lit(6)).cast("string"),
            ).alias("shape_key"),
        )
    )
    alt = words.groupBy("shape_key").agg(
        F.expr("CAST(percentile(pos, 0.5) AS DOUBLE)").alias("median_pos"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_words"),
    )
    assert _rows(twin) == _rows(alt)


def test_st35_emission_cutoff_is_sound(spark):
    """Every emitted daily window ends at or before the final
    watermark, window starts are UTC midnights, and the emitted rows
    equal a date_trunc formulation under the same cutoff."""
    _ensure_loaded()
    twin = REGISTRY["st35_emitted_daily_priorities"].fn(spark, SF)
    orders = load_table(spark, SF, "orders")
    jitter = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(48271)) % 1800
    arrival = F.col("o_orderdate") + F.make_dt_interval(secs=jitter.cast("double"))
    hi = orders.agg(
        (F.max(arrival) - F.expr("INTERVAL 30 MINUTES")).alias("hi")
    ).collect()[0][0]
    rows = twin.collect()
    assert rows, "emission set must be non-empty at sf0.001"
    from datetime import timedelta

    for r in rows:
        assert r.window_start + timedelta(days=1) <= hi
        assert (
            r.window_start.hour == 0
            and r.window_start.minute == 0
            and r.window_start.second == 0
        )
    alt = (
        orders.select(
            F.date_trunc("DAY", "o_orderdate").alias("window_start"),
            "o_orderpriority",
            "o_totalprice",
        )
        .filter(
            F.col("window_start") + F.expr("INTERVAL 1 DAY") <= F.lit(hi)
        )
        .groupBy("window_start", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
            .alias("revenue"),
        )
    )
    assert _rows(twin) == _rows(alt)


def test_st36_matches_min_by_formulation(spark):
    """Keep-first per (user, day) via the rank window == min_by over
    the packed (ts, event_id) arrival key."""
    _ensure_loaded()
    twin = REGISTRY["st36_daily_first_touch"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    arrival = F.struct(F.col("ts"), F.col("event_id"))
    firsts = events.groupBy(
        "user_id", F.to_date("ts").cast("timestamp").alias("day")
    ).agg(F.min_by("value", arrival).alias("value"))
    alt = (
        firsts.join(F.broadcast(cust), firsts.user_id + 1 == cust.c_custkey)
        .groupBy("day", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_first_touches"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
    )
    assert _rows(twin) == _rows(alt)


def test_st37_matches_driver_side_replay(spark):
    """The lag + prefix-sum run-length formulation == a literal
    per-user state-machine replay (the applyInPandasWithState image),
    run driver-side over the sf0.001 events (1000 rows — test-only
    materialization, not an operator)."""
    _ensure_loaded()
    twin = REGISTRY["st37_type_streak_state"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    rows = sorted(
        events.select("user_id", "event_type", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    state: dict[int, list] = {}  # uid -> [last_type, run, best, n, n_runs]
    for r in rows:
        s = state.setdefault(r.user_id, [None, 0, 0, 0, 0])
        if r.event_type == s[0]:
            s[1] += 1
        else:
            s[0] = r.event_type
            s[1] = 1
            s[4] += 1
        s[2] = max(s[2], s[1])
        s[3] += 1
    expected = sorted(
        (uid, s[3], s[4], s[2]) for uid, s in state.items()
    )
    got = sorted(tuple(r) for r in twin.collect())
    assert got == expected
