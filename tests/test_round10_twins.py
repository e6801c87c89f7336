"""Semantics cross-checks for the round-10 tag twins.

Each graded twin already has a DuckDB oracle (cross-ENGINE agreement)
and a golden snapshot; these tests add cross-FORMULATION agreement —
an independent Spark expression of the same semantics must produce the
identical frame — plus the structural facts a wrong implementation
would break (bag-semantics counts, relay fidelity, cube/union lattice
equality, composition-order invariance). Everything runs at sf0.001 so
the module stays fast.
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


def test_o12_matches_flat_conditional_formulation(spark):
    """The set-algebra chain == one flat per-user conditional profile:
    cohort membership is (has signup OR purchase) AND (has click OR
    view) AND NOT (errors > purchases); n_touch = clicks + views —
    UNION ALL's bag semantics recomputed as a sum of two counts."""
    _ensure_loaded()
    twin = REGISTRY["o12_channel_ledger"].fn(spark, SF)
    ev = load_table(spark, SF, "events")

    def n(etype):
        return F.sum(F.when(F.col("event_type") == etype, 1).otherwise(0))

    prof = ev.groupBy("user_id").agg(
        n("click").alias("nc"),
        n("view").alias("nv"),
        n("signup").alias("ns"),
        n("purchase").alias("np"),
        n("error").alias("ne"),
    )
    flat = (
        prof.filter(
            ((F.col("ns") > 0) | (F.col("np") > 0))
            & ((F.col("nc") > 0) | (F.col("nv") > 0))
            & ~(F.col("ne") > F.col("np"))
        )
        .select("user_id", (F.col("nc") + F.col("nv")).alias("n_touch"))
    )
    assert _rows(twin) == _rows(flat)


def test_s13_relay_matches_direct_aggregation(spark):
    """The four-hop sink relay must be lossless: aggregating the
    joined ORIGINALS (no sinks anywhere) yields the identical frame."""
    _ensure_loaded()
    twin = REGISTRY["s13_sink_relay"].fn(spark, SF)
    nation = load_table(spark, SF, "nation")
    region = load_table(spark, SF, "region")
    direct = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )
    assert _rows(twin) == _rows(direct)


def test_p13_matches_sql_text_formulation(spark):
    """The DataFrame shaping == the same logic written as SQL text
    (independent parse path, same table)."""
    _ensure_loaded()
    twin = REGISTRY["p13_part_shaping"].fn(spark, SF)
    load_table(spark, SF, "part").createOrReplaceTempView("p13_part")
    sql = spark.sql(
        """
        SELECT p_partkey AS part_key,
               upper(p_name) AS display_name,
               CASE WHEN p_name RLIKE '^(red|hot)' THEN 'warm'
                    WHEN p_name RLIKE '^(blue|cold)' THEN 'cool'
                    ELSE 'neutral' END AS tone,
               regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
               CASE p_type WHEN 'ECONOMY' THEN 'eco'
                           WHEN 'SMALL' THEN 'compact'
                           WHEN 'STANDARD' THEN 'std'
                           ELSE 'other' END AS tier,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM p13_part WHERE p_partkey % 3 = 0
        """
    )
    assert _rows(twin) == _rows(sql)


def test_a57_matches_unioned_groupbys(spark):
    """CUBE(a,b) == UNION ALL of the four plain groupBys with
    hand-assigned grouping_id bits, the modal month joined the same
    null-safe way."""
    _ensure_loaded()
    twin = REGISTRY["a57_priority_cube_modes"].fn(spark, SF)
    orders = load_table(spark, SF, "orders")

    def leg(keys, lvl):
        g = orders.groupBy(*keys).agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
            .alias("revenue"),
            F.countDistinct("o_custkey").alias("n_cust_exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_approx"),
        )
        for missing in {"o_orderpriority", "o_orderstatus"} - set(keys):
            g = g.withColumn(missing, F.lit(None).cast("string"))
        return g.select(
            "o_orderpriority",
            "o_orderstatus",
            F.lit(lvl).cast("bigint").alias("lvl"),
            "n_orders",
            "revenue",
            "n_cust_exact",
            "n_approx",
        )

    lattice = (
        leg(["o_orderpriority", "o_orderstatus"], 0)
        .unionAll(leg(["o_orderpriority"], 1))
        .unionAll(leg(["o_orderstatus"], 2))
        .unionAll(leg([], 3))
        .filter(F.col("n_orders") >= 20)
    )
    detail = orders.groupBy(
        "o_orderpriority", "o_orderstatus", F.month("o_orderdate").alias("m")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("o_orderpriority", "o_orderstatus").orderBy(
        F.col("cnt").desc(), "m"
    )
    modal = (
        detail.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("o_orderpriority").alias("mp"),
            F.col("o_orderstatus").alias("ms"),
            F.col("m").alias("modal_month"),
        )
    )
    built = lattice.join(
        F.broadcast(modal),
        lattice.o_orderpriority.eqNullSafe(modal.mp)
        & lattice.o_orderstatus.eqNullSafe(modal.ms),
        "left",
    ).select(
        "o_orderpriority",
        "o_orderstatus",
        "lvl",
        "n_orders",
        "revenue",
        "n_cust_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_cust_exact"))
            <= F.col("n_cust_exact") * 0.05
        ).alias("hll_within_5pct"),
        "modal_month",
    )
    assert _rows(twin) == _rows(built)


def test_j19_matches_join_and_case_formulation(spark):
    """semi → inner-join-distinct, anti → left-join-null-filter,
    theta-band → CASE band assignment: three different operators, the
    identical frame."""
    _ensure_loaded()
    twin = REGISTRY["j19_clean_hot_price_bands"].fn(spark, SF)
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    hot = part.filter(F.col("p_name").rlike("^hot ")).select("p_partkey")
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rk"))
        .distinct()
    )
    clean = (
        li.join(hot, li.l_partkey == hot.p_partkey)  # inner: keys unique
        .join(ret, li.l_orderkey == ret.rk, "left")
        .filter(F.col("rk").isNull())
        .select("l_extendedprice", "l_quantity")
    )
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    span4 = (F.col("mx") - F.col("mn")) / F.lit(4.0)
    banded = clean.crossJoin(F.broadcast(stats)).select(
        "l_extendedprice",
        "l_quantity",
        F.when(F.col("l_extendedprice") < F.col("mn") + 1 * span4, 0)
        .when(F.col("l_extendedprice") < F.col("mn") + 2 * span4, 1)
        .when(F.col("l_extendedprice") < F.col("mn") + 3 * span4, 2)
        .otherwise(3)
        .cast("bigint")
        .alias("band"),
    )
    built = banded.groupBy("band").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.floor("l_quantity").cast("bigint")).alias("total_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )
    assert _rows(twin) == _rows(built)


def test_f29_matches_mapless_formulation(spark):
    """The map-consuming columns recomputed with NO maps (conditional
    aggregation) and JSON via from_json instead of get_json_object —
    identical frame."""
    _ensure_loaded()
    twin = REGISTRY["f29_user_geo_profile"].fn(spark, SF)
    ev = load_table(spark, SF, "events")
    k = F.from_json(F.col("props"), "k bigint")["k"]
    per_type = ev.select(
        "user_id",
        "event_type",
        F.when(F.col("event_type") == "error", k).otherwise(0).alias("ek"),
    ).groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"), F.sum("ek").alias("err_k")
    )
    prof = per_type.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.coalesce(
            F.max(F.when(F.col("event_type") == "click", F.col("n"))),
            F.lit(-1),
        ).alias("n_click"),
        F.sum(F.when(F.col("n") >= 20, 1).otherwise(0))
        .cast("bigint")
        .alias("n_heavy_types"),
        F.sum("err_k").alias("err_k_sum"),
    )
    from data_wrangling_openstreetmap_spark.functions.geospatial import (
        grid_cell,
        haversine_m,
        in_bbox,
    )

    lat = (F.col("user_id") % 170) * 0.5 - 42.0
    lon = (F.col("user_id") % 355) * 0.5 - 88.0
    built = prof.select(
        "user_id",
        "n_events",
        "n_click",
        "n_heavy_types",
        "err_k_sum",
        grid_cell(lat, lon, 10).alias("cell_id"),
        F.round(haversine_m(lat, lon, F.lit(35.7), F.lit(139.7)), 0).alias(
            "hav_m_tokyo"
        ),
        in_bbox(lat, lon, 20.0, 100.0, 50.0, 150.0).alias("in_asia_box"),
    )
    assert _rows(twin) == _rows(built)


def test_u18_matches_builtin_formulation(spark):
    """The five-crossing Python chain == a pure-JVM recompute: split/
    filter/regexp/length expressions, window-centered integers, exact
    percentile(0.5) for the median. Any crossing that drops, reorders
    into buckets, or retypes rows breaks this equality."""
    _ensure_loaded()
    twin = REGISTRY["u18_five_crossing_bridge"].fn(spark, SF)
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 120)
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    norm = F.lower(F.regexp_replace(F.col("word"), "[^a-zA-Z]", ""))
    scored = (
        words.select("lang", norm.alias("norm"))
        .filter(F.col("norm") != "")
        .select(
            "lang",
            (
                F.length("norm")
                + 2
                * (
                    F.length("norm")
                    - F.length(F.regexp_replace("norm", "[aeiou]", ""))
                )
            ).cast("long").alias("score"),
        )
    )
    wl = Window.partitionBy("lang")
    centered = scored.select(
        "lang",
        (
            F.col("score") * F.count("*").over(wl) - F.sum("score").over(wl)
        ).alias("centered"),
    )
    built = centered.groupBy("lang").agg(
        F.count("*").alias("n_words"),
        F.percentile("centered", F.lit(0.5)).alias("median_centered"),
    )
    assert _rows(twin) == _rows(built)


def test_st38_composition_order_invariance(spark):
    """aggregate-then-join (the twin, the cheap streaming order) ==
    join-then-aggregate (the naive order): the dim key is functionally
    determined by user_id, so the two compositions must agree."""
    _ensure_loaded()
    twin = REGISTRY["st38_daily_segment_revenue"].fn(spark, SF)
    ev = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    naive = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cust), ev.user_id + 1 == cust.c_custkey)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "revenue"
            ),
        )
        .select(F.col("w.start").alias("day"), "segment", "n_purchases", "revenue")
    )
    assert _rows(twin) == _rows(naive)


def test_st39_emission_matches_per_row_expansion(spark):
    """The hop aggregate == explicit per-row two-window expansion
    (each order lands in day buckets d-1 and d) under the same
    watermark cut."""
    _ensure_loaded()
    twin = REGISTRY["st39_emitted_daily_hops"].fn(spark, SF)
    orders = load_table(spark, SF, "orders")
    jitter = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(69621)) % 2700
    j = orders.select(
        "o_orderdate",
        "o_orderstatus",
        "o_totalprice",
        (
            F.col("o_orderdate") + F.make_dt_interval(secs=jitter.cast("double"))
        ).alias("arrival_ts"),
    )
    hi = j.agg(
        (F.max("arrival_ts") - F.expr("INTERVAL 45 MINUTES")).alias("hi")
    )
    day = F.date_trunc("DAY", F.col("o_orderdate"))
    expanded = j.select(
        "o_orderstatus",
        "o_totalprice",
        F.explode(
            F.array(day - F.expr("INTERVAL 1 DAY"), day)
        ).alias("window_start"),
    )
    built = (
        expanded.groupBy("window_start", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0)
            .alias("revenue"),
        )
        .crossJoin(F.broadcast(hi))
        .filter(F.col("window_start") + F.expr("INTERVAL 2 DAYS") <= F.col("hi"))
        .drop("hi")
    )
    assert _rows(twin) == _rows(built)


def test_st40_matches_lag_cumsum_sessionization(spark):
    """session_window == the lag/cumsum hand-rolled sessionizer
    (strict > gap splits; dwell = last − first), rolled through the
    same dim."""
    _ensure_loaded()
    twin = REGISTRY["st40_segment_session_dwell"].fn(spark, SF)
    ev = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "ts", F.lag("ts").over(w_seq).alias("prev_ts")
    )
    flagged = lagged.select(
        "user_id",
        "ts",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                > 40 * 60 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.select(
        "user_id", "ts", F.sum("new_sess").over(w_cum).alias("sess_id")
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_ev"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias(
            "dur_us"
        ),
    )
    built = (
        per_sess.join(F.broadcast(cust), per_sess.user_id + 1 == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_ev").alias("max_session_events"),
            F.sum("dur_us").cast("bigint").alias("total_session_us"),
        )
    )
    assert _rows(twin) == _rows(built)


# ---------------------------------------------------------------------------
# AGGREGATE_FOLD_SITES spot checks (round 10, verdict #2): executable
# evidence for two audited "mirrored" classifications — the claims the
# freeze test records but cannot itself verify.
# ---------------------------------------------------------------------------


def test_rolling_hash_empty_string_matches_oracle_recurrence(spark):
    """The `mirrored+precond` claim for the codepoint fold: on an EMPTY
    string both the Spark fold and the DuckDB recurrence yield the init
    (0), so the precondition (no empty text) guards the OTHER precond
    sites, not this one — the fold's empty-input behavior itself is
    engine-identical."""
    import duckdb

    from data_wrangling_openstreetmap_spark.operators.llm import _codepoint_fold

    df = spark.createDataFrame([("",), ("a",), ("ab",)], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", _codepoint_fold(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    want = {
        s: con.execute(
            "SELECT list_reduce(list_prepend(0::BIGINT, "
            "[unicode(c) FOR c IN string_split(?, '') IF c <> '']), "
            "(acc, c) -> (acc * 31 + c) % 2147483647)",
            [s],
        ).fetchone()[0]
        for s in ("", "a", "ab")
    }
    assert got == want, (got, want)


def test_f6d_empty_filtered_map_folds_to_zero_on_both_engines(spark):
    """The `mirrored` claim for f6d's map fold: an order whose every
    line is below the qty threshold yields an EMPTY filtered map — the
    Spark fold returns its 0 init and the oracle's CASE…ELSE 0 SUM
    returns 0, NOT NULL (the exact shape that diverged in f28 before
    its guard; f6d is sound because the oracle says ELSE 0)."""
    df = spark.createDataFrame(
        [(1, 1, 5), (1, 2, 7)], "l_orderkey long, l_linenumber long, qty long"
    )
    m = df.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linenumber", "qty")))
        ).alias("m")
    )
    big = F.map_filter("m", lambda k, v: v >= F.lit(25))
    out = m.select(
        F.aggregate(
            F.map_values(big),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("big_qty")
    ).collect()
    assert [r["big_qty"] for r in out] == [0]
    import duckdb

    want = duckdb.connect().execute(
        "SELECT CAST(SUM(CASE WHEN qty >= 25 THEN qty ELSE 0 END) AS BIGINT) "
        "FROM (VALUES (5), (7)) t(qty)"
    ).fetchone()[0]
    assert want == 0
