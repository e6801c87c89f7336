"""Semantics cross-checks for the round-8 tag twins.

Each graded twin already has a DuckDB oracle (cross-ENGINE agreement)
and a golden snapshot; these tests add cross-FORMULATION agreement —
an independent Spark expression of the same semantics must produce the
identical frame — plus the structural facts a wrong implementation
would break (lattice consistency, conservation, anti-join soundness).
Everything runs at sf0.001 so the module stays fast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.io import load_table
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


def _rows(df, *key):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(
        (v is None, v) for v in t
    ))


def test_u16_matches_builtin_formulation(spark):
    """UDTF fan-out + Python normalization == explode(split) +
    regexp_replace, frame-identical."""
    _ensure_loaded()
    twin = REGISTRY["u16_udtf_signature_rollup"].fn(spark, SF)
    part = load_table(spark, SF, "part")
    built = (
        part.select(
            "p_partkey",
            F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .select(
            "p_partkey",
            F.col("pos").cast("bigint").alias("pos"),
            # round-11 formulation: ASCII-translate lowercasing, never a
            # Unicode lower() (full-vs-simple case mapping diverges
            # cross-engine on e.g. dotted İ — see _signature_py)
            F.translate(
                F.regexp_replace(F.col("word"), "[aeiouAEIOU]", ""),
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                "abcdefghijklmnopqrstuvwxyz",
            ).alias("signature"),
        )
        .groupBy("signature")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("pos").alias("pos_sum"),
            F.min("p_partkey").alias("first_part"),
        )
    )
    assert _rows(twin) == _rows(built)


def test_st33_matches_min_by_formulation(spark):
    """Keep-first per (user, event_type) via the rank window == min_by
    over the packed (ts, event_id) arrival key."""
    _ensure_loaded()
    twin = REGISTRY["st33_first_touch_snowflake"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")
    arrival = F.struct(F.col("ts"), F.col("event_id"))
    firsts = events.groupBy("user_id", "event_type").agg(
        F.min_by("value", arrival).alias("value")
    )
    alt = (
        firsts.join(F.broadcast(cust), firsts.user_id + 1 == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("event_type", F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_first_touches"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
    )
    assert _rows(twin) == _rows(alt)


def test_st34_first_event_is_always_a_record(spark):
    """Every user's first event sets a record, records never exceed
    events, and the peak matches a plain MAX."""
    _ensure_loaded()
    out = REGISTRY["st34_record_break_counter"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    plain = events.groupBy("user_id").agg(
        F.count("*").alias("n_events_chk"),
        F.max(F.round(F.col("value") * 100).cast("long")).alias("peak_chk"),
    )
    j = out.join(plain, "user_id")
    bad = j.filter(
        (F.col("n_records") < 1)
        | (F.col("n_records") > F.col("n_events"))
        | (F.col("n_events") != F.col("n_events_chk"))
        | (F.col("peak_cents") != F.col("peak_chk"))
    )
    assert bad.count() == 0
    assert out.count() == plain.count()


def test_j17_anti_and_asof_are_sound(spark):
    """No surviving purchase shares a (user, day) with an error event,
    and each attributed view is genuinely the latest at-or-before one."""
    _ensure_loaded()
    out = REGISTRY["j17_error_free_attribution"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id2"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    err = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.to_date("ts").alias("e_day")
    )
    joined = out.join(p, "purchase_id")
    # anti soundness
    leak = joined.join(
        err,
        (joined.user_id == err.e_user) & (F.to_date(joined.p_ts) == err.e_day),
        "inner",
    )
    assert leak.count() == 0
    # as-of optimality: the brute-force range join finds no LATER view
    # still at-or-before the purchase than the attributed one
    brute = (
        joined.filter(F.col("view_id").isNotNull())
        .join(
            v,
            (joined.user_id == v.v_user)
            & (v.v_ts <= joined.p_ts)
            & (v.v_ts > F.expr("p_ts - (us_since_view / 1e6) * INTERVAL 1 SECOND")),
        )
    )
    assert brute.count() == 0
    # attributed views exist and are at-or-before
    chk = joined.filter(F.col("view_id").isNotNull()).join(
        v, joined.view_id == v.view_id2
    )
    assert chk.filter(
        (F.col("v_user") != F.col("user_id")) | (F.col("v_ts") > F.col("p_ts"))
    ).count() == 0


def test_a55_rollup_lattice_is_consistent(spark):
    """Detail rows sum to their priority subtotal, subtotals to the
    grand total, and every HLL contract flag is true. HAVING-dropped
    groups (n<5) are tolerated in the sums via recomputation."""
    _ensure_loaded()
    out = REGISTRY["a55_priority_rollup_contract"].fn(spark, SF).cache()
    orders = load_table(spark, SF, "orders")
    total = orders.count()
    grand = out.filter(F.col("lvl") == 3).collect()
    assert len(grand) == 1 and grand[0]["n_orders"] == total
    # per-priority subtotal == direct recount (subtotals pass HAVING
    # whenever the priority has >=5 orders — all do in the fixture)
    direct = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    for r in out.filter(F.col("lvl") == 1).collect():
        assert direct[r["o_orderpriority"]] == r["n_orders"]
    assert out.filter(~F.col("hll_within_5pct")).count() == 0
    out.unpersist()


def test_o10_membership_matches_sql_formulation(spark):
    """The DataFrame set-algebra chain equals one Spark SQL statement
    of the same membership logic."""
    _ensure_loaded()
    twin = REGISTRY["o10_cohort_set_algebra"].fn(spark, SF)
    for t in ("events", "customer", "orders"):
        load_table(spark, SF, t).createOrReplaceTempView(f"o10chk_{t}")
    sql = spark.sql(
        """
        WITH purchasers AS (
          SELECT DISTINCT user_id + 1 AS ck FROM o10chk_events
          WHERE event_type = 'purchase'
        ), rich AS (
          SELECT c_custkey AS ck FROM o10chk_customer WHERE c_acctbal >= 5000.0
        ), active95 AS (
          SELECT DISTINCT o_custkey AS ck FROM o10chk_orders
          WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        ), errored AS (
          SELECT DISTINCT user_id + 1 AS ck FROM o10chk_events
          WHERE event_type = 'error'
        ), survivors AS (
          SELECT ck FROM (SELECT ck FROM purchasers UNION SELECT ck FROM rich)
          INTERSECT SELECT ck FROM active95
          EXCEPT SELECT ck FROM errored
        )
        SELECT DISTINCT c.c_mktsegment AS segment, c.c_nationkey AS nationkey
        FROM survivors s JOIN o10chk_customer c ON c.c_custkey = s.ck
        """
    )
    assert _rows(twin) == _rows(sql)


def test_f27_conserves_points_and_buckets(spark):
    """Ring/quadrant densities sum to the customer count; buckets are
    well-formed (known quadrants, non-negative rings, min <= mean)."""
    _ensure_loaded()
    out = REGISTRY["f27_quadrant_ring_density"].fn(spark, SF).cache()
    n_cust = load_table(spark, SF, "customer").count()
    assert out.agg(F.sum("n_points")).collect()[0][0] == n_cust
    bad = out.filter(
        (~F.col("quadrant").isin("NE", "NW", "SE", "SW"))
        | (F.col("ring") < 0)
        | (F.col("nearest_m") * F.col("n_points") > F.col("total_m"))
    )
    assert bad.count() == 0
    out.unpersist()


def test_st32_emission_cutoff_is_sound(spark):
    """Emitted windows are exactly the <=-watermark subset of the
    unfiltered tumbling rollup."""
    _ensure_loaded()
    out = REGISTRY["st32_emitted_hourly_by_type"].fn(spark, SF)
    events = load_table(spark, SF, "events")
    jitter = ((F.col("event_id") % F.lit(2147483648)) * F.lit(1103515245)) % 1200
    arrival = F.col("ts") + F.make_dt_interval(secs=jitter.cast("double"))
    hi = events.select(arrival.alias("a")).agg(F.max("a")).collect()[0][0]
    import datetime

    cutoff = hi - datetime.timedelta(minutes=10)
    allw = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "event_type", "n_events")
    )
    expected = allw.filter(F.col("we") <= F.lit(cutoff))
    got = out.select("window_start", "event_type", "n_events")
    assert _rows(got) == _rows(expected.select("ws", "event_type", "n_events"))


def test_p11_departments_are_exhaustive(spark):
    """Every part lands in exactly one (tier, department, brand_mod)
    cell and the dict's misses all route to 'misc'."""
    _ensure_loaded()
    out = REGISTRY["p11_chained_parse_normalize"].fn(spark, SF)
    n_parts = load_table(spark, SF, "part").count()
    assert out.agg(F.sum("n_parts")).collect()[0][0] == n_parts
    depts = {r[0] for r in out.select("department").distinct().collect()}
    assert depts <= {"assembly", "fasteners", "stock", "misc"}
    tiers = {r[0] for r in out.select("tier").distinct().collect()}
    assert tiers <= {"bulk", "eco", "spot"}


def test_precondition_events_user_ts_unique(spark):
    """Precondition parity companion for the ASOF oracle family
    (j7/j17/x1/x1b/x1c): DuckDB's ASOF JOIN picks an ARBITRARY row
    among equal-timestamp build-side matches and the jvmext lowering's
    ORDER BY ts DESC LIMIT 1 is equally tie-arbitrary, so every as-of
    parity grade silently assumes (user_id, ts) is unique in events.
    Pin the assumption at the sweep scale so fixture drift fails loudly
    (j17's oracle additionally collapses ties via QUALIFY — defense in
    depth, not a reason to drop this check)."""
    events = load_table(spark, "/root/testdata/sf0.1", "events")
    dups = (
        events.groupBy("user_id", "ts").count().filter(F.col("count") > 1)
    )
    assert dups.count() == 0
