"""Property-based invariants (hypothesis) over generated micro-tables.

Each property pins an algebraic law the oracle comparison can't state:
idempotence, symmetry, containment, conservation. Examples are kept
small (Spark job per example) — the laws, not the volume, do the work.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.functions import text as T
from data_wrangling_openstreetmap_spark.functions import vectors as V

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def _dedup_keep_min(df):
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@given(st.lists(texts, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_exact_dedup_idempotent(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    once = _dedup_keep_min(df)
    twice = _dedup_keep_min(once)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert len(a) == len(set(docs))  # one survivor per distinct text


@given(st.lists(texts, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_union_all_conserves_rows(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    half = df.filter(F.col("doc_id") % 2 == 0)
    rest = df.filter(F.col("doc_id") % 2 == 1)
    assert half.unionByName(rest).count() == df.count()


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-100, 100)),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 3),
)
@settings(**SETTINGS)
def test_topk_per_group_containment(spark, rows, k):
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v long, id long"
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), "id")
    top = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    all_rows = {(r.g, r.v, r.id) for r in df.collect()}
    top_rows = [(r.g, r.v, r.id) for r in top.collect()]
    assert set(top_rows) <= all_rows
    sizes = {}
    for g, _, _ in all_rows:
        sizes[g] = sizes.get(g, 0) + 1
    got = {}
    for g, _, _ in top_rows:
        got[g] = got.get(g, 0) + 1
    assert got == {g: min(k, n) for g, n in sizes.items()}


@given(
    st.lists(st.floats(-1, 1, allow_nan=False), min_size=4, max_size=4),
    st.lists(st.floats(-1, 1, allow_nan=False), min_size=4, max_size=4),
)
@settings(**SETTINGS)
def test_cosine_symmetry_and_self_unit(spark, a, b):
    if all(abs(x) < 1e-6 for x in a) or all(abs(x) < 1e-6 for x in b):
        return  # zero vectors have undefined cosine
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = df.select(
        V.cosine(F.col("a"), F.col("b")).alias("ab"),
        V.cosine(F.col("b"), F.col("a")).alias("ba"),
        V.cosine(F.col("a"), F.col("a")).alias("aa"),
        V.norm(V.l2_normalize(F.col("a"))).alias("unit"),
    ).collect()[0]
    assert math.isclose(r.ab, r.ba, rel_tol=1e-12)
    assert math.isclose(r.aa, 1.0, rel_tol=1e-9)
    assert math.isclose(r.unit, 1.0, rel_tol=1e-9)
    assert -1.0 - 1e-9 <= r.ab <= 1.0 + 1e-9


@given(texts, texts)
@settings(**SETTINGS)
def test_minhash_respects_text_identity(spark, t1, t2):
    df = spark.createDataFrame([(0, t1), (1, t2)], "doc_id long, text string")
    sigs = df.select(
        "doc_id",
        T.minhash_signature(T.shingles(F.col("text"), k=2), n_hashes=8).alias("s"),
    ).collect()
    s = {r.doc_id: tuple(r.s) for r in sigs}
    if t1 == t2:
        assert s[0] == s[1]
    assert len(s[0]) == 8 and len(s[1]) == 8


@given(st.lists(st.integers(0, 50), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_running_sum_last_equals_total(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("rs", F.sum("v").over(w)).orderBy("id").collect()
    assert out[-1].rs == sum(values)
    for prev, cur in zip(out, out[1:]):
        assert cur.rs == prev.rs + cur.v


def test_simhash_is_token_order_invariant(spark):
    """simhash64 votes over the token MULTISET — any permutation of the
    tokens (here: reversal, and a sorted copy) must fingerprint
    identically. Batched: the 64-bit-vote expression tree costs ~6 s of
    analysis/codegen PER QUERY, so the former @given form (10 examples
    = 10 queries) was the suite's third-slowest test; one seeded batch
    of 16 multisets in ONE query checks more cases at a tenth the
    cost (round-9 suite-time trim)."""
    import random

    rng = random.Random(0xD5EED)
    alphabet = [f"w{i}" for i in range(40)] + ["a", "b", "–", "x7"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        for _ in range(16)
    ]
    rows = [
        (" ".join(t), " ".join(reversed(t)), " ".join(sorted(t)))
        for t in cases
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string").select(
        T.simhash64(T.tokens(F.col("a"))).alias("ha"),
        T.simhash64(T.tokens(F.col("b"))).alias("hb"),
        T.simhash64(T.tokens(F.col("c"))).alias("hc"),
    )
    for r in df.collect():
        assert r.ha == r.hb == r.hc


@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=9))
@settings(**SETTINGS)
def test_rolling_corr_moments_match_python(spark, xs):
    """The integer-moment Pearson closed form used by w10 agrees with a
    direct Python computation on the full window."""
    ys = [(v * 7 + 3) % 101 for v in xs]  # deterministic second series
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return  # degenerate window — excluded by the operator too
    want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    ).agg(
        (
            (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / F.sqrt(
                (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")).cast("double")
                * (F.count("*") * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y")).cast("double")
            )
        ).alias("corr")
    )
    got = df.collect()[0].corr
    assert abs(got - want) < 1e-9


@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.sampled_from([1, 3, 16, 256]),
)
@settings(**SETTINGS)
def test_scalable_row_number_equals_global_window(spark, keys, width):
    """The two-level rank must equal row_number() OVER (ORDER BY key)
    for ANY key distribution and ANY bucket width — including negative
    keys (floor bucketing) and widths smaller than the gaps."""
    from data_wrangling_openstreetmap_spark.operators._helpers import (
        scalable_row_number,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.rn
        for r in scalable_row_number(df, "k", bucket_width=width).collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


@given(
    st.lists(
        # 8-in-10 rows share one key value — the skew-degenerate shape
        # that collapses any coarsening of the key into one bucket —
        # plus occasional NULL keys (range partitioning and window
        # ordering must agree on null placement: both nulls-first).
        st.sampled_from([42, 42, 42, 42, 42, 42, 42, 42, 7, None]),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_scalable_range_form_equals_global_window_on_skewed_key(spark, keys):
    """VERDICT r6 what's-wrong #1: the range-bucketed (bucket=None)
    forms must equal the global windows when the first order key is
    one-value-dominant — exactly the distribution that silently
    defeats any monotonic coarsening of the key."""
    from data_wrangling_openstreetmap_spark.operators._helpers import (
        scalable_row_number,
        scalable_running_sum,
    )

    df = spark.createDataFrame(
        [(i, k, i % 5 - 2) for i, k in enumerate(keys)],
        "id long, k long, v long",
    )
    got_rn = {
        r.id: r.rn
        for r in scalable_row_number(df, order_cols=["k", "id"]).collect()
    }
    got_sum = {
        r.id: r.run_sum
        for r in scalable_running_sum(
            df, order_cols=["k", "id"], value="v"
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: (r.rn, r.s)
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("k", "id")).alias("rn"),
            F.sum("v").over(w).alias("s"),
        ).collect()
    }
    assert got_rn == {i: rs[0] for i, rs in want.items()}
    assert got_sum == {i: rs[1] for i, rs in want.items()}


def test_range_buckets_bound_rows_on_constant_key_and_plan_is_partitioned(spark):
    """The range form's whole point: with a 99%-one-value (even fully
    constant) first key, per-bucket row counts stay bounded because the
    sampled bounds slice the TIE CLASS by the unique tiebreak — and the
    physical plan range-partitions the data instead of funneling it
    through a single-partition sort. Companion to the structural sweep
    in test_plan_shapes.py (which audits the registered callers)."""
    from data_wrangling_openstreetmap_spark.operators._helpers import (
        range_buckets,
        scalable_row_number,
    )
    from data_wrangling_openstreetmap_spark.plans.asserts import plan_string

    n = 1000
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, F.lit(7)).otherwise(F.lit(42)).alias("k"),
    )
    counts = [
        r.c
        for r in range_buckets(df, ["k", "id"], num_buckets=8)
        .groupBy("_bkt")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    # 8 requested buckets over 1000 rows, 990 sharing one key: bounds
    # must still split the tie class — no bucket may hold ~everything.
    assert max(counts) <= 400, counts
    assert len(counts) >= 4, counts

    ranked = scalable_row_number(df, order_cols=["k", "id"])
    plan = plan_string(ranked, mode="simple")
    assert "rangepartitioning" in plan.lower(), plan
    # Same structural rule as the registry-wide sweep: any
    # single-partition exchange must sit over an aggregation (the
    # O(#buckets) offsets table), never over the full input.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert any(
            tok in child
            for tok in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
        ), plan
    # and the output is still the exact global rank
    got = sorted((r.k, r.id, r.rn) for r in ranked.collect())
    want = sorted(
        (r.k, r.id, r.rn)
        for r in df.select(
            "k", "id", F.row_number().over(Window.orderBy("k", "id")).alias("rn")
        ).collect()
    )
    assert got == want


@given(st.integers(min_value=1, max_value=97))
@settings(**SETTINGS)
def test_ntile_closed_form_matches_spark_ntile(spark, n):
    """The l4_quality_deciles closed-form bucket arithmetic must equal
    Spark's own ntile(10) for every input size, including n < 10 where
    the oversized-decile branch covers everything."""
    df = spark.range(n).select(F.col("id").alias("k"))
    w = Window.orderBy("k")
    want = {r.k: r.d for r in df.select("k", F.ntile(10).over(w).alias("d")).collect()}
    ranked = df.select("k", (F.row_number().over(w)).alias("rn")).crossJoin(
        df.agg(F.count("*").alias("n"))
    )
    big = F.floor(F.col("n") / 10) + 1
    small = F.floor(F.col("n") / 10)
    r_ = F.col("n") % 10
    cut = r_ * big
    decile = F.when(
        F.col("rn") <= cut, F.floor((F.col("rn") - 1) / big) + 1
    ).otherwise(
        r_ + F.floor((F.col("rn") - cut - 1) / F.greatest(small, F.lit(1))) + 1
    )
    got = {
        r.k: r.d
        for r in ranked.select("k", decile.cast("int").alias("d")).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # order key
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([1, 7, 64]),
)
@settings(**SETTINGS)
def test_scalable_running_max_equals_global_window(spark, rows, width):
    """Bucketed prefix max must equal the global running max for ANY
    order-key distribution and bucket width (ties broken by a unique
    id, same contract as production callers)."""
    from data_wrangling_openstreetmap_spark.operators._helpers import (
        scalable_running_max,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    got = {
        r.id: r.run_max
        for r in scalable_running_max(
            df,
            order_cols=["k", "id"],
            value="v",
            bucket=F.floor(F.col("k") / width).cast("long"),
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.m
        for r in df.select("id", F.max("v").over(w).alias("m")).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # order key
            st.one_of(
                st.none(),  # SUM/MIN skip nulls — the merge must too
                st.integers(min_value=-100, max_value=100),
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([1, 7, 64]),
)
@settings(**SETTINGS)
def test_scalable_running_sum_and_min_equal_global_windows(spark, rows, width):
    """Bucketed prefix SUM and prefix MIN (round-5 helpers, w33/d8's
    substrate) must equal the global running forms for ANY order-key
    distribution, bucket width, AND null placement (review r5: rows
    preceding a bucket's first non-null value must surface the prior
    buckets' total, and all-null prefixes must stay NULL)."""
    from data_wrangling_openstreetmap_spark.operators._helpers import (
        scalable_running_min,
        scalable_running_sum,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    bucket = F.floor(F.col("k") / width).cast("long")
    got_sum = {
        r.id: r.run_sum
        for r in scalable_running_sum(
            df, order_cols=["k", "id"], value="v", bucket=bucket
        ).collect()
    }
    got_min = {
        r.id: r.run_min
        for r in scalable_running_min(
            df, order_cols=["k", "id"], value="v", bucket=bucket
        ).collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: (r.s, r.m)
        for r in df.select(
            "id",
            F.sum("v").over(w).alias("s"),
            F.min("v").over(w).alias("m"),
        ).collect()
    }
    assert got_sum == {i: sm[0] for i, sm in want.items()}
    assert got_min == {i: sm[1] for i, sm in want.items()}


# ---------------------------------------------------------------------------
# asof_join (plans/sql_ext.py): equivalence with pandas merge_asof —
# an independent reference implementation of backward-inclusive as-of.
# ---------------------------------------------------------------------------

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key
        st.integers(min_value=0, max_value=10_000),  # ts offset seconds
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): ties between
    # equal right timestamps are resolved differently by the two
    # implementations (ours: struct-max; pandas: input order) — the
    # law under test is the as-of MATCH, not tie luck.
)


@given(left=_asof_events, right=_asof_events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    import datetime as dt

    import pandas as pd

    from data_wrangling_openstreetmap_spark.plans.sql_ext import asof_join

    base = dt.datetime(2024, 1, 1)

    def frame(rows, val):
        return pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "t": [base + dt.timedelta(seconds=r[1]) for r in rows],
                val: [r[2] for r in rows],
            }
        )

    lpdf, rpdf = frame(left, "lv"), frame(right, "rv")
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = {
        (r.l_k, r.l_t, r.l_lv): r.r_rv
        for r in asof_join(ldf, rdf, "k", "t", "t", how="left").collect()
    }
    want_df = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        (row.k, row.t.to_pydatetime(), row.lv): (
            None if pd.isna(row.rv) else int(row.rv)
        )
        for row in want_df.itertuples()
    }
    assert got == want


@given(left=_asof_events, right=_asof_events, tol=st.integers(min_value=0, max_value=5000))
@settings(**SETTINGS)
def test_asof_join_tolerance_matches_pandas(spark, left, right, tol):
    import datetime as dt

    import pandas as pd

    from data_wrangling_openstreetmap_spark.plans.sql_ext import asof_join

    base = dt.datetime(2024, 1, 1)

    def frame(rows, val):
        return pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "t": [base + dt.timedelta(seconds=r[1]) for r in rows],
                val: [r[2] for r in rows],
            }
        )

    lpdf, rpdf = frame(left, "lv"), frame(right, "rv")
    got = {
        (r.l_k, r.l_t, r.l_lv): r.r_rv
        for r in asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            "k",
            "t",
            "t",
            how="left",
            tolerance=f"{tol} seconds",
        ).collect()
    }
    want_df = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=tol),
    )
    want = {
        (row.k, row.t.to_pydatetime(), row.lv): (
            None if pd.isna(row.rv) else int(row.rv)
        )
        for row in want_df.itertuples()
    }
    assert got == want


_qrows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # group
        st.integers(min_value=-50, max_value=50),  # score
    ),
    min_size=1,
    max_size=16,
)


@given(_qrows, st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_qualify_lowering_equals_subquery_form(spark, rows, k):
    """Frontend law: QUALIFY lowering == the explicit window-subquery
    rewrite, for ANY row multiset and k — including duplicate scores
    (the id tiebreak pins rank order on both formulations)."""
    from data_wrangling_openstreetmap_spark.plans.sql_ext import sql

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id int, g int, v int"
    )
    df.createOrReplaceTempView("prop_q")
    got = sql(
        spark,
        f"SELECT g, id FROM prop_q QUALIFY ROW_NUMBER() OVER "
        f"(PARTITION BY g ORDER BY v DESC, id) <= {k}",
    )
    want = spark.sql(
        f"SELECT g, id FROM (SELECT g, id, ROW_NUMBER() OVER "
        f"(PARTITION BY g ORDER BY v DESC, id) AS r FROM prop_q) WHERE r <= {k}"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(_qrows)
@settings(**SETTINGS)
def test_distinct_on_lowering_keeps_exactly_one_row_per_key(spark, rows):
    """Frontend law: DISTINCT ON emits exactly one row per key — the
    one ranked first by the ORDER BY — for any input multiset."""
    from data_wrangling_openstreetmap_spark.plans.sql_ext import sql

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id int, g int, v int"
    )
    df.createOrReplaceTempView("prop_don")
    got = sql(
        spark,
        "SELECT DISTINCT ON (g) g, id FROM prop_don ORDER BY g, v DESC, id",
    )
    out = [(r.g, r.id) for r in got.collect()]
    keys = [g for g, _ in out]
    assert sorted(keys) == sorted({g for g, _ in rows})
    best = {}
    for i, (g, v) in enumerate(rows):
        cur = best.get(g)
        if cur is None or (-v, i) < cur[0]:
            best[g] = ((-v, i), i)
    assert sorted(out) == sorted((g, b[1]) for g, b in best.items())


def test_seasonal_decompose_identity_and_balance(spark):
    """w30's additive contract: revenue == trend + seasonal + remainder
    for EVERY emitted day (up to the 6-dp output rounding), and the
    seasonal component sums to ~0 across weekdays weighted by their day
    counts (the detrended means are exact integer quotients, so the
    weighted sum telescopes to exactly zero before rounding)."""
    from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["w30_seasonal_decompose"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 3e-6
    # per-weekday remainder balance: the seasonal component is the
    # weekday MEAN of the detrended series, so the remainders within
    # each weekday sum to exactly zero pre-round
    from collections import defaultdict

    by_dow = defaultdict(list)
    for r in rows:
        by_dow[r["day"].weekday()].append(r["remainder"])
    for dow, rem in by_dow.items():
        assert abs(sum(rem)) < len(rem) * 1e-6, (dow, sum(rem))


def test_lorenz_deciles_monotone_and_complete(spark):
    """w32's Lorenz points: cumulative share is nondecreasing, convex
    in the decile index (richer deciles add larger increments), and
    ends at exactly 1; the ten bins cover every customer."""
    from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = sorted(
        REGISTRY["w32_lorenz_deciles"].fn(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["decile_share"] for r in rows]
    cums = [r["cum_share"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert all(b >= a - 1e-6 for a, b in zip(shares, shares[1:]))  # sorted ascending
    assert abs(cums[-1] - 1.0) < 1e-9


def test_wilson_lower_bound_is_conservative(spark):
    """q38: the Wilson lower bound never exceeds the point estimate,
    stays within [0, 1], and a thin perfect record scores BELOW a fat
    near-perfect one (the reason the bound exists)."""
    from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["q38_supplier_reliability"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_low"] <= r["ontime_rate"] <= 1.0

    def wilson(k, n):
        p = k / n
        return (p + 1.9208 / n - 1.96 * ((p * (1 - p) / n + 0.9604 / (n * n)) ** 0.5)) / (
            1 + 3.8416 / n
        )

    assert wilson(3, 3) < wilson(95, 100)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["ge", "gt", "le", "lt"]),
            st.integers(min_value=-5000, max_value=120000),
        ),
        max_size=6,
    )
)
def test_pushdown_reader_equals_unfiltered_scan_plus_predicate(filters):
    """s28's pruning contract as a property: for ANY conjunction of seq
    bounds, (pushFilters → partitions → clamped reads) must produce
    exactly the rows of the full feed that satisfy the conjunction —
    pruning may never drop a matching row or leak a filtered one."""
    try:  # pushFilters Filter classes are pyspark>=4.1; skip gracefully
        from pyspark.sql.datasource import (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        from data_wrangling_openstreetmap_spark.operators.relational import (
            _SynthPushdownReader,
        )
    except ImportError:
        import pytest as _pytest

        _pytest.skip("pushFilters API requires pyspark 4.1")

    mk = {
        "ge": GreaterThanOrEqual,
        "gt": GreaterThan,
        "le": LessThanOrEqual,
        "lt": LessThan,
    }
    r = _SynthPushdownReader({"partitions": "8", "rowsperpartition": "1000"})
    fs = [mk[k](("seq",), v) for k, v in filters]
    leftover = list(r.pushFilters(list(fs)))
    assert leftover == []  # every seq bound is absorbed
    got = sorted(
        row[0] for part in r.partitions() for row in r.read(part)
    )
    lo, hi = 0, 8 * 1000 - 1
    for k, v in filters:
        if k == "ge":
            lo = max(lo, v)
        elif k == "gt":
            lo = max(lo, v + 1)
        elif k == "le":
            hi = min(hi, v)
        else:
            hi = min(hi, v - 1)
    assert got == list(range(max(lo, 0), min(hi, 7999) + 1))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=7))
def test_hampel_quarter_cent_median_mad_match_python(spark, frame):
    """w39's 4×-unit median/MAD arithmetic equals float statistics on
    arbitrary frames (including even counts and all-equal values)."""
    import statistics

    df = spark.createDataFrame([(frame,)], "arr array<bigint>")
    n = len(frame)
    sa = sorted(frame)
    med4_expected = (
        4 * sa[n // 2] if n % 2 == 1 else 2 * (sa[n // 2 - 1] + sa[n // 2])
    )
    assert med4_expected == round(4 * statistics.median(frame))
    devs = sorted(abs(4 * v - med4_expected) for v in frame)
    mad4_expected = (
        devs[n // 2]
        if n % 2 == 1
        else (devs[n // 2 - 1] + devs[n // 2]) // 2
    )
    row = df.select(
        F.array_sort("arr").alias("sa"), F.size("arr").alias("n")
    ).select(
        F.when(
            F.col("n") % 2 == 1,
            4 * F.element_at("sa", ((F.col("n") + 1) / 2).cast("int")),
        )
        .otherwise(
            2
            * (
                F.element_at("sa", (F.col("n") / 2).cast("int"))
                + F.element_at("sa", (F.col("n") / 2 + 1).cast("int"))
            )
        )
        .alias("med4"),
        "sa",
        "n",
    ).select(
        "med4",
        F.array_sort(
            F.transform("sa", lambda v: F.abs(4 * v - F.col("med4")))
        ).alias("sd"),
        "n",
    ).select(
        "med4",
        F.when(
            F.col("n") % 2 == 1,
            F.element_at("sd", ((F.col("n") + 1) / 2).cast("int")),
        )
        .otherwise(
            F.expr(
                "(element_at(sd, cast(n / 2 as int))"
                " + element_at(sd, cast(n / 2 + 1 as int))) div 2"
            )
        )
        .alias("mad4"),
    ).collect()[0]
    assert row.med4 == med4_expected
    assert row.mad4 == mad4_expected


def test_modularity_contributions_sum_to_valid_q(spark):
    """g14 invariant: Σ q_micro/1e6 is a valid modularity (−0.5 ≤ Q ≤ 1)
    and Σ e_in ≤ m, Σ degree_sum = 2m."""
    from data_wrangling_openstreetmap_spark.registry import REGISTRY

    rows = REGISTRY["g14_modularity"].fn(spark, "/root/testdata/sf0.001").collect()
    q = sum(r.q_micro for r in rows) / 1e6
    assert -0.5 <= q <= 1.0
    assert sum(r.internal_edges for r in rows) <= sum(r.degree_sum for r in rows) / 2


def test_ckpt_full_plan_escape_hatch(spark, monkeypatch):
    """_helpers.ckpt must truncate lineage by default (explain shows a
    checkpoint scan, not the source) and be a NO-OP under
    DWOS_FULL_PLAN=1 — the contract the plan-sweep visibility fixture
    relies on; if the env gate silently broke, every structural sweep
    over a checkpointed prefix would pass vacuously again."""
    from data_wrangling_openstreetmap_spark.operators._helpers import ckpt

    df = spark.range(10).withColumnRenamed("id", "v")
    monkeypatch.setenv("DWOS_FULL_PLAN", "1")
    assert ckpt(df) is df  # full-visibility mode: identity
    monkeypatch.delenv("DWOS_FULL_PLAN")
    out = ckpt(df)
    assert out is not df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert [r.v for r in out.collect()] == list(range(10))


from hypothesis import given as _given_split, settings as _settings_split
from hypothesis import strategies as _st_split


@_given_split(
    names=_st_split.lists(
        _st_split.text(
            alphabet=_st_split.characters(
                codec="ascii", categories=("L", "N", "P", "Z")
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
@_settings_split(max_examples=60, deadline=None)
def test_split_top_level_roundtrips_backticked_names(names):
    """Property: joining backtick-quoted identifiers with ',' and
    re-splitting with the quote-aware scanner recovers every original
    name — including names containing commas, parens, and quotes (the
    EXCLUDE-list surface of review r6)."""
    from data_wrangling_openstreetmap_spark.plans.sql_ext import (
        _qid,
        _split_top_level,
        _unquote_ident,
    )

    joined = ", ".join(_qid(n) for n in names)
    parts = _split_top_level(joined)
    assert [_unquote_ident(p) for p in parts] == names
