"""Window order-tie determinism checker (VERDICT r7 §Next #2).

The w36 lesson: a prefix-frame window whose ORDER BY is not unique
within its partitions emits load-dependent results — rounds 1–6 passed
on the luck of shuffle-arrival order, and the hand-audit that was
supposed to prevent it missed w36 for six rounds. This module makes
the hazard class checkable by machine instead of by vigilance.

For a DataFrame, :func:`window_order_hazards` walks the OPTIMIZED
logical plan (column pruning has run, so a window child's output is
exactly the set of columns the query consumes at or above the window),
finds every ``Window`` node, classifies each window expression as
order-sensitive or not, and — for the sensitive ones — evaluates the
child against the real fixture and asserts the invariant:

    every (partition, order) tie class is CONSTANT in all child output
    columns that are not themselves order/partition attributes.

If that holds, tie rows are observationally interchangeable: any
physical arrival order assigns the same multiset of output rows, so
prefix sums, lag/lead, row_number, first/last etc. cannot diverge
across runs or engines. If the order is unique there are no tie
classes and the check passes trivially.

Order-INSENSITIVE shapes (skipped without evaluation):
- rank / dense_rank / percent_rank / cume_dist — depend only on order
  VALUES, identical for tied rows;
- commutative aggregates (sum/min/max/count/avg/bit/bool) over RANGE
  frames — the frame is defined by order values, so every tie row sees
  the same frame contents;
- the same aggregates over ROWS UNBOUNDED PRECEDING..UNBOUNDED
  FOLLOWING — the frame is the whole partition for every row.

Everything else — ROWS-frame aggregates (prefix and sliding),
first/last/nth_value/collect_list under any frame, lag/lead,
row_number/ntile, and any window function this module does not
recognize — is treated as order-sensitive (conservative default).

Expressions are evaluated through the JVM objects themselves
(``ExpressionUtils.column``), never by re-parsing ``expr.sql()`` text,
so computed order keys, dotted names, and duplicate-name children all
work. Child relations are materialized with ``Dataset.ofRows`` and the
tie aggregation is one small groupBy per distinct (child, spec) —
deduplicated across queries by the child plan's ``semanticHash``.

:func:`sort_limit_hazards` applies the same machinery to the repo's
other hand-enforced order invariant — "every ORDER BY under a LIMIT
carries a unique tiebreak": a global Sort + LIMIT k is flagged iff the
tie class CONTAINING the k-th row straddles the cut AND its rows differ
in any other output column (boundary-exact, so coarse orders whose cut
lands on a class edge pass without a tiebreak).

:func:`aggregate_order_hazards` (round 9, VERDICT r8 §Next #2) closes
the third order-nondeterminism class — GROUP BY aggregates whose value
depends on arrival order — with two checks over every ``Aggregate``
node:

1. STRUCTURAL: each ``collect_list``/``collect_set`` must be wrapped in
   ``sort_array``/``array_sort`` somewhere above it in the SAME output
   expression (the a8 idiom). This mechanizes the grep convention from
   ROUND8_NOTES §10; a consumed-order-insensitively site must be
   allowlisted BY NAME at the call site with its justification.
   Sort wrappers must genuinely order the collect: a CUSTOM
   ``array_sort`` comparator does not count (it may ignore element
   fields, leaving comparator-ties arrival-ordered), and a sort over
   an OUTER constructed array (``sort_array(array(collect_list(x)))``,
   ``array_repeat``) does not reach the nested collect — both fall
   through to the allowlist path.
2. EMPIRICAL: each ``first``/``last``/``any_value`` aggregate's
   argument must be CONSTANT within every group on the real fixture —
   the same tie-class evaluation the window checker runs, with the
   grouping keys playing the partition role. ``ignoreNulls`` functions
   probe null-ignoring distinctness; the strict forms count a NULL as
   a distinct value (struct-wrapped countDistinct).

:func:`checkpoint_opaque` reports whether a plan contains ``LogicalRDD``
leaves — lineage truncated by ``localCheckpoint``, invisible to every
plan walker here. The sweeps run under ``DWOS_FULL_PLAN=1`` so the
single-shot ``_helpers.ckpt`` truncations vanish (ADVICE r8 #1: windows
below a checkpoint were silently unswept); the UNCONDITIONAL iterative
checkpoints (graph loops) remain and must be explicitly allowlisted by
the caller, so the blind spot is loud instead of silent.

:func:`float_fold_sites` (round 12) enumerates the FIFTH
order-nondeterminism class — folds whose EXACT value depends on the
physical order partial aggregates are combined in, which the first four
checkers deliberately classify as "commutative": floating-point
addition is only approximately associative, so ``SUM``/``AVG`` over a
``double``/``float`` input, every moment-family aggregate (stddev /
variance / skewness / kurtosis / corr / covar — double M2/co-moment
buffers regardless of input type), and merge-order-sensitive sketches
(``approx_percentile``) can shift in their low-order bits when the scan
layout, partition count, or AQE coalescing changes. The repo's
defenses are (a) the integer-unit money recipe — exact long/decimal
sums for anything value-like, (b) ROUND(…, 6) on both engines before
hashing, with fixture magnitudes keeping absolute FP error orders of
magnitude below the 0.5e-6 decision boundary, and (c) the empirical
arrival audit, which scrambles the input layout and re-hashes every
query. This function makes the residual exposure ENUMERABLE: the
registry sweep freezes each query's site set
(``tests/float_fold_freeze.json``), so a new raw-double fold must be
reviewed against (a)–(c) before it can land. Window folds are in scope
except the ONE shape another checker genuinely covers: an
order-SENSITIVE windowed aggregate (ROWS prefix/sliding frame) is
tie-class-probed by checker #1, which proves ties value-identical —
and folding equal values in either tie order is bit-identical — so it
is skipped here; commutative aggregates over RANGE/unbounded frames
are SKIPPED BY checker #1 (frame contents are order-value-determined,
no probe runs), yet still fold the partition in physical tie order, so
their float instances are enumerated (``window-ordered:``), as are
ORDERLESS window frames (``window-unordered:``, arrival-order folds).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Window functions whose value depends only on the ORDER VALUES of the
# row, never on intra-tie physical position.
_RANK_LIKE = {"Rank", "DenseRank", "PercentRank", "CumeDist"}

# Aggregates that are commutative and duplicate-respecting: the result
# is a function of the frame's multiset of inputs, not their order.
_COMMUTATIVE_AGGS = {
    "Sum",
    "Min",
    "Max",
    "Count",
    "Average",
    "BitAndAgg",
    "BitOrAgg",
    "BitXorAgg",
    "BoolAnd",
    "BoolOr",
    "CountIf",
    "StddevSamp",
    "StddevPop",
    "VarianceSamp",
    "VariancePop",
}


@dataclass
class WindowHazard:
    """One window node that failed (or could not complete) the check."""

    kind: str  # "tie-violation" | "skipped"
    functions: Tuple[str, ...]
    partition: Tuple[str, ...]
    order: Tuple[str, ...]
    detail: str

    def __str__(self) -> str:  # pragma: no cover - formatting only
        return (
            f"[{self.kind}] fns={list(self.functions)} "
            f"partitionBy={list(self.partition)} orderBy={list(self.order)}: "
            f"{self.detail}"
        )


@dataclass
class SweepStats:
    windows_seen: int = 0
    windows_checked: int = 0
    windows_safe_by_shape: int = 0
    cache_hits: int = 0
    hazards: List[WindowHazard] = field(default_factory=list)


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _walk_windows(node, acc: list) -> list:
    if node.getClass().getSimpleName() == "Window":
        acc.append(node)
    for child in _seq(node.children()):
        _walk_windows(child, acc)
    # Scalar/lateral subqueries carry their own plans; a Window there is
    # just as hazardous.
    try:
        for sub in _seq(node.subqueries()):
            _walk_windows(sub, acc)
    except Exception:
        pass
    return acc


def _frame_parts(frame) -> Optional[Tuple[str, str, str]]:
    """(frameType, lower, upper) as SQL strings, or None if unspecified."""
    if frame.getClass().getSimpleName() != "SpecifiedWindowFrame":
        return None
    return (
        frame.frameType().sql(),
        frame.lower().sql(),
        frame.upper().sql(),
    )


def _fn_order_sensitive(wexpr) -> Tuple[bool, str]:
    """Classify one WindowExpression; returns (sensitive, label)."""
    fn = wexpr.windowFunction()
    cls = fn.getClass().getSimpleName()
    if cls in _RANK_LIKE:
        return False, cls
    if cls == "AggregateExpression":
        inner = fn.aggregateFunction().getClass().getSimpleName()
        label = f"agg:{inner}"
        if inner not in _COMMUTATIVE_AGGS:
            return True, label  # first/last/collect_list/percentile/...
        parts = _frame_parts(wexpr.windowSpec().frameSpecification())
        if parts is None:
            return True, label
        ftype, lower, upper = parts
        if ftype == "RANGE":
            return False, label
        if lower == "UNBOUNDED PRECEDING" and upper == "UNBOUNDED FOLLOWING":
            return False, label
        return True, label  # ROWS prefix or sliding frame
    # RowNumber, NTile, Lag, Lead, NthValue, python/unknown functions.
    return True, cls


def _jcolumn(spark: SparkSession, jexpr):
    from pyspark.sql.classic.column import Column as ClassicColumn

    eu = spark._jvm.org.apache.spark.sql.classic.ExpressionUtils
    return ClassicColumn(eu.column(jexpr))


def _canonical(col, dtype_str: str):
    """Make map-typed columns groupable/distinct-able."""
    if dtype_str.startswith("map<"):
        return F.array_sort(F.map_entries(col))
    return col


def window_order_hazards(
    df: DataFrame,
    *,
    cache: Optional[Dict] = None,
    stats: Optional[SweepStats] = None,
    max_report: int = 3,
) -> List[WindowHazard]:
    """Check every Window node in ``df``'s optimized plan.

    Returns the list of hazards (empty = the frame is tie-safe on this
    fixture). ``cache`` deduplicates identical (child, spec) checks
    across many DataFrames — pass one dict for a whole sweep.
    """
    spark = df.sparkSession
    stats = stats if stats is not None else SweepStats()
    cache = cache if cache is not None else {}
    hazards: List[WindowHazard] = []

    plan = df._jdf.queryExecution().optimizedPlan()
    for node in _walk_windows(plan, []):
        stats.windows_seen += 1
        sensitive_fns = []
        for alias in _seq(node.windowExpressions()):
            wexpr = alias.child()
            if wexpr.getClass().getSimpleName() != "WindowExpression":
                continue
            sensitive, label = _fn_order_sensitive(wexpr)
            if sensitive:
                sensitive_fns.append(label)
        if not sensitive_fns:
            stats.windows_safe_by_shape += 1
            continue

        part_exprs = _seq(node.partitionSpec())
        order_specs = _seq(node.orderSpec())
        order_exprs = [o.child() for o in order_specs]
        part_sql = tuple(e.sql() for e in part_exprs)
        order_sql = tuple(e.sql() for e in order_exprs)

        key_exprs = part_exprs + order_exprs
        if any(not e.deterministic() for e in key_exprs):
            hz = WindowHazard(
                kind="skipped",
                functions=tuple(sensitive_fns),
                partition=part_sql,
                order=order_sql,
                detail="non-deterministic partition/order expression",
            )
            hazards.append(hz)
            continue

        # exprIds of order/partition keys that are plain attribute refs:
        # those columns are constant on a tie class by definition.
        key_attr_ids = {
            e.exprId().id()
            for e in key_exprs
            if e.getClass().getSimpleName() == "AttributeReference"
        }
        child = node.child()
        child_attrs = _seq(child.output())
        other_attrs = [
            a for a in child_attrs if a.exprId().id() not in key_attr_ids
        ]
        if not other_attrs:
            # Tie rows are identical in every consumed column: physically
            # interchangeable, so any order-sensitive function still
            # yields the same output multiset.
            stats.windows_checked += 1
            continue

        cache_key = (
            child.semanticHash(),
            part_sql,
            order_sql,
            tuple(sorted(a.name() for a in other_attrs)),
        )
        if cache_key in cache:
            stats.cache_hits += 1
            detail = cache[cache_key]
        else:
            try:
                jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, child
                )
                child_df = DataFrame(jdf, spark)
                keys = [_jcolumn(spark, e) for e in key_exprs]
                probe = [
                    _canonical(_jcolumn(spark, a), a.dataType().sql().lower())
                    for a in other_attrs
                ]
                ties = (
                    child_df.groupBy(*keys)
                    .agg(
                        F.count(F.lit(1)).alias("__n"),
                        F.countDistinct(F.struct(*probe)).alias("__nv"),
                    )
                    .filter("__n > 1 AND __nv > 1")
                )
                bad = ties.limit(max_report).collect()
                if bad:
                    consumed = [a.name() for a in other_attrs]
                    detail = (
                        f"{len(bad)}+ tie class(es) differ in consumed "
                        f"columns {consumed}; e.g. keys="
                        f"{[tuple(r)[:-2] for r in bad]}"
                    )
                else:
                    detail = None
            except Exception as ex:  # pragma: no cover - env-specific
                detail = f"__skipped__ {type(ex).__name__}: {ex}"
            cache[cache_key] = detail

        stats.windows_checked += 1
        if detail is None:
            continue
        kind = "skipped" if detail.startswith("__skipped__") else "tie-violation"
        hazards.append(
            WindowHazard(
                kind=kind,
                functions=tuple(sensitive_fns),
                partition=part_sql,
                order=order_sql,
                detail=detail.replace("__skipped__ ", ""),
            )
        )

    stats.hazards.extend(hazards)
    return hazards


# ---------------------------------------------------------------------------
# Top-k boundary ties: the repo's OTHER hand-enforced order invariant
# ("every ORDER BY under a LIMIT carries a unique tiebreak"), made
# machine-checkable with the same plan-walk machinery. A global
# Sort + Limit k is nondeterministic iff the tie class that CONTAINS
# the k-th row straddles the boundary AND its rows differ in any other
# output column — rows inside the limit and fully-contained tie
# classes can tie freely.
# ---------------------------------------------------------------------------


def _walk_sort_limits(node, acc: list) -> list:
    """Collect (limit_k, sort_node, observable_exprs) for GlobalLimit
    over a global Sort, peeling LocalLimit and Project wrappers. A
    Project between the limit and the sort NARROWS what the query can
    observe — only its output expressions matter for tie
    interchangeability — so the projection list (if any) is returned as
    the observable set instead of the sort child's full output.
    ``observable_exprs`` is None when no Project intervenes."""
    cls = node.getClass().getSimpleName()
    if cls == "GlobalLimit":
        k_expr = node.limitExpr()
        child = node.child()
        observable = None
        n_projects = 0
        # peel LocalLimit and row-preserving Project wrappers; the
        # Project (the optimizer collapses stacks, so at most one is
        # expected) is what the query observes — its expressions
        # reference the Sort's output, so they evaluate on the sort
        # child directly
        while child.getClass().getSimpleName() in ("LocalLimit", "Project"):
            if child.getClass().getSimpleName() == "Project":
                n_projects += 1
                observable = _seq(child.projectList())
            child = child.child()
        if n_projects > 1:
            # stacked Projects would make `observable` reference the
            # lower Project's output, not the sort child — flag loudly
            # instead of mis-evaluating (never happens post-optimizer)
            observable = "UNSUPPORTED"
        if child.getClass().getSimpleName() == "Sort" and getattr(
            child, "global"
        )():
            try:
                k = int(k_expr.eval(None))
            except Exception:
                k = None
            acc.append((k, child, observable))
    for ch in _seq(node.children()):
        _walk_sort_limits(ch, acc)
    try:
        for sub in _seq(node.subqueries()):
            _walk_sort_limits(sub, acc)
    except Exception:
        pass
    return acc


def _sort_order_column(spark: SparkSession, so):
    """SortOrder -> a PySpark Column with the same direction/nulls."""
    col = _jcolumn(spark, so.child())
    direction = so.direction().sql()
    nulls = so.nullOrdering().sql()
    if direction == "ASC":
        return col.asc_nulls_last() if nulls == "NULLS LAST" else col.asc_nulls_first()
    return col.desc_nulls_first() if nulls == "NULLS FIRST" else col.desc_nulls_last()


def sort_limit_hazards(
    df: DataFrame,
    *,
    cache: Optional[Dict] = None,
    stats: Optional[SweepStats] = None,
) -> List[WindowHazard]:
    """Check every global Sort under a LIMIT in ``df``'s optimized plan:
    the k-boundary tie class must be value-identical in every other
    output column (or not straddle the boundary at all)."""
    spark = df.sparkSession
    stats = stats if stats is not None else SweepStats()
    cache = cache if cache is not None else {}
    hazards: List[WindowHazard] = []

    plan = df._jdf.queryExecution().optimizedPlan()
    for k, sort_node, observable in _walk_sort_limits(plan, []):
        stats.windows_seen += 1
        order_specs = _seq(sort_node.order())
        order_exprs = [o.child() for o in order_specs]
        order_sql = tuple(e.sql() for e in order_exprs)
        if (
            k is None
            or observable == "UNSUPPORTED"
            or any(not e.deterministic() for e in order_exprs)
        ):
            hazards.append(
                WindowHazard(
                    kind="skipped",
                    functions=("limit",),
                    partition=(),
                    order=order_sql,
                    detail="non-literal limit, stacked projections, or "
                    "non-deterministic sort key",
                )
            )
            continue
        key_attr_ids = {
            e.exprId().id()
            for e in order_exprs
            if e.getClass().getSimpleName() == "AttributeReference"
        }
        child = sort_node.child()
        if observable is not None:
            # a Project above the sort narrows what the query can
            # observe: only its expressions (minus pure key references)
            # must be constant on boundary ties. Alias exprs unwrap to
            # their child for the key-reference test; all exprs evaluate
            # against the sort child (the Project's input).
            other_attrs = []
            for e in observable:
                inner = e.child() if e.getClass().getSimpleName() == "Alias" else e
                if (
                    inner.getClass().getSimpleName() == "AttributeReference"
                    and inner.exprId().id() in key_attr_ids
                ):
                    continue
                other_attrs.append(inner)
        else:
            other_attrs = [
                a
                for a in _seq(child.output())
                if a.exprId().id() not in key_attr_ids
            ]
        if not other_attrs:
            stats.windows_checked += 1
            continue  # boundary ties are full duplicates — interchangeable
        cache_key = (
            "sortlimit",
            child.semanticHash(),
            k,
            order_sql,
            # observable entries may be arbitrary expressions, not just
            # attributes — key on their SQL text
            tuple(sorted(a.sql() for a in other_attrs)),
        )
        if cache_key in cache:
            stats.cache_hits += 1
            detail = cache[cache_key]
        else:
            try:
                jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, child
                )
                child_df = DataFrame(jdf, spark)
                keys = [_jcolumn(spark, e) for e in order_exprs]
                probe = [
                    _canonical(_jcolumn(spark, a), a.dataType().sql().lower())
                    for a in other_attrs
                ]
                classes = child_df.groupBy(*keys).agg(
                    F.count(F.lit(1)).alias("__n"),
                    F.countDistinct(F.struct(*probe)).alias("__nv"),
                )
                from pyspark.sql import Window as _W

                wspec = _W.orderBy(
                    *[_sort_order_column(spark, so) for so in order_specs]
                ).rowsBetween(_W.unboundedPreceding, 0)
                # single-partition window over O(tie classes) rows —
                # checker-only, never a production plan
                boundary = (
                    classes.withColumn("__cum", F.sum("__n").over(wspec))
                    .filter(
                        (F.col("__cum") - F.col("__n") < F.lit(k))
                        & (F.col("__cum") > F.lit(k))
                        & (F.col("__nv") > 1)
                    )
                    .limit(3)
                    .collect()
                )
                if boundary:
                    detail = (
                        f"LIMIT {k} boundary tie class straddles the cut "
                        f"with non-identical rows in "
                        f"{[a.sql() for a in other_attrs]}: keys="
                        f"{[tuple(r)[:-3] for r in boundary]}"
                    )
                else:
                    detail = None
            except Exception as ex:  # pragma: no cover - env-specific
                detail = f"__skipped__ {type(ex).__name__}: {ex}"
            cache[cache_key] = detail
        stats.windows_checked += 1
        if detail is None:
            continue
        kind = "skipped" if detail.startswith("__skipped__") else "tie-violation"
        hazards.append(
            WindowHazard(
                kind=kind,
                functions=("limit",),
                partition=(),
                order=order_sql,
                detail=detail.replace("__skipped__ ", ""),
            )
        )
    stats.hazards.extend(hazards)
    return hazards


# ---------------------------------------------------------------------------
# Aggregate-node order conventions (round 9, VERDICT r8 §Next #2): the
# third order-nondeterminism class, after window ties (rounds 7–8) and
# Sort+LIMIT boundary ties (round 8). collect_list/collect_set emit
# ARRIVAL-ordered arrays; first/last/any_value pick an ARRIVAL-chosen
# row — both are deterministic only if (a) the collect is sorted by
# value or (b) the picked argument is constant per group.
# ---------------------------------------------------------------------------

_ORDERED_COLLECTS = {"CollectList", "CollectSet"}
_SORT_WRAPPERS = {"SortArray", "ArraySort"}
# ArraySort ALWAYS carries a LambdaFunction comparator child — the
# default one is a full-element total order. A CUSTOM comparator
# (array_sort(col, (a,b)->…)) may ignore element fields or fail
# totality (e.g. ``(a,b) -> if(a<b,-1,0)`` returns 0 for BOTH a==b and
# a>b), leaving comparator-ties arrival-ordered — and a SQL-text form
# of that very comparator canonicalizes to an IF-chain sharing the
# default's PREFIX, so prefix matching is unsound (ADVICE r9 #1).
# Only FULL SQL equality against the two canonical default forms
# counts as a sort wrapper: the constant-folded non-nullable chain and
# the nullable null-handling chain (NULLs sort last, then the same
# total order). Both are element-type-independent (struct and bigint
# elements render identically); tests/test_window_orders.py re-derives
# them from a live session so Spark-version drift fails loudly.
# SortArray's second child is just the asc/desc literal — always a
# full order.
_NLV = "namedlambdavariable()"
_DEFAULT_CMP_CORE = (
    f"(IF(({_NLV} < {_NLV}), -1, (IF(({_NLV} > {_NLV}), 1, 0))))"
)
_DEFAULT_COMPARATOR_SQLS = frozenset(
    {
        # non-nullable elements: the bare total-order chain
        f"lambdafunction({_DEFAULT_CMP_CORE}, {_NLV}, {_NLV})",
        # nullable elements: NULL/NULL → 0, one-sided NULL → ±1, else
        # the same chain
        "lambdafunction((IF((("
        f"{_NLV} IS NULL) AND ({_NLV} IS NULL)), 0, "
        f"(IF(({_NLV} IS NULL), 1, (IF(({_NLV} IS NULL), -1, "
        f"{_DEFAULT_CMP_CORE})))))), {_NLV}, {_NLV})",
    }
)
# Nodes through which a sort wrapper PROVABLY still canonicalizes a
# collect's output (ADVICE r9 #3 inverted the old CreateArray/
# ArrayRepeat blacklist — any constructor not listed here resets
# under_sort, so CreateMap/MapValues/MapFromEntries nesting now takes
# the allowlist path instead of vacuously passing). Transparency test:
# the node maps the multiset of its input elements to an output
# multiset that is ARRIVAL-INDEPENDENT (elementwise or set-algebraic),
# so sorting its output yields one canonical array. Deliberately
# absent: ArrayTransform (a two-arg (element, index) lambda injects
# arrival position), Slice/ElementAt/ArraysZip (positional pre-sort),
# every map/array CONSTRUCTOR (the sort orders the constructed
# collection, not arrays nested in its elements).
_SORT_TRANSPARENT = {
    "Alias",
    "Cast",
    "Concat",
    "Reverse",
    "ArrayDistinct",
    "ArrayCompact",
    "Flatten",
    "ArrayUnion",
    "ArrayIntersect",
    "ArrayExcept",
    "ArrayRemove",
}
_PICK_AGGS = {"First", "Last", "AnyValue"}


def _walk_class(node, cls_name: str, acc: list) -> list:
    if node.getClass().getSimpleName() == cls_name:
        acc.append(node)
    for child in _seq(node.children()):
        _walk_class(child, cls_name, acc)
    try:
        for sub in _seq(node.subqueries()):
            _walk_class(sub, cls_name, acc)
    except Exception:
        pass
    return acc


def checkpoint_opaque(df: DataFrame) -> int:
    """Number of ``LogicalRDD`` leaves in the optimized plan — each one
    a lineage truncation this module's walkers cannot see through.
    Callers sweeping for order hazards must either neutralize the
    truncation (``DWOS_FULL_PLAN=1`` for ``_helpers.ckpt`` sites) or
    allowlist the query by name with a justification."""
    plan = df._jdf.queryExecution().optimizedPlan()
    return len(_walk_class(plan, "LogicalRDD", []))


def logical_rdd_ids(df: DataFrame) -> list:
    """The RDD ids behind every ``LogicalRDD`` leaf of the optimized
    plan. A checkpointed frame's id survives plan composition unchanged
    (probed live), so a sweep that records the POST-checkpoint frames'
    ids can classify each leaf of a final plan EXACTLY: id ∈ recorded →
    a walked iter_ckpt/ckpt truncation; id ∉ recorded → something else
    (by test_no_direct_local_checkpoint, only a bounded createDataFrame
    literal frame) that must be allowlisted. Classifying by leaf
    identity instead of ``opaque and not caps`` fixes the ADVICE r10
    conflation: a query that both iterates through iter_ckpt AND
    carries a literal leaf now has its literal leaf enumerated."""
    plan = df._jdf.queryExecution().optimizedPlan()
    return [leaf.rdd().id() for leaf in _walk_class(plan, "LogicalRDD", [])]


def _scan_expr_collects(expr, under_sort: bool, collects: list, picks: list):
    """Recursive expression walk: record bare (unsorted) collect_list /
    collect_set aggregate calls, and every first/last/any_value call
    with its (function class, ignoreNulls, argument expr, FILTER expr).
    The FILTER clause matters: Catalyst's RewriteDistinctAggregates
    emits ``first(partial) FILTER (WHERE gid = 0)`` internally, and the
    pick argument is constant only WITHIN the filtered rows — probing
    without the filter false-flags every multi-distinct aggregate."""
    cls = expr.getClass().getSimpleName()
    if cls == "AggregateExpression":
        # judged on the INCOMING flag — the chain of wrappers ABOVE the
        # collect decides whether its output order is canonical
        fn = expr.aggregateFunction()
        inner = fn.getClass().getSimpleName()
        if inner in _ORDERED_COLLECTS and not under_sort:
            args = ", ".join(c.sql() for c in _seq(fn.children()))
            collects.append(f"{inner}({args})")
        if inner in _PICK_AGGS:
            try:
                ignore_nulls = bool(fn.ignoreNulls())
            except Exception:
                ignore_nulls = False
            # the pick argument is the function's first child (First/
            # Last carry the ignoreNulls flag separately in Spark 4)
            arg = _seq(fn.children())[0]
            filt = expr.filter()
            filt_expr = filt.get() if filt.isDefined() else None
            picks.append((inner, ignore_nulls, arg, filt_expr))
    # flag for the CHILDREN: set by sort wrappers, passed through
    # provably-transparent nodes, severed by everything else
    if cls == "SortArray":
        under_sort = True
    elif cls == "ArraySort":
        try:
            is_default = expr.function().sql() in _DEFAULT_COMPARATOR_SQLS
        except Exception:
            is_default = False
        # a custom comparator is NOT a sort wrapper AND severs any
        # outer sort (its output order is comparator-defined, possibly
        # tie-ambiguous) — fail-safe toward the allowlist path
        under_sort = is_default
    elif cls not in _SORT_TRANSPARENT:
        # fail-safe default: any node not PROVEN to pass a canonical
        # ordering through (constructors, positional ops, lambdas,
        # unknown future nodes) severs the sort — closes both the
        # sort_array(array(collect_list(x))) nesting pass and its map
        # twins (CreateMap/MapValues/MapFromEntries) in one rule
        # (ADVICE r9 #3)
        under_sort = False
    for child in _seq(expr.children()):
        _scan_expr_collects(child, under_sort, collects, picks)


def aggregate_order_hazards(
    df: DataFrame,
    *,
    cache: Optional[Dict] = None,
    stats: Optional[SweepStats] = None,
) -> List[WindowHazard]:
    """Check every Aggregate node in ``df``'s optimized plan:
    collect_* must be sort-wrapped (structural), first/last/any_value
    arguments must be constant per group on the fixture (empirical).
    Returns hazards; reuse one ``cache`` across a sweep."""
    spark = df.sparkSession
    stats = stats if stats is not None else SweepStats()
    cache = cache if cache is not None else {}
    hazards: List[WindowHazard] = []

    plan = df._jdf.queryExecution().optimizedPlan()
    for node in _walk_class(plan, "Aggregate", []):
        stats.windows_seen += 1
        collects: list = []
        picks: list = []
        for named in _seq(node.aggregateExpressions()):
            _scan_expr_collects(named, False, collects, picks)
        group_exprs = _seq(node.groupingExpressions())
        group_sql = tuple(e.sql() for e in group_exprs)

        if collects:
            hazards.append(
                WindowHazard(
                    kind="unsorted-collect",
                    functions=tuple(collects),
                    partition=group_sql,
                    order=(),
                    detail="collect_list/collect_set not wrapped in "
                    "sort_array/array_sort — array order is arrival order",
                )
            )
        if not picks:
            if not collects:
                stats.windows_safe_by_shape += 1
            continue

        if any(not e.deterministic() for e in group_exprs):
            hazards.append(
                WindowHazard(
                    kind="skipped",
                    functions=tuple(p[0] for p in picks),
                    partition=group_sql,
                    order=(),
                    detail="non-deterministic grouping expression",
                )
            )
            continue

        child = node.child()
        pick_sql = tuple(
            f"{fn}({arg.sql()}){' ignorenulls' if ign else ''}"
            + (f" filter({filt.sql()})" if filt is not None else "")
            for fn, ign, arg, filt in picks
        )
        cache_key = ("aggpick", child.semanticHash(), group_sql, pick_sql)
        if cache_key in cache:
            stats.cache_hits += 1
            detail = cache[cache_key]
        else:
            try:
                jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, child
                )
                child_df = DataFrame(jdf, spark)
                keys = [_jcolumn(spark, e) for e in group_exprs]
                aggs = []
                for i, (fn, ign, arg, filt) in enumerate(picks):
                    col = _canonical(
                        _jcolumn(spark, arg), arg.dataType().sql().lower()
                    )
                    # ignoreNulls picks can never return a NULL the
                    # strict form could — probe null-ignoring
                    # distinctness; strict forms must also agree on
                    # WHERE the nulls are, so count NULL as a value
                    # via the struct wrap.
                    probe = col if ign else F.struct(col)
                    if filt is not None:
                        # rows failing the FILTER are invisible to the
                        # pick — a when() that yields NULL (plain or
                        # struct alike) drops them from countDistinct
                        probe = F.when(_jcolumn(spark, filt), probe)
                    aggs.append(F.countDistinct(probe).alias(f"__nv{i}"))
                nv_cols = [f"__nv{i}" for i in range(len(picks))]
                grouped = child_df.groupBy(*keys).agg(*aggs) if keys else (
                    child_df.agg(*aggs)
                )
                cond = " OR ".join(f"{c} > 1" for c in nv_cols)
                bad = grouped.filter(cond).limit(3).collect()
                if bad:
                    detail = (
                        f"non-constant pick argument(s) within group(s): "
                        f"{[tuple(r) for r in bad]} for {list(pick_sql)}"
                    )
                else:
                    detail = None
            except Exception as ex:  # pragma: no cover - env-specific
                detail = f"__skipped__ {type(ex).__name__}: {ex}"
            cache[cache_key] = detail

        stats.windows_checked += 1
        if detail is None:
            continue
        kind = "skipped" if detail.startswith("__skipped__") else "tie-violation"
        hazards.append(
            WindowHazard(
                kind=kind,
                functions=pick_sql,
                partition=group_sql,
                order=(),
                detail=detail.replace("__skipped__ ", ""),
            )
        )

    stats.hazards.extend(hazards)
    return hazards


# ---------------------------------------------------------------------------
# Multi-column carry desync (round 10, VERDICT r9 §Next #2): the
# FOURTH order-correctness class, mechanizing the j17 lesson. TWO OR
# MORE first/last(IGNORE NULLS) picks over the same window spec form a
# coherent multi-column carry ONLY if their arguments' NULL patterns
# coincide row-wise — then every pick skips exactly the same rows and
# lands on the same source row. If the patterns can diverge, one
# column carries from a DIFFERENT (older) row than another, silently
# desyncing the carried tuple: j17's (view ts, view cents) pair did
# exactly this on NULL view values, green on the NULL-free fixture for
# two rounds. first/last WITHOUT ignoreNulls always pick the frame
# edge row for every argument — no desync possible — so only
# ignoreNulls picks are probed.
# ---------------------------------------------------------------------------


def _null_pattern(expr) -> Optional[tuple]:
    """Resolve an expression's NULL condition to a canonical token, or
    None if unprovable. Handled forms (everything the repo's carry
    sites legitimately use):

    - statically non-nullable expression → ("never-null",)
    - bare attribute a → ("isnull", a.sql())
    - single-branch CASE WHEN c THEN v [ELSE NULL] with v non-nullable
      and c deterministic → ("not", c.sql()), normalized to
      ("isnull", x.sql()) when c is IsNotNull(x) — so a bare carried
      column and its ``when(col.isNotNull(), companion)`` twin resolve
      EQUAL (the w8 gap-fill idiom).

    The resolver is deliberately conservative: a pattern it cannot
    prove is a hazard, not a pass — the j17 desync was LATENT (zero
    diverging rows on the NULL-free fixture), so only static proof
    counts; the fixture probe is triage detail."""
    cls = expr.getClass().getSimpleName()
    if cls == "Alias":
        return _null_pattern(expr.child())
    try:
        if not expr.nullable():
            return ("never-null",)
    except Exception:
        return None
    if cls == "AttributeReference":
        return ("isnull", expr.sql())
    if cls == "CaseWhen":
        try:
            branches = _seq(expr.branches())
            else_opt = expr.elseValue()
        except Exception:
            return None
        if len(branches) != 1:
            return None
        if else_opt.isDefined():
            ev = else_opt.get()
            is_null_literal = (
                ev.getClass().getSimpleName() == "Literal"
                and ev.value() is None
            )
            if not is_null_literal:
                return None
        cond = branches[0]._1()
        val = branches[0]._2()
        if val.nullable() or not cond.deterministic():
            return None
        if cond.getClass().getSimpleName() == "IsNotNull":
            return ("isnull", _seq(cond.children())[0].sql())
        return ("not", cond.sql())
    return None


def multi_carry_hazards(
    df: DataFrame,
    *,
    cache: Optional[Dict] = None,
    stats: Optional[SweepStats] = None,
) -> List[WindowHazard]:
    """STATICALLY verify, for every Window node carrying ≥2 DISTINCT
    first/last(ignoreNulls) arguments under the same (function, frame),
    that the arguments are provably NULL-SYNCED (``_null_pattern``
    tokens resolve and agree) — then every pick skips the same rows and
    lands on the same source row. Unproven groups → hazard, with the
    fixture's empirical desync count in the detail (0 = LATENT, the
    j17 shape; >0 = live divergence). Queries whose contract is
    genuinely per-column-independent carry-forward must be allowlisted
    by name at the call site with a justification."""
    spark = df.sparkSession
    stats = stats if stats is not None else SweepStats()
    cache = cache if cache is not None else {}
    hazards: List[WindowHazard] = []

    plan = df._jdf.queryExecution().optimizedPlan()
    for node in _walk_windows(plan, []):
        groups: Dict[tuple, dict] = {}
        for alias in _seq(node.windowExpressions()):
            wexpr = alias.child()
            if wexpr.getClass().getSimpleName() != "WindowExpression":
                continue
            fn = wexpr.windowFunction()
            if fn.getClass().getSimpleName() != "AggregateExpression":
                continue
            agg = fn.aggregateFunction()
            inner = agg.getClass().getSimpleName()
            if inner not in ("First", "Last"):
                continue
            try:
                ignore_nulls = bool(agg.ignoreNulls())
            except Exception:
                ignore_nulls = False
            if not ignore_nulls:
                continue
            frame = wexpr.windowSpec().frameSpecification().sql()
            arg = _seq(agg.children())[0]
            groups.setdefault((inner, frame), {}).setdefault(arg.sql(), arg)

        part_sql = tuple(e.sql() for e in _seq(node.partitionSpec()))
        order_sql = tuple(o.child().sql() for o in _seq(node.orderSpec()))
        child = node.child()
        # Catalyst pre-projects computed window arguments into the
        # child Project (arg becomes a bare `_wN` attribute) — resolve
        # one level through it so `when(cond, x)` args keep their
        # static null pattern instead of degrading to ("isnull", _wN).
        subst: Dict[int, object] = {}
        if child.getClass().getSimpleName() == "Project":
            for ne in _seq(child.projectList()):
                if ne.getClass().getSimpleName() == "Alias":
                    subst[ne.exprId().id()] = ne.child()

        def _resolved_pattern(arg):
            if arg.getClass().getSimpleName() == "AttributeReference":
                defn = subst.get(arg.exprId().id())
                if defn is not None:
                    return _null_pattern(defn)
            return _null_pattern(arg)

        for (inner, frame), by_sql in sorted(groups.items()):
            if len(by_sql) < 2:
                continue
            stats.windows_seen += 1
            arg_sqls = tuple(sorted(by_sql))
            patterns = {s: _resolved_pattern(by_sql[s]) for s in arg_sqls}
            if (
                all(p is not None for p in patterns.values())
                and len(set(patterns.values())) == 1
            ):
                # provably NULL-synced: all picks always skip the same
                # rows → coherent carry under ANY input, not just the
                # fixture
                stats.windows_safe_by_shape += 1
                continue
            cache_key = ("carry", child.semanticHash(), inner, frame, arg_sqls)
            if cache_key in cache:
                stats.cache_hits += 1
                detail = cache[cache_key]
            else:
                # unprovable → hazard; the fixture desync count is
                # TRIAGE detail only (0 = latent j17 shape, >0 = live)
                try:
                    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                        spark._jsparkSession, child
                    )
                    child_df = DataFrame(jdf, spark)
                    cols = [_jcolumn(spark, by_sql[s]) for s in arg_sqls]
                    base = cols[0]
                    aggs = [
                        F.count(
                            F.when(base.isNull() != c.isNull(), F.lit(1))
                        ).alias(f"__desync{i}")
                        for i, c in enumerate(cols[1:], 1)
                    ]
                    row = child_df.agg(*aggs).collect()[0]
                    n_desync = sum(int(v) for v in row)
                    triage = (
                        "LATENT — restructure to a single-struct carry "
                        "or allowlist with a precondition test"
                        if n_desync == 0
                        else "LIVE divergence"
                    )
                    detail = (
                        f"{inner}(… IGNORE NULLS) carries not PROVABLY "
                        f"NULL-synced (patterns {patterns}); fixture "
                        f"desync rows: {n_desync} ({triage})"
                    )
                except Exception as ex:  # pragma: no cover - env-specific
                    detail = f"__skipped__ {type(ex).__name__}: {ex}"
                cache[cache_key] = detail
            stats.windows_checked += 1
            if detail is None:
                continue
            kind = "skipped" if detail.startswith("__skipped__") else "carry-desync"
            hazards.append(
                WindowHazard(
                    kind=kind,
                    functions=(f"{inner} ignorenulls",) + arg_sqls,
                    partition=part_sql,
                    order=order_sql,
                    detail=detail.replace("__skipped__ ", ""),
                )
            )

    stats.hazards.extend(hazards)
    return hazards


# ---------------------------------------------------------------------------
# 5th class (round 12): layout-order-sensitive numeric folds.
# ---------------------------------------------------------------------------

# Aggregates whose buffers are floating-point REGARDLESS of input type:
# Welford/M2 co-moment updates divide and subtract doubles, so even
# integer inputs produce combine-order-dependent low bits.
_MOMENT_AGGS = {
    "StddevSamp",
    "StddevPop",
    "VarianceSamp",
    "VariancePop",
    "Skewness",
    "Kurtosis",
    "Corr",
    "CovPopulation",
    "CovSample",
    "CentralMomentAgg",
    "RegrSlope",
    "RegrIntercept",
    "RegrR2",
    "RegrSXY",
    "RegrSXX",
    "RegrSYY",
    "RegrAvgX",
    "RegrAvgY",
    "Product",  # double multiply buffer — same combine-order exposure
}

# Sketches whose MERGE is not provably commutative-exact (unlike HLL,
# whose register-max merge is): quantile summaries compress based on
# insertion/merge order.
_SKETCH_AGGS = {"ApproximatePercentile", "HistogramNumeric"}

# Exact over int/long (long buffer, or integer-valued doubles < 2^53
# never arise: Spark sums integral types in LongType / Decimal in
# DecimalType) — order-sensitive ONLY when the input itself is
# floating-point.
_SUM_LIKE_AGGS = {"Sum", "Average", "TrySum", "TryAverage"}

_FLOAT_TYPES = ("double", "float")


def _fold_descriptor(prefix: str, inner: str, fn) -> str:
    import hashlib

    args = ", ".join(c.sql() for c in _seq(fn.children()))
    s = f"{prefix}:{inner}({args})"
    if len(s) > 160:
        # hash suffix keeps truncated descriptors collision-free: two
        # distinct long expressions sharing a 140-char prefix (and even
        # a length) must not freeze-match each other
        digest = hashlib.sha256(s.encode()).hexdigest()[:10]
        s = s[:140] + f"…{digest}"
    return s


def _scan_float_folds(expr, acc: list, prefix: str) -> None:
    cls = expr.getClass().getSimpleName()
    if cls == "AggregateExpression":
        fn = expr.aggregateFunction()
        inner = fn.getClass().getSimpleName()
        kids = _seq(fn.children())
        if inner in _MOMENT_AGGS or inner in _SKETCH_AGGS:
            acc.append(_fold_descriptor(prefix, inner, fn))
        elif inner in _SUM_LIKE_AGGS and kids:
            try:
                dt = kids[0].dataType().catalogString()
            except Exception:
                dt = "?"
            if dt in _FLOAT_TYPES or dt == "?":
                acc.append(_fold_descriptor(prefix, f"{inner}[{dt}]", fn))
    for child in _seq(expr.children()):
        _scan_float_folds(child, acc, prefix)


def float_fold_sites(df: DataFrame, *, stats: Optional[SweepStats] = None) -> tuple:
    """Sorted, deduplicated descriptors of every layout-order-sensitive
    numeric fold in ``df``'s optimized plan (see module docstring).
    Purely static — no fixture evaluation; callers freeze the per-query
    site sets so new raw-float folds force a review. Returned as a SET
    (not multiset) so iterative queries whose per-round pre-checkpoint
    frames repeat the same shapes freeze identically at every scale
    factor / convergence round count."""
    stats = stats if stats is not None else SweepStats()
    plan = df._jdf.queryExecution().optimizedPlan()
    acc: list = []
    for node in _walk_class(plan, "Aggregate", []):
        stats.windows_seen += 1
        for named in _seq(node.aggregateExpressions()):
            _scan_float_folds(named, acc, "agg")
    for node in _walk_windows(plan, []):
        stats.windows_seen += 1
        ordered = bool(_seq(node.orderSpec()))
        if not ordered:
            for alias in _seq(node.windowExpressions()):
                _scan_float_folds(alias, acc, "window-unordered")
            continue
        # Ordered window: a fold is out of scope here ONLY if checker
        # #1 actually probes it — i.e. _fn_order_sensitive classifies
        # it order-SENSITIVE (ROWS prefix/sliding frames), in which
        # case the tie-class probe proves value-identical ties and
        # equal values fold bit-identically in any tie order. The
        # shapes checker #1 skips WITHOUT probing — commutative
        # aggregates over RANGE or unbounded frames — still fold the
        # partition in physical tie order, so their float instances
        # belong in the freeze (round-12 self-review finding #1: the
        # first version skipped every ordered window on a premise
        # checker #1 does not establish).
        for alias in _seq(node.windowExpressions()):
            if alias.getClass().getSimpleName() != "Alias":
                continue
            wexpr = alias.child()
            if wexpr.getClass().getSimpleName() != "WindowExpression":
                continue
            sensitive, _label = _fn_order_sensitive(wexpr)
            if sensitive:
                stats.windows_safe_by_shape += 1
                continue
            _scan_float_folds(wexpr, acc, "window-ordered")
    stats.windows_checked += len(acc)
    return tuple(sorted(set(acc)))
