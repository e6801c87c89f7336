"""Extended-SQL frontend: ASOF JOIN and SIMILARITY JOIN keywords.

SURVEY.md §4.2 notes that no §2 operator *requires* a Catalyst rule, and
marks an ``ASOF JOIN`` keyword / similarity-join rewrite as optional
polish via ``spark.sql.extensions``. A real injected rule needs a
compiled Scala/JVM class on the driver classpath, which this
Python-only repo cannot ship — so the same surface is provided one
layer up: :func:`sql` accepts a documented superset of Spark SQL,
lowers the extended constructs to the engine's scale-safe DataFrame
plans (the union-timeline as-of join, the inverted-index similarity
join), and hands everything else to ``spark.sql`` verbatim. The user
experience is identical — write SQL with the extra keyword, get back a
DataFrame whose physical plan is the one a planner rule would have
produced.

Grammar (case-insensitive; one extended join per statement):

``ASOF JOIN``::

    SELECT <select-list>
    FROM <left>  [AS] <la>
    ASOF [LEFT] JOIN <right> [AS] <ra>
      ON <la>.<k1> = <ra>.<k1> [AND <la>.<k2> = <ra>.<k2> ...]
     AND <la>.<ts> >= <ra>.<ts>
    [remaining clauses...]

  ``<left>``/``<right>`` are table/temp-view names. For each left row,
  the matched right row is the latest one with equal ``<key>`` and
  ``<ts>`` at-or-before the left row's (DuckDB/Pandas ``merge_asof``
  "backward" semantics). Plain ``ASOF JOIN`` drops unmatched left rows;
  ``ASOF LEFT JOIN`` keeps them with nulls. In the result, columns are
  addressed ``<la>.<col>`` / ``<ra>.<col>`` exactly as written — the
  rewrite maps them onto the lowered plan's flat namespace.

  Lowering (scale note): union both inputs with a kind marker, one
  window partitioned BY KEY ordered by (ts, kind) carrying the right
  row forward as a packed struct with ``last(..., ignorenulls=True)``,
  keep left rows. One shuffle on the key, no per-row range probe, no
  O(left × right) blow-up — the 100 TB-safe as-of plan (same shape as
  operators/windows.py::j7_asof_join). Ties: right rows sort before
  left rows at equal ts (inclusive ``>=``); among right rows with
  identical (key, ts) the struct-greatest row wins — deterministic,
  where a sort-merge ASOF picks arbitrarily.

``SIMILARITY JOIN``::

    SELECT <select-list>
    FROM <t> [AS] <a> SIMILARITY JOIN <t> [AS] <b>
      ON token_jaccard(<a>.<text>, <b>.<text>) >= <threshold>
     AND <a>.<id> < <b>.<id>
    [remaining clauses...]

  Exact distinct-token Jaccard (whitespace tokens — the engine's
  ``functions.text.tokens`` definition) over a self-join, lowered to the
  inverted-index form (explode tokens, equi-join on token, count common
  per pair) — the planner-level rewrite §4.2 describes: the user writes
  the O(n²) pairwise predicate, the plan that runs is the token-blocked
  join that survives 100 TB. Result columns: ``<a>.<id>``, ``<b>.<id>``
  and ``similarity``.

``QUALIFY``::

    SELECT <select-list>
    FROM <single-table clauses...>
    QUALIFY (ROW_NUMBER()|RANK()|DENSE_RANK())
            OVER (PARTITION BY ... ORDER BY ...) <= <k>

  Snowflake/DuckDB-style window filtering without a subquery. Lowered
  by appending the window expression to the select list, filtering on
  it, and dropping the helper column — which Spark's optimizer then
  compiles to ``WindowGroupLimit``: each group's top-k is taken
  BEFORE the shuffle (partial group-limit on the map side), so the
  window never materializes whole partitions — the same decorrelated
  shape j10_lateral_topk pins. The QUALIFY clause must be last
  (matching the documented single-statement grammar; put ORDER BY in
  an outer query), and the predicate must be ``<= <int literal>``.

Anything not matching these shapes (and any plain SQL) passes through
``spark.sql`` untouched; a malformed extended clause raises
``SqlExtError`` with the expected grammar rather than silently
delegating.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as _text

__all__ = ["sql", "asof_join", "SqlExtError"]


class SqlExtError(ValueError):
    """Raised when an extended-SQL clause is recognized but malformed."""


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _qid(name: str) -> str:
    """Backtick-quote an identifier for a generated select list — a
    schema column needing quoting (space, hyphen, reserved word) must
    not produce invalid rewritten SQL (ADVICE r5)."""
    return "`" + name.replace("`", "``") + "`"


def _ident_key(spark: SparkSession):
    """Column-name matching for schema-driven rewrites: case-insensitive
    by default (Spark's resolution default), case-SENSITIVE when the
    session runs spark.sql.caseSensitive=true — otherwise a rewrite
    could substitute both of two case-distinct columns (ADVICE r5)."""
    cs = str(spark.conf.get("spark.sql.caseSensitive", "false")).lower() == "true"
    return (lambda s: s) if cs else str.lower


def _unquote_ident(c: str) -> str:
    """Strip surrounding backticks from a user-written column name and
    unescape doubled backticks (the inverse of _qid) — EXCLUDE/REPLACE
    lists must accept the same quoted spellings the rewrite emits."""
    c = c.strip()
    if len(c) >= 2 and c[0] == c[-1] == "`":
        c = c[1:-1].replace("``", "`")
    return c

_ASOF_RE = re.compile(
    rf"""
    \bFROM\s+ (?P<lt>{_IDENT}) (?:\s+AS)? \s+ (?P<la>{_IDENT})
    \s+ ASOF \s+ (?P<left>LEFT\s+)? JOIN
    \s+ (?P<rt>{_IDENT}) (?:\s+AS)? \s+ (?P<ra>{_IDENT})
    \s+ ON \s+ (?P<eqs>
        {_IDENT}\.{_IDENT} \s* = \s* {_IDENT}\.{_IDENT}
        (?: \s+ AND \s+ {_IDENT}\.{_IDENT} \s* = \s* {_IDENT}\.{_IDENT} )*
    )
    \s+ AND \s+ (?P<t1a>{_IDENT})\.(?P<t1c>{_IDENT})
    \s* >= \s* (?P<t2a>{_IDENT})\.(?P<t2c>{_IDENT})
    """,
    re.IGNORECASE | re.VERBOSE,
)

_ASOF_EQ_RE = re.compile(
    rf"(?P<a1>{_IDENT})\.(?P<c1>{_IDENT})\s*=\s*(?P<a2>{_IDENT})\.(?P<c2>{_IDENT})"
)

_SIM_RE = re.compile(
    rf"""
    \bFROM\s+ (?P<lt>{_IDENT}) (?:\s+AS)? \s+ (?P<la>{_IDENT})
    \s+ SIMILARITY \s+ JOIN
    \s+ (?P<rt>{_IDENT}) (?:\s+AS)? \s+ (?P<ra>{_IDENT})
    \s+ ON \s+ token_jaccard \s* \(
        \s* (?P<x1a>{_IDENT})\.(?P<x1c>{_IDENT}) \s* , \s*
        (?P<x2a>{_IDENT})\.(?P<x2c>{_IDENT}) \s* \)
    \s* >= \s* (?P<thr>\d+(?:\.\d+)?)
    \s+ AND \s+ (?P<i1a>{_IDENT})\.(?P<i1c>{_IDENT})
    \s* < \s* (?P<i2a>{_IDENT})\.(?P<i2c>{_IDENT})
    """,
    re.IGNORECASE | re.VERBOSE,
)


_QUALIFY_RE = re.compile(
    r"""
    ^(?P<head>.*?)
    \bQUALIFY\s+
    (?P<fn>ROW_NUMBER|RANK|DENSE_RANK) \s* \( \s* \) \s+
    OVER \s* \( (?P<over>(?:[^()]+|\([^()]*\))*) \) \s*
    <= \s* (?P<k>\d+)
    \s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


def _lower_qualify(spark: SparkSession, m: re.Match) -> DataFrame:
    """Lower QUALIFY: inject the window expression into the select
    list, filter, drop. The injection point is the statement's first
    top-level FROM — same documented restriction as the join
    constructs (no subquery with its own FROM ahead of the main one).
    """
    head = m.group("head")
    fm = re.search(r"\bFROM\b", head, re.IGNORECASE)
    if fm is None:
        raise SqlExtError("QUALIFY statement must contain a FROM clause")
    inner = (
        head[: fm.start()]
        + f", {m.group('fn')}() OVER ({m.group('over')}) AS __qualify_rank "
        + head[fm.start() :]
    )
    lowered = spark.sql(inner)
    return lowered.filter(F.col("__qualify_rank") <= int(m.group("k"))).drop(
        "__qualify_rank"
    )


def _qualify(sql_text: str, aliases: dict[str, str]) -> str:
    """Rewrite ``alias.col`` references onto the lowered flat namespace
    (``alias.col`` → ``alias_col``) for the given aliases only.

    Textual, not lexical: an ``alias.col``-shaped substring INSIDE a
    string literal would also rewrite. Acceptable for this frontend's
    documented grammar (a full implementation hooks the real parser via
    a Catalyst extension — the JVM-classpath route plans/sql_ext.py's
    module docstring explains this repo cannot ship)."""

    def sub(m: re.Match) -> str:
        a = m.group(1)
        return f"{aliases[a.lower()]}_{m.group(2)}" if a.lower() in aliases else m.group(0)

    return re.sub(rf"\b({_IDENT})\.({_IDENT})\b", sub, sql_text)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    left_prefix: str = "l",
    right_prefix: str = "r",
    tolerance: str | None = None,
) -> DataFrame:
    """General backward as-of join as a reusable DataFrame transform.

    For each left row, attach the right row with equal key(s) and the
    greatest ``right_ts`` <= ``left_ts`` (inclusive). Output columns are
    ``{left_prefix}_<col>`` for every left column and
    ``{right_prefix}_<col>`` for every right column (null-filled when
    ``how='left'`` and no match exists; unmatched left rows are dropped
    when ``how='inner'``).

    One shuffle on the key, window carry of a packed struct — never a
    range probe per row. Ties at equal (key, ts): right rows are
    eligible (inclusive), and among identical right timestamps the
    struct-greatest right row is carried (deterministic).

    ``tolerance`` (an INTERVAL literal body, e.g. ``"30 minutes"``)
    bounds the lookback like pandas ``merge_asof(tolerance=...)``: a
    carried right row older than ``left_ts - tolerance`` is treated as
    no match (nulled for ``how='left'``, dropped for ``'inner'``). The
    filter is applied AFTER the carry, so the plan shape is unchanged —
    and it is exactly what lets a streaming/stateful variant expire
    state: matches beyond the horizon are unreachable by construction.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"as-of key {k!r} must exist on both sides")

    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns]
    ts_t = "timestamp"

    r_side = right.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)],
        F.col(right_ts).cast(ts_t).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("__r"),
        F.lit(None).cast(left.select(F.struct(*lcols).alias("s")).schema["s"].dataType).alias(
            "__l"
        ),
    )
    l_side = left.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(keys)],
        F.col(left_ts).cast(ts_t).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(right.select(F.struct(*rcols).alias("s")).schema["s"].dataType).alias(
            "__r"
        ),
        F.struct(*[F.col(c).alias(c) for c in lcols]).alias("__l"),
    )
    timeline = r_side.unionByName(l_side)

    w = (
        Window.partitionBy(*[f"__k_{i}" for i in range(len(keys))])
        .orderBy(F.col("__ts"), F.col("__kind"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = timeline.withColumn("__r_fill", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__kind") == 1
    )
    if tolerance is not None:
        carried_ts = F.col("__r_fill").getField(right_ts).cast(ts_t)
        horizon = F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        filled = filled.withColumn(
            "__r_fill",
            F.when(carried_ts >= horizon, F.col("__r_fill")),
        )
    if how == "inner":
        filled = filled.filter(F.col("__r_fill").isNotNull())

    out: list[Column] = []
    out.extend(F.col("__l").getField(c).alias(f"{left_prefix}_{c}") for c in lcols)
    out.extend(F.col("__r_fill").getField(c).alias(f"{right_prefix}_{c}") for c in rcols)
    return filled.select(*out)



# Lowered-subquery temp views need PER-INVOCATION unique names: the
# alias-derived form (__asof_p_c) is shared by every query written
# with the same aliases, and the threaded suite constructs x1 (inner)
# and x1b (left) concurrently — thread A's spark.sql(rewritten) then
# resolves the view thread B just replaced, cross-wiring the join mode
# (observed round 12: x1b returned x1's 178 inner rows against its
# 202-row left oracle). next(_VIEW_SEQ) is atomic under the GIL; the
# view is dropped right after the eager analysis inlines it.
_VIEW_SEQ = itertools.count()


def _lower_asof(spark: SparkSession, query: str, m: re.Match) -> DataFrame:
    la, ra = m.group("la"), m.group("ra")
    amap = {la.lower(): la, ra.lower(): ra}

    def side(a: str) -> str:
        al = a.lower()
        if al not in amap:
            raise SqlExtError(
                f"ASOF JOIN ON clause references unknown alias {a!r} "
                f"(expected {la!r} or {ra!r})"
            )
        return "left" if al == la.lower() else "right"

    keys: list[str] = []
    for em in _ASOF_EQ_RE.finditer(m.group("eqs")):
        eq = {side(em.group("a1")): em.group("c1"), side(em.group("a2")): em.group("c2")}
        if len(eq) != 2:
            raise SqlExtError("each ASOF JOIN equality must reference both aliases once")
        if eq["left"] != eq["right"]:
            raise SqlExtError(
                "ASOF JOIN key columns must share a name on both sides "
                f"(got {eq['left']!r} = {eq['right']!r}); alias one side first"
            )
        keys.append(eq["left"])
    ts = {side(m.group("t1a")): m.group("t1c"), side(m.group("t2a")): m.group("t2c")}
    if len(ts) != 2 or side(m.group("t1a")) != "left":
        raise SqlExtError(
            "ASOF JOIN inequality must be <left>.<ts> >= <right>.<ts> (backward as-of)"
        )

    joined = asof_join(
        spark.table(m.group("lt")),
        spark.table(m.group("rt")),
        key=keys,
        left_ts=ts["left"],
        right_ts=ts["right"],
        how="left" if m.group("left") else "inner",
        left_prefix=la,
        right_prefix=ra,
    )
    view = f"__asof_{la}_{ra}_{next(_VIEW_SEQ)}"
    joined.createOrReplaceTempView(view)
    rewritten = _qualify(query[: m.start()] + f"FROM {view}" + query[m.end() :], amap)
    out = spark.sql(rewritten)  # eager analysis inlines the view
    spark.catalog.dropTempView(view)
    return out


def _lower_similarity(spark: SparkSession, query: str, m: re.Match) -> DataFrame:
    la, ra = m.group("la"), m.group("ra")
    amap = {la.lower(): la, ra.lower(): ra}
    if m.group("lt").lower() != m.group("rt").lower():
        raise SqlExtError("SIMILARITY JOIN is a self-join: both sides must name one table")
    pairs = [
        (m.group("x1a"), m.group("x1c"), m.group("x2a"), m.group("x2c")),
        (m.group("i1a"), m.group("i1c"), m.group("i2a"), m.group("i2c")),
    ]
    for a1, c1, a2, c2 in pairs:
        if {a1.lower(), a2.lower()} != {la.lower(), ra.lower()}:
            raise SqlExtError("SIMILARITY JOIN predicates must reference both aliases")
        if c1 != c2:
            raise SqlExtError(
                f"SIMILARITY JOIN compares one column per predicate (got {c1!r} vs {c2!r})"
            )
    text_col, id_col = pairs[0][1], pairs[1][1]
    # a.id < b.id as written may have the id predicate alias-flipped;
    # normalize so the FIRST alias is the lesser id.
    lo, hi = (la, ra) if m.group("i1a").lower() == la.lower() else (ra, la)
    thr = float(m.group("thr"))

    src = spark.table(m.group("lt"))
    masks = _text.dense_token_masks(src, id_col, text_col)
    if masks is not None:
        # Dense regime (optimization r12): global vocab ≤ 64 bits, so
        # the lowering emits the broadcast mask pair scan instead of
        # the inverted-index join — same exact semantics (bit_count
        # intersection / integer-ratio Jaccard), no token explode, no
        # pair-count shuffle. See functions/text.py::dense_token_masks
        # for the regime argument; sparse vocabularies keep the
        # inverted-index lowering below.
        common = F.bit_count(F.col("a.__mask").bitwiseAND(F.col("b.__mask")))
        sim = common.cast("double") / (F.col("a.__n") + F.col("b.__n") - common)
        lowered = (
            _text.mask_pair_scan(masks, id_col, spark)
            .select(
                F.col(f"a.{id_col}").alias(f"{lo}_{id_col}"),
                F.col(f"b.{id_col}").alias(f"{hi}_{id_col}"),
                sim.alias("similarity"),
            )
            .filter(F.col("similarity") >= thr)
        )
    else:
        toks_arr = _text.distinct_tokens(F.col(text_col))
        toks = src.select(
            F.col(id_col).alias("__id"),
            F.size(toks_arr).alias("__n"),
            F.explode(toks_arr).alias("__tok"),
        )
        a, b = toks.alias("a"), toks.alias("b")
        common = (
            a.join(b, (F.col("a.__tok") == F.col("b.__tok")) & (F.col("a.__id") < F.col("b.__id")))
            .groupBy(
                F.col("a.__id").alias(f"{lo}_{id_col}"),
                F.col("b.__id").alias(f"{hi}_{id_col}"),
                F.col("a.__n").alias("__na"),
                F.col("b.__n").alias("__nb"),
            )
            .agg(F.count("*").alias("__common"))
        )
        sim = F.col("__common").cast("double") / (
            F.col("__na") + F.col("__nb") - F.col("__common")
        )
        lowered = (
            common.withColumn("similarity", sim)
            .filter(F.col("similarity") >= thr)
            .select(f"{lo}_{id_col}", f"{hi}_{id_col}", "similarity")
        )
    view = f"__sim_{la}_{ra}_{next(_VIEW_SEQ)}"
    lowered.createOrReplaceTempView(view)
    rewritten = _qualify(query[: m.start()] + f"FROM {view}" + query[m.end() :], amap)
    out = spark.sql(rewritten)  # eager analysis inlines the view
    spark.catalog.dropTempView(view)
    return out


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ``query`` — Spark SQL plus the extended join keywords above.

    Plain SQL delegates to ``spark.sql`` untouched. A recognized
    extended construct is lowered to the scale-safe DataFrame plan and
    the remaining clauses run against the lowered result.
    """
    if re.search(r"\bASOF\s+(?:LEFT\s+)?JOIN\b", query, re.IGNORECASE):
        m = _ASOF_RE.search(query)
        if m is None:
            raise SqlExtError(
                "ASOF requires: FROM <t> <a> ASOF [LEFT] JOIN <t2> <b> "
                "ON <a>.<k> = <b>.<k> AND <a>.<ts> >= <b>.<ts>"
            )
        return _lower_asof(spark, query, m)
    if re.search(r"\bDISTINCT\s+ON\b", query, re.IGNORECASE):
        m = _DON_RE.search(query)
        if m is None:
            raise SqlExtError(
                "DISTINCT ON requires: SELECT DISTINCT ON (<cols>) <select-list> "
                "FROM <table> ORDER BY <cols>"
            )
        return _lower_distinct_on(spark, m)
    if re.search(r"\bMATCH_RECOGNIZE\s*\(", query, re.IGNORECASE):
        m = _MR_RE.search(query)
        if m is None:
            raise SqlExtError(
                "MATCH_RECOGNIZE requires: SELECT <part>, MATCH_COUNT() AS "
                "<alias> FROM <t> MATCH_RECOGNIZE (PARTITION BY <part> ORDER "
                "BY <cols> PATTERN (SYM[+|*] ...) DEFINE SYM AS <pred>, ...)"
            )
        return _lower_match_recognize(spark, m)
    if re.search(
        r"\bQUALIFY\s+(?:ROW_NUMBER|RANK|DENSE_RANK)\b", query, re.IGNORECASE
    ):
        # trigger on the two-token construct shape, not the bare word:
        # a column or alias legitimately named `qualify` passes through
        # (the ASOF branch set this convention with \bASOF\s+JOIN\b).
        m = _QUALIFY_RE.search(query)
        if m is None:
            raise SqlExtError(
                "QUALIFY requires a trailing clause of the form: QUALIFY "
                "ROW_NUMBER()|RANK()|DENSE_RANK() OVER (...) <= <int>"
            )
        return _lower_qualify(spark, m)
    if re.search(r"\*\s+EXCLUDE\s*\(", query, re.IGNORECASE):
        # Dispatch is deliberately a .search (EXCLUDE is not a builtin
        # function name, so a false trigger is malformed SQL anyway);
        # statement-start anchoring happens INSIDE _lower_exclude, which
        # raises SqlExtError on any prefixed form (WITH CTEs included) —
        # see test_exclude_raises_on_cte_prefix. VERDICT r5 finding #1.
        m = _EXCLUDE_RE.search(query)
        if m is None:
            raise SqlExtError(
                "EXCLUDE requires: SELECT * EXCLUDE (<col> [, <col>...]) "
                "FROM <table-or-view> [rest]"
            )
        return _lower_exclude(spark, query, m)
    if re.match(r"^\s*SELECT\s+\*\s+REPLACE\s*\(", query, re.IGNORECASE):
        # Anchored dispatch (unlike EXCLUDE's search): REPLACE() is a
        # common builtin string function, so `expr * REPLACE(col, ...)`
        # is realistic plain SQL that must fall through to spark.sql —
        # only the statement-initial star-REPLACE form is the construct.
        return _lower_replace(spark, query)
    if re.search(r"\bSIMILARITY\s+JOIN\b", query, re.IGNORECASE):
        m = _SIM_RE.search(query)
        if m is None:
            raise SqlExtError(
                "SIMILARITY JOIN requires: FROM <t> <a> SIMILARITY JOIN <t> <b> "
                "ON token_jaccard(<a>.<c>, <b>.<c>) >= <thr> AND <a>.<id> < <b>.<id>"
            )
        return _lower_similarity(spark, query, m)
    return spark.sql(query)


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE (subset): row-pattern matching over ordered
# partitions, lowered to the symbol-string + regex plan (the
# q30_event_pattern_match shape) — counts non-overlapping matches of
# the PATTERN per partition.
#
# Grammar (one statement shape; documented restrictions as with the
# other extended constructs — single table, one partition column,
# predicates free of the token ", <SYM> AS"):
#
#   SELECT <part_col>, MATCH_COUNT() AS <alias>
#   FROM <table> MATCH_RECOGNIZE (
#     PARTITION BY <part_col>
#     ORDER BY <col> [, <col> ...]
#     PATTERN ( SYM[+|*] SYM[+|*] ... )
#     DEFINE SYM AS <predicate> [, SYM AS <predicate> ...]
#   )
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# DISTINCT ON (DuckDB/Postgres surface): keep the FIRST row per key
# group under the statement's ORDER BY. Lowered to the row_number()=1
# window plan (the deterministic spelling of the same semantics).
#
#   SELECT DISTINCT ON (<col> [, <col>...]) <select-list>
#   FROM <table> ORDER BY <cols...>
# ---------------------------------------------------------------------------

_DON_RE = re.compile(
    rf"""
    ^\s* SELECT \s+ DISTINCT \s+ ON \s*
    \( \s* (?P<on>{_IDENT}(?:\s*,\s*{_IDENT})*) \s* \) \s+
    (?P<sel>.+?) \s+
    FROM \s+ (?P<t>{_IDENT}) \s+
    ORDER \s+ BY \s+ (?P<ord>.+?) \s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


def _lower_distinct_on(spark: SparkSession, m: re.Match) -> DataFrame:
    inner = (
        f"SELECT {m.group('sel')}, ROW_NUMBER() OVER ("
        f"PARTITION BY {m.group('on')} ORDER BY {m.group('ord')}"
        f") AS __don_rn FROM {m.group('t')}"
    )
    return spark.sql(inner).filter(F.col("__don_rn") == 1).drop("__don_rn")


_MR_RE = re.compile(
    rf"""
    ^\s* SELECT \s+ (?P<sel>{_IDENT}) \s* , \s*
    MATCH_COUNT \s* \( \s* \) \s+ AS \s+ (?P<alias>{_IDENT}) \s+
    FROM \s+ (?P<t>{_IDENT}) \s+ MATCH_RECOGNIZE \s* \(
    \s* PARTITION \s+ BY \s+ (?P<part>{_IDENT})
    \s+ ORDER \s+ BY \s+ (?P<ord>{_IDENT}(?:\s*,\s*{_IDENT})*)
    \s+ PATTERN \s* \( \s* (?P<pat>{_IDENT}[+*]?(?:\s+{_IDENT}[+*]?)*) \s* \)
    \s+ DEFINE \s+ (?P<defs>.+?)
    \s* \) \s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_MR_DEF_RE = re.compile(
    rf"(?P<sym>{_IDENT})\s+AS\s+(?P<pred>.+?)(?=,\s*{_IDENT}\s+AS\s|\s*$)",
    re.IGNORECASE | re.DOTALL,
)


def _lower_match_recognize(spark: SparkSession, m: re.Match) -> DataFrame:
    if m.group("sel").lower() != m.group("part").lower():
        raise SqlExtError(
            "MATCH_RECOGNIZE: the select column must be the PARTITION BY column"
        )
    defines = [
        (d.group("sym").upper(), d.group("pred").strip())
        for d in _MR_DEF_RE.finditer(m.group("defs"))
    ]
    if not defines:
        raise SqlExtError("MATCH_RECOGNIZE: DEFINE must bind at least one symbol")
    chars = {sym: chr(ord("a") + i) for i, (sym, _) in enumerate(defines)}

    pat_chars = []
    for tok in m.group("pat").split():
        sym, quant = (tok[:-1], tok[-1]) if tok[-1] in "+*" else (tok, "")
        if sym.upper() not in chars:
            raise SqlExtError(f"MATCH_RECOGNIZE: PATTERN symbol {sym!r} not DEFINEd")
        pat_chars.append(chars[sym.upper()] + quant)
    regex = "".join(pat_chars)

    # First matching DEFINE wins; rows matching none become '-', which
    # no pattern char can match (symbols map to [a-z]).
    sym_expr = "CASE "
    for sym, pred in defines:
        sym_expr += f"WHEN ({pred}) THEN '{chars[sym]}' "
    sym_expr += "ELSE '-' END"

    part = m.group("part")
    order_cols = [c.strip() for c in m.group("ord").split(",")]
    df = spark.table(m.group("t")).selectExpr(
        part, *order_cols, f"{sym_expr} AS __mr_sym"
    )
    journey = df.groupBy(part).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(*order_cols, F.col("__mr_sym")))
                ),
                lambda s: s["__mr_sym"],
            ),
        ).alias("__mr_journey")
    )
    return journey.select(
        F.col(part),
        F.size(
            F.regexp_extract_all(F.col("__mr_journey"), F.lit(regex), F.lit(0))
        )
        .cast("long")
        .alias(m.group("alias")),
    )


# ---------------------------------------------------------------------------
# SELECT * EXCLUDE (DuckDB/Snowflake surface): star-projection minus
# named columns. Spark has no EXCLUDE clause; the lowering resolves the
# FROM relation's schema at plan time and rewrites the star into the
# explicit surviving column list (order preserved), then delegates to
# spark.sql. Restriction (documented, like the other constructs): the
# FROM target must be a named table/view, not a subquery — schema
# resolution needs a catalog name.
# ---------------------------------------------------------------------------

_EXCLUDE_RE = re.compile(
    r"""SELECT\s+\*\s+EXCLUDE\s*\(\s*(?P<cols>[^)]+?)\s*\)\s+
        FROM\s+(?P<table>[A-Za-z_][\w.]*)
        (?P<rest>.*)$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

# Clauses allowed to FOLLOW the single FROM table. A JOIN, comma-list,
# or subquery would make the star span columns the lowering cannot see
# — those must raise, not silently lower to the first table's columns.
_EXCLUDE_REST_OK = re.compile(
    r"""^\s*(?:$|WHERE\b|GROUP\s+BY\b|HAVING\b|ORDER\s+BY\b|LIMIT\b)""",
    re.IGNORECASE,
)


def _lower_exclude(spark: SparkSession, query: str, m: re.Match) -> DataFrame:
    table = m.group("table")
    if query[: m.start()].strip():
        # Anchored-to-statement-start guard: a prefix like
        # "WITH t AS (...)" would make spark.table(<table>) resolve a
        # catalog object while the rewritten SQL's CTE shadows it —
        # wrong columns or a confusing analysis error. Only the
        # documented single-statement form lowers.
        raise SqlExtError(
            "EXCLUDE must start the statement: SELECT * EXCLUDE (...) "
            "FROM <table-or-view>; CTE/prefixed forms are not supported"
        )
    if not _EXCLUDE_REST_OK.match(m.group("rest") or ""):
        raise SqlExtError(
            "EXCLUDE supports a single FROM table/view (optionally followed "
            "by WHERE/GROUP BY/HAVING/ORDER BY/LIMIT); joins and comma lists "
            "would silently drop the other relations' columns"
        )
    key = _ident_key(spark)
    # _split_top_level is quote-aware, so a backticked name containing a
    # comma does not mis-split (review r6); names containing ')' remain
    # out of reach of _EXCLUDE_RE's capture and raise the malformed error.
    excluded = [
        key(_unquote_ident(c)) for c in _split_top_level(m.group("cols"))
    ]
    schema_cols = spark.table(table).columns
    missing = [c for c in excluded if c not in [key(s) for s in schema_cols]]
    if missing:
        raise SqlExtError(
            f"EXCLUDE names columns not in {table}: {', '.join(missing)}"
        )
    keep = [c for c in schema_cols if key(c) not in excluded]
    if not keep:
        raise SqlExtError("EXCLUDE would remove every column")
    rewritten = query[: m.start()] + (
        "SELECT " + ", ".join(_qid(c) for c in keep) + " FROM " + table
    ) + m.group("rest")
    return spark.sql(rewritten)


# ---------------------------------------------------------------------------
# SELECT * REPLACE (DuckDB/Snowflake surface): star-projection with
# named columns substituted by expressions, order and width preserved.
# Spark has no REPLACE clause; the lowering resolves the FROM relation's
# schema at plan time and rewrites the star into the explicit column
# list with each replaced slot spelled ``(<expr>) AS <col>``, then
# delegates to spark.sql. Same restrictions as EXCLUDE (statement must
# START with the construct; single named FROM table/view; only
# WHERE/GROUP BY/HAVING/ORDER BY/LIMIT may follow) — and the REPLACE
# list is scanned with a parenthesis counter, not a regex, because
# replacement expressions legitimately nest parens (round(x, 2)).
# ---------------------------------------------------------------------------

_REPLACE_HEAD_RE = re.compile(
    r"^\s*SELECT\s+\*\s+REPLACE\s*\(", re.IGNORECASE
)

# The AS target accepts a bare identifier OR a backticked name (spaces,
# hyphens, reserved words) — EXCLUDE accepts quoted names, so REPLACE
# must too (review r6; the ADVICE-r5 quoting fix was half-applied).
_REPLACE_ITEM_RE = re.compile(
    r"^\s*(?P<expr>.+?)\s+AS\s+(?P<col>[A-Za-z_]\w*|`(?:[^`]|``)+`)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_REPLACE_FROM_RE = re.compile(
    r"^\s*FROM\s+(?P<table>[A-Za-z_][\w.]*)(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list[str]:
    """Split on commas at paren depth 0, OUTSIDE string literals —
    `replace(tag, ',', ';') AS tag` must not split mid-literal."""
    items, depth, start, quote = [], 0, 0, ""
    i = 0
    while i < len(text):
        ch = text[i]
        if quote:
            if ch == quote:
                # SQL doubles the quote char to escape it inside a literal
                if i + 1 < len(text) and text[i + 1] == quote:
                    i += 1
                else:
                    quote = ""
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(text[start:i])
            start = i + 1
        i += 1
    items.append(text[start:])
    return [s.strip() for s in items if s.strip()]


def _matching_paren(text: str, open_end: int) -> int:
    """Index just PAST the ')' closing the '(' that ends at open_end,
    quote-aware (parens inside string literals don't count); -1 if
    unbalanced."""
    depth, i, quote = 1, open_end, ""
    while i < len(text) and depth:
        ch = text[i]
        if quote:
            if ch == quote:
                if i + 1 < len(text) and text[i + 1] == quote:
                    i += 1
                else:
                    quote = ""
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return -1 if depth else i


def _lower_replace(spark: SparkSession, query: str) -> DataFrame:
    head = _REPLACE_HEAD_RE.match(query)
    if head is None:
        raise SqlExtError(
            "REPLACE must start the statement: SELECT * REPLACE "
            "(<expr> AS <col> [, ...]) FROM <table-or-view>; CTE/prefixed "
            "forms are not supported"
        )
    # find the matching close paren of the REPLACE(...) list
    # (quote-aware: expressions legitimately embed parens in literals)
    i = _matching_paren(query, head.end())
    if i < 0:
        raise SqlExtError("REPLACE list has unbalanced parentheses")
    body = query[head.end() : i - 1]
    fm = _REPLACE_FROM_RE.match(query[i:])
    if fm is None:
        raise SqlExtError(
            "REPLACE requires a single named FROM table/view immediately "
            "after the list"
        )
    if not _EXCLUDE_REST_OK.match(fm.group("rest") or ""):
        raise SqlExtError(
            "REPLACE supports a single FROM table/view (optionally followed "
            "by WHERE/GROUP BY/HAVING/ORDER BY/LIMIT); joins and comma lists "
            "would silently drop the other relations' columns"
        )
    key = _ident_key(spark)
    repl: dict[str, str] = {}
    for item in _split_top_level(body):
        im = _REPLACE_ITEM_RE.match(item)
        if im is None:
            raise SqlExtError(
                f"REPLACE item must be '<expr> AS <col>', got: {item!r}"
            )
        repl[key(_unquote_ident(im.group("col")))] = im.group("expr")
    table = fm.group("table")
    schema_cols = spark.table(table).columns
    missing = [c for c in repl if c not in [key(s) for s in schema_cols]]
    if missing:
        raise SqlExtError(
            f"REPLACE names columns not in {table}: {', '.join(missing)}"
        )
    select_list = ", ".join(
        f"({repl[key(c)]}) AS {_qid(c)}" if key(c) in repl else _qid(c)
        for c in schema_cols
    )
    rewritten = (
        "SELECT " + select_list + " FROM " + table + fm.group("rest")
    )
    return spark.sql(rewritten)
