"""Catalyst-level extension (SURVEY §4.2, the last blue-sky item): a
REAL ``spark.sql.extensions``-injected parser rule, not the pre-parse
string-rewrite frontend. ``jvmext/dwos-sql-ext.jar`` (Java source +
build.sh beside it) implements ParserInterface, delegating everything
to the session parser except three documented statement shapes:

- a trailing QUALIFY clause, lowered to the ``* EXCEPT`` window/filter
  form (schema-free because Spark 4 has ``SELECT * EXCEPT``);
- ``ASOF [LEFT] JOIN … ON k-equalities AND a.ts >= b.ts``, lowered to
  a correlated LATERAL ``ORDER BY ts DESC LIMIT 1`` subquery (schema-
  free because only the ON clause's column NAMES are needed), which
  Spark decorrelates to the WindowGroupLimit rank-1 plan;
- ``SELECT DISTINCT ON (cols) … ORDER BY …``, lowered to the
  row_number()=1 window filter (the Postgres/DuckDB first-row-per-key
  semantics).

The extension must load with the JVM (driver extraClassPath), so this
test drives a FRESH interpreter+JVM in a subprocess — the in-process
test session can't exercise it. Engine-vs-engine: DuckDB runs its
NATIVE QUALIFY, NATIVE ASOF JOIN, and NATIVE DISTINCT ON on the same
parquet, so the x1/x5 oracle semantics are graded through the injected
path too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb
import pytest

JAR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_wrangling_openstreetmap_spark",
    "jvmext",
    "dwos-sql-ext.jar",
)

SF_SMALL = "/root/testdata/sf0.001"

_QUALIFY_SQL = (
    "SELECT user_id, event_id, value FROM {src} "
    "QUALIFY ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY value DESC, event_id) <= 2"
)

# The x1_asof_sql statement shape (sql_frontend.py), run through PLAIN
# spark.sql in the child — only the injected parser can make it parse.
_ASOF_SQL = (
    "SELECT p.event_id AS purchase_id, p.user_id AS user_id, "
    "CAST(unix_micros(CAST(p.ts AS TIMESTAMP)) "
    "- unix_micros(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS us_since_click "
    "FROM x1_purchases p ASOF JOIN x1_clicks c "
    "ON p.user_id = c.user_id AND p.ts >= c.ts"
)

_ASOF_DUCK = """
SELECT p.event_id, p.user_id, CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT)
FROM (SELECT user_id, ts, event_id FROM '{pq}' WHERE event_type = 'purchase') p
ASOF {left}JOIN (SELECT user_id, ts, event_id FROM '{pq}' WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

_CHILD = """
import json, sys
from pyspark.sql import SparkSession
jar, sf, qualify_sql, asof_sql = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
spark = (SparkSession.builder.master("local[2]")
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.extensions", "dwos.ext.DwosSqlExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet(sf + "/events.parquet")
ev.createOrReplaceTempView("ev")
ev.filter("event_type = 'purchase'").selectExpr(
    "user_id", "ts", "event_id").createOrReplaceTempView("x1_purchases")
ev.filter("event_type = 'click'").selectExpr(
    "user_id", "ts", "event_id").createOrReplaceTempView("x1_clicks")
df = spark.sql(qualify_sql.format(src="ev"))
rows = sorted((r.user_id, r.event_id, round(r.value, 2)) for r in df.collect())
plain = spark.sql("SELECT COUNT(*) AS n FROM ev").collect()[0].n
# the word QUALIFY inside a string literal must NOT trigger the rule
lit = spark.sql("SELECT 'no QUALIFY here' AS s FROM ev LIMIT 1").collect()[0].s
# literal parens inside the OVER clause must not break the paren scan
lp = spark.sql(
    "SELECT user_id, event_id, ts, value FROM ev "
    "QUALIFY ROW_NUMBER() OVER "
    "(PARTITION BY user_id, date_format(ts, '(yyyy)') "
    "ORDER BY value DESC, event_id) <= 1"
).count()
asof = sorted(tuple(r) for r in spark.sql(asof_sql).collect())
asof_plan = spark.sql(asof_sql)._jdf.queryExecution().executedPlan().toString()
asof_left_sql = asof_sql.replace("ASOF JOIN", "ASOF LEFT JOIN").replace(
    "CAST(unix_micros", "CAST(coalesce(unix_micros").replace(
    "AS BIGINT) AS us_since_click", ", -1) AS BIGINT) AS us_since_click")
asof_left = sorted(tuple(r) for r in spark.sql(asof_left_sql).collect())
don = sorted((a, b, round(c, 2)) for a, b, c in (tuple(r) for r in spark.sql(
    "SELECT DISTINCT ON (user_id) user_id, event_id, value FROM ev "
    "WHERE event_type = 'click' "
    "ORDER BY user_id, value DESC, event_id").collect()))
ev.selectExpr("user_id", "event_id", "value", "event_type").createOrReplaceTempView("ev4")
exdf = spark.sql("SELECT * EXCLUDE (event_type, value) FROM ev4 "
                 "WHERE event_type = 'purchase'")
excl = {"cols": exdf.columns,
        "rows": sorted((r.user_id, r.event_id) for r in exdf.collect())}
# EXCLUDE composes with QUALIFY (pre-pass) and in subqueries
exq = spark.sql("SELECT * EXCLUDE (value, event_type) FROM ev4 "
                "QUALIFY ROW_NUMBER() OVER "
                "(PARTITION BY user_id ORDER BY event_id) <= 1")
excl_q = {"cols": exq.columns, "n": exq.count()}
exs = spark.sql("SELECT COUNT(*) AS n FROM "
                "(SELECT * EXCLUDE (props) FROM ev) t")
excl_sub = exs.collect()[0].n
# star-adjacency guard: a string literal containing EXCLUDE( unchanged
exlit = spark.sql("SELECT '* EXCLUDE (x)' AS s FROM ev LIMIT 1").collect()[0].s
# multiplication guard: a function NAMED exclude must not trigger the
# rewrite (price * exclude(...) is arithmetic, not a projection star)
spark.udf.register("exclude", lambda x: x, "double")
exmul = spark.sql(
    "SELECT value * exclude(value) AS v FROM ev LIMIT 1").collect()[0].v
# backslash-escaped quote must not flip the scanner's string state:
# the EXCLUDE( below sits INSIDE a literal that follows an escaped '
exesc = spark.sql(
    "SELECT 'it\\\\'s * ' AS p, '* EXCLUDE (x)' AS s FROM ev LIMIT 1"
).collect()[0].s
# injected Catalyst FUNCTION: dwos_cents resolves to Multiply/Round/
# Cast at analysis time; values must equal the spelled-out recipe
fn_rows = spark.sql(
    "SELECT SUM(dwos_cents(value)) AS a,"
    " SUM(CAST(round(value * 100) AS BIGINT)) AS b,"
    " dwos_cents(12.345) AS c FROM ev"
).collect()[0]
fn_ok = (fn_rows.a == fn_rows.b) and fn_rows.c in (1234, 1235)
fn_desc = spark.sql("DESCRIBE FUNCTION dwos_cents").collect()
fn_reg = any("dwos_cents" in str(r) for r in fn_desc)
print("RESULT " + json.dumps({
    "cols": df.columns, "rows": rows, "plain": plain, "lit": lit,
    "lp": lp, "asof": asof, "asof_left": asof_left, "don": don,
    "asof_wgl": "WindowGroupLimit" in asof_plan,
    "excl": excl, "excl_q": excl_q, "excl_sub": excl_sub,
    "exlit": exlit, "exmul": exmul is not None, "exesc": exesc,
    "fn_ok": fn_ok, "fn_reg": fn_reg}))
"""


JVMEXT_DIR = os.path.dirname(JAR)


@pytest.fixture(scope="module")
def built_jar(tmp_path_factory):
    """Fresh jar compiled IN-RUN from ``src/dwos/ext/*.java`` (VERDICT
    r6 §Next #5): the subprocess test drives the extension through a
    jar this very session built, so the committed binary is a
    convenience artifact for non-JDK environments, not load-bearing
    test input. javac into a temp dir, zip the classes (a jar is a zip;
    the manifest is optional for classpath loading). Falls back to the
    committed jar only when no JDK is present."""
    import shutil
    import zipfile

    javac = shutil.which("javac")
    if javac is None:
        if os.path.exists(JAR):
            return JAR
        pytest.skip("no JDK and no committed jar")
    import pyspark

    jars_glob = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    src_dir = os.path.join(JVMEXT_DIR, "src", "dwos", "ext")
    srcs = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".java")
    )
    assert srcs, f"no Java sources under {src_dir}"
    tmp = tmp_path_factory.mktemp("jvmext")
    classes = tmp / "classes"
    classes.mkdir()
    out = subprocess.run(
        [javac, "-cp", jars_glob, "-d", str(classes), *srcs],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    jar_path = tmp / "dwos-sql-ext.jar"
    with zipfile.ZipFile(jar_path, "w") as zf:
        for root, _, files in os.walk(classes):
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, classes))
    return str(jar_path)


@pytest.mark.skipif(not os.path.exists(JAR), reason="extension jar not built")
def test_committed_jar_matches_java_source():
    """The committed jar must be byte-identical (per class) to a fresh
    javac build of src/dwos/ext/*.java — otherwise the jar can silently
    drift from the checked-in source while the subprocess test keeps
    passing against stale bytecode (ADVICE r5). Recompiles into a temp
    dir with the same pyspark-bundled classpath build.sh uses."""
    import shutil
    import tempfile
    import zipfile

    javac = shutil.which("javac")
    if javac is None:
        pytest.skip("no JDK in environment; cannot verify jar provenance")
    import pyspark

    jars_glob = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    src_dir = os.path.join(JVMEXT_DIR, "src", "dwos", "ext")
    assert os.path.isdir(src_dir), (
        f"extension jar exists but its Java sources are missing ({src_dir}) "
        "— the jar is unverifiable; restore src/ or drop the jar"
    )
    srcs = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".java")
    )
    assert srcs, "no Java sources beside the jar"
    # NB: byte-identity assumes the jar was built by THIS environment's
    # JDK with build.sh's flags (true here — the jar is rebuilt in-container
    # whenever the source changes). A legitimately different JDK would
    # fail this test; the fix is `sh jvmext/build.sh` to refresh the jar,
    # which is exactly the drift-repair the test exists to force.
    with tempfile.TemporaryDirectory() as tmp:
        out = subprocess.run(
            [javac, "-cp", jars_glob, "-d", tmp, *srcs],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        rebuilt = {}
        for root, _, files in os.walk(tmp):
            for f in files:
                if f.endswith(".class"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, tmp).replace(os.sep, "/")
                    with open(full, "rb") as fh:
                        rebuilt[rel] = fh.read()
        with zipfile.ZipFile(JAR) as zf:
            committed = {
                n: zf.read(n) for n in zf.namelist() if n.endswith(".class")
            }
        assert set(rebuilt) == set(committed), (
            f"class set drift: only-in-source={sorted(set(rebuilt) - set(committed))} "
            f"only-in-jar={sorted(set(committed) - set(rebuilt))}"
        )
        stale = [n for n in rebuilt if rebuilt[n] != committed[n]]
        assert not stale, f"jar bytecode differs from fresh source build: {stale}"


def test_injected_parser_matches_duckdb_native(built_jar):
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, built_jar, SF_SMALL, _QUALIFY_SQL, _ASOF_SQL],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    got = json.loads(line[-1][len("RESULT "):])
    # QUALIFY semantics: helper column dropped, original projection kept
    assert got["cols"] == ["user_id", "event_id", "value"]
    assert got["plain"] == 1000  # untouched statements still parse
    assert got["lit"] == "no QUALIFY here"  # keyword in a literal ignored
    assert got["lp"] == 15  # literal parens in OVER still lower (1/user)
    con = duckdb.connect()
    exp = sorted(
        (u, e, round(v, 2))
        for u, e, v in con.sql(
            _QUALIFY_SQL.format(src=f"'{SF_SMALL}/events.parquet'")
        ).fetchall()
    )
    assert [tuple(r) for r in got["rows"]] == exp
    # ASOF through the injected path == DuckDB's NATIVE ASOF JOIN (the
    # x1 oracle semantics), and the lateral decorrelates to the rank-1
    # WindowGroupLimit plan (no exhaustive join)
    pq = f"{SF_SMALL}/events.parquet"
    exp_asof = sorted(con.sql(_ASOF_DUCK.format(pq=pq, left="")).fetchall())
    assert [tuple(r) for r in got["asof"]] == exp_asof
    exp_left = sorted(
        con.sql(
            _ASOF_DUCK.replace(
                "CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT)",
                "CAST(coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS BIGINT)",
            ).format(pq=pq, left="LEFT ")
        ).fetchall()
    )
    assert [tuple(r) for r in got["asof_left"]] == exp_left
    assert got["asof_wgl"] is True
    # DISTINCT ON through the injected path == DuckDB's NATIVE form
    exp_don = sorted(
        (a, b, round(c, 2))
        for a, b, c in con.sql(
            "SELECT DISTINCT ON (user_id) user_id, event_id, value "
            f"FROM '{pq}' WHERE event_type = 'click' "
            "ORDER BY user_id, value DESC, event_id"
        ).fetchall()
    )
    assert [tuple(r) for r in got["don"]] == exp_don
    # EXCLUDE through the injected path == DuckDB's NATIVE EXCLUDE
    exp_excl = con.sql(
        "SELECT * EXCLUDE (event_type, value) FROM "
        f"(SELECT user_id, event_id, value, event_type FROM '{pq}') "
        "WHERE event_type = 'purchase'"
    )
    assert got["excl"]["cols"] == [c for c in exp_excl.columns]
    assert [tuple(r) for r in got["excl"]["rows"]] == sorted(
        exp_excl.fetchall()
    )
    # composed EXCLUDE + QUALIFY: helper and excluded columns both gone
    assert got["excl_q"]["cols"] == ["user_id", "event_id"]
    assert got["excl_q"]["n"] == 15  # one row per user
    assert got["excl_sub"] == 1000  # EXCLUDE lowers inside subqueries
    assert got["exlit"] == "* EXCLUDE (x)"  # literals never rewritten
    assert got["exmul"] is True  # a UDF named exclude is not a star form
    assert got["exesc"] == "* EXCLUDE (x)"  # escaped quotes keep state
    # injected function: registered in the catalog, value-identical to
    # the spelled-out exact-cents recipe
    assert got["fn_reg"] is True
    assert got["fn_ok"] is True
