"""Catalyst-level extension (SURVEY §4.2, the last blue-sky item): a
REAL ``spark.sql.extensions``-injected parser rule, not the pre-parse
string-rewrite frontend. ``jvmext/dwos-sql-ext.jar`` (Java source +
build.sh beside it) implements ParserInterface, delegating everything
to the session parser except statements ending in the documented
QUALIFY shape, which lower to the * EXCEPT window/filter form.

The extension must load with the JVM (driver extraClassPath), so this
test drives a FRESH interpreter+JVM in a subprocess — the in-process
test session can't exercise it. Engine-vs-engine: DuckDB runs its
native QUALIFY on the same parquet.
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

_CHILD = """
import json, sys
from pyspark.sql import SparkSession
jar, sf, sql_text = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (SparkSession.builder.master("local[2]")
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.extensions", "dwos.ext.QualifyExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(sf + "/events.parquet").createOrReplaceTempView("ev")
df = spark.sql(sql_text.format(src="ev"))
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
print("RESULT " + json.dumps({
    "cols": df.columns, "rows": rows, "plain": plain, "lit": lit,
    "lp": lp}))
"""


@pytest.mark.skipif(not os.path.exists(JAR), reason="extension jar not built")
def test_injected_qualify_parser_matches_duckdb_native():
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, JAR, SF_SMALL, _QUALIFY_SQL],
        capture_output=True,
        text=True,
        timeout=240,
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
