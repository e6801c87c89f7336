"""Driver-strict oracle probe under a plain or HOSTILE Spark config.

The grading driver uses its own untuned SparkSession, so every round's
close-out re-drives the graded surface outside the test harness:

    python -m tools.hostile_probe            # plain local[8], DRIVER_WINDOW
    python -m tools.hostile_probe hostile    # hostile cfg, DRIVER_WINDOW
    python -m tools.hostile_probe hostile full   # hostile cfg, ALL queries
    python -m tools.hostile_probe plain full     # plain cfg, ALL queries

Hostile = local[32], 200 shuffle partitions (the Spark default a naive
driver would carry), trailing-slash sf_dir, and a reloaded
``__spark_entry__`` module (double-import must not double-register).
Exit code 1 on any mismatch or raise. Round-12 note: the first
full-registry hostile run (492 queries) passed clean; before that only
the 50-name window had ever been driven hostile.
"""

from __future__ import annotations

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import SparkSession

    hostile = "hostile" in sys.argv[1:]
    full = "full" in sys.argv[1:]
    if hostile:
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "200")
            .getOrCreate()
        )
        sf = "/root/testdata/sf0.01/"  # trailing slash on purpose
    else:
        spark = SparkSession.builder.master("local[8]").getOrCreate()
        sf = "/root/testdata/sf0.01"
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    if hostile:
        importlib.reload(entry)

    from data_wrangling_openstreetmap_spark.oracle import compare, run_oracle

    qs, oracles = entry.queries(), entry.oracle_sql()
    if full:
        names = list(qs)
    else:
        from data_wrangling_openstreetmap_spark.operators import DRIVER_WINDOW

        names = list(DRIVER_WINDOW)

    bad, n = [], 0
    for name in names:
        try:
            df = qs[name](spark, sf)
            rows = [tuple(r) for r in df.collect()]
            n += 1
            if name in oracles:
                o_cols, o_rows = run_oracle(oracles[name], sf)
                problems = compare(df.columns, rows, o_cols, o_rows)
                if problems:
                    bad.append((name, problems))
        except Exception as ex:  # noqa: BLE001 - survey everything
            bad.append((name, f"raised {type(ex).__name__}: {ex}"))
    label = ("HOSTILE" if hostile else "PLAIN") + (
        " FULL-REGISTRY" if full else " WINDOW"
    )
    print(f"{label} PROBE: {n} run")
    print("MISMATCHES:", bad or "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
