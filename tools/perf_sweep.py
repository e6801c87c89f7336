"""Registry-wide per-query timing sweep (optimization rounds).

For every registered query at $DWOS_SWEEP_SF_DIR (default sf0.1):
build the DataFrame from the registry fn, execute it into the noop sink
(guide §1.4 — times the computation, not result serialization), and
record build time, cold execution, and best warm execution separately.
Optionally dumps each query's ``explain("formatted")`` to a directory.

Usage:
    python -m tools.perf_sweep [--runs N] [--plans DIR] [--out FILE]
                               [--names n1,n2,...]

Emits one JSON object: {name: {"build_s":..., "cold_s":..., "warm_s":...,
"err": ...}, ...} plus a "_meta" entry (loadavg, ref_microop_s), so
round-over-round comparisons can normalize for box speed exactly like
bench.py does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded
from data_wrangling_openstreetmap_spark.session import get_spark


def _ref_microop(spark) -> float:
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id * 3 + 1)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2, help="warm runs per query")
    ap.add_argument("--plans", default=None, help="dir for explain(formatted) dumps")
    ap.add_argument("--out", default=None, help="output JSON path (default stdout)")
    ap.add_argument("--names", default=None, help="comma-separated subset")
    args = ap.parse_args()

    _ensure_loaded()
    sf_dir = os.environ.get("DWOS_SWEEP_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dwos-perf-sweep", cpus=cpus)

    names = sorted(REGISTRY) if not args.names else args.names.split(",")
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    # Warm the JVM + Python worker pool so the first query's cold number
    # is about the query, not interpreter startup.
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()

    try:
        with open("/proc/loadavg") as fh:
            loadavg = [float(x) for x in fh.read().split()[:3]]
    except OSError:
        loadavg = None

    results: dict[str, dict] = {
        "_meta": {
            "sf_dir": sf_dir,
            "cpus": cpus,
            "runs": args.runs,
            "loadavg": loadavg,
            "ref_microop_s": _ref_microop(spark),
        }
    }
    for i, name in enumerate(names):
        spec = REGISTRY[name]
        rec: dict = {}
        try:
            spark.sparkContext.setJobDescription(f"sweep-build: {name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            rec["build_s"] = round(time.perf_counter() - t0, 4)
            spark.sparkContext.setJobDescription(f"sweep-cold: {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["cold_s"] = round(time.perf_counter() - t0, 4)
            warms = []
            for _ in range(args.runs):
                # Rebuild per run like bench.py: re-collecting one frame
                # lets Spark silently reuse shuffle stages.
                df = spec.fn(spark, sf_dir)
                spark.sparkContext.setJobDescription(f"sweep-warm: {name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                warms.append(round(time.perf_counter() - t0, 4))
            rec["warm_s"] = min(warms)
            rec["warm_runs"] = warms
            if args.plans:
                txt = spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                    fh.write(txt)
        except Exception as exc:  # record and continue — a sweep, not a test
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = rec
        print(
            f"[{i + 1}/{len(names)}] {name}: {rec.get('warm_s', rec.get('err'))}",
            file=sys.stderr,
            flush=True,
        )

    out = json.dumps(results, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)
    else:
        print(out)
    spark.stop()


if __name__ == "__main__":
    main()
