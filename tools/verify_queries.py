"""Driver-strict oracle parity for a named subset of queries.

Optimization-round companion to the full driver sim: after rewriting an
operator, prove the rewrite computes the identical result (schema +
rows, driver-strict canonicalization) at one or more scale factors
before moving on.

Usage:
    python -m tools.verify_queries name1 [name2 ...] [--sfs 0.001,0.01,0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_wrangling_openstreetmap_spark import oracle as O
from data_wrangling_openstreetmap_spark.registry import REGISTRY, _ensure_loaded
from data_wrangling_openstreetmap_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sfs", default="0.001,0.01,0.1")
    args = ap.parse_args()

    _ensure_loaded()
    spark = get_spark(app_name="dwos-verify-subset")
    failed = False
    for name in args.names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"{name}: rows-only (no oracle) — checking rows>0 at each SF")
        for sf in args.sfs.split(","):
            sf_dir = f"/root/testdata/sf{sf}"
            t0 = time.perf_counter()
            pdf = spec.fn(spark, sf_dir).toPandas()
            dt = round(time.perf_counter() - t0, 2)
            if spec.oracle is None:
                ok = len(pdf) > 0
                print(f"  {name} sf{sf}: rows={len(pdf)} ({dt}s)", "OK" if ok else "EMPTY")
                failed |= not ok
                continue
            odf = O.run_oracle_df(spec.oracle, sf_dir)
            problems = O.strict_compare_frames(pdf, odf)
            if problems:
                failed = True
                print(f"  {name} sf{sf}: MISMATCH ({dt}s)")
                for p in problems:
                    print(f"    {p}")
            else:
                print(f"  {name} sf{sf}: parity OK, rows={len(pdf)} ({dt}s)")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
