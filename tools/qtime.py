#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1): time individual
queries through the noop sink (same methodology as bench.py), and
optionally dump their ``explain("formatted")`` plans to files.

Usage:
    python tools/qtime.py q1 q2 ...              # time queries, n=3, sf0.1
    python tools/qtime.py --n 5 --sf DIR q1 ...
    python tools/qtime.py --plans plans/r13 --suffix before q1 ...
    python tools/qtime.py --profile q1           # cProfile driver side

The plan dump writes ``<plansdir>/<query>_<suffix>.txt`` — the artifact
the judge checks plan claims against (driver cannot run Spark).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ohsome_planet_spark.plans.queries import all_queries  # noqa: E402
from ohsome_planet_spark.session import get_spark, release_cached  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain() files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the driver for the FIRST run of each query")
    ap.add_argument("--plan-only", action="store_true",
                    help="skip the timed runs; just dump plans")
    args = ap.parse_args()

    spark = get_spark(app_name="qtime")
    qs = all_queries()
    names = args.queries
    if names == ["ALL"]:
        names = sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # session warmup (mirrors bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()

    results = {}
    for name in names:
        fn = qs[name]
        ts = []
        for i in range(0 if args.plan_only else args.n):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{i}")
            t0 = time.time()
            if args.profile and i == 0:
                import cProfile
                import pstats

                prof = cProfile.Profile()
                prof.enable()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                prof.disable()
                st = pstats.Stats(prof)
                st.sort_stats("cumulative")
                st.print_stats(30)
            else:
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            release_cached()
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            release_cached()
        if ts:
            med = statistics.median(ts)
            results[name] = (med, ts)
            print(f"{name}: median {med:.3f}s  runs {[round(t,3) for t in ts]}",
                  flush=True)
        else:
            print(f"{name}: plan dumped", flush=True)

    print("--- summary ---")
    for name, (med, _ts) in sorted(results.items(), key=lambda kv: -kv[1][0]):
        print(f"{med:8.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
