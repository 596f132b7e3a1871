#!/usr/bin/env python
"""Interleaved A/B of staged_sort vs plain orderBy for named queries.

Both variants of each query are built in ONE SparkSession — the plain
variant under SPARK_GRAFT_PLAIN_SORT=1, the staged one without — and the
noop-sink executions alternate A,B,A,B,... so the sandbox's multi-minute
box-state drift hits both variants equally (OPTIMIZATION_r13.md,
"Measurement conditions"). Prints per-query medians and the
staged/plain ratio; the round's keep bar is ratio <= 0.96.

Usage:
    python tools/ab_staged.py [--n 5] [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from ohsome_planet_spark.plans.queries import all_queries
    from ohsome_planet_spark.session import get_spark, release_cached

    spark = get_spark(app_name="ab_staged")
    qs = all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark.range(1000).selectExpr("sum(id)").collect()  # warmup

    results = {}
    for name in args.queries:
        fn = qs[name]
        times: dict[str, list[float]] = {"plain": [], "staged": []}
        for i in range(args.n):
            for variant in ("plain", "staged"):
                if variant == "plain":
                    os.environ["SPARK_GRAFT_PLAIN_SORT"] = "1"
                else:
                    os.environ.pop("SPARK_GRAFT_PLAIN_SORT", None)
                # t0 BEFORE the build: bench.py times build+action, and
                # with AQE a lazy localCheckpoint materializes its query
                # stages at build time (AdaptiveSparkPlanExec.execute()
                # runs every stage except the final one), so timing only
                # the action would credit staged variants with work they
                # did before the clock started.
                spark.sparkContext.setJobDescription(f"ab:{name}:{variant}#{i}")
                t0 = time.time()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                times[variant].append(time.time() - t0)
                release_cached()
        os.environ.pop("SPARK_GRAFT_PLAIN_SORT", None)
        p = statistics.median(times["plain"])
        s = statistics.median(times["staged"])
        ratio = s / max(p, 1e-9)
        verdict = "KEEP" if ratio <= 0.96 else "revert"
        results[name] = {
            "plain": round(p, 2), "staged": round(s, 2),
            "ratio": round(ratio, 2), "verdict": verdict,
            "plain_runs": [round(t, 2) for t in times["plain"]],
            "staged_runs": [round(t, 2) for t in times["staged"]],
        }
        print(json.dumps({name: results[name]}), flush=True)
    print("== summary ==")
    for name, r in results.items():
        print(f"{r['ratio']:5.2f} {r['verdict']:6s} {name} "
              f"(plain {r['plain']} staged {r['staged']})")


if __name__ == "__main__":
    main()
