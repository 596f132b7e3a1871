#!/usr/bin/env python
"""Interleaved A/B of a runtime SQL conf over named queries (guide §1).

Both variants run in ONE SparkSession: the conf is flipped around each
build+noop execution, alternated A,B,A,B,... so box-state drift hits both
equally (the only measurement shape that survives this sandbox's noise;
see OPTIMIZATION_r13.md "Measurement conditions").

Usage:
    python tools/ab_conf.py --conf spark.sql.join.preferSortMergeJoin \
        --a true --b false [--n 5] [--sf DIR] q1 q2 ...
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
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True, help="baseline value")
    ap.add_argument("--b", required=True, help="candidate value")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from ohsome_planet_spark.plans.queries import all_queries
    from ohsome_planet_spark.session import get_spark, release_cached

    spark = get_spark(app_name="ab_conf")
    qs = all_queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark.range(1000).selectExpr("sum(id)").collect()  # warmup

    try:
        orig_val = spark.conf.get(args.conf)
    except Exception:
        orig_val = None

    results = {}
    for name in args.queries:
        fn = qs[name]
        times: dict[str, list[float]] = {"a": [], "b": []}
        for _ in range(args.n):
            for variant in ("a", "b"):
                spark.conf.set(
                    args.conf, args.a if variant == "a" else args.b
                )
                # time build+action, exactly like bench.py (lazy
                # localCheckpoints materialize at build time under AQE)
                t0 = time.perf_counter()
                df = fn(spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                times[variant].append(time.perf_counter() - t0)
                release_cached()
        if orig_val is not None:
            spark.conf.set(args.conf, orig_val)
        else:
            try:
                spark.conf.unset(args.conf)
            except Exception:
                spark.conf.set(args.conf, args.a)
        med_a = statistics.median(times["a"])
        med_b = statistics.median(times["b"])
        ratio = round(med_b / med_a, 3) if med_a else float("nan")
        results[name] = {
            "a": round(med_a, 2),
            "b": round(med_b, 2),
            "ratio": ratio,
            "a_runs": [round(t, 2) for t in times["a"]],
            "b_runs": [round(t, 2) for t in times["b"]],
        }
        print(json.dumps({name: results[name]}), flush=True)

    print("== summary ==")
    for name, r in sorted(results.items(), key=lambda kv: kv[1]["ratio"]):
        print(f"{r['ratio']:5.2f}  {name} (a {r['a']} b {r['b']})")


if __name__ == "__main__":
    main()
