#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Execution is forced through the noop sink so the full plan runs (count()
alone would let Catalyst prune most of the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohsome_planet_spark.plans.queries import all_queries  # noqa: E402
from ohsome_planet_spark.session import get_spark, release_cached  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="ohsome_planet_spark_bench")
    queries = all_queries()

    # warm up the JVM/session so per-query numbers measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # release operator-persisted intermediates so a 32-query session's
        # storage memory stays flat (each query re-derives its own)
        release_cached()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
