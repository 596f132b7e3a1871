#!/usr/bin/env python
"""Plan-hygiene audit over the whole query registry.

For every registry query, build the DataFrame at a small SF and inspect
the optimized physical plan for the anti-patterns the engine promises not
to have:

- ``CartesianProduct`` — an unbounded cross join (broadcast nested-loop
  joins against dimension-sized frames are fine and counted separately);
- ``BatchEvalPython`` — a row-at-a-time Python UDF (Arrow-batched pandas
  UDFs show up as ``ArrowEvalPython``/``MapInPandas`` and are allowed);
- exchange count and WholeStageCodegen span count, recorded per query so
  round-over-round plan drift is visible.

Writes ``PLAN_AUDIT.json`` at the repo root and exits non-zero if any
query carries a flagged anti-pattern. Queries that execute eagerly
(streaming memory sinks, driver-looped iterations) are audited on the
frame they return.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from ohsome_planet_spark.plans.queries import QUERIES
    from ohsome_planet_spark.session import get_spark, release_cached

    spark = get_spark(app_name="plan_audit")
    out: dict[str, dict] = {}
    flagged: list[str] = []
    names = sorted(QUERIES)
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            entry = {
                "cartesian": plan.count("CartesianProduct"),
                "row_python_udf": plan.count("BatchEvalPython"),
                "arrow_python": plan.count("ArrowEvalPython")
                + plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas"),
                "exchanges": plan.count("Exchange"),
                "codegen_spans": plan.count("WholeStageCodegen"),
            }
            if entry["cartesian"] or entry["row_python_udf"]:
                flagged.append(name)
                entry["flagged"] = True
            out[name] = entry
        except Exception:
            out[name] = {"error": traceback.format_exc(limit=3).strip().splitlines()[-1]}
            flagged.append(name)
        finally:
            try:
                release_cached()
            except Exception:
                pass
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    summary = {
        "sf_dir": SF_DIR,
        "n_queries": len(out),
        "flagged": sorted(flagged),
        "queries": out,
    }
    if len(sys.argv) <= 1:  # only persist full-registry runs
        with open(path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: summary[k] for k in ("sf_dir", "n_queries", "flagged")}
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
