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

Lineage-truncation seams (localCheckpoint staging) hide their upstream
segment from the returned frame's printed plan, so the audit ALSO walks
every pre-checkpoint frame registered by ``truncate_lineage`` while the
query was built (``session.drain_seam_frames``) — the round-9 verdict's
blind spot. Per-query counts are the sum over the returned plan plus all
seam-segment plans; ``seams`` records how many segments were audited.
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
    from ohsome_planet_spark.session import drain_seam_frames

    for name in names:
        try:
            drain_seam_frames()  # discard seams left over from fixtures
            df = QUERIES[name](spark, SF_DIR)
            seams = drain_seam_frames()
            plans = [df._jdf.queryExecution().executedPlan().toString()]
            for seam in seams:
                try:
                    plans.append(
                        seam._jdf.queryExecution().executedPlan().toString()
                    )
                except Exception:
                    pass  # seam frame already released by the query body
            entry = {
                "cartesian": sum(p.count("CartesianProduct") for p in plans),
                "row_python_udf": sum(p.count("BatchEvalPython") for p in plans),
                "arrow_python": sum(
                    p.count("ArrowEvalPython")
                    + p.count("MapInPandas")
                    + p.count("FlatMapGroupsInPandas")
                    for p in plans
                ),
                "exchanges": sum(p.count("Exchange") for p in plans),
                "codegen_spans": sum(p.count("WholeStageCodegen") for p in plans),
                "seams": len(plans) - 1,
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
