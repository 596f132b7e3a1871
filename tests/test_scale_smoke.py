"""Scale-fidelity smoke for the contribution flagships (round-6 verdict
item #2): pin one point of SCALE.md's scaling curve each round.

The sf0.1 derived way/relation inputs are self-replicated ~10× with
disjoint id offsets (same history shapes, 10× the parents), materialized
to parquet (so both scales enter the pipeline as plain scans — a 10-way
union INPUT plan would inflate the exchange count by plan-branch
arithmetic, not data), and the full pipelines run at 1× and 10×. Two assertions:

- wall grows SUB-QUADRATICALLY (a quadratic operator would be ~100×; the
  bound is generous because sf0.1 walls are driver-bound and ±50% noisy);
- the physical plan gains NO new exchange — no extra shuffle or global
  sort appears when the data grows (fewer is fine: the planner may pick
  more broadcasts from input statistics), i.e. the plan shape is
  scale-invariant and only task counts change.

The measured points are recorded in SCALE_SMOKE.json at the repo root so
the curve is tracked round-over-round.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.contributions import (
    relation_contribution_events,
    synthesize_contributions,
    way_contribution_events,
)

SF_DIR = "/root/testdata/sf0.1"
K = 10
NODE_OFF = 100_000_000
WAY_OFF = 1_000_000
REL_OFF = 10_000

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 testdata not present"
)


def _replicate(df, k, id_off, refs_off=None, members_off=None):
    parts = []
    for i in range(k):
        d = df.withColumn("osm_id", F.col("osm_id") + F.lit(i * id_off))
        if refs_off is not None:
            off = i * refs_off
            d = d.withColumn("refs", F.transform("refs", lambda r: r + F.lit(off)))
        if members_off is not None:
            off = i * members_off
            d = d.withColumn(
                "members",
                F.transform(
                    "members",
                    lambda m: F.struct(
                        m["type"].alias("type"),
                        (m["id"] + F.lit(off)).alias("id"),
                        m["role"].alias("role"),
                    ),
                ),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _stage(df, path):
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _run(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().sparkPlan().toString()
    return plan.count("Exchange")


def _record(entry: dict):
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALE_SMOKE.json")
    data = {}
    if os.path.exists(path):
        try:
            data = json.load(open(path))
        except Exception:
            data = {}
    data[entry.pop("name")] = entry
    json.dump(data, open(path, "w"), indent=1, sort_keys=True)


def test_contrib_ways_scales_subquadratically(spark, tmp_path):
    from ohsome_planet_spark.plans.queries import _derived_way_inputs
    from ohsome_planet_spark.session import release_cached

    ways, nodes = _derived_way_inputs(spark, SF_DIR)
    ways = _stage(ways, str(tmp_path / "w1"))
    nodes = _stage(nodes, str(tmp_path / "n1"))
    w10 = _stage(_replicate(ways, K, WAY_OFF, refs_off=NODE_OFF), str(tmp_path / "w10"))
    n10 = _stage(_replicate(nodes, K, NODE_OFF), str(tmp_path / "n10"))

    one = synthesize_contributions(way_contribution_events(ways, nodes))
    ten = synthesize_contributions(way_contribution_events(w10, n10))
    assert _exchanges(ten) <= _exchanges(one), "new exchange appeared at scale"

    t1 = _run(one)
    release_cached()
    t10 = _run(ten)
    release_cached()
    ratio = t10 / max(t1, 0.05)
    _record({"name": "contrib_ways", "wall_1x": round(t1, 2),
             "wall_10x": round(t10, 2), "ratio": round(ratio, 2), "k": K})
    assert ratio < 30.0, f"10x input cost {ratio:.1f}x wall — super-linear blowup"


def test_contrib_relations_scales_subquadratically(spark, tmp_path):
    from ohsome_planet_spark.plans.queries import (
        _derived_relations,
        _derived_way_inputs,
    )
    from ohsome_planet_spark.session import release_cached

    ways, nodes = _derived_way_inputs(spark, SF_DIR)
    rels = _derived_relations(spark, SF_DIR)
    ways = _stage(ways, str(tmp_path / "w1"))
    nodes = _stage(nodes, str(tmp_path / "n1"))
    rels = _stage(rels, str(tmp_path / "r1"))
    w10 = _stage(_replicate(ways, K, WAY_OFF, refs_off=NODE_OFF), str(tmp_path / "w10"))
    n10 = _stage(_replicate(nodes, K, NODE_OFF), str(tmp_path / "n10"))
    r10 = _stage(_replicate(rels, K, REL_OFF, members_off=WAY_OFF), str(tmp_path / "r10"))

    one = synthesize_contributions(relation_contribution_events(rels, ways, nodes))
    ten = synthesize_contributions(relation_contribution_events(r10, w10, n10))
    assert _exchanges(ten) <= _exchanges(one), "new exchange appeared at scale"

    t1 = _run(one)
    release_cached()
    t10 = _run(ten)
    release_cached()
    ratio = t10 / max(t1, 0.05)
    _record({"name": "contrib_relations", "wall_1x": round(t1, 2),
             "wall_10x": round(t10, 2), "ratio": round(ratio, 2), "k": K})
    assert ratio < 30.0, f"10x input cost {ratio:.1f}x wall — super-linear blowup"
