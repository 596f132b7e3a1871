"""Randomized differential testing of the RELATION temporal member merge
(round-6 verdict item #4): the relational ``merge_member_streams`` path vs
the sequential exact twin (``temporal_merge_exact.merge_one_parent``, the
verbatim port of the reference's PriorityQueue merge,
``contrib/ContributionsEntity.java:62-151``).

The way-level cross-validation (test_merge_cross_validation.py) pins the
way merge; here BOTH sides consume the SAME member event streams (the way
contribution instants + compacted node versions), so any divergence
isolates the relation-level merge semantics: mixed way/node/nested-relation
members, role swaps, duplicate member slots, deletes, and interleaved
same-changeset edits across member types.
"""

import datetime as dt
import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.temporal_merge import (
    merge_member_streams,
    minor_relevant_node_versions,
    way_contribution_instants,
)
from ohsome_planet_spark.operators.temporal_merge_exact import merge_one_parent
from ohsome_planet_spark.schemas import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA


def ts(sec):
    return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)


ROLES = ["outer", "inner", "", "stop"]


def random_relation_history(seed: int, rel_id: int, way_base: int, node_base: int):
    """One relation's random history plus its member way/node histories.

    Exercises: member mixes (way/node/nested relation), roles, duplicate
    member slots, members created late or deleted, same-changeset edits
    shared across relation majors and member events (the fold
    interleavings), and member sets changing between majors.
    """
    rng = random.Random(seed)
    n_nodes = rng.randint(2, 5)
    nids = [node_base + i for i in range(1, n_nodes + 1)]
    n_ways = rng.randint(1, 3)
    wids = [way_base + i for i in range(1, n_ways + 1)]

    node_rows = []
    for nid in nids:
        t = rng.randint(0, 4)
        for version in range(1, rng.randint(2, 6)):
            node_rows.append(
                (
                    nid, version, ts(t), rng.randint(1, 6), rng.randint(1, 3),
                    "u", rng.random() > 0.1, {}, float(version), 0.0,
                )
            )
            t += rng.randint(1, 5)

    way_rows = []
    for wid in wids:
        t = rng.randint(1, 8)
        for version in range(1, rng.randint(2, 4)):
            refs = rng.sample(nids, rng.randint(1, n_nodes))
            way_rows.append(
                (
                    wid, version, ts(t), rng.randint(1, 6), 1, "u",
                    rng.random() > 0.1, {"h": "x"}, refs,
                )
            )
            t += rng.randint(3, 12)

    rel_rows = []
    t = rng.randint(2, 10)
    for version in range(1, rng.randint(2, 5)):
        members = []
        for wid in rng.sample(wids, rng.randint(1, n_ways)):
            members.append(("way", wid, rng.choice(ROLES)))
        for nid in rng.sample(nids, rng.randint(0, min(2, n_nodes))):
            members.append(("node", nid, rng.choice(ROLES)))
        if rng.random() < 0.3:  # nested relation member: carried, no events
            members.append(("relation", rel_id + 500_000, ""))
        if members and rng.random() < 0.3:  # duplicate member slot
            m = rng.choice(members)
            members.append((m[0], m[1], rng.choice(ROLES)))
        rng.shuffle(members)
        rel_rows.append(
            (
                rel_id, version, ts(t), rng.randint(1, 6), 1, "u",
                rng.random() > 0.05, {"type": "multipolygon"}, members,
            )
        )
        t += rng.randint(4, 15)
    return node_rows, way_rows, rel_rows


def _member_event_frames(spark, wdf, ndf):
    """The same member event stream construction as
    ``relation_contribution_events`` (contributions.py), with a minimal
    (version, ts, changeset) state so no geometry UDF runs."""
    way_inst = way_contribution_instants(wdf, ndf)
    wseq = W.partitionBy("osm_id").orderBy("ts", "osm_version", "changeset")
    state = F.struct(
        F.col("osm_version").cast("int").alias("version"),
        F.col("ts").alias("sts"),
        F.col("changeset").alias("scs"),
    )
    way_events = way_inst.select(
        F.lit("way").alias("mtype"),
        F.col("osm_id").alias("mid"),
        F.row_number().over(wseq).alias("seq"),
        "ts",
        F.col("changeset").alias("cs"),
        F.col("user_id").alias("uid"),
        F.col("user_name").alias("uname"),
        state.alias("state"),
    )
    node_events = minor_relevant_node_versions(ndf).select(
        F.lit("node").alias("mtype"),
        F.col("osm_id").alias("mid"),
        F.col("version").alias("seq"),
        "ts",
        F.col("changeset").alias("cs"),
        F.col("user_id").alias("uid"),
        F.col("user_name").alias("uname"),
        F.struct(
            F.col("version").cast("int").alias("version"),
            F.col("ts").alias("sts"),
            F.col("changeset").alias("scs"),
        ).alias("state"),
    )
    return way_events.unionByName(node_events)


def _relational(spark, rel_rows, way_rows, node_rows):
    rdf = spark.createDataFrame(rel_rows, RELATION_SCHEMA)
    wdf = spark.createDataFrame(way_rows, WAY_SCHEMA)
    ndf = spark.createDataFrame(node_rows, NODE_SCHEMA)
    majors = rdf.select(
        F.col("osm_id").alias("pid"),
        F.col("version").alias("pv"),
        F.col("ts").alias("pts"),
        F.col("changeset").alias("pcs"),
        F.col("user_id").alias("puid"),
        F.col("user_name").alias("puname"),
    )
    slots = rdf.select(
        F.col("osm_id").alias("pid"),
        F.col("version").alias("pv"),
        F.posexplode("members").alias("pos", "m"),
    ).select(
        "pid", "pv", "pos",
        F.col("m.type").alias("mtype"),
        F.col("m.id").alias("mid"),
        F.col("m.role").alias("role"),
    )
    events = _member_event_frames(spark, wdf, ndf)
    merged = merge_member_streams(majors, slots, events)
    out = set()
    for r in merged.collect():
        states = tuple(
            (m.mtype, m.mid, (m.state.version if m.state is not None else None))
            for m in sorted(r.members, key=lambda m: m.pos)
        )
        out.add((r.pid, r.pv, r.inst_ts, r.inst_cs, states))
    return out, events


def _exact(rel_rows, event_rows):
    """Pure-Python sequential twin over the SAME collected event stream."""
    streams: dict[tuple, list[dict]] = {}
    for e in sorted(event_rows, key=lambda e: (e.mtype, e.mid, e.seq)):
        streams.setdefault((e.mtype, e.mid), []).append(
            {
                "seq": e.seq, "ts": e.ts, "cs": e.cs, "uid": e.uid,
                "uname": e.uname, "version": e.state.version,
            }
        )
    by_rel: dict[int, list] = {}
    for r in sorted(rel_rows, key=lambda r: (r[2], r[1])):
        by_rel.setdefault(r[0], []).append(
            {
                "version": r[1], "ts": r[2], "cs": r[3], "uid": r[4],
                "uname": r[5],
                "members": [((m[0], m[1]), m[2]) for m in r[8]],
            }
        )
    out = set()
    for rid, majors in by_rel.items():
        for inst in merge_one_parent(majors, streams):
            states = tuple(
                (k[0], k[1], (s["version"] if s is not None else None))
                for k, _role, s in inst["member_states"]
            )
            out.add((rid, inst["version"], inst["ts"], inst["cs"], states))
    return out


def compare(spark, rel_rows, way_rows, node_rows):
    rel, events = _relational(spark, rel_rows, way_rows, node_rows)
    exact = _exact(rel_rows, events.collect())
    assert rel == exact, (
        f"paths diverge:\nrelational-only: {sorted(rel - exact)[:5]}"
        f"\nexact-only: {sorted(exact - rel)[:5]}"
    )
    return rel


def test_relation_hand_fixture(spark):
    """Way member whose node moves mid-relation-life → relation minor."""
    nodes = [
        (1, 1, ts(0), 1, 1, "u", True, {}, 1.0, 0.0),
        (1, 2, ts(6), 4, 1, "u", True, {}, 2.0, 0.0),
    ]
    ways = [(10, 1, ts(1), 1, 1, "u", True, {"h": "x"}, [1])]
    rels = [
        (100, 1, ts(2), 2, 1, "u", True, {"type": "multipolygon"},
         [("way", 10, "outer"), ("node", 1, "")]),
    ]
    rel = compare(spark, rels, ways, nodes)
    # one major instant + one minor (node v2 at ts6 propagates through
    # both the way stream and the direct node member)
    assert len(rel) == 2
    pvs = {(pv, t) for (_id, pv, t, _cs, _st) in rel}
    assert pvs == {(1, ts(2)), (1, ts(6))}


def test_relation_cross_validation_randomized_bulk(spark):
    """200 independent random relation histories, unioned into one
    DataFrame triple and cross-validated in one Spark job pair."""
    node_rows, way_rows, rel_rows = [], [], []
    for seed in range(200):
        nr, wr, rr = random_relation_history(
            seed,
            rel_id=100_000 + seed,
            way_base=10_000 + seed * 10,
            node_base=seed * 100,
        )
        node_rows.extend(nr)
        way_rows.extend(wr)
        rel_rows.extend(rr)
    compare(spark, rel_rows, way_rows, node_rows)
