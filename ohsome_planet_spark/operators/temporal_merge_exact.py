"""Exact-parity temporal member merge: a verbatim Python port of the
reference's sequential PriorityQueue merge
(``contrib/ContributionsEntity.java:62-151``) run per parent via
``cogroup().applyInPandas`` (SURVEY.md §2.9, UDF budget item 5).

This is the alternative physical strategy to the relational form in
``temporal_merge.py``: same semantics, different execution. The relational
form is the scale path (no per-key Python); this form is the
semantics-by-construction path — the two are cross-validated on randomized
histories in tests, which pins the relational form's correctness far
beyond the hand-written fixtures.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _MemberStream:
    """prev()/peek()/next() iterator over one member's version list."""

    __slots__ = ("rows", "pos")

    def __init__(self, rows: list[dict]):
        self.rows = rows
        self.pos = 0

    def has_next(self) -> bool:
        return self.pos < len(self.rows)

    def peek(self) -> dict:
        return self.rows[self.pos]

    def next(self) -> dict:
        row = self.rows[self.pos]
        self.pos += 1
        return row

    def prev(self) -> dict | None:
        return self.rows[self.pos - 1] if self.pos > 0 else None

    def key(self):
        """PriorityQueue ordering: (timestamp, changeset) of the head, with
        exhausted streams sorting last (Instant.MAX / Long.MAX)."""
        if not self.has_next():
            return (pd.Timestamp.max, float("inf"))
        head = self.peek()
        return (head["ts"], head["cs"])


def merge_one_parent(
    majors: list[dict], member_events: dict[object, list[dict]]
) -> Iterable[dict]:
    """Port of ContributionsEntity.computeNext for one parent OSH list.

    majors: parent versions sorted by (ts, version), each with
        {version, ts, cs, uid, uname, members: [(key, role), ...]}.
    member_events: key -> version rows [{seq, ts, cs, uid, uname, state}].
    Yields contribution instants {version, run_idx, ts, cs, uid, uname,
    member_states: [(key, role, state-or-None), ...]}.
    """
    streams: dict[object, _MemberStream] = {}

    def get_stream(key):
        if key not in streams:
            streams[key] = _MemberStream(member_events.get(key, []))
        return streams[key]

    i_major = 0
    n = len(majors)
    while i_major < n:
        major = majors[i_major]
        ts, cs, uid, uname = major["ts"], major["cs"], major["uid"], major["uname"]
        active: dict[object, _MemberStream] = {}

        # initMembers (lines 82-96): advance while ts<=T OR cs==C
        member_list = []
        for key, role in major["members"]:
            stream = active.setdefault(key, get_stream(key))
            while stream.has_next() and (
                stream.peek()["ts"] <= ts or stream.peek()["cs"] == cs
            ):
                stream.next()
            member_list.append((key, role))

        def emit(run_idx, ts_, cs_, uid_, uname_):
            return {
                "version": major["version"],
                "run_idx": run_idx,
                "ts": ts_,
                "cs": cs_,
                "uid": uid_,
                "uname": uname_,
                "member_states": [
                    (k, r, active[k].prev() if k in active else None)
                    for k, r in member_list
                ],
            }

        next_major_ts = majors[i_major + 1]["ts"] if i_major + 1 < n else pd.Timestamp.max

        run_idx = 0
        yield emit(run_idx, ts, cs, uid, uname)

        # drain loop (computeNext lines 115-148): the queue is re-sorted per
        # pop because a popped member re-enters with its next event
        def heads():
            return sorted(((s.key(), k) for k, s in active.items()), key=lambda e: e[0])

        while True:
            hs = heads()
            if not hs:
                break
            (h_ts, h_cs), hk = hs[0]
            if not (h_ts < next_major_ts):
                break  # exhausted streams (Timestamp.max) also land here
            sel_ts, sel_cs = h_ts, h_cs
            sel_uid = active[hk].peek()["uid"]
            sel_uname = active[hk].peek()["uname"]
            while True:
                (h_ts, h_cs), hk = heads()[0]
                if h_cs != sel_cs or not (h_ts < next_major_ts):
                    break
                sel_ts = h_ts
                stream = active[hk]
                if stream.has_next():
                    stream.next()
            run_idx += 1
            yield emit(run_idx, sel_ts, sel_cs, sel_uid, sel_uname)

        i_major += 1


def way_contribution_instants_exact(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Exact-path equivalent of ``temporal_merge.way_contribution_instants``
    (member ids + state columns only; used for cross-validation)."""
    from ..session import ship_package
    from .temporal_merge import minor_relevant_node_versions

    ship_package(ways.sparkSession)

    links = (
        ways.select(F.col("osm_id").alias("way_id"), F.explode("refs").alias("node_id"))
        .distinct()
    )
    node_ev = (
        minor_relevant_node_versions(nodes)
        .join(links, F.col("osm_id") == F.col("node_id"))
        .select(
            "way_id",
            F.col("osm_id").alias("nid"),
            F.col("version").alias("seq"),
            "ts",
            F.col("changeset").alias("cs"),
            F.col("user_id").alias("uid"),
            F.col("user_name").alias("uname"),
            "lon",
            "lat",
            "visible",
        )
    )
    ways_keyed = ways.withColumn("way_id", F.col("osm_id"))

    out_schema = (
        "osm_id bigint, osm_version int, run_idx bigint, ts timestamp,"
        " changeset bigint, user_id bigint, user_name string,"
        " member_ids array<bigint>, member_versions array<int>"
    )

    def merge_group(ways_pdf: pd.DataFrame, ev_pdf: pd.DataFrame) -> pd.DataFrame:
        if ways_pdf.empty:
            return pd.DataFrame(
                columns=[
                    "osm_id",
                    "osm_version",
                    "run_idx",
                    "ts",
                    "changeset",
                    "user_id",
                    "user_name",
                    "member_ids",
                    "member_versions",
                ]
            )
        wid = int(ways_pdf.iloc[0]["osm_id"])
        majors = []
        for _, w in ways_pdf.sort_values(["ts", "version"]).iterrows():
            majors.append(
                {
                    "version": int(w["version"]),
                    "ts": w["ts"],
                    "cs": int(w["changeset"]),
                    "uid": int(w["user_id"]),
                    "uname": w["user_name"],
                    "members": [
                        (int(r), "")
                        for r in (list(w["refs"]) if w["refs"] is not None else [])
                    ],
                }
            )
        events: dict[object, list[dict]] = {}
        if not ev_pdf.empty:
            for _, e in ev_pdf.sort_values(["nid", "seq"]).iterrows():
                events.setdefault(int(e["nid"]), []).append(
                    {
                        "seq": int(e["seq"]),
                        "ts": e["ts"],
                        "cs": int(e["cs"]),
                        "uid": int(e["uid"]),
                        "uname": e["uname"],
                        "version": int(e["seq"]),
                    }
                )
        rows = []
        for inst in merge_one_parent(majors, events):
            rows.append(
                {
                    "osm_id": wid,
                    "osm_version": inst["version"],
                    "run_idx": inst["run_idx"],
                    "ts": inst["ts"],
                    "changeset": inst["cs"],
                    "user_id": inst["uid"],
                    "user_name": inst["uname"],
                    "member_ids": [k for k, _r, _s in inst["member_states"]],
                    "member_versions": [
                        (s["version"] if s is not None else None)
                        for _k, _r, s in inst["member_states"]
                    ],
                }
            )
        return pd.DataFrame(rows)

    return (
        ways_keyed.groupBy("way_id")
        .cogroup(node_ev.groupBy("way_id"))
        .applyInPandas(merge_group, out_schema)
    )
