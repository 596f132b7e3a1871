"""Temporal member merge (SURVEY.md J3) — the reference's core operator,
re-expressed relationally, generic over member-stream type.

The reference k-way-merges each parent's member version streams with a
PriorityQueue ordered by (timestamp, changeset)
(``contrib/ContributionsEntity.java:22-151``) and emits a *minor version* of
the parent per drained same-changeset run. Ways merge node streams
(``ContributionsWay.java``); relations merge node streams AND way
*contribution* streams — a way's own minor versions propagate upward
(``ContributionsRelation.java``, ``Contributions2Parquet.java:379-405``).

The executable spec is ``ContributionsWayTest.java``; rules reproduced:

1. member state at a major version = latest member event with
   ts <= parent_ts, PLUS any *consecutive head* events sharing the parent's
   changeset even when later (``initMembers`` lines 86-92; pinned by
   testWayExistsBeforeNode / testReferencedNodeHasOlderTimestamp).
   The member stream POSITION persists across majors
   (``ContributionsEntity`` keeps one iterator per member): an event
   head-folded by major k is already consumed when major k+1 initialises,
   even if its timestamp is later than major k+1 — it is part of k+1's
   init state, never a minor, and never blocks k+1's own head-fold.
   Relationally this is a per-(parent, member) cumulative max of
   fold-consumed stream positions over majors in (ts, version) order;
   because a fold can be *enabled* by an earlier fold (the blocking event
   was already consumed), the classification is a fixpoint — iterated
   ``FOLD_FIXPOINT_ITERS`` times, which resolves consumption chains
   through that depth (a depth-d chain needs d+1 majors; real OSM chains
   beyond depth 1 are vanishingly rare).
2. remaining member events, sorted by (ts, changeset), group into maximal
   consecutive same-changeset runs; each run before the next major becomes
   ONE minor version timestamped at the run's LAST event (drain loop
   123-131), changeset/user from the run's FIRST event (lines 118-121).
3. runs may share a timestamp (different changesets → separate minors).
4. node histories are pre-compacted to location/visibility changes
   (``minor/MinorNode.java:55-64``) — tag-only node edits cause no minors.

Spark shape: windows + one equi-join; as-of member-state reconstruction is
a union + last-value window keyed by run index — no range join, no per-key
iteration. Shuffle keys: member id for the stream join, parent id for run
construction and state windows; each stage is one hash exchange AQE can
rebalance at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from ..session import register_cached

# Head-folds enabled by earlier head-folds form consumption chains; each
# classification pass resolves one chain level. A depth-d chain needs d+1
# parent majors with interleaved out-of-order member edits — depth > 1 is
# essentially absent from real OSM history, 3 covers the differential
# test's deepest constructible case (4 majors).
FOLD_FIXPOINT_ITERS = 3

NODE_STATE_TYPE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)

# state carried for relation members: enough to rebuild geometry + the
# contrib-member output columns (type/id/timestamp/geometry)
GEOM_STATE_TYPE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("visible", T.BooleanType()),
        T.StructField("geom_wkb", T.BinaryType()),
        T.StructField("geom_type", T.StringType()),
    ]
)


def minor_relevant_node_versions(nodes: DataFrame) -> DataFrame:
    """MinorNode compaction: keep only versions where (lon, lat, visible)
    changed (``minor/MinorNode.java:55-64``)."""
    w = W.partitionBy("osm_id").orderBy("version", "ts")
    changed = (
        ~F.col("lon").eqNullSafe(F.lag("lon").over(w))
        | ~F.col("lat").eqNullSafe(F.lag("lat").over(w))
        | ~F.col("visible").eqNullSafe(F.lag("visible").over(w))
        | F.lag("version").over(w).isNull()
    )
    return nodes.withColumn("_keep", changed).filter("_keep").drop("_keep")


class FoldConvergenceError(RuntimeError):
    """The head-fold fixpoint needed more passes than FOLD_FIXPOINT_ITERS —
    the classification would silently diverge from the reference for this
    history. Rerun with ``temporal_merge_exact``."""


def merge_member_streams(
    majors: DataFrame, slots: DataFrame, events: DataFrame,
    assert_convergence: bool = False,
) -> DataFrame:
    """Generic temporal member merge.

    majors: pid, pv, pts, pcs, puid, puname (one row per parent major
            version; validity window derived via lead over (pts, pv)).
    slots:  pid, pv, pos, mtype, mid, role (ordered member list per major).
    events: mtype, mid, seq, ts, cs, uid, uname, state (member version
            streams; ``seq`` is the stream position, ``state`` any struct).

    Returns one row per (pid, pv, run_idx) instant with inst_ts/inst_cs/
    inst_uid/inst_uname and ``members``: array<struct<pos, mtype, mid,
    role, state>> ordered by pos (state null = member not yet existing).
    """
    state_type = events.schema["state"].dataType

    majors = majors.withColumn(
        "pts_end", F.lead("pts").over(W.partitionBy("pid").orderBy("pts", "pv"))
    )
    # majors/slots/events feed 3-4 downstream branches each; without
    # persistence Catalyst re-derives them per branch (measured: 32 source
    # scans for the way pipeline). MEMORY_AND_DISK keeps the plan one-pass;
    # at cluster scale the same role is played by a staged table.
    majors = register_cached(majors.persist(StorageLevel.MEMORY_AND_DISK))
    slots = register_cached(slots.persist(StorageLevel.MEMORY_AND_DISK))

    member_streams = (
        majors.select("pid", "pv", "pts", "pts_end", "pcs")
        .join(slots.select("pid", "pv", "mtype", "mid").distinct(), ["pid", "pv"])
    )
    ev = member_streams.join(events, ["mtype", "mid"])

    # --- classification (rule 1) -----------------------------------------
    mw = (
        W.partitionBy("pid", "pv", "mtype", "mid")
        .orderBy("seq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # stream-pointer window: ONE member's events across ALL majors of one
    # parent, majors in (pts, pv) order. The cumulative max of
    # fold-consumed seq is the reference's persistent per-member stream
    # position. Both this and mw cluster on a superset of the join keys
    # (mtype, mid), so neither adds an exchange — only a sort.
    cw = (
        W.partitionBy("pid", "mtype", "mid")
        .orderBy("pts", "pv", "seq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    after_t = F.col("ts") > F.col("pts")

    def _classification_pass(df: DataFrame) -> DataFrame:
        # an event already consumed by an earlier major's head-fold cannot
        # block this major's head-fold (the reference iterator is past it)
        violation = (
            after_t & (F.col("cs") != F.col("pcs")) & ~F.col("_prior")
        ).cast("int")
        return (
            df.withColumn("_viol", F.max(violation).over(mw))
            .withColumn(
                "_fold",
                after_t & (F.col("cs") == F.col("pcs")) & (F.col("_viol") == 0),
            )
            .withColumn(
                "_fmax", F.max(F.when(F.col("_fold"), F.col("seq"))).over(cw)
            )
            # same-pv rows in the cummax are harmless: an earlier fold in
            # this pv has a smaller seq, and the current row is excluded
            # via ~_fold — only folds from earlier (pts, pv) can reach
            # this seq.
            .withColumn(
                "_prior",
                after_t
                & ~F.col("_fold")
                & (F.col("seq") <= F.coalesce("_fmax", F.lit(-(2**62)))),
            )
        )

    ev = ev.withColumn("_prior", F.lit(False))
    # Fold-candidate gate: the fixpoint only does work when some member
    # event shares its parent major's changeset after pts (cs == pcs ∧
    # ts > pts). Virtually all real histories have none — then _fold/_prior
    # are constant-false and all 3 passes (2 window sorts each over the
    # widest frame in the pipeline) can be skipped outright. The gate costs
    # one existence probe over the (persisted) join; the persist replaces
    # the recompute the probe would otherwise trigger.
    ev = register_cached(ev.persist(StorageLevel.MEMORY_AND_DISK))
    has_fold_candidates = not ev.filter(
        after_t & (F.col("cs") == F.col("pcs"))
    ).isEmpty()
    if has_fold_candidates:
        for _ in range(FOLD_FIXPOINT_ITERS):
            ev = _classification_pass(ev)
    else:
        ev = (
            ev.withColumn("_viol", F.lit(0))
            .withColumn("_fold", F.lit(False))
            .withColumn("_fmax", F.lit(None).cast("long"))
        )
    if assert_convergence:
        # one probe pass: any row whose fold/prior classification would
        # still change means a consumption chain deeper than the fixed
        # iteration count — fail loudly instead of silently diverging
        # (callers fall back to temporal_merge_exact for such histories)
        probe = _classification_pass(
            ev.withColumnRenamed("_fold", "_fold0").withColumnRenamed(
                "_prior", "_prior0"
            ).withColumn("_prior", F.col("_prior0"))
        )
        n = probe.filter(
            (F.col("_fold") != F.col("_fold0"))
            | (F.col("_prior") != F.col("_prior0"))
        ).count()
        if n:
            raise FoldConvergenceError(
                f"head-fold classification did not converge after "
                f"{FOLD_FIXPOINT_ITERS} passes ({n} rows still changing): "
                "consumption chain deeper than the fixpoint bound — use "
                "temporal_merge_exact for this history"
            )
    fold = F.col("_fold")
    init_consumed = (~after_t) | fold | F.col("_prior")
    is_minor = (
        after_t
        & ~fold
        & ~F.col("_prior")
        & (F.col("pts_end").isNull() | (F.col("ts") < F.col("pts_end")))
    )
    ev = (
        ev.withColumn("_init", init_consumed)
        .withColumn("_minor", is_minor)
        .filter(F.col("_init") | F.col("_minor"))
        .drop("_viol", "_fold", "_fmax", "_prior")
    )
    # Lineage truncation, not just persist: the classified event stream
    # feeds three downstream branches (runs, states, probes join), each of
    # which would otherwise re-embed the full upstream merge pipeline in
    # its task binaries and AQE re-plans — the plan-depth cost the r8
    # verdict flagged on contrib_ways (209 printed Exchange nodes). Same
    # staged-intermediate pattern as the relation path's member_events.
    from ..session import truncate_lineage

    ev = truncate_lineage(ev)

    # --- run construction (rules 2-3) ------------------------------------
    rw = W.partitionBy("pid", "pv").orderBy("ts", "cs", "mtype", "mid", "seq")
    minor_ev = (
        ev.filter("_minor")
        .withColumn(
            "_new_run", (~F.col("cs").eqNullSafe(F.lag("cs").over(rw))).cast("int")
        )
        .withColumn(
            "run_idx",
            F.sum("_new_run").over(rw.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    minor_ev = truncate_lineage(minor_ev)
    runs = minor_ev.groupBy("pid", "pv", "run_idx").agg(
        F.max("ts").alias("inst_ts"),
        F.first("cs").alias("inst_cs"),
        F.min_by(F.col("uid"), F.struct("ts", "cs", "mid", "seq")).alias("inst_uid"),
        F.min_by(F.col("uname"), F.struct("ts", "cs", "mid", "seq")).alias("inst_uname"),
    )

    instants = majors.select(
        "pid",
        "pv",
        F.lit(0).cast("bigint").alias("run_idx"),
        F.col("pts").alias("inst_ts"),
        F.col("pcs").alias("inst_cs"),
        F.col("puid").alias("inst_uid"),
        F.col("puname").alias("inst_uname"),
    ).unionByName(runs)

    # --- as-of member states via union + run-position window --------------
    states = (
        ev.withColumn(
            "k", F.when(F.col("_init"), F.lit(0).cast("bigint")).otherwise(F.lit(None))
        )
        .join(
            minor_ev.select("pid", "pv", "mtype", "mid", "seq", "run_idx"),
            ["pid", "pv", "mtype", "mid", "seq"],
            "left",
        )
        .withColumn("k", F.coalesce("k", "run_idx"))
        .select(
            "pid",
            "pv",
            "mtype",
            "mid",
            "k",
            F.lit(0).alias("_probe"),
            F.col("seq").alias("_ord"),
            F.col("state").alias("_state"),
            F.lit(None).cast("int").alias("pos"),
            F.lit(None).cast("string").alias("role"),
        )
    )
    probes = instants.join(slots, ["pid", "pv"]).select(
        "pid",
        "pv",
        "mtype",
        "mid",
        F.col("run_idx").alias("k"),
        F.lit(1).alias("_probe"),
        F.lit(2_147_483_647).alias("_ord"),
        F.lit(None).cast(state_type).alias("_state"),
        "pos",
        "role",
    )
    sw = (
        W.partitionBy("pid", "pv", "mtype", "mid")
        .orderBy("k", "_probe", "_ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    resolved = (
        states.unionByName(probes)
        .withColumn("_asof", F.last("_state", ignorenulls=True).over(sw))
        .filter(F.col("_probe") == 1)
        .select("pid", "pv", "k", "pos", "mtype", "mid", "role", F.col("_asof").alias("state"))
    )

    entry = F.struct("pos", "mtype", "mid", "role", "state")
    per_instant = (
        resolved.groupBy("pid", "pv", "k")
        .agg(F.array_sort(F.collect_list(entry)).alias("members"))
        .withColumnRenamed("k", "run_idx")
    )
    entry_type = T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("mtype", T.StringType()),
            T.StructField("mid", T.LongType()),
            T.StructField("role", T.StringType()),
            T.StructField("state", state_type),
        ]
    )
    return instants.join(per_instant, ["pid", "pv", "run_idx"], "left").withColumn(
        "members", F.coalesce("members", F.array().cast(T.ArrayType(entry_type)))
    )


# ---------------------------------------------------------------------------
# way wrapper
# ---------------------------------------------------------------------------


def way_contribution_instants(
    ways: DataFrame, nodes: DataFrame, assert_convergence: bool = False
) -> DataFrame:
    """Way history + node history → contribution instants with as-of member
    states (see module docstring)."""
    majors = ways.select(
        F.col("osm_id").alias("pid"),
        F.col("version").alias("pv"),
        F.col("ts").alias("pts"),
        F.col("changeset").alias("pcs"),
        F.col("user_id").alias("puid"),
        F.col("user_name").alias("puname"),
        F.col("visible").alias("wvis"),
        F.col("tags").alias("wtags"),
        F.col("refs").alias("wrefs"),
    )
    slots = (
        majors.select("pid", "pv", F.posexplode("wrefs").alias("pos", "mid"))
        .withColumn("mtype", F.lit("node"))
        .withColumn("role", F.lit(""))
    )
    node_events = minor_relevant_node_versions(nodes).select(
        F.lit("node").alias("mtype"),
        F.col("osm_id").alias("mid"),
        F.col("version").alias("seq"),
        "ts",
        F.col("changeset").alias("cs"),
        F.col("user_id").alias("uid"),
        F.col("user_name").alias("uname"),
        F.struct(
            F.col("version"),
            F.col("ts"),
            F.col("changeset"),
            F.col("visible"),
            F.col("lon"),
            F.col("lat"),
        ).alias("state"),
    )
    merged = merge_member_streams(
        majors.select("pid", "pv", "pts", "pcs", "puid", "puname"),
        slots,
        node_events,
        assert_convergence=assert_convergence,
    )
    return merged.join(
        majors.select("pid", "pv", "wvis", "wtags", "wrefs"), ["pid", "pv"]
    ).select(
        F.col("pid").alias("osm_id"),
        F.col("pv").alias("osm_version"),
        "run_idx",
        F.col("inst_ts").alias("ts"),
        F.col("inst_cs").alias("changeset"),
        F.col("inst_uid").alias("user_id"),
        F.col("inst_uname").alias("user_name"),
        F.col("wvis").alias("visible"),
        F.col("wtags").alias("tags"),
        F.col("wrefs").alias("refs"),
        F.transform(F.col("members"), lambda m: m["state"]).alias("member_states"),
        F.transform(F.col("members"), lambda m: m["mid"]).alias("member_ids"),
    )
