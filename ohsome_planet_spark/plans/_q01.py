"""Slice 1/6 of the former plans/queries.py (round-11 verdict
item 7: mechanical, zero-semantic split by CONTIGUOUS line range,
so definition order — and therefore import-time oracle
construction — is preserved exactly). Families in this slice:
TPC-H-ish relational rows, windows/sessions/as-of, contribution synthesis (nodes/PBF/offset grid/changesets), hashtags, XZ, geodesic, spatial join, and the dedup family front half (exact/shingle/minhash/LSH/simhash/CC/exact-substr/line-dedup/ccnet-LM/C4/contamination).

Each slice star-imports its predecessor (cumulative namespace
chain), so cross-slice helper references resolve identically to
the original single file; ``plans/queries.py`` re-exports the
final namespace."""

from __future__ import annotations

from ._qshared import *  # noqa: F401,F403

# --- produce-then-query: shared materialized contributions ------------------
#
# The reference's user contract is produce-then-query: the contribution
# pipeline writes a GeoParquet dataset ONCE and every downstream query
# (snapshots, tag stats, member unnesting — docs/useful_queries.md) reads
# the stored table. Re-deriving the full pipeline inside each downstream
# query (as rounds 1-5 did) models the wrong thing and at 100 TB would
# re-run the planet build per query. The first downstream query in a
# session materializes the stream to parquet; the rest scan it with
# column pruning + predicate pushdown, exactly like a real deployment.
_MATERIALIZED: dict[tuple[str, str], str] = {}


def _produce_then_query(
    spark: SparkSession, sf_dir: str, kind: str, build: Callable[[], DataFrame]
) -> DataFrame:
    import os
    import tempfile

    path = _MATERIALIZED.get((kind, sf_dir))
    if path is None or not os.path.isdir(path):
        path = os.path.join(
            tempfile.mkdtemp(prefix=f"opc_stage_{kind}_"), "contribs"
        )
        build().write.mode("overwrite").parquet(path)
        _MATERIALIZED[(kind, sf_dir)] = path
    return spark.read.parquet(path)


def _node_contribs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _produce_then_query(
        spark, sf_dir, "nodes",
        lambda: synthesize_contributions(
            node_contribution_events(_derived_nodes(spark, sf_dir))
        ),
    )


def _way_contribs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        ways, nodes = _derived_way_inputs(spark, sf_dir)
        return synthesize_contributions(way_contribution_events(ways, nodes))

    return _produce_then_query(spark, sf_dir, "ways", build)


def _relation_contribs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        ways, nodes = _derived_way_inputs(spark, sf_dir)
        rels = _derived_relations(spark, sf_dir)
        return synthesize_contributions(
            relation_contribution_events(rels, ways, nodes)
        )

    return _produce_then_query(spark, sf_dir, "relations", build)


def _pq_codebook_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebooks (m=4, every=64, 1 Lloyd round) trained once per
    session — the stored-index contract: `pq_codes` is the verified
    trainer+encoder op and re-derives per run; the search queries
    (`pq_adc_topk`, `ann_ivfpq_topk`) read the staged codebook table,
    exactly as a deployed ANN service reads its trained index rather than
    retraining per query."""
    from ..operators.similarity import pq_codebooks

    return _produce_then_query(
        spark, sf_dir, "pq_cb_m4_e64",
        lambda: pq_codebooks(
            fan_out(_t(spark, sf_dir, "embeddings")), m=4, dim=64, every=64,
            iters=1,
        ),
    )


def _pq_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoded PQ code matrix, staged once per session (the stored
    index's data half; see :func:`_pq_codebook_table`)."""
    from ..operators.similarity import pq_encode

    def build() -> DataFrame:
        cb = _pq_codebook_table(spark, sf_dir)
        return pq_encode(
            fan_out(_t(spark, sf_dir, "embeddings")), cb, m=4, dim=64
        )

    return _produce_then_query(spark, sf_dir, "pq_codes_m4_e64", build)


def _pq_residual_codebook_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual PQ codebooks (FAISS IVFADC ``by_residual`` default):
    trained on x − coarse_centroid(x) instead of raw vectors, staged once
    per session like the raw-vector index tables. The coarse quantizer is
    the k-means-TRAINED centroid table (:func:`_trained_centroids_table`),
    not the sampled seeds: residual encoding only pays off when the
    coarse centroids actually sit inside the data (see
    :func:`_residual_v_cte` for the measured energies)."""
    from ..operators.similarity import pq_codebooks, residual_vectors

    def build() -> DataFrame:
        emb = fan_out(_t(spark, sf_dir, "embeddings"))
        res = residual_vectors(emb, _trained_centroids_table(spark, sf_dir))
        return pq_codebooks(res, m=4, dim=64, every=64, iters=1)

    return _produce_then_query(spark, sf_dir, "pq_res_cb_m4_e64", build)


def _pq_residual_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual PQ code matrix WITH the list id per row — in a stored
    IVFADC index the code and its inverted-list membership live in the
    same entry, so the staged table carries both."""
    from ..operators.similarity import pq_encode, residual_vectors

    def build() -> DataFrame:
        emb = fan_out(_t(spark, sf_dir, "embeddings"))
        res = residual_vectors(emb, _trained_centroids_table(spark, sf_dir))
        cb = _pq_residual_codebook_table(spark, sf_dir)
        return pq_encode(res, cb, m=4, dim=64).join(
            res.select("vec_id", "_list"), "vec_id"
        )

    return _produce_then_query(spark, sf_dir, "pq_res_codes_m4_e64", build)


def _trained_centroids_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means centroids (every=64, iters=2) trained once per session —
    the IVF train-once/reuse contract: the trainer (`kmeans_centroids`)
    re-derives per run to stay the verified op, consumers (IVF probing,
    semantic dedup) read the stored table."""
    return _produce_then_query(
        spark, sf_dir, "kmeans_e64_i2",
        lambda: kmeans_iterate(
            fan_out(_t(spark, sf_dir, "embeddings")), every=64, iters=2
        ).select("cid", "cv"),
    )


def _dedup_cluster_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters (doc_id, cluster_id, n_docs,
    is_canonical) staged once per session — the trainer-vs-consumer split
    of the k-means/PQ index tables applied to the dedup family
    (round-6 verdict item #8): ``dedup_clusters`` is the verified trainer
    and re-derives SimHash→banding→connected-components per run; consumers
    (``dedup_canonical``) read the stored cluster table, exactly as a
    deduplication service reads its precomputed cluster assignments rather
    than re-clustering the corpus per request."""
    from ..operators.dedup import dedup_clusters, simhash_near_dup_pairs

    def build() -> DataFrame:
        docs = fan_out(_t(spark, sf_dir, "documents"))
        sigs = simhash(docs, "doc_id", "text", bits=32)
        pairs = simhash_near_dup_pairs(sigs, bits=32, bands=4, max_hamming=3)
        return dedup_clusters(docs, pairs, id_col="doc_id")

    return _produce_then_query(spark, sf_dir, "simhash_clusters_b4_h3", build)


# ===========================================================================
# relational surface (joins/aggregations/sorts — SURVEY.md §2.3/2.4/2.6)
# ===========================================================================


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(avg(l_quantity), 6)                                       AS avg_qty,
           round(avg(l_extendedprice), 6)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           CAST(count(*) AS BIGINT)                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter + map-side-combinable aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "topk_order_revenue",
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dimension filter pushed below a 3-way join, top-k.

    customer is broadcast (dimension-sized); lineitem⨝orders shuffles on the
    order key only."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "region_nation_revenue",
    """
    SELECT r.r_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT)          AS n_orders
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey  = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join; all dimensions broadcast, facts
    shuffle once on the order key."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dim = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    )
    return staged_sort(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("o_orderkey").alias("n_orders"),
        ),
        "r_name",
        "n_name",
    )


@_register(
    "order_priority_counts",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS = left-semi join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "sales_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           round(sum(o_totalprice), 2)      AS total,
           CAST(count(*) AS BIGINT)         AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (ROLLUP) — free in Spark, absent in the
    reference engine (SURVEY.md §2.4 note)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "total",
            "n",
        )
        .orderBy("status", "priority")
    )


# ===========================================================================
# window surface (SURVEY.md §2.5 / A1-A6 analogs on the events stream)
# ===========================================================================


@_register(
    "events_windows",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT)                  AS seq,
           round(value - coalesce(lag(value) OVER w, 0.0), 2)    AS delta,
           coalesce(lead(ts) OVER w, TIMESTAMP '2222-01-01')     AS valid_to,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq
    """,
)
def events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/row_number/running-sum — the A1-A6 window family in one
    pass; all four specs share one partitioning → single shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(w).cast("bigint").alias("seq"),
            F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 2).alias("delta"),
            F.coalesce(
                F.lead("ts").over(w), F.lit("2222-01-01").cast("timestamp")
            ).alias("valid_to"),
            F.round(
                F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
            ).alias("running_value"),
        )
        .orderBy("user_id", "seq")
    )


@_register(
    "user_sessions",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - coalesce(lag(ts) OVER w, ts - INTERVAL 9999 MINUTE)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min) via cumulative-sum-of-boundaries — the
    batch equivalent of a session window."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ, so the
    # gap test is immune to parquet NTZ-inference drift (round-5 red row)
    prev = F.lag("ts").over(w)
    gap_over = (F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES")
    marked = ev.withColumn(
        "new_session",
        F.when(prev.isNull() | gap_over, F.lit(1)).otherwise(F.lit(0)),
    )
    # first row of each user: lag null -> new session (oracle encodes the
    # same via the sentinel interval)
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@_register(
    "latest_state",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           round(value, 2) AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 analog: latest-value-per-key state table (the Spark replacement of
    the reference's replication RocksDB store)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
        )
        .orderBy("user_id")
    )


@_register(
    "asof_purchase_view",
    """
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS view_ts, round(v.value, 2) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J3's relational core): each purchase picks up the latest
    preceding view per user. Union + last-value window — one shuffle, no
    interval explosion (operators/asof.py)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.round("value", 2).alias("view_value"),
        )
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        value_cols=["view_ts", "view_value"],
    )
    return out.select("event_id", "user_id", "ts", "view_ts", "view_value").orderBy("event_id")


# ===========================================================================
# OSM contribution pipeline on derived histories (flagship)
# ===========================================================================

def _contrib_oracle_sql(ent_cte: str) -> str:
    """The node-contribution window-SQL oracle, parameterized over the
    entity-derivation CTE (``contrib_nodes`` derives float coords and raw
    event timestamps; ``contrib_from_pbf`` derives PBF-representable
    second-resolution timestamps and 1e-7-exact coordinates)."""
    return _CONTRIB_ORACLE_BODY.replace("__ENT_CTE__", ent_cte)


_CONTRIB_ORACLE_BODY = """
__ENT_CTE__, raw AS (
  SELECT *,
         lag(ts)       OVER w AS prev_ts,
         lag(tagv)     OVER w AS prev_tagv,
         lag(visible)  OVER w AS prev_visible,
         lead(version)   OVER w AS next_version,
         lead(changeset) OVER w AS next_changeset
  FROM ent WINDOW w AS (PARTITION BY osm_id ORDER BY ts, version, changeset)
), squashed AS (
  SELECT * FROM raw
  WHERE next_version IS NULL
     OR NOT (next_version = version AND next_changeset = changeset)
), emitted AS (
  SELECT *,
         lead(ts) OVER w AS next_ts,
         last_value(CASE WHEN visible THEN struct_pack(lon := lon, lat := lat) END IGNORE NULLS)
           OVER (PARTITION BY osm_id ORDER BY ts, version, changeset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS eff,
         CAST(row_number() OVER (PARTITION BY osm_id, version ORDER BY ts, changeset) - 1 AS INT) AS osm_minor_version,
         CAST(row_number() OVER w AS INT) AS osm_edits
  FROM squashed WINDOW w AS (PARTITION BY osm_id ORDER BY ts, version, changeset)
), final AS (
  SELECT *, lag(eff) OVER (PARTITION BY osm_id ORDER BY ts, version, changeset) AS prev_eff
  FROM emitted
)
SELECT
  CASE WHEN NOT visible THEN 'deleted'
       WHEN eff IS NULL THEN 'invalid'
       WHEN next_ts IS NOT NULL THEN 'history'
       ELSE 'latest' END                                  AS status,
  ts                                                      AS valid_from,
  coalesce(next_ts, TIMESTAMP '2222-01-01')               AS valid_to,
  osm_id, version AS osm_version, osm_minor_version, osm_edits,
  prev_ts                                                 AS osm_last_edit,
  CASE WHEN NOT visible THEN 'DELETION'
       WHEN NOT coalesce(prev_visible, FALSE) THEN 'CREATION'
       ELSE nullif(concat_ws('_',
              CASE WHEN tagv IS DISTINCT FROM prev_tagv THEN 'TAG' END,
              CASE WHEN (eff).lon IS DISTINCT FROM (prev_eff).lon
                     OR (eff).lat IS DISTINCT FROM (prev_eff).lat THEN 'GEOMETRY' END), '')
  END                                                     AS contrib_type,
  round((eff).lon, 6)                                     AS cx,
  round((eff).lat, 6)                                     AS cy
FROM final
ORDER BY osm_id, osm_edits
"""

_CONTRIB_ORACLE = _contrib_oracle_sql("""
WITH base AS (
  SELECT user_id AS osm_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
         event_type, value
  FROM events
), ent AS (
  SELECT osm_id, ts,
         CAST(((seq - 1) // 2) + 1 AS INT)            AS version,
         CAST((((seq - 1) // 2) + 1) % 7 AS BIGINT)   AS changeset,
         event_type <> 'error'                        AS visible,
         event_type                                   AS tagv,
         (value % 360.0) - 180.0                      AS lon,
         ((value * 7.0) % 180.0) - 90.0               AS lat
  FROM base
)""")

# contrib_from_pbf: same history, but every value must survive the PBF
# wire format exactly — timestamps at whole seconds (date_granularity
# 1000), coordinates on the half/quarter-degree grid (exact doubles,
# lossless through the 1e-7 nanodegree encoding).
_CONTRIB_FROM_PBF_ORACLE = _contrib_oracle_sql("""
WITH base AS (
  SELECT user_id AS osm_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
         event_type, value
  FROM events WHERE user_id % 4 = 0
), ent AS (
  SELECT osm_id,
         TIMESTAMP '2015-01-01' + INTERVAL 1 MINUTE * seq              AS ts,
         CAST(((seq - 1) // 2) + 1 AS INT)            AS version,
         CAST((((seq - 1) // 2) + 1) % 7 AS BIGINT)   AS changeset,
         event_type <> 'error'                        AS visible,
         event_type                                   AS tagv,
         (abs(CAST(floor(value) AS BIGINT)) % 360) - 180 + 0.5         AS lon,
         (abs(CAST(floor(value * 7.0) AS BIGINT)) % 180) - 90 + 0.25   AS lat
  FROM base
)""")


def _derived_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic node-history derivation from the events table: two
    events per version (so same-changeset squash triggers), 'error' events
    are deletions."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = F.row_number().over(w)
    version = (F.floor((seq - 1) / 2) + 1).cast("int")
    return ev.select(
        F.col("user_id").alias("osm_id"),
        version.alias("version"),
        "ts",
        (version % 7).cast("bigint").alias("changeset"),
        F.lit(0).alias("user_id"),
        F.lit("u").alias("user_name"),
        (F.col("event_type") != "error").alias("visible"),
        F.create_map(F.lit("t"), F.col("event_type")).alias("tags"),
        ((F.col("value") % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 7.0) % 180.0) - 90.0).alias("lat"),
    )


@_register("contrib_nodes", _CONTRIB_ORACLE)
def contrib_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full node contribution pipeline (A1-A6, F3, F4) on
    derived histories, checked column-by-column against a window-SQL oracle."""
    nodes = _derived_nodes(spark, sf_dir)
    contribs = synthesize_contributions(node_contribution_events(nodes))
    return staged_sort(
        contribs.select(
        "status",
        "valid_from",
        "valid_to",
        "osm_id",
        "osm_version",
        "osm_minor_version",
        "osm_edits",
        "osm_last_edit",
        "contrib_type",
        F.round("centroid.x", 6).alias("cx"),
        F.round("centroid.y", 6).alias("cy"),
    ),
        "osm_id",
        "osm_edits",
    )


_PBF_FIXTURES: dict[str, str] = {}


def _pbf_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build the deterministic ``.osh.pbf`` fixture for contrib_from_pbf:
    derive a bounded node history from events (25% of users), collect it,
    and encode real DenseNodes wire bytes. The collect is fixture
    construction, not pipeline shape — at 100 TB the PBF already exists
    (it is the planet dump); only the decode side below is the engine."""
    import os

    path = _PBF_FIXTURES.get(sf_dir)
    if path is not None and os.path.exists(path):
        return path
    from ..sources.pbf_encoder import write_node_history_pbf

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = F.row_number().over(w)
    version = (F.floor((seq - F.lit(1)) / 2) + 1).cast("int")
    rows = ev.select(
        F.col("user_id").alias("osm_id"),
        version.alias("version"),
        (F.lit(1420070400) + 60 * seq).alias("ts_s"),
        (version % 7).cast("bigint").alias("changeset"),
        (F.col("event_type") != "error").alias("visible"),
        F.col("event_type").alias("tagv"),
        (F.abs(F.floor("value").cast("bigint")) % 360 - 180 + 0.5).alias("lon"),
        (F.abs(F.floor(F.col("value") * 7.0).cast("bigint")) % 180 - 90 + 0.25).alias("lat"),
    ).orderBy("osm_id", "version", "ts_s").collect()
    nodes = [
        dict(
            osm_id=r.osm_id, version=r.version, ts_ms=r.ts_s * 1000,
            changeset=r.changeset, uid=0, user="u", visible=r.visible,
            tags={"t": r.tagv}, lon=r.lon, lat=r.lat,
        )
        for r in rows
    ]
    import hashlib
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"opc_fixture_nodes_{key}.osh.pbf"
    )
    write_node_history_pbf(path, nodes)
    _PBF_FIXTURES[sf_dir] = path
    return path


@_register("contrib_from_pbf", _CONTRIB_FROM_PBF_ORACLE)
def contrib_from_pbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end S1-S6 + A1-A6 seam: real ``.osh.pbf`` bytes → distributed
    blob decode (``read_pbf``, mapInPandas over the blob index) → node
    contribution synthesis — the `Contributions2Parquet.call()` path
    (``Contributions2Parquet.java:125-207``) inside the hash-match gate.
    The oracle replays the same history from the events table in pure SQL;
    any decode bug (delta/zigzag, string table, info fields, granularity)
    breaks the hash."""
    from ..sources.pbf import read_pbf

    path = _pbf_fixture(spark, sf_dir)
    ents = read_pbf(spark, path).filter(F.col("osm_type") == "node")
    nodes = ents.select(
        "osm_id", "version", "ts", "changeset", "user_id", "user_name",
        "visible", "tags", "lon", "lat",
    )
    contribs = synthesize_contributions(node_contribution_events(nodes))
    return contribs.select(
        "status",
        "valid_from",
        "valid_to",
        "osm_id",
        "osm_version",
        "osm_minor_version",
        "osm_edits",
        "osm_last_edit",
        "contrib_type",
        F.round("centroid.x", 6).alias("cx"),
        F.round("centroid.y", 6).alias("cy"),
    ).orderBy("osm_id", "osm_edits")


# contrib_from_pbf_offset_grid: the SAME contribution semantics, but the
# wire bytes carry non-default granularity / lat_offset / lon_offset /
# date_granularity VARYING PER BLOCK (osm_id%3 picks the combo). The
# decoder's (off + gran*x)/1e9 replay (pbf.py, matching Block.java:88-97)
# was implemented-but-untested until this row: every fixture before it
# used the defaults (round-10 verdict, What's missing #1). Coordinates
# are multiples of 250 nanodegrees on each block's grid, so encode →
# decode → round(·,6) is lossless on both engines; timestamps are
# multiples of every date_granularity used.
_GRID_GRAN = "CASE osm_id % 3 WHEN 0 THEN 250 WHEN 1 THEN 500 ELSE 1250 END"
_GRID_LATO = "CASE osm_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 250000 ELSE 500000 END"
_GRID_LONO = "CASE osm_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1250000 ELSE 750000 END"
_CONTRIB_PBF_OFFSET_ORACLE = _contrib_oracle_sql(f"""
WITH base AS (
  SELECT user_id AS osm_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
         event_type
  FROM events WHERE user_id % 4 = 0
), grid AS (
  SELECT osm_id, seq, event_type,
         ((osm_id * 37 + seq * 11) % 720001) - 360000 AS klon,
         ((osm_id * 53 + seq * 13) % 360001) - 180000 AS klat
  FROM base
), ent AS (
  SELECT osm_id,
         TIMESTAMP '2015-01-01' + INTERVAL 1 MINUTE * seq              AS ts,
         CAST(((seq - 1) // 2) + 1 AS INT)            AS version,
         CAST((((seq - 1) // 2) + 1) % 7 AS BIGINT)   AS changeset,
         event_type <> 'error'                        AS visible,
         event_type                                   AS tagv,
         (({_GRID_LONO}) + ({_GRID_GRAN}) * klon) / 1e9 AS lon,
         (({_GRID_LATO}) + ({_GRID_GRAN}) * klat) / 1e9 AS lat
  FROM grid
)""")

_GRID_COMBOS = {
    # osm_id%3 → (granularity, lat_offset, lon_offset, date_granularity)
    0: (250, 0, 0, 1000),
    1: (500, 250_000, 1_250_000, 2000),
    2: (1250, 500_000, 750_000, 5000),
}


def _pbf_offset_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Encode the offset-grid ``.osh.pbf``: three interleaved block
    families, each with its own granularity/offsets/date_granularity
    (fields 17-20 on the wire). Coordinates are constructed ON the grid,
    so encoding is exact and the oracle recomputes them in closed form."""
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"opc_fixture_offset_grid_{key}.osh.pbf"
    )
    if _PBF_FIXTURES.get(("grid", sf_dir)) == path and os.path.exists(path):
        return path
    from ..sources.pbf_encoder import encode_block, write_pbf

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = F.row_number().over(w)
    version = (F.floor((seq - F.lit(1)) / 2) + 1).cast("int")
    rows = ev.select(
        F.col("user_id").alias("osm_id"),
        version.alias("version"),
        (F.lit(1420070400) + 60 * seq).alias("ts_s"),
        (version % 7).cast("bigint").alias("changeset"),
        (F.col("event_type") != "error").alias("visible"),
        F.col("event_type").alias("tagv"),
        ((F.col("user_id") * 37 + seq * 11) % 720001 - 360000).alias("klon"),
        ((F.col("user_id") * 53 + seq * 13) % 360001 - 180000).alias("klat"),
    ).orderBy("osm_id", "version", "ts_s").collect()
    by_combo: dict[int, list[dict]] = {0: [], 1: [], 2: []}
    for r in rows:
        gran, lat_o, lon_o, _dg = _GRID_COMBOS[r.osm_id % 3]
        by_combo[r.osm_id % 3].append(
            dict(
                osm_id=r.osm_id, version=r.version, ts_ms=r.ts_s * 1000,
                changeset=r.changeset, uid=0, user="u", visible=r.visible,
                tags={"t": r.tagv},
                lon=(lon_o + gran * r.klon) / 1e9,
                lat=(lat_o + gran * r.klat) / 1e9,
            )
        )
    blocks = []
    for c, nodes in by_combo.items():
        gran, lat_o, lon_o, dg = _GRID_COMBOS[c]
        for i in range(0, max(len(nodes), 1), 4000):
            blocks.append(
                encode_block(
                    dense_nodes=nodes[i : i + 4000],
                    granularity=gran,
                    lat_offset=lat_o,
                    lon_offset=lon_o,
                    date_granularity=dg,
                )
            )
    fd, tmp = tempfile.mkstemp(dir=tempfile.gettempdir(), suffix=".pbf.tmp")
    os.close(fd)
    write_pbf(tmp, blocks)
    os.replace(tmp, path)
    _PBF_FIXTURES[("grid", sf_dir)] = path
    return path


@_register("contrib_from_pbf_offset_grid", _CONTRIB_PBF_OFFSET_ORACLE)
def contrib_from_pbf_offset_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``contrib_from_pbf``'s wire-format-hardening twin: the same
    decode → synthesis pipeline over blocks that carry NON-DEFAULT
    granularity (250/500/1250), lat/lon offsets, and date_granularity
    (1000/2000/5000), varying per block. One wrong term in the
    ``(off + gran*x)/1e9`` or ``ts*date_gran`` replay (``sources/pbf.py``
    vs Block.java:88-97) shifts every coordinate/timestamp and breaks
    the hash."""
    from ..sources.pbf import read_pbf

    path = _pbf_offset_fixture(spark, sf_dir)
    ents = read_pbf(spark, path).filter(F.col("osm_type") == "node")
    nodes = ents.select(
        "osm_id", "version", "ts", "changeset", "user_id", "user_name",
        "visible", "tags", "lon", "lat",
    )
    contribs = synthesize_contributions(node_contribution_events(nodes))
    return staged_sort(
        contribs.select(
        "status",
        "valid_from",
        "valid_to",
        "osm_id",
        "osm_version",
        "osm_minor_version",
        "osm_edits",
        "osm_last_edit",
        "contrib_type",
        F.round("centroid.x", 6).alias("cx"),
        F.round("centroid.y", 6).alias("cy"),
    ),
        "osm_id",
        "osm_edits",
    )


_CONTRIB_CHANGESETS_ORACLE = """
WITH contribs AS (
  SELECT o_orderkey AS contrib_id, CAST(o_custkey AS BIGINT) AS changeset_id
  FROM orders
), cs AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         TIMESTAMP '2020-01-01' + INTERVAL 1 MINUTE * c_custkey AS created_at,
         TIMESTAMP '2020-01-01' + INTERVAL 1 MINUTE * (c_custkey + 120) AS closed_at,
         c_mktsegment AS editor,
         concat('h', CAST(c_custkey % 10 AS VARCHAR), ',',
                lower(c_mktsegment))                         AS hashtags
  FROM customer WHERE c_custkey % 3 <> 0
)
SELECT contrib_id,
       changeset_id,
       coalesce(cs.created_at, TIMESTAMP '1970-01-01')       AS cs_created_at,
       cs.closed_at                                          AS cs_closed_at,
       cs.editor                                             AS editor,
       coalesce(cs.hashtags, '')                             AS hashtags
FROM contribs LEFT JOIN cs ON contribs.changeset_id = cs.id
ORDER BY contrib_id
"""


@_register("contrib_changesets", _CONTRIB_CHANGESETS_ORACLE)
def contrib_changesets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 changeset enrichment: left join with the reference's default
    record for missing ids (``util/Utils.java:50-66``), editor from
    tags['created_by'] (A11, ``ChangesetDb.java:50``). Every third
    changeset id is withheld so the default-record path is exercised.
    Scale shape: semi-join-pruned build side, AQE-picked broadcast
    (see ``with_changesets``)."""
    from ..operators.contributions import with_changesets

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    contribs = orders.select(
        F.col("o_orderkey").alias("contrib_id"),
        F.col("o_custkey").cast("bigint").alias("changeset_id"),
    )
    changesets = customer.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").cast("bigint").alias("id"),
        F.expr(
            "timestamp'2020-01-01' + make_interval(0,0,0,0,0, c_custkey, 0)"
        ).alias("created_at"),
        F.expr(
            "timestamp'2020-01-01' + make_interval(0,0,0,0,0, c_custkey + 120, 0)"
        ).alias("closed_at"),
        F.create_map(F.lit("created_by"), F.col("c_mktsegment")).alias("tags"),
        F.array(
            F.concat(F.lit("h"), (F.col("c_custkey") % 10).cast("string")),
            F.lower("c_mktsegment"),
        ).alias("hashtags"),
    )
    out = with_changesets(contribs, changesets)
    return out.select(
        "contrib_id",
        F.col("changeset.id").alias("changeset_id"),
        F.col("changeset.created_at").alias("cs_created_at"),
        F.col("changeset.closed_at").alias("cs_closed_at"),
        F.col("changeset.editor").alias("editor"),
        F.concat_ws(",", "changeset.hashtags").alias("hashtags"),
    ).orderBy("contrib_id")


# ===========================================================================
# scalar function surface: hashtags, xz, geodesic (A8-A11)
# ===========================================================================


_CAMPAIGN_ORACLE = """
WITH contribs AS (
  SELECT o_orderkey AS contrib_id, CAST(o_custkey AS BIGINT) AS changeset_id
  FROM orders
), cs AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         TIMESTAMP '2020-01-01' + INTERVAL 1 MINUTE * c_custkey AS created_at,
         [concat('h', CAST(c_custkey % 10 AS VARCHAR)),
          lower(c_mktsegment)]                                AS hashtags
  FROM customer WHERE c_custkey % 3 <> 0
), j AS (
  SELECT contrib_id, cs.id AS cs_id, cs.created_at,
         unnest(cs.hashtags) AS hashtag
  FROM contribs JOIN cs ON contribs.changeset_id = cs.id
)
SELECT hashtag,
       CAST(count(*) AS BIGINT)              AS n_contribs,
       CAST(count(DISTINCT cs_id) AS BIGINT) AS n_changesets,
       min(created_at)                       AS first_at,
       max(created_at)                       AS last_at
FROM j GROUP BY hashtag ORDER BY hashtag
"""


@_register("hashtag_campaign_stats", _CAMPAIGN_ORACLE)
def hashtag_campaign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign (mapathon) monitoring — the ohsome hashtag analytic the
    reference's changeset hashtags exist to serve: per hashtag, the
    contribution count, distinct changesets, and first/last changeset
    time. One explode + one map-side-combinable groupBy downstream of the
    J4 enrichment join; missing changesets carry the default record's
    empty hashtag list, so they drop out at the explode, matching the
    oracle's inner join."""
    from ..operators.contributions import with_changesets

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    contribs = orders.select(
        F.col("o_orderkey").alias("contrib_id"),
        F.col("o_custkey").cast("bigint").alias("changeset_id"),
    )
    changesets = customer.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").cast("bigint").alias("id"),
        F.expr(
            "timestamp'2020-01-01' + make_interval(0,0,0,0,0, c_custkey, 0)"
        ).alias("created_at"),
        F.expr(
            "timestamp'2020-01-01' + make_interval(0,0,0,0,0, c_custkey + 120, 0)"
        ).alias("closed_at"),
        F.create_map(F.lit("created_by"), F.col("c_mktsegment")).alias("tags"),
        F.array(
            F.concat(F.lit("h"), (F.col("c_custkey") % 10).cast("string")),
            F.lower("c_mktsegment"),
        ).alias("hashtags"),
    )
    enriched = with_changesets(contribs, changesets)
    tagged = enriched.select(
        "contrib_id",
        F.col("changeset.id").alias("cs_id"),
        F.col("changeset.created_at").alias("created_at"),
        F.explode("changeset.hashtags").alias("hashtag"),
    )
    return (
        tagged.groupBy("hashtag")
        .agg(
            F.count(F.lit(1)).alias("n_contribs"),
            F.countDistinct("cs_id").alias("n_changesets"),
            F.min("created_at").alias("first_at"),
            F.max("created_at").alias("last_at"),
        )
        .orderBy("hashtag")
    )


def _hashtags_oracle() -> str:
    from ..functions.hashtags import HASHTAG_RE, URL_RE

    # HASHTAG_RE is built from literal codepoints, so it is valid RE2 as-is;
    # escape single quotes for the SQL literal
    pat = HASHTAG_RE.replace("'", "''")
    url = URL_RE
    return f"""
    WITH comments AS (
      SELECT doc_id,
             concat('Edit #', source, ' and #', lang, 'map see http://x.io/#ign ',
                    '#', CAST(doc_id % 100 AS VARCHAR), ' #ok') AS comment
      FROM documents
    ), extracted AS (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(
               list_transform(
                 regexp_extract_all(regexp_replace(comment, '{url}', '', 'g'),
                   '{pat}'),
                 t -> t[2:]),
               t -> len(t) >= 2 AND NOT regexp_matches(t, '^[0-9]+$')))) AS hashtags
      FROM comments
    )
    SELECT doc_id, array_to_string(hashtags, ',') AS hashtags
    FROM extracted ORDER BY doc_id
    """


@_register("changeset_hashtags", _hashtags_oracle())
def changeset_hashtags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: hashtag derivation (URL stripping, ≥2 chars, non-numeric,
    distinct+sorted) on synthesized comment strings."""
    docs = _t(spark, sf_dir, "documents")
    comment = F.concat(
        F.lit("Edit #"),
        F.col("source"),
        F.lit(" and #"),
        F.col("lang"),
        F.lit("map see http://x.io/#ign "),
        F.lit("#"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" #ok"),
    )
    # The driver's canonicalizer sorts the result frame and cannot hash
    # array cells, so emit the hashtag list as a canonical comma-joined
    # string on both engines.
    return docs.select(
        "doc_id", F.concat_ws(",", hashtags_expr(comment)).alias("hashtags")
    ).orderBy("doc_id")


def _xz_oracle() -> str:
    g = G_DEFAULT
    n_elem = _n_elem(g)
    terms = []
    for i in range(g):
        scale = float(2 ** (i + 1))
        cap = 2 ** (i + 1) - 1
        bx = f"(least(CAST(floor(nx * {scale}) AS BIGINT), {cap}) % 2)"
        by = f"(least(CAST(floor(ny * {scale}) AS BIGINT), {cap}) % 2)"
        terms.append(
            f"CASE WHEN {i} < lvl THEN ({bx} + 2 * {by}) * {int(n_elem[i])} + 1 ELSE 0 END"
        )
    code_sum = " + ".join(terms)
    return f"""
    WITH boxes AS (
      SELECT c_custkey,
             CAST((c_custkey % 340) - 170 AS DOUBLE)      AS xmin,
             CAST(((c_custkey * 3) % 160) - 80 AS DOUBLE) AS ymin,
             CAST((c_custkey % 340) - 170 AS DOUBLE) + (abs(c_acctbal) % 10.0)      AS xmax,
             CAST(((c_custkey * 3) % 160) - 80 AS DOUBLE) + ((abs(c_acctbal) * 2.0) % 8.0) AS ymax
      FROM customer
    ), norm AS (
      SELECT c_custkey,
             (180.0 + xmin) / 360.0 AS nx, (90.0 + ymin) / 360.0 AS ny,
             (180.0 + xmax) / 360.0 AS nx2, (90.0 + ymax) / 360.0 AS ny2
      FROM boxes
    ), lvl1 AS (
      SELECT *, greatest(nx2 - nx, ny2 - ny) AS ext FROM norm
    ), lvl2 AS (
      SELECT *,
        CASE WHEN ext <= 0 THEN {g}
             ELSE CAST(floor(ln(ext) / ln(0.5)) AS BIGINT) END AS l1
      FROM lvl1
    ), lvl3 AS (
      SELECT *, power(0.5, l1 + 1) AS w2 FROM lvl2
    ), leveled AS (
      SELECT *,
        CAST(CASE WHEN l1 >= {g} THEN {g}
             WHEN (nx2 <= floor(nx / w2) * w2 + 2 * w2) AND (ny2 <= floor(ny / w2) * w2 + 2 * w2)
               THEN l1 + 1 ELSE l1 END AS INT) AS lvl
      FROM lvl3
    )
    SELECT c_custkey, lvl AS xz_level, CAST({code_sum} AS BIGINT) AS xz_code
    FROM leveled ORDER BY c_custkey
    """


@_register("xz_codes", _xz_oracle())
def xz_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: XZ-ordering codes as pure codegen expressions on derived bboxes."""
    c = _t(spark, sf_dir, "customer")
    xmin = ((F.col("c_custkey") % 340) - 170).cast("double")
    ymin = (((F.col("c_custkey") * 3) % 160) - 80).cast("double")
    xmax = xmin + (F.abs(F.col("c_acctbal")) % 10.0)
    ymax = ymin + ((F.abs(F.col("c_acctbal")) * 2.0) % 8.0)
    return staged_sort(
        c.select(
        "c_custkey",
        xz_level_expr(xmin, ymin, xmax, ymax).alias("xz_level"),
        xz_code_expr(xmin, ymin, xmax, ymax).alias("xz_code"),
    ),
        "c_custkey",
    )


@_register(
    "geodesic_tracks",
    f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             (value % 360.0) - 180.0        AS lon,
             ((value * 7.0) % 180.0) - 90.0 AS lat
      FROM events
    ), segs AS (
      SELECT user_id,
             lag(lon) OVER w AS lon1, lag(lat) OVER w AS lat1, lon AS lon2, lat AS lat2
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           round(sum(
             6371000.0 * sqrt(
               pow((radians(lon2) - radians(lon1))
                   * cos((atan({SPHERE_FACT!r} * tan(radians(lat1)))
                        + atan({SPHERE_FACT!r} * tan(radians(lat2)))) / 2), 2)
             + pow(atan({SPHERE_FACT!r} * tan(radians(lat2)))
                 - atan({SPHERE_FACT!r} * tan(radians(lat1))), 2))
           ) / 1000.0, 3) AS track_km,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM segs WHERE lon1 IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def geodesic_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: geodesic track length per user (WGS84-corrected spherical
    formula as native expressions + lag window)."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("value") % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 7.0) % 180.0) - 90.0).alias("lat"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    segs = pts.select(
        "user_id",
        F.lag("lon").over(w).alias("lon1"),
        F.lag("lat").over(w).alias("lat1"),
        F.col("lon").alias("lon2"),
        F.col("lat").alias("lat2"),
    ).filter(F.col("lon1").isNotNull())
    seg_len = segment_length_expr(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
    )
    return (
        segs.groupBy("user_id")
        .agg(
            F.round(F.sum(seg_len) / 1000.0, 3).alias("track_km"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .orderBy("user_id")
    )


# ===========================================================================
# spatial join (J5)
# ===========================================================================

_GRID_FEATURES = [
    ("AAA", -170.0, -80.0, -50.0, 0.0),
    ("BBB", -50.0, -80.0, 60.0, 0.0),
    ("CCC", 60.0, -80.0, 170.0, 0.0),
    ("DDD", -170.0, 0.0, -50.0, 80.0),
    ("EEE", -50.0, 0.0, 60.0, 80.0),
    ("FFF", 60.0, 0.0, 170.0, 80.0),
]


def _spatial_oracle() -> str:
    cases = " || ".join(
        f"CASE WHEN lon >= {x0!r} AND lon <= {x1!r} AND lat >= {y0!r} AND lat <= {y1!r} "
        f"THEN ['{fid}'] ELSE [] END"
        for fid, x0, y0, x1, y1 in _GRID_FEATURES
    )
    return f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 330) - 165.0 + 0.25        AS lon,
             ((c_custkey * 7) % 158) - 79.0 + 0.25   AS lat
      FROM customer
    )
    SELECT c_custkey, round(lon, 6) AS lon, round(lat, 6) AS lat,
           array_to_string(list_sort({cases}), ',') AS countries
    FROM pts ORDER BY c_custkey
    """


@_register("spatial_join_countries", _spatial_oracle())
def spatial_join_countries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: broadcast spatial join of derived points against rectangular
    'countries' (shared borders → points on the border match both sides)."""
    feats = [rect_feature(fid, x0, y0, x1, y1) for fid, x0, y0, x1, y1 in _GRID_FEATURES]
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 330) - 165.0 + 0.25).alias("lon"),
        (((F.col("c_custkey") * 7) % 158) - 79.0 + 0.25).alias("lat"),
    )
    out = join_countries(pts, feats, "lon", "lat")
    # Array columns break the driver-side canonicalizer: join to a string.
    return out.select(
        "c_custkey",
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        F.concat_ws(",", "countries").alias("countries"),
    ).orderBy("c_custkey")


# ===========================================================================
# dedup family
# ===========================================================================


@_register(
    "dedup_exact",
    f"""
    SELECT {hash60_sql('text')} AS content_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY 1 ORDER BY content_hash
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dup_groups(docs, "doc_id", "text").orderBy("content_hash")


_SHINGLE_SQL = """
  SELECT doc_id AS doc, shingle
  FROM (
    SELECT doc_id,
           list_distinct(list_transform(
             range(1, greatest(len(toks) - {n} + 2, 2)),
             i -> array_to_string(toks[i : i + {n} - 1], ' '))) AS grams
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
          FROM documents)
  ), UNNEST(grams) AS t(shingle)
  WHERE len(string_split(shingle, ' ')) = {n}
"""


def _jaccard_oracle(n: int = 3, threshold: float = 0.5, max_df: int = 64) -> str:
    sh = _SHINGLE_SQL.format(n=n)
    return f"""
    WITH sh0 AS (
      SELECT DISTINCT doc, {hash60_sql('shingle')} AS shingle_hash FROM ({sh})
    ), sh AS (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY shingle_hash) AS _df FROM sh0
      ) WHERE _df <= {max_df}
    ), sizes AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc
    ), inter AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= {threshold!r}
    ORDER BY doc_a, doc_b
    """


def _lr_oracle(iters: int = 3, lr: float = 0.5) -> str:
    from ..functions.text import STOPWORDS

    k = 5
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    xs = [f"x{j}" for j in range(k)]

    def z(wref: str | None) -> str:
        if wref is None:
            terms = [f"0.0 * {x}" for x in xs]
        else:
            terms = [f"{wref}.w{j} * {xs[j]}" for j in range(k)]
        return " + ".join(terms)

    def grads(name: str, wref: str | None, extra_from: str) -> str:
        p = f"1.0/(1.0+exp(-({z(wref)})))"
        cols = ", ".join(
            f"sum(CAST(round((({p} - y) * {x}) * 1e9) AS BIGINT)) AS g{j}"
            for j, x in enumerate(xs)
        )
        return f"{name} AS (SELECT {cols} FROM f{extra_from})"

    parts = [
        f"""WITH f AS (
      SELECT 1.0 AS x0,
             ln(1.0 + n_chars) - ln(300.0) AS x1,
             len(list_filter(toks, t -> t IN ({stops})))
               / greatest(len(toks), 1) AS x2,
             (n_chars / greatest(len(toks), 1)) / 10.0 - 0.55 AS x3,
             len(toks) / 100.0 - 0.55 AS x4,
             CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y
      FROM (SELECT n_chars,
                   list_filter(regexp_split_to_array(lower(text), '\\W+'),
                               x -> x <> '') AS toks
            FROM documents)
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f)"""
    ]
    for t in range(1, iters + 1):
        wprev = None if t == 1 else f"w{t - 1}"
        parts.append(grads(f"g{t}", wprev, "" if t == 1 else f", w{t - 1}"))
        upd = ", ".join(
            (
                f"0.0 - {lr!r} * (g{j} / 1e9) / nn.n AS w{j}"
                if t == 1
                else f"w.w{j} - {lr!r} * (g{j} / 1e9) / nn.n AS w{j}"
            )
            for j in range(k)
        )
        src = f"g{t}, nn" if t == 1 else f"g{t}, w{t - 1} w, nn"
        parts.append(f"w{t} AS (SELECT {upd} FROM {src})")
    wf = f"w{iters}"
    pz = f"1.0/(1.0+exp(-({z('w')})))"
    weight_rows = " UNION ALL ".join(
        f"SELECT 'x{j}' AS feature, round(w.w{j}, 9) AS weight FROM {wf} w"
        for j in range(k)
    )
    return (
        ",\n".join(parts)
        + f"""
    {weight_rows}
    UNION ALL
    SELECT 'accuracy' AS feature,
           round((SELECT avg(CASE WHEN ({pz} >= 0.5) = (y >= 0.5)
                                  THEN 1.0 ELSE 0.0 END)
                  FROM f, {wf} w), 9) AS weight
    ORDER BY feature
    """
    )


@_register("quality_lr_train", _lr_oracle(iters=3, lr=0.5))
def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING, oracle-replayed: 3 rounds
    of full-batch gradient descent over per-document quality features
    (bias, log length, stopword ratio, mean word length, token count)
    against a synthetic linearly-separable label (n_chars ≥ 300; features
    centered at the boundary so 3 full-batch rounds reach ~98% train
    accuracy — the verified artifact is the TRAINING LOOP, not a
    production classifier).
    The gradient is quantized to int64 per row before the sum (the
    k-means trainer's order-independence trick), so the aggregated
    gradient is exact integer arithmetic under any partitioning and the
    DuckDB oracle replays every round bit-for-bit — weights AND final
    train accuracy. Scale shape: one map-side-combinable agg per round;
    the driver sees 5 integers per round (``operators/curation.py::
    train_logreg``). This is the fastText-style quality-classifier
    training stage of a curation pipeline, Spark-shaped."""
    from ..operators.curation import train_logreg

    docs = fan_out(_t(spark, sf_dir, "documents"))
    toks = tokens_expr(F.col("text"))
    feats = docs.select(
        F.lit(1.0).alias("x0"),
        (F.log(F.lit(1.0) + F.col("n_chars")) - F.log(F.lit(300.0))).alias(
            "x1"
        ),
        stopword_ratio_expr(F.col("text")).alias("x2"),
        (
            (F.col("n_chars") / F.greatest(F.size(toks), F.lit(1))) / 10.0
            - 0.55
        ).alias("x3"),
        (F.size(toks) / 100.0 - 0.55).alias("x4"),
        F.when(F.col("n_chars") >= 300, 1.0).otherwise(0.0).alias("y"),
    )
    w, acc = train_logreg(feats, n_features=5, iters=3, lr=0.5)
    rows = [(f"x{j}", w[j]) for j in range(5)] + [("accuracy", acc)]
    out = spark.createDataFrame(rows, "feature string, weight double")
    return staged_sort(
        out.select(
        "feature", F.round("weight", 9).alias("weight")
    ),
        "feature",
    )


def _chunk_oracle(max_tokens: int = 16, overlap: int = 4) -> str:
    stride = max_tokens - overlap
    return f"""
    WITH base AS (
      SELECT doc_id AS doc, toks, len(toks) AS n
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\W+'),
                               x -> x <> '') AS toks
            FROM documents)
      WHERE len(toks) > 0
    )
    SELECT doc, i AS chunk_idx,
           array_to_string(toks[i * {stride} + 1 : i * {stride} + {max_tokens}],
                           ' ') AS chunk_text,
           least(n - i * {stride}, {max_tokens}) AS n_tokens
    FROM base, UNNEST(range(0,
      CAST(ceil(greatest(n - {overlap}, 1) / CAST({stride} AS DOUBLE))
           AS BIGINT))) AS t(i)
    ORDER BY doc, chunk_idx
    """


@_register("document_chunks", _chunk_oracle(max_tokens=16, overlap=4))
def document_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for embedding/RAG/long-context prep:
    each document's token stream becomes windows of 16 tokens with 4
    tokens of overlap carried between consecutive chunks
    (``operators/packing.py::chunk_documents``). Pure narrow transform —
    one sequence/slice expression and an explode, zero shuffles — so it
    composes with any downstream embedding stage at full scan speed."""
    from ..operators.packing import chunk_documents

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return chunk_documents(docs, max_tokens=16, overlap=4).orderBy(
        "doc", "chunk_idx"
    )


_SPAN_SQL = """
  SELECT doc, {h} AS h
  FROM (
    SELECT doc_id AS doc,
           list_transform(range(1, greatest(len(toks) - {n} + 2, 2)),
                          i -> array_to_string(toks[i : i + {n} - 1], ' ')) AS grams
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
          FROM documents)
  ), UNNEST(grams) AS t(span)
  WHERE len(string_split(span, ' ')) = {n}
"""


def _span_dup_oracle(n: int = 8, min_docs: int = 2) -> str:
    sp = _SPAN_SQL.format(n=n, h=hash60_sql("span"))
    return f"""
    WITH sp AS ({sp}),
    dph AS (SELECT h, count(DISTINCT doc) AS nd FROM sp GROUP BY h)
    SELECT doc, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN nd >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(sum(CASE WHEN nd >= {min_docs} THEN 1 ELSE 0 END)
                 / count(*), 6) AS dup_fraction
    FROM sp JOIN dph USING (h)
    GROUP BY doc ORDER BY doc
    """


@_register("span_duplication", _span_dup_oracle(n=8, min_docs=2))
def span_duplication_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span dedup (Lee et al. 2022) as the scalable
    Spark composition: per document, the fraction of positional token
    8-gram spans (multiplicity kept, unlike the distinct shingle set)
    shared with ≥2 distinct documents — the signal used to cut
    boilerplate/mirrored passages that survive document-level near-dup
    filters. Linear in corpus tokens (hash-keyed agg + join back), no
    all-pairs stage and no global sort — the 100 TB substitute for a
    suffix array."""
    from ..operators.dedup import span_duplication

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return span_duplication(docs, "doc_id", "text", n=8, min_docs=2).orderBy(
        "doc"
    )


def _exact_substr_oracle(n: int = 8, min_docs: int = 2) -> str:
    h = hash60_sql("span")
    return f"""
    WITH docs AS (
      SELECT doc_id AS doc,
             list_filter(regexp_split_to_array(lower(text), '\\W+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    sp AS (
      SELECT doc, i, {h} AS h FROM (
        SELECT doc, i, array_to_string(toks[i : i + {n} - 1], ' ') AS span
        FROM docs, UNNEST(range(1, greatest(len(toks) - {n} + 2, 1))) AS t(i)
        WHERE len(toks) >= i + {n} - 1
      )
    ),
    duph AS (
      SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc) >= {min_docs}
    ),
    dupsp AS (SELECT doc, i FROM sp JOIN duph USING (h)),
    isl0 AS (
      SELECT doc, i,
             max(i + {n}) OVER (PARTITION BY doc ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      FROM dupsp
    ),
    isl1 AS (
      SELECT doc, i,
             CASE WHEN pe IS NULL OR i > pe THEN 1 ELSE 0 END AS ni
      FROM isl0
    ),
    isl2 AS (
      SELECT doc, i,
             sum(ni) OVER (PARTITION BY doc ORDER BY i
               ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl1
    ),
    iv AS (
      SELECT doc, min(i) AS s, max(i) + {n} AS e
      FROM isl2 GROUP BY doc, isl
    ),
    ivs AS (
      SELECT doc, list(struct_pack(s := s, e := e) ORDER BY s) AS ivl
      FROM iv GROUP BY doc
    ),
    fin AS (
      SELECT d.doc, d.toks, coalesce(v.ivl, []) AS ivl
      FROM docs d LEFT JOIN ivs v USING (doc)
    )
    SELECT doc,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
           coalesce(array_to_string(list_transform(kept, j -> toks[j]), ' '),
                    '') AS dedup_text
    FROM (
      SELECT doc, toks,
             list_filter(range(1, len(toks) + 1),
               j -> len(list_filter(ivl,
                      iv -> j >= iv.s AND j < iv.e)) = 0) AS kept
      FROM fin
    )
    ORDER BY doc
    """


@_register("exact_substr_dedup", _exact_substr_oracle(n=8, min_docs=2))
def exact_substr_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal (Lee et al. 2022 §4.1): rewrite documents with
    every cross-corpus duplicated 8-gram span cut out, overlapping spans
    merged to maximal ranges (gaps-and-islands window). The removal half
    of the pipeline whose scoring half is ``span_duplication`` — linear in
    corpus tokens, no suffix-array global sort."""
    from ..operators.dedup import exact_substr_dedup

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return staged_sort(
        exact_substr_dedup(docs, "doc_id", "text", n=8, min_docs=2),
        "doc",
    )


def _exact_substr_rewrite_oracle(n: int = 8, min_docs: int = 2) -> str:
    h = hash60_sql("span")
    return f"""
    WITH raw AS (
      SELECT doc_id AS doc, text,
             regexp_extract_all(text, '(\\W+|\\w+)', 1) AS segs
      FROM documents
    ),
    docs AS (
      SELECT doc, text, segs,
             list_transform(
               list_filter(segs, s -> regexp_matches(s, '^\\w')),
               s -> lower(s)) AS toks
      FROM raw
    ),
    sp AS (
      SELECT doc, i, {h} AS h FROM (
        SELECT doc, i, array_to_string(toks[i : i + {n} - 1], ' ') AS span
        FROM docs, UNNEST(range(1, greatest(len(toks) - {n} + 2, 1))) AS t(i)
        WHERE len(toks) >= i + {n} - 1
      )
    ),
    duph AS (
      SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc) >= {min_docs}
    ),
    dupsp AS (SELECT doc, i FROM sp JOIN duph USING (h)),
    isl0 AS (
      SELECT doc, i,
             max(i + {n}) OVER (PARTITION BY doc ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      FROM dupsp
    ),
    isl1 AS (
      SELECT doc, i,
             CASE WHEN pe IS NULL OR i > pe THEN 1 ELSE 0 END AS ni
      FROM isl0
    ),
    isl2 AS (
      SELECT doc, i,
             sum(ni) OVER (PARTITION BY doc ORDER BY i
               ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl1
    ),
    iv AS (
      SELECT doc, min(i) AS s, max(i) + {n} AS e
      FROM isl2 GROUP BY doc, isl
    ),
    ivs AS (
      SELECT doc, list(struct_pack(s := s, e := e) ORDER BY s) AS ivl
      FROM iv GROUP BY doc
    ),
    segrows AS (
      SELECT doc, i, segs[i] AS seg
      FROM docs, UNNEST(range(1, len(segs) + 1)) AS t(i)
    ),
    segcum AS (
      SELECT doc, i, seg, regexp_matches(seg, '^\\w') AS isw,
             sum(CASE WHEN regexp_matches(seg, '^\\w') THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS cw
      FROM segrows
    ),
    -- 1-based: a word's token index is cw; a separator's preceding-word
    -- index is cw (0 before the first word). Cut words with cw in [s,e),
    -- separators strictly between cut words (cw in [s, e-2]).
    flag AS (
      SELECT c.doc, c.i, c.seg,
             len(list_filter(coalesce(v.ivl, []), iv ->
               CASE WHEN c.isw THEN c.cw >= iv.s AND c.cw < iv.e
                    ELSE c.cw >= iv.s AND c.cw < iv.e - 1 END)) > 0 AS cut
      FROM segcum c LEFT JOIN ivs v USING (doc)
    ),
    rebuilt AS (
      SELECT doc,
             coalesce(string_agg(seg, '' ORDER BY i)
                        FILTER (WHERE NOT cut), '') AS kept
      FROM flag GROUP BY doc
    )
    SELECT d.doc,
           CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(list_sum(list_transform(v.ivl, iv -> iv.e - iv.s)),
                         0) AS BIGINT) AS n_removed,
           coalesce(r.kept, d.text) AS text
    FROM docs d
      LEFT JOIN ivs v USING (doc)
      LEFT JOIN rebuilt r USING (doc)
    ORDER BY d.doc
    """


@_register(
    "exact_substr_rewrite", _exact_substr_rewrite_oracle(n=8, min_docs=2)
)
def exact_substr_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal over the ORIGINAL text (the reference tool's
    byte-range-cut semantics, Lee et al. 2022): duplicated 8-gram token
    spans are cut out of the original string — word segments plus the
    separators strictly between them — so casing/punctuation outside cut
    spans survive byte-for-byte (``exact_substr_dedup`` returns the
    normalized-token join instead; ADVICE round 10). The oracle replays
    segmentation, island merge, the segment cut rule, and string
    reassembly; one mis-kept separator or lost capital breaks the hash."""
    from ..operators.dedup import exact_substr_rewrite

    docs = fan_out(_t(spark, sf_dir, "documents"))
    # staged_sort measured a wash here (interleaved A/B 0.96): the body's
    # own 8-gram explode re-aggregates cheaply on the sampling pass
    return exact_substr_rewrite(
        docs, "doc_id", "text", n=8, min_docs=2
    ).orderBy("doc")


def _line_dedup_oracle() -> str:
    h = hash60_sql("nrm")
    return f"""
    WITH docs AS (
      SELECT doc_id AS doc,
             concat_ws(chr(10),
               'Doc ' || CAST(doc_id AS VARCHAR),
               text,
               CASE WHEN doc_id % 3 = 0
                    THEN 'Subscribe to our Newsletter!' END,
               CASE WHEN doc_id % 4 = 1
                    THEN '(c) 2024 All Rights Reserved. Page 1 of 10' END,
               lang) AS t
      FROM documents
    ),
    lns AS (
      SELECT doc, i - 1 AS pos, ls[i] AS line
      FROM (SELECT doc, string_split(t, chr(10)) AS ls FROM docs),
           UNNEST(range(1, len(ls) + 1)) AS u(i)
    ),
    nrm AS (
      SELECT doc, pos, line,
             regexp_replace(regexp_replace(lower(trim(line)),
               '\\d+', '0', 'g'), '\\s+', ' ', 'g') AS nrm
      FROM lns
    ),
    hashed AS (
      SELECT doc, pos, line, nrm,
             CASE WHEN nrm = '' THEN NULL ELSE {h} END AS hh
      FROM nrm
    ),
    firsts AS (
      SELECT hh, min(struct_pack(doc := doc, pos := pos)) AS fkey
      FROM hashed WHERE hh IS NOT NULL GROUP BY hh
    ),
    flags AS (
      SELECT n.doc, n.pos, n.line,
             CASE WHEN n.hh IS NULL THEN TRUE
                  ELSE n.doc = f.fkey.doc AND n.pos = f.fkey.pos END AS keep
      FROM hashed n LEFT JOIN firsts f ON n.hh = f.hh
    )
    SELECT doc,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS text
    FROM flags GROUP BY doc ORDER BY doc
    """


@_register("ccnet_line_dedup", _line_dedup_oracle())
def ccnet_line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus line dedup (Wenzek et al. 2020 §3.1 —
    the pipeline half whose LM-perplexity filter is the `ccnet_lm_filter`
    gate row below / :func:`..operators.curation.ccnet_lm_filter`):
    only the corpus-FIRST occurrence (min doc, pos — deterministic, not
    shard order) of each normalized line survives. The fixture plants
    real boilerplate shapes — a newsletter line on every third doc, a
    digit-bearing copyright line on every fourth (digit runs normalize
    to '0', so '2024' and 'Page 1 of 10' dedup across numbering), and
    the lang field as a low-cardinality shared line — among unique
    per-doc lines. The oracle replays normalization, hashing,
    first-occurrence selection, and line reassembly."""
    from ..operators.dedup import line_dedup

    docs = fan_out(_t(spark, sf_dir, "documents"))
    ftxt = F.concat_ws(
        "\n",
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")),
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("Subscribe to our Newsletter!")
        ),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.lit("(c) 2024 All Rights Reserved. Page 1 of 10"),
        ),
        F.col("lang"),
    )
    inp = docs.select("doc_id", ftxt.alias("ftxt"))
    return line_dedup(inp, "doc_id", "ftxt").orderBy("doc")


def _ccnet_lm_oracle(k: float = 0.5, train_pct: int = 80) -> str:
    split = hash60_sql("CAST(doc_id AS VARCHAR) || ':split'") + " % 100"
    return rf"""
    WITH docs AS (
      SELECT doc_id AS doc, lang,
             concat_ws(chr(10), text,
               CASE WHEN doc_id % 5 = 0
                    THEN 'the the the of of and the end' END,
               CASE WHEN doc_id % 7 = 2
                    THEN 'zq kjw xvv qqp zzkrp wq' END) AS t,
             ({split}) < {train_pct} AS is_train
      FROM documents
    ), para AS (
      SELECT doc, lang, is_train, ls[i] AS para
      FROM (SELECT doc, lang, is_train,
                   string_split(t, chr(10)) AS ls FROM docs),
           UNNEST(range(1, len(ls) + 1)) AS u(i)
    ), ptoks AS (
      SELECT doc, lang, is_train, para,
             list_filter(regexp_split_to_array(lower(para), '\W+'),
                         x -> x <> '') AS toks
      FROM para
    ), bg0 AS (
      SELECT doc, lang, is_train,
             unnest(list_transform(range(1, len(toks)),
               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
      FROM ptoks
    ), bg AS (
      SELECT doc, lang, is_train, (p).w1 AS w1, (p).w2 AS w2 FROM bg0
    ), c2 AS (
      SELECT lang, w1, w2, count(*) AS c2 FROM bg
      WHERE is_train GROUP BY 1, 2, 3
    ), c1 AS (
      SELECT lang, w1, sum(c2) AS c1 FROM c2 GROUP BY 1, 2
    ), v AS (
      SELECT lang, count(DISTINCT w2) AS vocab FROM c2 GROUP BY 1
    ), scored AS (
      SELECT t.doc,
             -ln((coalesce(p.c2, 0) + {k}) /
                 (coalesce(u.c1, 0) + {k} * v.vocab)) AS nll
      FROM bg t
        LEFT JOIN c2 p ON p.lang = t.lang AND p.w1 = t.w1 AND p.w2 = t.w2
        LEFT JOIN c1 u ON u.lang = t.lang AND u.w1 = t.w1
        JOIN v ON v.lang = t.lang
    ), ds AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams, sum(nll) AS s
      FROM scored GROUP BY doc
    ), np AS (
      SELECT doc,
             CAST(count(*) FILTER (WHERE trim(para) <> '') AS BIGINT)
               AS n_paragraphs
      FROM para GROUP BY doc
    ), outq AS (
      SELECT d.doc, d.lang,
             coalesce(np.n_paragraphs, 0) AS n_paragraphs,
             coalesce(ds.n_bigrams, 0) AS n_bigrams,
             round(ds.s / ds.n_bigrams, 6) AS log_ppl,
             round(exp(round(ds.s / ds.n_bigrams, 6)), 4) AS ppl
      FROM docs d LEFT JOIN np ON np.doc = d.doc LEFT JOIN ds ON ds.doc = d.doc
    ), bucketed AS (
      SELECT doc, lang, n_paragraphs, n_bigrams, log_ppl, ppl,
             CASE ntile(3) OVER (PARTITION BY lang ORDER BY log_ppl, doc)
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM outq WHERE log_ppl IS NOT NULL
      UNION ALL
      SELECT doc, lang, n_paragraphs, n_bigrams, log_ppl, ppl, 'tail'
      FROM outq WHERE log_ppl IS NULL
    )
    SELECT doc, lang, n_paragraphs, n_bigrams, log_ppl, ppl, bucket,
           bucket <> 'tail' AS keep
    FROM bucketed ORDER BY doc
    """


@_register("ccnet_lm_filter", _ccnet_lm_oracle())
def ccnet_lm_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's LM-perplexity filter (Wenzek et al. 2020 §4.3) — the
    pipeline half `ccnet_line_dedup` feeds: per-LANGUAGE add-k bigram
    LM fit on the deterministic train split, every doc scored paragraph
    by paragraph (bigrams never cross the newline), then equal
    head/middle/tail thirds per language by mean NLL (ntile over one
    skinny row per doc). The fixture plants a stopword-soup paragraph
    on every 5th doc (pulls log_ppl DOWN — frequent bigrams) and a
    gibberish paragraph on every 7th (pushes it UP — unseen bigrams
    back off to k/(0+k·vocab)), so buckets move on planted evidence.
    The oracle replays split, tokenization, both count tables, the
    smoothing arithmetic, and the ntile bucketing term-for-term."""
    from ..operators.curation import ccnet_lm_filter

    docs = fan_out(_t(spark, sf_dir, "documents"))
    ftxt = F.concat_ws(
        "\n",
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("the the the of of and the end")
        ),
        F.when(F.col("doc_id") % 7 == 2, F.lit("zq kjw xvv qqp zzkrp wq")),
    )
    inp = docs.select("doc_id", "lang", ftxt.alias("ftxt"))
    return staged_sort(ccnet_lm_filter(
        inp, id_col="doc_id", text_col="ftxt", lang_col="lang"
    ), "doc")


def _ccnet_pipeline_oracle(k: float = 0.5, train_pct: int = 80) -> str:
    """Composed replay of the FULL CCNet pipeline: the line-dedup CTE
    chain (normalization → hash → corpus-first struct-min winner → line
    reassembly) feeding the per-language bigram-LM perplexity chain —
    the LM trains and scores on the DEDUPED text, so one wrong kept
    line anywhere in the corpus shifts count tables, scores, and
    bucket boundaries everywhere."""
    h = hash60_sql("nrm")
    split = hash60_sql("CAST(doc_id AS VARCHAR) || ':split'") + " % 100"
    return rf"""
    WITH rawdocs AS (
      SELECT doc_id AS doc, lang,
             concat_ws(chr(10),
               'Doc ' || CAST(doc_id AS VARCHAR),
               text,
               CASE WHEN doc_id % 3 = 0
                    THEN 'Subscribe to our Newsletter!' END,
               CASE WHEN doc_id % 4 = 1
                    THEN '(c) 2024 All Rights Reserved. Page 1 of 10' END,
               CASE WHEN doc_id % 7 = 2
                    THEN 'zq kjw xvv qqp zzkrp wq' END,
               lang) AS t
      FROM documents
    ),
    lns AS (
      SELECT doc, i - 1 AS pos, ls[i] AS line
      FROM (SELECT doc, string_split(t, chr(10)) AS ls FROM rawdocs),
           UNNEST(range(1, len(ls) + 1)) AS u(i)
    ),
    nrm AS (
      SELECT doc, pos, line,
             regexp_replace(regexp_replace(lower(trim(line)),
               '\d+', '0', 'g'), '\s+', ' ', 'g') AS nrm
      FROM lns
    ),
    hashed AS (
      SELECT doc, pos, line, nrm,
             CASE WHEN nrm = '' THEN NULL ELSE {h} END AS hh
      FROM nrm
    ),
    firsts AS (
      SELECT hh, min(struct_pack(doc := doc, pos := pos)) AS fkey
      FROM hashed WHERE hh IS NOT NULL GROUP BY hh
    ),
    flags AS (
      SELECT n.doc, n.pos, n.line,
             CASE WHEN n.hh IS NULL THEN TRUE
                  ELSE n.doc = f.fkey.doc AND n.pos = f.fkey.pos END AS keep
      FROM hashed n LEFT JOIN firsts f ON n.hh = f.hh
    ),
    dd AS (
      SELECT doc,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS text
      FROM flags GROUP BY doc
    ),
    docs AS (
      SELECT dd.doc AS doc_id, r.lang, dd.text, dd.n_lines, dd.n_kept,
             ({split}) < {train_pct} AS is_train
      FROM dd JOIN rawdocs r ON r.doc = dd.doc
    ), para AS (
      SELECT doc_id, lang, is_train, ls[i] AS para
      FROM (SELECT doc_id, lang, is_train,
                   string_split(text, chr(10)) AS ls FROM docs),
           UNNEST(range(1, len(ls) + 1)) AS u(i)
    ), ptoks AS (
      SELECT doc_id, lang, is_train, para,
             list_filter(regexp_split_to_array(lower(para), '\W+'),
                         x -> x <> '') AS toks
      FROM para
    ), bg0 AS (
      SELECT doc_id, lang, is_train,
             unnest(list_transform(range(1, len(toks)),
               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
      FROM ptoks
    ), bg AS (
      SELECT doc_id, lang, is_train, (p).w1 AS w1, (p).w2 AS w2 FROM bg0
    ), c2 AS (
      SELECT lang, w1, w2, count(*) AS c2 FROM bg
      WHERE is_train GROUP BY 1, 2, 3
    ), c1 AS (
      SELECT lang, w1, sum(c2) AS c1 FROM c2 GROUP BY 1, 2
    ), v AS (
      SELECT lang, count(DISTINCT w2) AS vocab FROM c2 GROUP BY 1
    ), scored AS (
      SELECT t.doc_id,
             -ln((coalesce(p.c2, 0) + {k}) /
                 (coalesce(u.c1, 0) + {k} * v.vocab)) AS nll
      FROM bg t
        LEFT JOIN c2 p ON p.lang = t.lang AND p.w1 = t.w1 AND p.w2 = t.w2
        LEFT JOIN c1 u ON u.lang = t.lang AND u.w1 = t.w1
        JOIN v ON v.lang = t.lang
    ), ds AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, sum(nll) AS s
      FROM scored GROUP BY doc_id
    ), np AS (
      SELECT doc_id,
             CAST(count(*) FILTER (WHERE trim(para) <> '') AS BIGINT)
               AS n_paragraphs
      FROM para GROUP BY doc_id
    ), outq AS (
      SELECT d.doc_id, d.lang, d.n_lines, d.n_kept,
             coalesce(np.n_paragraphs, 0) AS n_paragraphs,
             coalesce(ds.n_bigrams, 0) AS n_bigrams,
             round(ds.s / ds.n_bigrams, 6) AS log_ppl,
             round(exp(round(ds.s / ds.n_bigrams, 6)), 4) AS ppl
      FROM docs d LEFT JOIN np ON np.doc_id = d.doc_id
                  LEFT JOIN ds ON ds.doc_id = d.doc_id
    ), bucketed AS (
      SELECT doc_id, lang, n_lines, n_kept, n_paragraphs, n_bigrams,
             log_ppl, ppl,
             CASE ntile(3) OVER (PARTITION BY lang ORDER BY log_ppl, doc_id)
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM outq WHERE log_ppl IS NOT NULL
      UNION ALL
      SELECT doc_id, lang, n_lines, n_kept, n_paragraphs, n_bigrams,
             log_ppl, ppl, 'tail'
      FROM outq WHERE log_ppl IS NULL
    )
    SELECT doc_id AS doc, lang, n_lines, n_kept, n_paragraphs, n_bigrams,
           log_ppl, ppl, bucket, bucket <> 'tail' AS keep
    FROM bucketed ORDER BY doc
    """


@_register("ccnet_pipeline", _ccnet_pipeline_oracle())
def ccnet_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL CCNet pipeline under one hash (Wenzek et al. 2020):
    cross-corpus line dedup FIRST (boilerplate collapses to its corpus-
    first occurrence), then the per-language bigram-LM perplexity filter
    trains AND scores on the DEDUPED text. Composition is the test: the
    newsletter/copyright boilerplate survives only in one document, so
    every other document's paragraph set — and through the shared count
    tables, every document's score and the per-language ntile boundaries
    — depends on the dedup stage being exactly right. Output carries
    both stages' evidence (n_lines/n_kept + LM fields)."""
    from ..operators.curation import ccnet_lm_filter
    from ..operators.dedup import line_dedup
    from ..session import truncate_lineage

    docs = fan_out(_t(spark, sf_dir, "documents"))
    ftxt = F.concat_ws(
        "\n",
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")),
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("Subscribe to our Newsletter!")
        ),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.lit("(c) 2024 All Rights Reserved. Page 1 of 10"),
        ),
        F.when(F.col("doc_id") % 7 == 2, F.lit("zq kjw xvv qqp zzkrp wq")),
        F.col("lang"),
    )
    # Stage the dedup output ONCE: the LM filter derives paragraph, bigram,
    # count-table and doc-score branches from its input, and the final
    # projection joins the dedup evidence back — without a seam the whole
    # line_dedup DAG is re-embedded per branch (measured: 94 scans / 256
    # exchanges in the body plan; 50 / 100 with the seam; solo noop
    # median 7.0 -> 4.9 s at sf0.1 — guide §3.3, truncate giant plans;
    # §5, localCheckpoint to cut lineage).
    dd = truncate_lineage(line_dedup(
        docs.select("doc_id", ftxt.alias("ftxt")), "doc_id", "ftxt"
    ))
    inp = dd.join(
        docs.select(F.col("doc_id").alias("doc"), "lang"), "doc"
    )
    out = ccnet_lm_filter(inp, id_col="doc", text_col="text",
                          lang_col="lang")
    return staged_sort(
        out.join(dd.select("doc", "n_lines", "n_kept"), "doc")
        .select("doc", "lang", "n_lines", "n_kept", "n_paragraphs",
                "n_bigrams", "log_ppl", "ppl", "bucket", "keep"),
        "doc",
    )


_C4_ORACLE = """
WITH base AS (
  SELECT doc_id AS doc, text, string_split(text, chr(10)) AS lines
  FROM documents
),
k AS (
  SELECT doc, text, lines,
         list_filter(lines, l ->
           len(list_filter(string_split_regex(trim(l), '\\s+'),
                           w -> w <> '')) >= 30
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base
)
SELECT doc,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
       (NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(lower(text), '{')
        AND len(kept) >= 1) AS keep_doc
FROM k ORDER BY doc
"""


@_register("c4_line_filter", _C4_ORACLE)
def c4_line_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): per-line
    word-count/marker rules rewrite the document, doc-level markers and a
    kept-line floor decide keep_doc. The corpus is single-line, so the
    gate exercises the doc-level split (terminal-punct rule off,
    30-word floor); the line-granular semantics are refereed by
    tests/test_c4_filter.py on multi-line fixtures. Pure narrow map —
    zero shuffles, full codegen."""
    from ..operators.curation import c4_line_filter

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return c4_line_filter(
        docs,
        "doc_id",
        "text",
        min_words_per_line=30,
        require_terminal_punct=False,
        min_kept_lines=1,
    ).orderBy("doc")


def _contamination_oracle(n: int = 8, mod: int = 97, threshold: float = 0.05) -> str:
    sh = _SHINGLE_SQL.format(n=n)
    return f"""
    WITH sh0 AS (
      SELECT DISTINCT doc, {hash60_sql('shingle')} AS h FROM ({sh})
    ),
    ev AS (SELECT DISTINCT h FROM sh0 WHERE doc % {mod} = 0),
    tr AS (SELECT * FROM sh0 WHERE doc % {mod} <> 0)
    SELECT doc, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(ev.h) AS BIGINT) AS n_overlap,
           round(count(ev.h) / count(*), 6) AS overlap_fraction,
           count(ev.h) / count(*) >= {threshold!r} AS contaminated
    FROM tr LEFT JOIN ev USING (h)
    GROUP BY doc ORDER BY doc
    """


@_register("eval_contamination", _contamination_oracle(n=8, mod=10, threshold=0.05))
def eval_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark-contamination scoring: per TRAIN document,
    the fraction of its distinct token 8-gram shingles that also occur
    anywhere in the EVAL split (docs with doc_id % 10 == 0 stand in for
    a held-out benchmark), plus a ≥5% contamination flag. Complements
    bloom_decontamination (exact-key membership) with the published
    n-gram-overlap protocol. Scale shape: the eval shingle set is
    benchmark-sized (MBs against a 100 TB corpus), so it BROADCASTS —
    the train side is scanned once, map-side joined, and aggregated on
    the doc key; no shuffle of the corpus on the shingle key at all."""
    from ..operators.dedup import shingles

    docs = fan_out(_t(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % 10 == 0
    ev_sh = (
        shingles(docs.filter(is_eval), "doc_id", "text", n=8)
        .select("shingle_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr_sh = shingles(docs.filter(~is_eval), "doc_id", "text", n=8)
    return (
        tr_sh.join(F.broadcast(ev_sh), "shingle_hash", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
        .select(
            "doc",
            "n_shingles",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "overlap_fraction"
            ),
            (F.col("n_overlap") / F.col("n_shingles") >= 0.05).alias(
                "contaminated"
            ),
        )
        .orderBy("doc")
    )


@_register("ngram_jaccard_dups", _jaccard_oracle(n=2, threshold=0.12, max_df=64))
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-2-gram Jaccard ≥ 0.12 over shingles with
    document frequency ≤ 64 (stop-shingle cap keeps the inverted-index
    self-join from exploding quadratically on hot shingles)."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.12, max_df=64
    ).orderBy("doc_a", "doc_b")


def _minhash_oracle(num_perm: int = 16, n: int = 3) -> str:
    sh = _SHINGLE_SQL.format(n=n)
    mins = ",\n           ".join(
        f"min(({_perm_coeff(i, 'a')} * (shingle_hash % {MINHASH_PRIME}) + {_perm_coeff(i, 'b')}) % {MINHASH_PRIME}) AS mh_{i}"
        for i in range(num_perm)
    )
    sig = ", ".join(f"mh_{i}" for i in range(num_perm))
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc, {hash60_sql('shingle')} AS shingle_hash FROM ({sh})
    )
    SELECT doc, concat_ws(',', {sig}) AS signature
    FROM (SELECT doc, {mins} FROM sh GROUP BY doc)
    ORDER BY doc
    """


@_register("minhash_signatures", _minhash_oracle())
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 affine permutations mod 2^31-1 over md5
    shingle hashes) — deterministic, so the SQL oracle reproduces it bit
    for bit. The scan fans out first: a single small parquet file reads
    as one task, and the shingle construction is the CPU-heavy part."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    sh = shingles(docs, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, num_perm=16)
    return staged_sort(
        sig.select(
        "doc", F.concat_ws(",", *[F.col("signature")[i] for i in range(16)]).alias("signature")
    ),
        "doc",
    )


def _lsh_oracle(num_perm: int = 16, bands: int = 4, n: int = 3) -> str:
    sh = _SHINGLE_SQL.format(n=n)
    mins = ",\n           ".join(
        f"min(({_perm_coeff(i, 'a')} * (shingle_hash % {MINHASH_PRIME}) + {_perm_coeff(i, 'b')}) % {MINHASH_PRIME}) AS mh_{i}"
        for i in range(num_perm)
    )
    rows = num_perm // bands
    band_rows = ", ".join(
        "({b}, concat_ws(',', {cols}))".format(
            b=b, cols=", ".join(f"mh_{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc, {hash60_sql('shingle')} AS shingle_hash FROM ({sh})
    ), sig AS (
      SELECT doc, {mins} FROM sh GROUP BY doc
    ), banded AS (
      SELECT doc, b.band, b.bucket
      FROM sig, (VALUES {band_rows}) AS b(band, bucket)
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    ORDER BY doc_a, doc_b
    """


@_register("lsh_candidate_pairs", _lsh_oracle())
def lsh_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding (16 perms, 4 bands × 4 rows): candidate pairs
    share at least one band bucket."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    sh = shingles(docs, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, num_perm=16)
    return staged_sort(
        lsh_candidate_pairs(sig, num_perm=16, bands=4),
        "doc_a",
        "doc_b",
    )


def _dedup_recall_oracle(threshold: float = 0.5) -> str:
    truth = _jaccard_oracle(n=3, threshold=threshold, max_df=64)
    cand = _lsh_oracle()
    return f"""
    WITH truth AS (SELECT doc_a, doc_b FROM ({truth})),
    cand AS (SELECT doc_a, doc_b FROM ({cand})),
    hit AS (SELECT doc_a, doc_b FROM truth INTERSECT SELECT doc_a, doc_b FROM cand)
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM cand) AS BIGINT)  AS n_candidates,
           CAST((SELECT count(*) FROM hit) AS BIGINT)   AS n_hit,
           round((SELECT count(*) FROM hit)
                 / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6) AS recall,
           round((SELECT count(*) FROM hit)
                 / CAST((SELECT count(*) FROM cand) AS DOUBLE), 6)  AS precision
    """


@_register("dedup_recall_eval", _dedup_recall_oracle())
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation — ann_recall_eval's sibling for the text
    side: MinHash-LSH candidate pairs (16 perms, 4×4 bands) graded
    against exact 3-gram Jaccard ≥ 0.5 ground truth (stop-shingle
    max_df=64 cap on the exact index, stated in the metric's contract).
    Output is one row: truth/candidate/hit counts, recall, and candidate
    precision — the number a pipeline owner tunes bands/rows against.
    Scale shape: both sides are the already-bounded pair generators; the
    grading join is pair-keyed (tiny) and the aggregate is one row."""
    from ..operators.dedup import minhash_signatures as mh_sigs
    from ..session import truncate_lineage

    docs = fan_out(_t(spark, sf_dir, "documents"))
    # ONE shingle derivation for both sides (r13, guide §2.4): the truth
    # pipeline's inverted-index self-join and the MinHash pipeline both
    # start from the same shingles(docs, n=3) frame; seaming it once
    # replaces the per-consumer explode+distinct re-derivation
    # (interleaved A/B at sf0.1: 3.08 -> 2.11 s, 0.69; outputs equal).
    sh = truncate_lineage(shingles(docs, "doc_id", "text", n=3))
    truth = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=64,
        shingle_df=sh,
    ).select("doc_a", "doc_b")
    cand = lsh_candidate_pairs(
        mh_sigs(sh, num_perm=16), num_perm=16, bands=4
    ).select("doc_a", "doc_b")
    # ONE action for all three counts: tag each side, union, and count
    # per-pair membership. The previous truth.count() / cand.count() /
    # truth.intersect(cand).count() ran THREE actions, recomputing the
    # shingle + MinHash pipelines roughly twice each (guide §1.2: fix
    # the algorithm's pass count first). n_hit counts DISTINCT pairs on
    # both sides — exactly intersect()'s set semantics.
    tagged = truth.withColumn("_t", F.lit(1)).withColumn(
        "_c", F.lit(0)
    ).unionByName(
        cand.withColumn("_t", F.lit(0)).withColumn("_c", F.lit(1))
    )
    per_pair = tagged.groupBy("doc_a", "doc_b").agg(
        F.sum("_t").alias("nt"), F.sum("_c").alias("nc")
    )
    tot = per_pair.agg(
        F.sum("nt").alias("n_truth"),
        F.sum("nc").alias("n_cand"),
        F.sum(
            ((F.col("nt") > 0) & (F.col("nc") > 0)).cast("long")
        ).alias("n_hit"),
    ).collect()[0]
    n_truth = int(tot.n_truth or 0)
    n_cand = int(tot.n_cand or 0)
    n_hit = int(tot.n_hit or 0)
    row = [(
        n_truth, n_cand, n_hit,
        round(n_hit / n_truth, 6) if n_truth else None,
        round(n_hit / n_cand, 6) if n_cand else None,
    )]
    return spark.createDataFrame(
        row,
        "n_truth bigint, n_candidates bigint, n_hit bigint,"
        " recall double, precision double",
    )


def _simhash_oracle(bits: int = 32) -> str:
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id AS doc,
             list_transform(
               list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> ''),
               t -> {hash60_sql('t')}) AS th
      FROM documents
    )
    SELECT doc, CAST({votes} AS BIGINT) AS simhash FROM tok ORDER BY doc
    """


@_register("simhash_signatures", _simhash_oracle())
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charikar SimHash (32-bit majority-vote signature), shuffle-free."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    return simhash(docs, "doc_id", "text", bits=32).orderBy("doc")


def _simhash_pairs_oracle(bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sig_cte = _simhash_oracle(bits).replace("ORDER BY doc", "").strip()
    band_rows = ", ".join(
        f"({b}, (simhash >> {b * band_bits}) % {mask + 1})" for b in range(bands)
    )
    return f"""
    WITH sigs AS ({sig_cte}
    ), banded AS (
      SELECT doc, simhash, b.band, b.bucket
      FROM sigs, (VALUES {band_rows}) AS b(band, bucket)
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


@_register("simhash_near_dups", _simhash_pairs_oracle())
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band-bucket candidates + exact Hamming
    re-rank (bit_count(xor)), everything native."""
    from ..operators.dedup import simhash_near_dup_pairs

    docs = fan_out(_t(spark, sf_dir, "documents"))
    sigs = simhash(docs, "doc_id", "text", bits=32)
    return (
        simhash_near_dup_pairs(sigs, bits=32, bands=4, max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("doc_a", "doc_b")
    )


def _cc_labeled_ctes() -> str:
    """The recursive transitive-closure CTE chain ending in ``labeled``
    (doc_id, cluster_id) — shared by the cluster and canonical-selection
    oracles so the two can't drift apart."""
    base = _simhash_pairs_oracle()
    tail = "ORDER BY doc_a, doc_b"
    assert base.count(tail) == 1, "simhash pairs oracle drifted"
    pairs_sql = base.replace(tail, "").strip()
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({pairs_sql})
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (
      SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
    ), labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )"""


def _dedup_clusters_oracle() -> str:
    return f"""
    {_cc_labeled_ctes()}
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_docs,
           doc_id = cluster_id AS is_canonical
    FROM labeled ORDER BY doc_id
    """


@_register("dedup_clusters", _dedup_clusters_oracle())
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: SimHash near-dup pairs → alternating
    large-star/small-star connected components (O(log n) shuffle rounds)
    → per-document cluster id, size, and canonical flag. The oracle
    replays the grouping with a recursive transitive-closure CTE — fine
    at oracle scale, quadratic in component size at planet scale, which
    is exactly why the Spark side uses the star algorithm instead."""
    from ..operators.dedup import dedup_clusters, simhash_near_dup_pairs

    docs = fan_out(_t(spark, sf_dir, "documents"))
    sigs = simhash(docs, "doc_id", "text", bits=32)
    pairs = simhash_near_dup_pairs(sigs, bits=32, bands=4, max_hamming=3)
    return dedup_clusters(docs, pairs, id_col="doc_id").orderBy("doc_id")


def _dedup_canonical_oracle() -> str:
    return f"""
    {_cc_labeled_ctes()}
    , sized AS (
      SELECT doc_id, cluster_id,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_docs
      FROM labeled
    ), scored AS (
      SELECT s.doc_id, s.cluster_id, s.n_docs, d.n_chars AS score,
             row_number() OVER (PARTITION BY s.cluster_id
                                ORDER BY d.n_chars DESC, s.doc_id ASC) AS rnk,
             first_value(s.doc_id) OVER (PARTITION BY s.cluster_id
                                ORDER BY d.n_chars DESC, s.doc_id ASC) AS best_doc
      FROM sized s JOIN documents d USING (doc_id)
    )
    SELECT doc_id, cluster_id, n_docs, score, rnk = 1 AS keep, best_doc
    FROM scored ORDER BY doc_id
    """


@_register("dedup_canonical", _dedup_canonical_oracle())
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best canonical selection over near-dup clusters: SimHash
    banding → connected components → per-cluster argmax(n_chars) exemplar
    (ties to the smallest id). The curation behavior real pipelines ship —
    retain the longest/best duplicate, not the min-id one. Spark side is
    one join + one window over ``cluster_id``; only the small cluster
    frame moves, never the texts. Reads the staged cluster table
    (:func:`_dedup_cluster_table`) — the trainer is ``dedup_clusters``."""
    from ..operators.dedup import keep_best

    docs = fan_out(_t(spark, sf_dir, "documents"))
    clusters = _dedup_cluster_table(spark, sf_dir)
    return keep_best(clusters, docs, id_col="doc_id", score_col="n_chars").orderBy(
        "doc_id"
    )


# ===========================================================================
# text analysis
# ===========================================================================


@_register(
    "text_quality",
    """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks,
             length(text) AS n_chars_total,
             length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_nonpunct
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_tokens,
             (n_chars_total - n_nonpunct) / greatest(n_chars_total, 1) AS punct_ratio,
             len(list_filter(toks, x -> list_contains(
                ['the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','with','for','on'], x)))
               / greatest(len(toks), 1) AS stop_ratio,
             list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1) AS mtl
      FROM t
    )
    SELECT doc_id, n_tokens,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6)  AS stopword_ratio,
           round(mtl, 6)         AS mean_token_len,
           round(
             least(n_tokens / 64.0, 1.0) * 0.4
             + least(stop_ratio * 4.0, 1.0) * 0.2
             + greatest(1.0 - punct_ratio * 4.0, 0.0) * 0.2
               * (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END)
             + (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
    FROM m ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, punctuation ratio, stopword ratio,
    mean token length, composite score — all codegen expressions."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count_expr(t).alias("n_tokens"),
        F.round(punct_ratio_expr(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio_expr(t), 6).alias("stopword_ratio"),
        F.round(mean_token_len_expr(t), 6).alias("mean_token_len"),
        quality_score_expr(t).alias("quality"),
    ).orderBy("doc_id")


# the BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
# marks — the piece boundaries every byte-pair encoder starts from. Plain
# POSIX classes so Java regex (Spark) and RE2 (DuckDB) agree exactly.
_BPE_PIECE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@_register(
    "token_counts",
    f"""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
             AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_PIECE_RE}')) AS n_bpe_pieces,
           round(strlen(text)
                 / greatest(len(regexp_extract_all(text, '{_BPE_PIECE_RE}')), 1), 6)
             AS bytes_per_piece
    FROM documents ORDER BY doc_id
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens and
    BPE-ish pre-tokenizer pieces per document, plus bytes-per-piece (the
    compression-ratio proxy used to spot boilerplate/binary junk). All
    codegen regexp expressions, no UDFs."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    t = F.col("text")
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    pieces = F.size(F.regexp_extract_all(t, F.lit(_BPE_PIECE_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.cast("bigint").alias("n_ws_tokens"),
        pieces.cast("bigint").alias("n_bpe_pieces"),
        F.round(
            F.octet_length(t) / F.greatest(pieces, F.lit(1)), 6
        ).alias("bytes_per_piece"),
    ).orderBy("doc_id")


@_register(
    "lang_id",
    """
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, lang, greatest(len(toks), 1) AS n,
        len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) / greatest(len(toks), 1) AS s_en,
        len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) / greatest(len(toks), 1) AS s_de,
        len(list_filter(toks, x -> list_contains(['le','la','les','et','est','une','des','que','pas','pour'], x))) / greatest(len(toks), 1) AS s_fr,
        len(list_filter(toks, x -> list_contains(['el','la','los','las','es','una','que','por','con','para'], x))) / greatest(len(toks), 1) AS s_es
      FROM t
    ), g AS (
      SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
             greatest(s_en, s_de, s_fr, s_es) AS best
      FROM s
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN best < 0.05 THEN 'und'
                WHEN s_fr = best THEN 'fr'
                WHEN s_es = best THEN 'es'
                WHEN s_en = best THEN 'en'
                ELSE 'de' END AS guessed_lang
    FROM g ORDER BY doc_id
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword ratios per language; ties
    break toward the lexicographically-largest language code (array_max on
    (score, lang) structs — mirrored in the oracle's CASE order)."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_guess_expr(F.col("text")).alias("guessed_lang"),
    ).orderBy("doc_id")


@_register(
    "doc_fingerprints",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, t -> {hash60_sql('t')} % {FP_MOD})),
             (a, b) -> (a * 31 + b) % {FP_MOD}) AS fingerprint
    FROM t ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint over token hashes."""
    docs = fan_out(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


# ===========================================================================
# similarity search
# ===========================================================================


_ANN_COSINE_ORACLE = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
    ), sims AS (
      SELECT q.query_id, e.vec_id,
             round(
               list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
          FROM sims)
    WHERE rank <= 5 ORDER BY query_id, rank
    """


@_register("ann_cosine_topk", _ANN_COSINE_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 5 query vectors (broadcast query
    side; JVM-side dot products via aggregate/zip_with)."""
    emb = fan_out(_t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


def _ann_lsh_oracle(dim: int = 64, nbits: int = 8, k: int = 5) -> str:
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, nbits)
    # signature: explicit left-assoc dot sums so the fp evaluation order
    # matches Spark's aggregate fold exactly
    bit_terms = []
    for b, plane in enumerate(planes):
        dot = " + ".join(
            f"(embedding[{d + 1}]::DOUBLE * {plane[d]!r})" for d in range(dim)
        )
        bit_terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << b} ELSE 0 END)")
    sig = " + ".join(bit_terms)
    return f"""
    WITH sigs AS (
      SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS sig FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, sig AS qsig
      FROM sigs WHERE vec_id < 5
    ), cand AS (
      SELECT q.query_id, s.vec_id,
             round(
               list_dot_product(s.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
      FROM sigs s JOIN q ON s.sig = q.qsig AND s.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
          FROM cand)
    WHERE rank <= {k} ORDER BY query_id, rank
    """


@_register("ann_lsh_topk", _ann_lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: random-hyperplane LSH bucketing + exact re-rank
    within bucket (the scale path; recall traded for a bucket equi-join).
    The 8×64 hyperplane weights are deterministic md5-derived literals, so
    the oracle reproduces the signatures bit-for-bit."""
    emb = fan_out(_t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_bucket_topk(emb, queries, dim=64, k=5, nbits=8)
    return staged_sort(
        out.select(
        "query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank")
    ),
        "query_id",
        "rank",
    )



__all__ = [n for n in dict(globals()) if not n.startswith("__")]
