"""Iterative graph computation as DataFrame loops: PageRank.

Companion to the large-star/small-star connected components in
``operators/dedup.py`` — same execution discipline for any iterative
graph algorithm on Spark:

- the per-round plan is one equi-join (ranks ⨝ edges on src) plus one
  map-side-combinable aggregation (sum by dst), both hash-keyed on node
  ids, so AQE reuses/co-plans the exchanges;
- rounds are a *driver-side* loop over DataFrames with per-round lineage
  truncation — plan depth stays O(1) per round instead of O(rounds);
- nothing data-sized ever reaches the driver.

Formula (Page et al. 1999, public): ``r' = (1-d)/N + d · Σ_in r/outdeg``.
On a symmetrized edge set every node has out-degree ≥ 1, so no dangling
mass term is needed; the docstring of :func:`pagerank` states this
precondition rather than hiding a silent redistribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import truncate_lineage

__all__ = ["pagerank", "symmetrize"]


def symmetrize(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected pair list -> directed edge relation (both directions)."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    return fwd.unionByName(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )


def pagerank(
    edges: DataFrame, iterations: int = 2, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over a (src, dst) edge relation.

    Precondition: every node that appears must have out-degree ≥ 1
    (guaranteed after :func:`symmetrize`); otherwise the dangling mass
    simply leaves the system, as in the power-iteration textbook form.
    Returns (node, rank). Deterministic up to float addition order —
    round before comparing across engines.
    """
    # The edge relation is typically the output of an expensive derivation
    # (e.g. the shingle self-join). It is consumed 2 + 2·iterations times
    # below; without cutting its lineage every consumer re-runs the whole
    # upstream plan. Same fix as the CC rounds in dedup.py.
    edges = truncate_lineage(edges, eager=True)
    nodes = truncate_lineage(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct(),
        eager=True,
    )
    n = nodes.count()  # scalar, drives the teleport constant only
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = edges.join(outdeg, "src")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        inbound = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("inbound"))
        )
        ranks = truncate_lineage(
            nodes.join(inbound, nodes.node == inbound.dst, "left").select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("inbound", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
