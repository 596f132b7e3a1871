"""Similarity search over embedding columns (array<float>).

Two paths, as a large-scale pipeline needs both:

- :func:`cosine_topk` — exact brute-force top-k, the correctness baseline.
  The dot product/norms are native ``aggregate``/``zip_with`` expressions
  (JVM, codegen); the query side is broadcast, so the big side streams
  without a shuffle; top-k is a per-query window.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane (sign) LSH.
  Each vector gets a ``nbits``-bit signature; candidates come from an
  equi-join on (or near) the signature, then exact re-ranking. Hyperplane
  weights derive deterministically from md5 so results are reproducible.

At 100 TB the brute-force path is O(N·Q); the LSH path turns it into an
equi-join on signature buckets — the shuffle is by bucket key and AQE
handles skewed buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set against the vector
    table, rank per query. Ties broken by vec_id for determinism; cosine
    rounded to 6 dp so cross-engine comparisons hash stably."""
    joined = vectors.join(F.broadcast(queries), vectors[id_col] != queries[query_id_col])
    sim = F.round(
        cosine_expr(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>")),
        6,
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        joined.select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, nbits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (b, d) is a
    uniform value in [-1, 1) derived from md5(b:d)."""
    planes = []
    for b in range(nbits):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"hyperplane:{b}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / float(1 << 31) - 1.0)
        planes.append(row)
    return planes


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """nbits-bit sign signature as BIGINT (bit b set iff vec · plane_b > 0)."""
    sig = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, wgt: x.cast("double") * wgt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
    return sig


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH signature bucket with the
    query, then exact cosine re-ranking within the bucket."""
    planes = _hyperplanes(dim, nbits)
    v = vectors.withColumn("_sig", signature_expr(F.col(vec_col), planes))
    q = queries.withColumn("_qsig", signature_expr(F.col(query_vec_col), planes))
    joined = v.join(
        F.broadcast(q),
        (F.col("_sig") == F.col("_qsig")) & (v[id_col] != q[query_id_col]),
    )
    sim = F.round(
        cosine_expr(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>")),
        6,
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        joined.select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
