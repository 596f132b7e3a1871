"""Referees for the KMV/theta sketch: exactness below k, the order-
statistic merge invariant (sketch(A ∪ B) == merge(sketch(A), sketch(B))
as SETS OF HASHES, not just estimates), and estimation accuracy against
known ground truth on planted overlaps."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.sketches import (
    kmv_estimate_expr,
    kmv_intersect_estimate_expr,
    kmv_merge_expr,
    kmv_sketch,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sketch(spark, ids, k):
    df = spark.createDataFrame([(str(i),) for i in ids], "uid string")
    return kmv_sketch(df, F.col("uid"), k=k).collect()[0]


def test_exact_below_k(spark):
    row = _sketch(spark, range(50), k=256)
    assert row.n_keys == 50 and len(row.ks) == 50
    # referee: the hashes are exactly the sorted md5-60 values
    assert row.ks == sorted(_h60(str(i)) for i in range(50))
    df = spark.createDataFrame([(row.ks,)], "ks array<long>")
    (est,) = df.select(kmv_estimate_expr(F.col("ks"), 256).alias("e")).first()
    assert est == 50.0


def test_merge_invariant(spark):
    k = 64
    a = _sketch(spark, range(0, 400), k).ks
    b = _sketch(spark, range(200, 600), k).ks
    both = _sketch(spark, range(0, 600), k).ks
    df = spark.createDataFrame([(a, b)], "a array<long>, b array<long>")
    (merged,) = df.select(
        kmv_merge_expr(F.col("a"), F.col("b"), k).alias("m")
    ).first()
    assert merged == both  # the global k smallest live in the per-side k


@pytest.mark.parametrize("n_a,n_b,overlap", [(2000, 2000, 1000), (3000, 1500, 300)])
def test_estimation_accuracy(spark, n_a, n_b, overlap):
    k = 256
    ids_a = [f"a{i}" for i in range(n_a - overlap)] + [
        f"c{i}" for i in range(overlap)
    ]
    ids_b = [f"b{i}" for i in range(n_b - overlap)] + [
        f"c{i}" for i in range(overlap)
    ]
    a = _sketch(spark, ids_a, k).ks
    b = _sketch(spark, ids_b, k).ks
    df = spark.createDataFrame([(a, b)], "a array<long>, b array<long>")
    row = df.select(
        kmv_estimate_expr(F.col("a"), k).alias("ea"),
        kmv_estimate_expr(F.col("b"), k).alias("eb"),
        kmv_estimate_expr(kmv_merge_expr(F.col("a"), F.col("b"), k), k).alias(
            "eu"
        ),
        kmv_intersect_estimate_expr(F.col("a"), F.col("b"), k).alias("ei"),
    ).first()
    # k=256 -> relative standard error ~1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(row.ea - n_a) / n_a < 0.25
    assert abs(row.eb - n_b) / n_b < 0.25
    n_u = n_a + n_b - overlap
    assert abs(row.eu - n_u) / n_u < 0.25
    # intersections inherit union-sketch variance scaled by 1/J — be loose
    assert abs(row.ei - overlap) / overlap < 0.6
