"""Round-8 differential oracles: independent numpy replays of
quality-LR training and MMR selection (verdict item 10 — builder-written
DuckDB oracles must not be the only referee for new operators)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _feature_frame(spark, n=80, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=(n, 4))
    w_true = np.array([0.8, -1.2, 0.5, 2.0])
    y = ((X @ w_true + rng.normal(0, 0.3, n)) > 0).astype(float)
    rows = [
        (1.0, float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), float(X[i, 3]),
         float(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "x0 double, x1 double, x2 double, x3 double, x4 double, y double"
    )
    return df, np.column_stack([np.ones(n), X]), y


def _numpy_logreg(Xb, y, iters, lr):
    """Independent replay of train_logreg's exact algorithm: int64
    gradient quantization per row, rational weight updates."""
    n = len(y)
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        e = p - y
        g = np.array(
            [int(np.sum(np.round(e * Xb[:, j] * 1e9).astype(np.int64)))
             for j in range(Xb.shape[1])]
        )
        w = w - lr * (g / 1e9) / n
    p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
    acc = float(np.mean((p >= 0.5) == (y >= 0.5)))
    return w, acc


def test_train_logreg_matches_numpy_replay(spark):
    from ohsome_planet_spark.operators.curation import train_logreg

    df, Xb, y = _feature_frame(spark)
    w_spark, acc_spark = train_logreg(df, n_features=5, iters=3, lr=0.5)
    w_np, acc_np = _numpy_logreg(Xb, y, iters=3, lr=0.5)
    # JVM exp vs libm exp can differ by 1 ulp -> at most a few 1e-9 quanta
    # in each round's integer gradient
    assert np.allclose(w_spark, w_np, atol=1e-7, rtol=0)
    assert acc_spark == acc_np
    assert acc_np >= 0.85  # the loop actually learns


def test_train_logreg_partition_invariant(spark):
    from ohsome_planet_spark.operators.curation import train_logreg

    df, _, _ = _feature_frame(spark, n=60, seed=11)
    w1, a1 = train_logreg(df.coalesce(1), n_features=5, iters=2, lr=0.5)
    w32, a32 = train_logreg(df.repartition(32), n_features=5, iters=2, lr=0.5)
    assert w1 == w32 and a1 == a32  # exact: int64 gradient sums


def _vec_frame(spark, n=30, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    V = rng.normal(0.0, 1.0, size=(n, dim))
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"),
        V,
    )


def _numpy_mmr(V, query_id, pool, k, lam):
    """Independent replay: 6-decimal cosines, integer micro-unit greedy."""
    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    q = V[query_id]
    rel = {i: cos(V[i], q) for i in range(len(V)) if i != query_id}
    cands = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    lam_t = round(lam * 10)
    rels_u = {c: round(rel[c] * 1e6) for c in cands}
    sims_u = {
        (a, b): round(cos(V[a], V[b]) * 1e6)
        for a in cands for b in cands if a != b
    }
    chosen, picked, remaining = [], [], sorted(cands)
    for rank in range(1, k + 1):
        best = None
        for c in remaining:
            if picked:
                ms = max(sims_u[(c, p)] for p in picked)
                s = lam_t * rels_u[c] - (10 - lam_t) * ms
            else:
                s = lam_t * rels_u[c]
            if best is None or (s, -c) > (best[1], -best[0]):
                best = (c, s)
        chosen.append((rank, best[0], best[1] / 1e7))
        picked.append(best[0])
        remaining.remove(best[0])
    return chosen


def test_mmr_diverse_topk_matches_numpy_replay(spark):
    from ohsome_planet_spark.operators.similarity import mmr_diverse_topk

    df, V = _vec_frame(spark)
    got = mmr_diverse_topk(df, query_id=0, pool=12, k=5, lam=0.7)
    want = _numpy_mmr(V, query_id=0, pool=12, k=5, lam=0.7)
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    for (_, _, sa), (_, _, sb) in zip(got, want):
        assert sa == pytest.approx(sb, abs=1e-9)


def test_mmr_diversifies_vs_plain_topk(spark):
    """MMR with lam<1 must not simply return the pure-relevance ranking
    when near-duplicates exist in the pool."""
    from ohsome_planet_spark.operators.similarity import mmr_diverse_topk

    rng = np.random.default_rng(5)
    base = rng.normal(size=8)
    # 3 near-copies of the most relevant direction + spread vectors
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 4):
        rows.append((i, [float(x) for x in base + rng.normal(0, 0.01, 8)]))
    for i in range(4, 15):
        rows.append((i, [float(x) for x in rng.normal(size=8)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = mmr_diverse_topk(df, query_id=0, pool=10, k=4, lam=0.5)
    picked = [i for _, i, _ in got]
    # pure relevance would pick the 3 near-copies first; MMR must not
    assert not set(picked[:3]) <= {1, 2, 3}
