"""PageRank: exact values on a known graph, rank-mass conservation."""

import pytest

from ohsome_planet_spark.operators.graph import pagerank, symmetrize


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_pagerank_matches_hand_computation(spark):
    # path graph 1-2, 2-3 symmetrized: outdeg 1=[2], 2=[1,3], 3=[2]
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    got = {r.node: r.rank for r in pagerank(e, iterations=2, damping=0.85).collect()}

    n, d = 3, 0.85
    r0 = {1: 1 / n, 2: 1 / n, 3: 1 / n}
    outdeg = {1: 1, 2: 2, 3: 1}

    def step(r):
        inb = {1: r[2] / outdeg[2], 2: r[1] + r[3], 3: r[2] / outdeg[2]}
        return {k: (1 - d) / n + d * inb[k] for k in r}

    expect = step(step(r0))
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-12)
    # the symmetric graph has no dangling nodes: total mass stays 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_symmetrize_doubles_edges(spark):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "a bigint, b bigint")
    e = symmetrize(pairs, "a", "b")
    got = {(r.src, r.dst) for r in e.collect()}
    assert got == {(1, 2), (2, 1), (3, 4), (4, 3)}


def test_pagerank_star_center_dominates(spark):
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a bigint, b bigint"
    )
    got = {
        r.node: r.rank
        for r in pagerank(symmetrize(pairs, "a", "b"), iterations=3).collect()
    }
    assert got[0] > max(v for k, v in got.items() if k != 0)


# --- BPE merge training ------------------------------------------------------

from ohsome_planet_spark.operators.bpe import bpe_train


def test_bpe_hand_corpus(spark):
    # aaab x3 + ab x2: round1 merges (a,a) [6 > ab's 5], round2 (a,b),
    # round3 (aa,ab); weighted symbol totals checked by hand
    words = spark.createDataFrame([("aaab", 3), ("ab", 2)], "word string, freq bigint")
    got = bpe_train(words, rounds=3)
    assert [(r["left"], r["right"], r["pair_count"], r["n_symbols_after"])
            for r in got] == [
        ("a", "a", 6, 13),
        ("a", "b", 5, 8),
        ("aa", "ab", 3, 5),
    ]


def test_bpe_overlap_greedy_leftmost(spark):
    # 'aaaa': (a,a) count 3; leftmost-greedy pairs positions (1,2) and
    # (3,4) -> [aa, aa] -> 2 symbols
    words = spark.createDataFrame([("aaaa", 1)], "word string, freq bigint")
    got = bpe_train(words, rounds=1)
    assert got[0]["pair_count"] == 3
    assert got[0]["n_symbols_after"] == 2


def test_bpe_stops_when_no_pairs(spark):
    words = spark.createDataFrame([("a", 5), ("b", 2)], "word string, freq bigint")
    assert bpe_train(words, rounds=2) == []
