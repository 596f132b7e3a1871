"""Unit tests for the generic operators: as-of join, spatial join, dedup."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.asof import asof_join
from ohsome_planet_spark.operators.dedup import exact_dedup
from ohsome_planet_spark.operators.spatial import (
    join_countries,
    points_in_feature,
    polygon_feature,
    rect_feature,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, ts("2020-01-05T00:00:00")), (1, ts("2020-01-10T00:00:00")), (2, ts("2020-01-01T00:00:00"))],
            "k int, t timestamp",
        )
        right = spark.createDataFrame(
            [
                (1, ts("2020-01-05T00:00:00"), "a"),
                (1, ts("2020-01-07T00:00:00"), "b"),
                (2, ts("2020-01-02T00:00:00"), "c"),
            ],
            "k int, rt timestamp, v string",
        )
        out = {
            (r.k, r.t): r.v
            for r in asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
        }
        # equal timestamps match (inclusive)
        assert out[(1, ts("2020-01-05T00:00:00"))] == "a"
        assert out[(1, ts("2020-01-10T00:00:00"))] == "b"
        # no state before the probe -> null
        assert out[(2, ts("2020-01-01T00:00:00"))] is None

    def test_strict(self, spark):
        left = spark.createDataFrame([(1, ts("2020-01-05T00:00:00"))], "k int, t timestamp")
        right = spark.createDataFrame(
            [(1, ts("2020-01-05T00:00:00"), "same"), (1, ts("2020-01-04T00:00:00"), "before")],
            "k int, rt timestamp, v string",
        )
        out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", strict=True).collect()
        assert out[0].v == "before"


class TestSpatial:
    def test_point_inside_outside(self):
        feat = rect_feature("X", 0.0, 0.0, 10.0, 10.0)
        px = np.array([5.0, 15.0, -1.0])
        py = np.array([5.0, 5.0, 5.0])
        assert points_in_feature(px, py, feat).tolist() == [True, False, False]

    def test_border_point_matches_both(self, spark):
        """FIXTURES.md §4: a feature on a shared border reports both codes."""
        feats = [rect_feature("AAA", 0.0, 0.0, 10.0, 10.0), rect_feature("BBB", 10.0, 0.0, 20.0, 10.0)]
        df = spark.createDataFrame(
            [(1, 10.0, 5.0), (2, 5.0, 5.0), (3, 25.0, 5.0)], "id int, lon double, lat double"
        )
        out = {r.id: r.countries for r in join_countries(df, feats).collect()}
        assert out[1] == ["AAA", "BBB"]
        assert out[2] == ["AAA"]
        assert out[3] == []

    def test_polygon_with_hole(self):
        feat = polygon_feature(
            "H",
            [
                [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
                [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)],
            ],
        )
        px = np.array([5.0, 1.0, 4.0])  # hole center, solid part, hole boundary
        py = np.array([5.0, 1.0, 5.0])
        assert points_in_feature(px, py, feat).tolist() == [False, True, True]


class TestDedup:
    def test_exact_dedup_keeps_first(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id int, t string"
        )
        kept = exact_dedup(df, ["t"], "id")
        assert {r.id for r in kept.collect()} == {1, 3}

    def test_connected_components_vs_union_find(self, spark):
        import random

        from ohsome_planet_spark.operators.dedup import connected_components

        def uf(edges, nodes):
            parent = {n: n for n in nodes}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for u, v in edges:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
            return {n: find(n) for n in nodes}

        rng = random.Random(11)
        edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        nodes = sorted({x for e in edges for x in e})
        expected = uf(edges, nodes)
        df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == expected

    def test_connected_components_chain(self, spark):
        """A path graph is the worst case for naive label propagation
        (O(diameter) rounds); the star algorithm must still converge
        within max_iter and label every node with the chain minimum."""
        from ohsome_planet_spark.operators.dedup import connected_components

        chain = [(i, i + 1) for i in range(120)]
        df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert len(got) == 121 and set(got.values()) == {0}

    def test_dedup_clusters_singletons_and_canonical(self, spark):
        from ohsome_planet_spark.operators.dedup import dedup_clusters

        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id bigint"
        )
        pairs = spark.createDataFrame(
            [(1, 3), (3, 5)], "doc_a bigint, doc_b bigint"
        )
        rows = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
        assert {d: r.cluster_id for d, r in rows.items()} == {
            0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1,
        }
        assert rows[1].n_docs == 3 and rows[1].is_canonical
        assert rows[3].n_docs == 3 and not rows[3].is_canonical
        assert rows[0].n_docs == 1 and rows[0].is_canonical


class TestIvf:
    def _vectors(self, spark, n=60, dim=8, seed=3):
        rng = np.random.default_rng(seed)
        rows = [
            (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_ivf_full_probe_equals_brute_force(self, spark):
        """With nprobe >= #lists, IVF search must reproduce exact top-k."""
        from ohsome_planet_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
            seed_centroids,
        )

        vecs = self._vectors(spark)
        cents = seed_centroids(vecs, every=10)  # 6 lists
        queries = vecs.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = {
            (r.query_id, r.rank): r.vec_id
            for r in cosine_topk(vecs, queries, k=3).collect()
        }
        ivf = {
            (r.query_id, r.rank): r.vec_id
            for r in ivf_topk(vecs, queries, cents, k=3, nprobe=6).collect()
        }
        assert ivf == exact

    def test_ivf_narrow_probe_subset(self, spark):
        """nprobe=1 results are a subset of the probed list's members and
        ranks stay dense per query."""
        from ohsome_planet_spark.operators.similarity import (
            ivf_topk,
            seed_centroids,
        )

        vecs = self._vectors(spark)
        cents = seed_centroids(vecs, every=10)
        queries = vecs.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = ivf_topk(vecs, queries, cents, k=5, nprobe=1).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r.rank)
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


class TestProductQuantization:
    def _vectors(self, spark, n=40, dim=8, seed=7):
        rng = np.random.default_rng(seed)
        rows = [
            (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def test_pq_encode_is_argmin_over_codebooks(self, spark):
        """Codes must equal the numpy argmin of rounded squared-L2 over the
        trained per-subspace codebooks (ties to the smallest codeword id)."""
        from ohsome_planet_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )

        m, dim = 2, 8
        vecs = self._vectors(spark, dim=dim)
        cb = pq_codebooks(vecs, m=m, dim=dim, every=10, iters=1)
        cb_rows = {
            (r.sub, r.cid): np.array(r.cv) for r in cb.collect()
        }
        codes = pq_encode(vecs, cb, m=m, dim=dim).collect()
        raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in vecs.collect()}
        assert len(codes) == len(raw) * m
        ds = dim // m
        for r in codes:
            sv = raw[r.vec_id][r.sub * ds:(r.sub + 1) * ds]
            dists = {
                cid: round(float(((sv - cv) ** 2).sum()), 6)
                for (sub, cid), cv in cb_rows.items()
                if sub == r.sub
            }
            best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
            assert (r.code, round(r.sub_dist, 6)) == best

    def test_pq_adc_ranks_are_dense_and_exclude_self(self, spark):
        from ohsome_planet_spark.operators.similarity import (
            pq_adc_topk,
            pq_codebooks,
            pq_encode,
        )

        m, dim = 2, 8
        vecs = self._vectors(spark, dim=dim)
        cb = pq_codebooks(vecs, m=m, dim=dim, every=10, iters=1)
        codes = pq_encode(vecs, cb, m=m, dim=dim)
        queries = vecs.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = pq_adc_topk(codes, cb, queries, k=4, m=m, dim=dim).collect()
        by_q = {}
        for r in out:
            assert r.vec_id != r.query_id
            by_q.setdefault(r.query_id, []).append(r.rank)
        assert set(by_q) == {0, 1}
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


    def test_residual_vectors_reconstruct(self, spark):
        """residual + assigned centroid == original vector, and the list id
        matches assign_nearest."""
        from ohsome_planet_spark.operators.similarity import (
            assign_nearest,
            centroids_df,
            residual_vectors,
        )

        dim = 8
        vecs = self._vectors(spark, dim=dim)
        cents = centroids_df(vecs, every=10)
        res = {r.vec_id: (r._list, np.array(r.embedding))
               for r in residual_vectors(vecs, cents).collect()}
        raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in vecs.collect()}
        assigned = {r.vec_id: r.cid
                    for r in assign_nearest(vecs, cents).collect()}
        cv = {r.cid: np.array(r.cv) for r in cents.collect()}
        assert set(res) == set(raw)
        for vid, (lst, rv) in res.items():
            assert lst == assigned[vid]
            np.testing.assert_allclose(rv + cv[lst], raw[vid], atol=1e-9)

    def test_ivfpq_residual_full_probe_matches_residual_adc(self, spark):
        """With nprobe >= #lists, residual IVF-PQ must rank by the same
        per-list residual ADC distance a numpy replay computes."""
        from ohsome_planet_spark.operators.similarity import (
            centroids_df,
            ivfpq_residual_topk,
            pq_codebooks,
            pq_encode,
            residual_vectors,
        )

        m, dim = 2, 8
        vecs = self._vectors(spark, dim=dim)
        cents = centroids_df(vecs, every=10)  # 4 lists
        res = residual_vectors(vecs, cents)
        cb = pq_codebooks(res, m=m, dim=dim, every=7, iters=1)
        codes = pq_encode(res, cb, m=m, dim=dim).join(
            res.select("vec_id", "_list"), "vec_id"
        )
        queries = vecs.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = ivfpq_residual_topk(
            codes, cb, cents, queries, k=4, nprobe=4, m=m, dim=dim
        ).collect()
        by_q = {}
        for r in out:
            assert r.vec_id != r.query_id
            by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.adc_dist))
        assert set(by_q) == {0, 1}
        # numpy replay of the residual ADC for one query
        cbr = {(r.sub, r.cid): np.array(r.cv) for r in cb.collect()}
        code_rows = {}
        for r in codes.collect():
            code_rows.setdefault(r.vec_id, {})[r.sub] = (r.code, r._list)
        cvs = {r.cid: np.array(r.cv) for r in cents.collect()}
        raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in vecs.collect()}
        ds = dim // m
        for qid, ranked in by_q.items():
            expect = {}
            for vid, subs in code_rows.items():
                if vid == qid:
                    continue
                lst = subs[0][1]
                qres = raw[qid] - cvs[lst]
                d = 0.0
                for sub, (code, _) in subs.items():
                    qsv = qres[sub * ds:(sub + 1) * ds]
                    d += round(float(((qsv - cbr[(sub, code)]) ** 2).sum()), 6)
                expect[vid] = round(d, 6)
            for rank, vid, adc in sorted(ranked):
                assert abs(expect[vid] - adc) < 1e-6


class TestGeometrySpatialJoin:
    def test_linestring_crossing_feature(self, spark):
        """A line that crosses a country without any vertex inside still
        intersects (the full-geometry join, not just vertices)."""
        from ohsome_planet_spark.functions import wkb as wkblib
        from ohsome_planet_spark.operators.spatial import join_countries_geometry

        feats = [rect_feature("AAA", 0.0, 0.0, 10.0, 10.0)]
        crossing = wkblib.encode(
            {"type": "LineString", "coords": [(-5.0, 5.0), (15.0, 5.0)]}
        )
        inside = wkblib.encode({"type": "Point", "coords": (5.0, 5.0)})
        outside = wkblib.encode(
            {"type": "LineString", "coords": [(20.0, 20.0), (30.0, 30.0)]}
        )
        df = spark.createDataFrame(
            [(1, crossing), (2, inside), (3, outside)], "id int, geometry binary"
        )
        out = {r.id: r.countries for r in join_countries_geometry(df, feats).collect()}
        assert out[1] == ["AAA"]
        assert out[2] == ["AAA"]
        assert out[3] == []

    def test_polygon_containing_feature(self, spark):
        """A polygon fully containing a small country intersects it even
        though no polygon vertex lies inside the country."""
        from ohsome_planet_spark.functions import wkb as wkblib
        from ohsome_planet_spark.operators.spatial import join_countries_geometry

        feats = [rect_feature("TINY", 4.0, 4.0, 6.0, 6.0)]
        big = wkblib.encode(
            {
                "type": "Polygon",
                "coords": [
                    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
                ],
            }
        )
        df = spark.createDataFrame([(1, big)], "id int, geometry binary")
        out = join_countries_geometry(df, feats).collect()[0].countries
        assert out == ["TINY"]


def test_truncate_lineage_uses_reliable_checkpoint_when_configured(spark, tmp_path):
    """Cluster-mode switch (round-5 advice): with a checkpoint dir set,
    truncate_lineage writes a reliable checkpoint (files on durable
    storage, survives executor loss) instead of localCheckpoint."""
    import os

    from pyspark.sql import functions as F

    from ohsome_planet_spark.session import truncate_lineage

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # default: localCheckpoint path
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = truncate_lineage(df, eager=True)
    assert out.count() == 100

    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        out2 = truncate_lineage(df, eager=True)
        assert out2.count() == 100
        files = [f for _, _, fs in os.walk(ckpt) for f in fs]
        assert files, "reliable checkpoint must write to the checkpoint dir"
    finally:
        # restore the no-checkpoint-dir default so other tests keep the
        # localCheckpoint path (no public unset API; go through the JVM)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


class TestVerifyCandidatePairs:
    def test_false_positive_candidates_are_dropped(self, spark):
        """LSH candidates below the exact-Jaccard threshold must not
        survive verification; pairs above it keep their exact score."""
        from ohsome_planet_spark.operators.dedup import (
            shingles,
            verify_candidate_pairs,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
                (3, "one two three four five six"),          # unrelated
            ],
            "doc_id int, text string",
        )
        sh = shingles(docs, "doc_id", "text", n=3)
        # candidates include a banding false positive: (1, 3)
        cand = spark.createDataFrame(
            [(1, 2), (1, 3)], "doc_a int, doc_b int"
        )
        rows = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in verify_candidate_pairs(cand, sh, threshold=0.3).collect()
        }
        assert (1, 3) not in rows          # false positive rejected
        assert (1, 2) in rows
        # docs 1/2 share 3 of their 4 3-gram shingles: J = 3/5
        assert rows[(1, 2)] == 0.6


def test_train_logreg_partition_invariant(spark):
    from ohsome_planet_spark.operators.curation import train_logreg
    import random

    rng = random.Random(7)
    rows = [
        (1.0, rng.uniform(-2, 2), rng.uniform(0, 1), float(rng.random() > 0.5))
        for _ in range(500)
    ]
    schema = "x0 double, x1 double, x2 double, y double"
    w1, a1 = train_logreg(
        spark.createDataFrame(rows, schema).repartition(1), 3, iters=3
    )
    w32, a32 = train_logreg(
        spark.createDataFrame(rows, schema).repartition(32), 3, iters=3
    )
    # int64-quantized gradients -> bit-identical under any partitioning
    assert w1 == w32 and a1 == a32


def test_knn_self_join_prenorm(spark):
    """r13: knn_self_join precomputes per-row norms instead of evaluating
    them per scored pair. The cosine must stay bit-identical to the
    inline dot/(norm*norm) form — same operands, same operation order."""
    import random

    from pyspark.sql import functions as F

    from ohsome_planet_spark.operators.similarity import (
        centroids_df, cosine_expr, knn_self_join,
    )

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = knn_self_join(emb, centroids_df(emb, every=20), k=3)
    got = {
        (r.vec_id, r.neighbor_id): r.cosine
        for r in out.collect()
    }
    assert got, "no neighbor pairs produced"
    # reference: the inline-cosine expression over the same pairs
    pairs = spark.createDataFrame(
        [(a, b) for (a, b) in got], "vec_id bigint, neighbor_id bigint"
    )
    ref = (
        pairs.join(emb, "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("emb_b"),
            ),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                cosine_expr(
                    F.col("embedding").cast("array<double>"),
                    F.col("emb_b").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    want = {(r.vec_id, r.neighbor_id): r.cosine for r in ref.collect()}
    assert got == want


def test_ngram_jaccard_pairs_shingle_df_param(spark):
    """r13: passing a pre-built shingles frame must give the identical
    pair set as the internal derivation (dedup_recall_eval shares one
    seamed shingle table between the jaccard and MinHash pipelines)."""
    from ohsome_planet_spark.operators.dedup import (
        ngram_jaccard_pairs, shingles,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different sentence about spark plans"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = sorted(
        map(tuple, ngram_jaccard_pairs(df, "doc_id", "text", n=3).collect())
    )
    via_param = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                df, "doc_id", "text", n=3,
                shingle_df=shingles(df, "doc_id", "text", n=3),
            ).collect(),
        )
    )
    assert base and base == via_param
