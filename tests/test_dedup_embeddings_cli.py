"""End-to-end drive of the `dedup-embeddings` CLI: embeddings parquet →
semantic-dedup cluster + keep tables (capped LSH candidates, exact
cosine threshold, connected components), then verify the planted
near-duplicate groups collapse and unrelated vectors survive."""

import json

import numpy as np

from ohsome_planet_spark.cli import main as cli_main


def _write_corpus_with_twins(spark, path, n=80, dim=64, twins=12, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
        if i < twins:
            # ±2% multiplicative jitter: cosine ~0.9997, well above 0.99
            jit = v * (1.0 + 0.02 * np.sin(np.arange(dim) + i))
            rows.append((i + 1_000_000, [float(x) for x in jit]))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).write.mode("overwrite").parquet(path)
    return n + twins


def test_dedup_embeddings_cli_e2e(spark, tmp_path, capsys):
    emb_path = str(tmp_path / "emb")
    out = str(tmp_path / "sem")
    total = _write_corpus_with_twins(spark, emb_path)

    rc = cli_main(
        [
            "dedup-embeddings", "--input", emb_path, "--out", out,
            "--threshold", "0.99", "--ntables", "2", "--bucket-cap", "16",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_vectors"] == total

    clusters = spark.read.parquet(out + "/clusters")
    rows = {r.vec_id: r for r in clusters.collect()}
    assert len(rows) == total
    # every planted twin pair collapsed into one cluster with the
    # original as canonical (min id), the twin flagged non-canonical
    collapsed = 0
    for i in range(12):
        a, b = rows[i], rows[i + 1_000_000]
        if b.cluster_id == a.cluster_id == i:
            collapsed += 1
            assert a.is_canonical and not b.is_canonical
            assert a.n_docs >= 2
    # LSH recall on ±2% twins is ~1.0 at these settings; allow one miss
    # (a twin split from its original in BOTH tables by the bucket cap)
    assert collapsed >= 11, collapsed
    # unrelated vectors (near-orthogonal gaussians) stay singletons
    singles = [r for r in rows.values() if r.n_docs == 1]
    assert len(singles) >= total - 2 * 12 - 2
    # keep table = canonical ids exactly
    keep = {r.vec_id for r in spark.read.parquet(out + "/keep").collect()}
    assert keep == {v.vec_id for v in rows.values() if v.is_canonical}
    assert report["n_kept"] == len(keep)
    assert report["n_dropped"] == total - len(keep)
