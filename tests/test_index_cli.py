"""End-to-end drive of the `index` CLI: train + store an ANN index from an
embeddings parquet, then answer a query by READING the stored tables —
the FAISS train/add/write/load cycle with parquet as the index format."""

import json

import numpy as np
from pyspark.sql import functions as F

from ohsome_planet_spark.cli import main as cli_main


def _write_embeddings(spark, path, n=120, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(path)


def test_index_cli_ivfpq_residual_roundtrip(spark, tmp_path, capsys):
    emb_path = str(tmp_path / "emb")
    out = str(tmp_path / "index")
    _write_embeddings(spark, emb_path)

    rc = cli_main(
        [
            "index", "--input", emb_path, "--out", out,
            "--kind", "ivfpq_residual", "--dim", "16", "--pq-m", "2",
            "--coarse-every", "20", "--train-iters", "2",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["kind"] == "ivfpq_residual"
    assert report["n_lists"] >= 2
    assert report["n_codes"] == 120 * 2  # one row per (vector, subspace)
    assert report["bytes_per_vector"] == 2

    # search by READING the stored tables — no retraining
    from ohsome_planet_spark.operators.similarity import ivfpq_residual_topk

    coarse = spark.read.parquet(out + "/coarse")
    cb = spark.read.parquet(out + "/codebooks")
    codes = spark.read.parquet(out + "/codes")
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ivfpq_residual_topk(
        codes, cb, coarse, queries, k=3, nprobe=2, m=2, dim=16
    ).collect()
    by_q = {}
    for r in got:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == {0, 1}
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_index_cli_ivf_only(spark, tmp_path, capsys):
    emb_path = str(tmp_path / "emb")
    out = str(tmp_path / "index")
    _write_embeddings(spark, emb_path, n=60)
    rc = cli_main(
        ["index", "--input", emb_path, "--out", out, "--kind", "ivf",
         "--dim", "16", "--coarse-every", "15"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_lists"] >= 2 and "n_codes" not in report
    assert spark.read.parquet(out + "/coarse").columns == ["cid", "cv"]


def test_explain_cli(capsys):
    from ohsome_planet_spark.cli import main

    assert main(["explain", "pricing_summary",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out and "HashAggregate" in out


def test_explain_cli_unknown_query(capsys):
    from ohsome_planet_spark.cli import main

    assert main(["explain", "pricing_sumary"]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "pricing_summary" in err
