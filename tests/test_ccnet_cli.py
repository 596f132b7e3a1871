"""End-to-end drive of the `ccnet` CLI: documents parquet → cross-corpus
line dedup + per-language LM perplexity buckets — planted boilerplate
collapses to one corpus occurrence, gibberish docs land in tail, and the
JSON summary's counters agree with the written table."""

import json

from ohsome_planet_spark.cli import main as cli_main


def _write_docs(spark, path):
    rows = []
    for i in range(36):
        # digit-free unique token: line-dedup folds digit runs, so a
        # "number {i}" body would collapse corpus-wide to ONE line
        tok = chr(97 + i % 26) + chr(97 + i // 26)
        body = f"the cat named {tok} sat on the mat while the dog ran home"
        text = f"{body}\nSubscribe to our newsletter!\nvisit example dot com"
        rows.append((i, "en", text))
    # gibberish doc: worst perplexity in its language
    rows.append((98, "en", "zq wv qq kjw zzkrp mxp vvq jjw"))
    # second language with its own LM
    rows += [(200 + i, "de",
              f"der hund {chr(97 + i)}x lief nach hause")
             for i in range(9)]
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).write.mode("overwrite").parquet(path)
    return len(rows)


def test_ccnet_cli_e2e(spark, tmp_path, capsys):
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "ccnet")
    total = _write_docs(spark, inp)

    rc = cli_main(["ccnet", "--input", inp, "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_docs"] == total
    assert 0 < report["n_keep"] < total
    assert report["lines_kept"] < report["lines_total"]

    got = {r.doc: r for r in spark.read.parquet(out).collect()}
    assert len(got) == total
    # boilerplate dedup: the newsletter/visit lines survive in exactly
    # one document corpus-wide -> every doc keeps its body line, two
    # docs' worth of boilerplate survive in total
    kept_lines = sum(r.n_kept for r in got.values())
    assert kept_lines == (
        # every doc keeps >=1 line; 36 en boiler docs keep body only,
        # except the first occurrence doc keeps all 3
        total + 2  # +2 extra kept boilerplate lines on the winner doc
    ), kept_lines
    # the deduped text of a non-winner doc is just its body
    assert "Subscribe" not in got[5].text and "named f" in got[5].text
    # gibberish lands in tail and is dropped
    assert got[98].bucket == "tail" and not got[98].keep
    # language isolation: de docs bucket among themselves (9 docs -> 3/3/3)
    de = [r for r in got.values() if r.lang == "de"]
    assert sorted([r.bucket for r in de]).count("head") == 3


def test_ccnet_cli_cutoff_mode(spark, tmp_path, capsys):
    inp = str(tmp_path / "docs2")
    out = str(tmp_path / "ccnet2")
    _write_docs(spark, inp)
    rc = cli_main(
        ["ccnet", "--input", inp, "--out", out, "--bucket-mode", "cutoff"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["bucket_mode"] == "cutoff"
    got = {r.doc: r for r in spark.read.parquet(out).collect()}
    assert got[98].bucket == "tail"
