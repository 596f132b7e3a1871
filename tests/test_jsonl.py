"""JSONL source/sink referees: exact round-trip including hard strings
(newlines inside values, quotes, unicode, nulls), gzip on-disk format,
FAILFAST vs permissive corrupt-line handling, binary rejection."""

from __future__ import annotations

import glob
import gzip
import json

import pytest

from ohsome_planet_spark.sources.jsonl import read_jsonl, write_jsonl


def test_roundtrip_hard_strings(spark, tmp_path):
    rows = [
        (1, 'line\nbreak and "quotes" and \\ backslash', "en"),
        (2, "unicode: café 世界 \U0001f600", "zh"),
        (3, None, None),
        (4, "", ""),
        (5, "\t tab \r carriage", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "out")
    write_jsonl(df, path, gzip=True, n_files=2)
    back = read_jsonl(
        spark, path, "doc_id bigint, text string, lang string"
    )
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == {d: (t, l) for d, t, l in rows}
    # on-disk format is genuine gzip NDJSON readable by anything
    files = glob.glob(path + "/part-*.gz")
    assert files
    lines = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == 5
    assert {l["doc_id"] for l in lines} == {1, 2, 3, 4, 5}
    by_id = {l["doc_id"]: l for l in lines}
    assert by_id[1]["text"] == rows[0][1]  # \n survives as the \n ESCAPE
    assert "text" not in by_id[3] or by_id[3].get("text") is None


def test_failfast_vs_permissive(spark, tmp_path):
    path = str(tmp_path / "dirty")
    import os

    os.makedirs(path)
    with open(path + "/a.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    with pytest.raises(Exception):
        read_jsonl(spark, path, "doc_id bigint, text string").collect()
    back = read_jsonl(
        spark, path,
        "doc_id bigint, text string, _corrupt_record string",
        permissive=True,
    )
    rows = back.collect()
    good = [r for r in rows if r.doc_id is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]._corrupt_record.startswith("THIS IS NOT")


def test_permissive_appends_corrupt_column(spark, tmp_path):
    """permissive=True must quarantine bad lines even when the caller's
    schema does NOT name _corrupt_record — Spark only populates the
    corrupt-record column when it is in the explicit schema, so
    read_jsonl appends it (ADVICE round 10: without this, corrupt lines
    silently became all-null rows)."""
    import os

    path = str(tmp_path / "dirty2")
    os.makedirs(path)
    with open(path + "/a.jsonl", "w") as f:
        f.write('{"doc_id": 7, "text": "fine"}\n')
        f.write("{broken\n")
    back = read_jsonl(spark, path, "doc_id bigint, text string",
                      permissive=True)
    assert "_corrupt_record" in back.columns  # appended, not silent
    rows = back.collect()
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith("{broken")
    assert {r.doc_id for r in rows if r.doc_id is not None} == {7}
    # StructType schema path too
    from pyspark.sql.types import StructType

    st = StructType.fromDDL("doc_id bigint, text string")
    back2 = read_jsonl(spark, path, st, permissive=True)
    assert "_corrupt_record" in back2.columns
    assert len(st.fields) == 2  # caller's schema object not mutated


def test_binary_rejected(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, blob binary")
    with pytest.raises(ValueError, match="binary"):
        write_jsonl(df, "/tmp/never-written")
