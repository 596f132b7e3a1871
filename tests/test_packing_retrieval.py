"""Unit tests for sequence packing and BM25 retrieval (training-data ops)."""

import math

from pyspark.sql import functions as F

from ohsome_planet_spark.operators.packing import pack_sequences, packing_stats
from ohsome_planet_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pack_sequences_offsets_contiguous(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["tok"] * (10 * (i % 7) + 1))) for i in range(40)],
    )
    packed = pack_sequences(docs, seq_len=32, n_shards=4).collect()
    # within each shard, ordered by doc_id, offsets are exactly cumulative
    by_shard = {}
    for r in sorted(packed, key=lambda r: (r.shard, r.doc_id)):
        expect = by_shard.get(r.shard, 0)
        assert r.start_off == expect, (r.doc_id, r.shard)
        by_shard[r.shard] = expect + r.n_tokens
    # block arithmetic is internally consistent
    for r in packed:
        assert r.first_seq == r.start_off // 32
        assert r.last_seq == max(r.start_off + r.n_tokens - 1, r.start_off) // 32
        assert r.n_splits == r.last_seq - r.first_seq
        assert r.seq_offset == r.start_off % 32


def test_pack_sequences_empty_doc(spark):
    docs = _docs(spark, [(1, ""), (2, "a b c")])
    rows = {r.doc_id: r for r in pack_sequences(docs, seq_len=8, n_shards=1).collect()}
    assert rows[1].n_tokens == 0
    assert rows[1].n_splits == 0
    assert rows[1].first_seq == rows[1].last_seq


def test_packing_stats_roundtrip(spark):
    docs = _docs(spark, [(i, " ".join(["w"] * 13)) for i in range(30)])
    packed = pack_sequences(docs, seq_len=32, n_shards=4)
    stats = {r.shard: r for r in packing_stats(packed, seq_len=32).collect()}
    agg = {
        r.shard: r
        for r in packed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    }
    for shard, s in stats.items():
        assert s.n_docs == agg[shard].n
        assert s.total_tokens == agg[shard].t
        assert s.n_sequences == math.ceil(agg[shard].t / 32)
        expected_tail = agg[shard].t % 32
        if expected_tail == 0 and agg[shard].t > 0:
            expected_tail = 32  # exactly-full final sequence reports seq_len
        assert s.tail_fill == expected_tail


def test_packing_stats_exactly_full_tail_reports_seq_len(spark):
    """Round-6 ADVICE: tail_fill==0 used to be ambiguous between 'exactly
    full' and 'empty'; an exactly-full shard now reports seq_len."""
    # 4 docs x 8 tokens = 32 = exactly one full sequence, single shard
    docs = _docs(spark, [(i, " ".join(["w"] * 8)) for i in range(4)])
    packed = pack_sequences(docs, seq_len=32, n_shards=1)
    s = packing_stats(packed, seq_len=32).collect()[0]
    assert s.total_tokens == 32
    assert s.n_sequences == 1
    assert s.tail_fill == 32


def test_bm25_ranks_term_density(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark fast"),          # dense in query term
            (2, "spark slow and long " + "pad " * 50),  # one hit, long doc
            (3, "nothing relevant here"),
            (4, "spark join"),                       # two distinct terms
        ],
    )
    got = bm25_topk(docs, ["spark", "join"], k=3).collect()
    ids = [r.doc_id for r in got]
    assert 3 not in ids  # no query term, never scored
    assert len(ids) == 3
    # two-term doc beats the single long one-hit doc
    assert ids.index(4) < ids.index(2)
    # length normalization: short dense doc beats long one-hit doc
    assert ids.index(1) < ids.index(2)
    assert all(r.bm25 > 0 for r in got)


def test_bm25_k_limit_and_determinism(spark):
    docs = _docs(spark, [(i, "common term") for i in range(20)])
    got = bm25_topk(docs, ["common"], k=5).collect()
    # all scores tie -> deterministic doc_id tiebreak picks lowest ids
    assert [r.doc_id for r in got] == [0, 1, 2, 3, 4]


def test_pack_cli_end_to_end(spark, tmp_path, capsys):
    import json as _json
    import os

    from ohsome_planet_spark.cli import main

    src = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 20))) for i in range(100)],
        "doc_id bigint, text string",
    )
    docs.write.parquet(src)
    out = str(tmp_path / "packed")
    assert main(["pack", "--input", src, "--out", out,
                 "--seq-len", "64", "--shards", "4"]) == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["docs"] == 100
    assert report["sequences"] >= report["tokens"] // 64
    assert 0 < report["fill_ratio"] <= 1

    # hive shard partitions exist and the shard-local token stream is
    # exactly replayable: offsets are cumulative in doc_id order
    back = spark.read.parquet(out)
    assert set(back.columns) >= {"doc_id", "text", "start_off", "first_seq"}
    for shard_dir in os.listdir(out):
        if not shard_dir.startswith("shard="):
            continue
        rows = sorted(
            back.filter(f"shard = {shard_dir.split('=')[1]}").collect(),
            key=lambda r: r.doc_id,
        )
        off = 0
        for r in rows:
            assert r.start_off == off
            off += len(r.text.split())
