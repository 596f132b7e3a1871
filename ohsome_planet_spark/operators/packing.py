"""Sequence packing: assign documents to fixed-length training sequences.

LLM training pipelines concatenate tokenized documents and chunk the
stream into ``seq_len``-token training sequences ("concat-and-chunk", the
T5/GPT data-prep shape). The packing assignment itself — which sequence(s)
each document lands in, at what offset, how many block boundaries split it
— is a pure prefix-sum over a deterministic document order.

Scale shape: a *global* prefix sum would need a total order (single
reducer at the end of a global sort — a 100 TB non-starter). Real
pipelines pack per output shard instead, so the operator shards documents
by a deterministic hash and packs within shards: the cumulative-offset
window partitions by ``shard`` and Spark runs one exchange hash-partitioned
on shard, every shard summed independently in parallel. Shard count is the
write-parallelism knob exactly as in production tokenizer-sharding jobs.

No reference counterpart (ohsome-planet is an OSM engine); this is part of
the training-data surface alongside dedup/ANN/text analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import hash60_expr, tokens_expr

__all__ = ["pack_sequences", "packing_stats", "chunk_documents"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing assignment under concat-and-chunk.

    Returns one row per document: its shard, whitespace-token count,
    start offset in the shard's token stream, first/last sequence index,
    the number of sequence boundaries that split the document, and its
    offset inside the first sequence. Documents are ordered by ``id_col``
    within each shard (deterministic, so the packing is reproducible
    across runs and cluster sizes).
    """
    n_tok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    ).cast("bigint")
    shard = F.pmod(hash60_expr(F.col(id_col).cast("string")), F.lit(n_shards)).cast(
        "bigint"
    )
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    out = (
        docs.select(F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"))
        .withColumn("start_off", start)
        .withColumn("first_seq", F.floor(F.col("start_off") / seq_len))
        .withColumn(
            "last_seq",
            F.floor(
                F.greatest(
                    F.col("start_off") + F.col("n_tokens") - 1, F.col("start_off")
                )
                / seq_len
            ),
        )
        .withColumn("n_splits", (F.col("last_seq") - F.col("first_seq")).cast("bigint"))
        .withColumn("seq_offset", F.pmod(F.col("start_off"), F.lit(seq_len)).cast("bigint"))
    )
    return out


def packing_stats(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Per-shard packing summary: documents, tokens, emitted sequences
    (ceil of the token total), tail fill of the final sequence, and how
    many documents straddle a boundary. One partial-agg shuffle on the
    (already co-partitioned) shard key.

    ``tail_fill`` is ``seq_len`` (i.e. "full") when the final sequence is
    exactly full, and 0 only for an empty shard — the plain modulo
    conflated the two (round-6 ADVICE, mirrored in the oracle SQL).
    """
    total = F.sum("n_tokens")
    mod = F.pmod(total, F.lit(seq_len))
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.alias("total_tokens"),
        F.ceil(total / seq_len).cast("bigint").alias("n_sequences"),
        F.when((mod == 0) & (total > 0), F.lit(seq_len))
        .otherwise(mod)
        .cast("bigint")
        .alias("tail_fill"),
        F.sum((F.col("n_splits") > 0).cast("bigint")).alias("n_split_docs"),
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: split each document's token
    stream into windows of ``max_tokens`` with ``overlap`` tokens of
    context carried between consecutive chunks (stride =
    max_tokens − overlap) — the standard long-document prep for
    embedding / RAG / long-context training pipelines.

    Output: (doc, chunk_idx, chunk_text, n_tokens). The final partial
    chunk is kept (n_tokens ≤ max_tokens); a document emits
    ceil(max(n_doc_tokens − overlap, 1) / stride) chunks, each starting
    at chunk_idx·stride. A chunk that would be a pure suffix of the
    previous one (entirely overlap, no new tokens) is never emitted.

    Scale: chunking is a narrow per-row transform — token split, one
    ``sequence``/``transform``/``slice`` expression, one explode. No
    shuffle at all; output order and content are deterministic.
    """
    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    # last start index: largest i*stride with i*stride + overlap < n
    # (ensures every chunk carries at least one non-overlap token),
    # except a single chunk at 0 when the doc fits entirely
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1)) / stride)
    starts = F.sequence(F.lit(0), n_chunks.cast("int") - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(max_tokens)).alias("n_tokens"),
        ),
    )
    return (
        docs.filter(n > 0)
        .select(F.col(id_col).alias("doc"), F.explode(chunks).alias("c"))
        .select(
            "doc",
            F.col("c.chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
