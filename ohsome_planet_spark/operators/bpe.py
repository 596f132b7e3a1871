"""Distributed byte-pair-encoding (BPE) merge training.

Sennrich, Haddow & Birch 2016 (public algorithm): start from characters,
repeatedly merge the most frequent adjacent symbol pair. Tokenizer
training is part of the training-data pipeline, and the classic
implementation is a single-machine loop over a word-frequency dict; the
Spark shape here scales each round to an arbitrary corpus:

- the word-frequency table is built once (one shuffle, map-side combined
  — at 100 TB the distinct-word table is orders of magnitude smaller
  than the corpus);
- a round's pair counting is a map-side-combinable aggregation over
  exploded adjacent pairs, so the exchange carries one row per distinct
  (pair) per partition, not per occurrence;
- the argmax pair is a 1-row sort-limit (deterministic count-desc, then
  lexicographic tiebreak) — the only driver-sized data movement;
- the merge itself is a native fold (`F.aggregate`) over each word's
  symbol array — leftmost-greedy, the reference semantics — executed
  map-only, no Python;
- per-round lineage truncation keeps plan depth O(1) per round (same
  discipline as k-means / connected components / PageRank here).

SentencePiece-style: no end-of-word marker (documented divergence from
the original paper's `</w>`; merges never cross word boundaries because
words are the unit of the symbol arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import truncate_lineage

__all__ = ["word_freqs", "bpe_train"]


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercase ``\\W+`` tokens — the corpus summary
    every BPE round runs against."""
    from ..functions.text import tokens_expr

    return (
        docs.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_expr(symbols, left: str, right: str):
    """Leftmost-greedy single-pass merge of adjacent (left, right) in a
    symbol array, as a native fold. Overlapping matches (only possible
    when left == right, e.g. 'aaa' for pair (a,a)) resolve left-first:
    [a,a,a] -> [aa, a]."""
    merged = F.lit(left + right)

    # No re-merge flag is needed: a freshly-merged element equals
    # left+right, and merging it again would require left == left+right —
    # impossible for non-empty right. Value comparison alone is safe.
    def step(acc, x):
        can_merge = (F.element_at(acc, -1) == left) & (x == F.lit(right))
        return F.when(
            (F.size(acc) > 0) & can_merge,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


def bpe_train(words: DataFrame, rounds: int = 3) -> list[dict]:
    """Run ``rounds`` BPE merges; return one record per round:
    ``{round, left, right, pair_count, n_symbols_after}``.

    ``n_symbols_after`` is the corpus-weighted symbol total — a strong
    checksum that the merge rewrote every occurrence.
    """
    return bpe_train_with_symbols(words, rounds)[0]


def bpe_train_with_symbols(
    words: DataFrame, rounds: int = 3
) -> tuple[list[dict], DataFrame]:
    """:func:`bpe_train` plus the trained vocabulary's symbol table —
    (word, freq, symbols) after all merges. The symbol table IS the
    tokenizer: encoding a corpus is a broadcast join of its word stream
    against this vocab-sized frame (see ``bpe_encode_stats``)."""
    spark = words.sparkSession
    syms = words.select(
        "word",
        "freq",
        F.split(F.col("word"), "(?!$)").alias("symbols"),
    )
    # Spark's split with the lookahead pattern yields chars without a
    # trailing empty string; guard anyway (defensive against engine drift)
    syms = syms.withColumn(
        "symbols", F.filter(F.col("symbols"), lambda s: s != "")
    )
    out: list[dict] = []
    for rnd in range(1, rounds + 1):
        pairs = (
            syms.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("left"), F.asc("right")
        ).limit(1).collect()
        if not best:
            break
        b = best[0]
        syms = truncate_lineage(
            syms.withColumn(
                "symbols", _merge_expr(F.col("symbols"), b.left, b.right)
            ),
            eager=True,
        )
        n_after = syms.agg(
            F.sum(F.col("freq") * F.size("symbols")).alias("n")
        ).first()[0]
        out.append(
            {
                "round": rnd,
                "left": b.left,
                "right": b.right,
                "pair_count": int(b.pair_count),
                "n_symbols_after": int(n_after),
            }
        )
    return out, syms
