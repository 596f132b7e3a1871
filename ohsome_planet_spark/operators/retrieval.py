"""BM25 ranked retrieval over a document corpus.

Okapi BM25 (Robertson & Walker, SIGIR'94 — public formula) re-expressed
as a three-relation DataFrame plan:

  1. corpus statistics: ``N`` and average document length — one partial
     aggregation, two scalars, broadcast back via a 1-row crossJoin;
  2. per-term document frequencies for the *query terms only* — the term
     filter is pushed below the explode, so the shuffle carries one row
     per (doc, query-term) hit, never the full posting list;
  3. per-document score: ``sum over query terms of idf(t) * tf*(k1+1) /
     (tf + k1*(1-b+b*dl/avgdl))``, then a top-k.

Everything is native Column expressions (codegen); document frequencies
are dimension-sized (|query terms| rows) and broadcast into the scoring
join. At 100 TB the only wide stage is the (doc, term) partial-count —
map-side combinable, keyed on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under Okapi BM25.

    idf uses the +1-smoothed Robertson form ``ln((N - df + 0.5) /
    (df + 0.5) + 1)`` so scores stay positive even for terms present in
    most documents.
    """
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks").cast("double"))

    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    terms = spark.createDataFrame([(t,) for t in query_terms], "term string")
    # one row per (doc, query-term) occurrence count; non-query terms are
    # filtered before the aggregation shuffle
    tf = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df")
    )

    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(k)
