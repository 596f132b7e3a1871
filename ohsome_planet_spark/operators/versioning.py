"""Dataset snapshot diffing: added / removed / changed / unchanged rows
between two versions of a corpus.

Training datasets are rebuilt from recurring crawls; the per-release
changelog (what entered, what left, what changed content) is a standard
curation artifact. Relationally it is one full-outer join on the id with
a content-hash comparison — a single shuffle keyed on the id, with the
hash computed map-side so the exchange carries (id, hash), never the
payload. When both versions live as bucketed tables on the same key the
join is shuffle-free (``sources/state_tables.py`` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60_expr

__all__ = ["dataset_diff", "diff_summary"]


def dataset_diff(
    v1: DataFrame,
    v2: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """One row per id present in either version, with its diff status.

    Only (id, content-hash) pairs cross the wire; the payload column
    never shuffles.
    """
    a = v1.select(
        F.col(id_col).alias("id"), hash60_expr(F.col(content_col)).alias("h1")
    )
    b = v2.select(
        F.col(id_col).alias("id"), hash60_expr(F.col(content_col)).alias("h2")
    )
    joined = a.join(b, "id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") == F.col("h2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("id").alias(id_col), status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """Status → row count, the one-line release report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
