"""SQL-first queryability contract for the written contributions dataset.

The reference delegates analysis to DuckDB over the produced GeoParquet
(``docs/useful_queries.md``); the Spark-native equivalent is a pair of
temp views over the same files, so those documented queries run as
``spark.sql`` with only dialect-level changes (``unnest``→``inline``,
``map_contains_entry(tags,k,v)``→``tags[k] = v``):

    register_contribution_views(spark, "/data/contributions")
    spark.sql("SELECT ... FROM contributions WHERE valid_from <= ...")
    spark.sql("SELECT ... FROM contributions_latest WHERE osm_type = 'relation'")

``contributions`` spans latest+history; ``contributions_latest`` prunes
to the latest layer — via the hive ``layer`` partition when the dataset
was written with ``split_latest`` (partition pruning, no file even
opened), else via the valid_to sentinel predicate (parquet row-group
pushdown on the timestamp column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geoparquet import VALID_TO_SENTINEL


def register_contribution_views(
    spark: SparkSession, path: str, name: str = "contributions"
) -> DataFrame:
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    if "layer" in df.columns:
        latest = df.filter(F.col("layer") == "latest")
    else:
        latest = df.filter(F.col("valid_to") == F.lit(VALID_TO_SENTINEL))
    latest.createOrReplaceTempView(f"{name}_latest")
    return df
