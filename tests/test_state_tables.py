"""Bucketed state-table tests: the co-located join drops its shuffle."""

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.sources.state_tables import (
    join_is_shuffle_free,
    read_state,
    write_bucketed,
)


def test_bucketed_join_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        a = spark.range(0, 10000).select(
            F.col("id").alias("osm_id"), (F.col("id") * 2).alias("v")
        )
        b = spark.range(0, 10000).select(
            F.col("id").alias("osm_id"), (F.col("id") * 3).alias("w")
        )
        write_bucketed(a, "state_a", n_buckets=8, path=str(tmp_path / "a"))
        write_bucketed(b, "state_b", n_buckets=8, path=str(tmp_path / "b"))

        ta, tb = read_state(spark, "state_a"), read_state(spark, "state_b")
        joined = ta.join(tb, "osm_id")
        assert joined.count() == 10000
        assert join_is_shuffle_free(joined), joined._jdf.queryExecution().executedPlan().toString()[:2000]

        # contrast: the same join on unbucketed frames shuffles both sides
        plain = a.join(b, "osm_id")
        assert not join_is_shuffle_free(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS state_a")
        spark.sql("DROP TABLE IF EXISTS state_b")
