"""Salted-join skew handling: result equivalence with the plain join and
the expected physical shape (dimension replicated, fact salted)."""

from pyspark.sql import functions as F

from ohsome_planet_spark.operators.skew import replicate_salted, salted_join, with_salt


def _skewed(spark):
    # 20k rows, 90% on one hot key
    fact = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, ["k"], "inner").groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, ["k"], n_salt=8, how="inner").groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_left_join_unmatched_rows_survive(spark):
    fact, _ = _skewed(spark)
    dim = spark.createDataFrame([(7, "only-hot")], "k bigint, name string")
    out = salted_join(fact, dim, ["k"], n_salt=4, how="left")
    plain = fact.join(dim, ["k"], "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("name").isNull()).count() == plain.filter(
        F.col("name").isNull()
    ).count()


def test_salt_spreads_hot_key(spark):
    fact, _ = _skewed(spark)
    n = 8
    salts = (
        with_salt(fact.filter(F.col("k") == 7), ["k"], n)
        .select("_salt").distinct().count()
    )
    assert salts == n  # the hot key occupies every sub-key


def test_dim_replication_is_exact(spark):
    _, dim = _skewed(spark)
    rep = replicate_salted(dim, 5)
    assert rep.count() == dim.count() * 5
    assert rep.select("_salt").distinct().count() == 5


def test_salted_join_with_map_columns(spark):
    """Map-typed columns (tag maps) can't be hashed by Spark; the salt
    must derive from the hashable columns only."""
    fact = spark.createDataFrame(
        [(7, {"k": "v"}, i) for i in range(50)], "k bigint, tags map<string,string>, v bigint"
    )
    dim = spark.createDataFrame([(7, "hot")], "k bigint, name string")
    out = salted_join(fact, dim, ["k"], n_salt=4)
    assert out.count() == 50
    assert out.columns == ["k", "tags", "v", "name"]
