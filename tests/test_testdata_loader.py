"""Environment-drift regression guards for the benchmark-table loader.

Round-5 lesson: a Spark-side change in parquet timestamp inference
(TIMESTAMP_NTZ) broke a query that had been green for four rounds. The
loader now normalizes session timezone + timestamp types itself; these
tests pin that contract under deliberately hostile session configs the
driver might hand us."""

from pyspark.sql import functions as F

from ohsome_planet_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_loader_normalizes_hostile_session(spark):
    before_tz = spark.conf.get("spark.sql.session.timeZone", None)
    before_ntz = spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled", None
    )
    try:
        # a driver-built session in another timezone with NTZ inference on
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        ev = load_table(spark, SF, "events")
        # every timestamp column must come back as plain TIMESTAMP (LTZ),
        # never TIMESTAMP_NTZ
        for f in ev.schema.fields:
            assert f.dataType.typeName() != "timestamp_ntz", f.name
        # the session is pinned back to UTC so literals match the oracles
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # the round-5 failure shape: epoch arithmetic on ts must plan
        ev.select(F.col("ts").cast("double")).limit(1).collect()
        # and the nanosecond→microsecond rebuild stays exact
        row = ev.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
        assert row["lo"].year >= 2020 and row["hi"].year <= 2030
    finally:
        if before_tz is not None:
            spark.conf.set("spark.sql.session.timeZone", before_tz)
        if before_ntz is not None:
            spark.conf.set(
                "spark.sql.parquet.inferTimestampNTZ.enabled", before_ntz
            )


def test_loader_keeps_pushdown(spark):
    """The timestamp rebuild is a thin projection: predicate pushdown and
    column pruning still reach the parquet scan through it."""
    ev = load_table(spark, SF, "events")
    q = ev.filter(F.col("event_id") < 100).select("event_id", "user_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    assert "PushedFilters: [" in scan and "event_id" in scan.split("PushedFilters")[1]
    assert "props" not in scan  # unused wide column pruned
