"""HyperLogLog sketch: accuracy, branch coverage, mergeability."""

from pyspark.sql import functions as F

from ohsome_planet_spark.functions.text import hash60_expr
from ohsome_planet_spark.operators.sketches import hll_estimate, hll_registers

P = 8
M = 1 << P


def _hashed(spark, n, grp="g"):
    return (
        spark.range(n)
        .select(
            F.lit(grp).alias("g"),
            hash60_expr(F.concat(F.lit(f"{grp}:"), F.col("id").cast("string"))).alias("h"),
        )
    )


def test_hll_large_range_accuracy(spark):
    # n >> 2.5*m exercises the raw-estimate branch; standard error for
    # m=256 is ~1.04/sqrt(m) ≈ 6.5%, so 25% is a generous determinism-safe
    # bound that still catches any structural bug
    n = 20000
    df = _hashed(spark, n)
    est = hll_estimate(hll_registers(df, ["g"], "h", p=P), ["g"], p=P).collect()[0]
    assert abs(est.hll_estimate - n) / n < 0.25
    assert est.n_registers <= M


def test_hll_small_range_linear_counting(spark):
    n = 30  # far below 2.5*m -> linear counting branch
    df = _hashed(spark, n, grp="s")
    est = hll_estimate(hll_registers(df, ["g"], "h", p=P), ["g"], p=P).collect()[0]
    # with 30 keys in 256 buckets collisions are rare: estimate ≈ exact
    assert abs(est.hll_estimate - n) < 5


def test_hll_registers_merge_by_max(spark):
    a = _hashed(spark, 500, grp="m")
    b = (
        spark.range(250, 750)  # overlapping second half
        .select(
            F.lit("m").alias("g"),
            hash60_expr(F.concat(F.lit("m:"), F.col("id").cast("string"))).alias("h"),
        )
    )
    union_regs = hll_registers(a.unionByName(b), ["g"], "h", p=P)
    merged = (
        hll_registers(a, ["g"], "h", p=P)
        .unionByName(hll_registers(b, ["g"], "h", p=P))
        .groupBy("g", "bucket")
        .agg(F.max("register").alias("register"))
    )
    u = {(r.bucket): r.register for r in union_regs.collect()}
    m = {(r.bucket): r.register for r in merged.collect()}
    assert u == m  # the pre-aggregated-rollup property


def test_hll_duplicates_invariant(spark):
    base = _hashed(spark, 100, grp="d")
    dup = base.unionByName(base).unionByName(base)
    e1 = hll_estimate(hll_registers(base, ["g"], "h", p=P), ["g"], p=P).collect()[0]
    e3 = hll_estimate(hll_registers(dup, ["g"], "h", p=P), ["g"], p=P).collect()[0]
    assert e1.hll_estimate == e3.hll_estimate  # multiplicity-blind


# --- Count-Min sketch --------------------------------------------------------

from ohsome_planet_spark.operators.sketches import cms_build, cms_query


def _tok_stream(spark, counts):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return (
        spark.createDataFrame(rows, "tok string")
        .withColumn("h", hash60_expr(F.col("tok")))
    )


def test_cms_never_underestimates(spark):
    counts = {f"t{i}": (i % 10) + 1 for i in range(300)}
    stream = _tok_stream(spark, counts)
    cms = cms_build(stream, "h", d=4, w=256)
    keys = stream.select("tok", "h").distinct()
    got = {r.tok: r.cms_estimate for r in cms_query(keys, "h", cms, d=4, w=256).collect()}
    for t, n in counts.items():
        assert got[t] >= n, t  # the one-sided CMS guarantee


def test_cms_exact_when_sparse(spark):
    counts = {"a": 7, "b": 3, "c": 11}
    stream = _tok_stream(spark, counts)
    cms = cms_build(stream, "h", d=4, w=1024)
    keys = stream.select("tok", "h").distinct()
    got = {r.tok: r.cms_estimate for r in cms_query(keys, "h", cms, d=4, w=1024).collect()}
    # 3 keys in 4×1024 cells: collision-free, estimates exact
    assert got == counts


def test_cms_absent_key_zero_when_empty_cells(spark):
    cms = cms_build(_tok_stream(spark, {"x": 5}), "h", d=4, w=1024)
    assert cms.count() <= 4
    probe = _tok_stream(spark, {"never-seen": 1}).distinct()
    got = cms_query(probe, "h", cms, d=4, w=1024).collect()[0]
    assert got.cms_estimate == 0  # all 4 cells empty for this key


def test_cms_query_preserves_duplicate_key_rows(spark):
    """Round-6 ADVICE: estimates are joined back to the input frame, so
    duplicate probe rows each get their own output row."""
    from ohsome_planet_spark.functions.text import hash60_expr
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "tok string")
    keys = df.withColumn("h", hash60_expr(F.col("tok")))
    cms = cms_build(keys, "h", d=4, w=256)
    out = cms_query(keys, "h", cms, d=4, w=256).collect()
    assert len(out) == 3
    xs = [r for r in out if r.tok == "x"]
    assert len(xs) == 2 and all(r.cms_estimate >= 2 for r in xs)
