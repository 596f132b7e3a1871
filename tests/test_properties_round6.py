"""Hypothesis property tests for the round-6 operators.

Each property is the operator's load-bearing guarantee — the thing that
must hold at any scale, not just on the fixtures: packing offsets are an
exact prefix sum under any document mix; Bloom membership never produces
a false negative; CMS never underestimates; HLL ignores multiplicity.
One shared SparkSession, small bounded examples (Spark round-trips are
~100 ms each, so examples are capped to keep the suite fast).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ohsome_planet_spark.functions.text import hash60_expr
from ohsome_planet_spark.operators.bloom import build_bloom, probe_bloom
from ohsome_planet_spark.operators.packing import pack_sequences
from ohsome_planet_spark.operators.sketches import (
    cms_build,
    cms_query,
    hll_estimate,
    hll_registers,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    seq_len=st.integers(min_value=4, max_value=64),
)
def test_packing_prefix_sum_property(spark, lengths, seq_len):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id bigint, text string",
    )
    rows = pack_sequences(docs, seq_len=seq_len, n_shards=3).collect()
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        assert r.start_off == by_shard.get(r.shard, 0)
        by_shard[r.shard] = r.start_off + r.n_tokens
        # a document never spans more boundaries than its token count allows
        assert 0 <= r.n_splits <= max(r.n_tokens - 1, 0) // seq_len + 1
    # token conservation: shard totals sum to the corpus total
    assert sum(by_shard.values()) == sum(lengths)


@settings(**SETTINGS)
@given(
    member=st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=30),
    extra=st.sets(st.text(min_size=1, max_size=8), min_size=0, max_size=30),
)
def test_bloom_no_false_negatives_property(spark, member, extra):
    def hashed(keys):
        return spark.createDataFrame(
            [(k,) for k in keys], "key string"
        ).withColumn("h", hash60_expr(F.col("key")))

    bloom = build_bloom(hashed(member), "h", m=4096, k=3)
    got = {
        r.key: r.maybe_member
        for r in probe_bloom(hashed(member | extra), "h", bloom, m=4096, k=3).collect()
    }
    assert all(got[k] for k in member)


@settings(**SETTINGS)
@given(
    counts=st.dictionaries(
        st.text(min_size=1, max_size=6),
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=20,
    )
)
def test_cms_one_sided_property(spark, counts):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    stream = spark.createDataFrame(rows, "tok string").withColumn(
        "h", hash60_expr(F.col("tok"))
    )
    cms = cms_build(stream, "h", d=3, w=128)
    got = {
        r.tok: r.cms_estimate
        for r in cms_query(
            stream.select("tok", "h").distinct(), "h", cms, d=3, w=128
        ).collect()
    }
    for t, n in counts.items():
        assert got[t] >= n


@settings(**SETTINGS)
@given(
    keys=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
    copies=st.integers(min_value=1, max_value=3),
)
def test_hll_multiplicity_blind_property(spark, keys, copies):
    def df(reps):
        rows = [(k,) for k in keys for _ in range(reps)]
        return spark.createDataFrame(rows, "k bigint").select(
            F.lit("g").alias("g"), hash60_expr(F.col("k").cast("string")).alias("h")
        )

    e1 = hll_estimate(hll_registers(df(1), ["g"], "h", p=6), ["g"], p=6).collect()[0]
    eN = hll_estimate(hll_registers(df(copies), ["g"], "h", p=6), ["g"], p=6).collect()[0]
    assert e1.hll_estimate == eN.hll_estimate
