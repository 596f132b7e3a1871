"""Independent referee for ccnet_lm_filter (round-11 verdict item 3):
the DuckDB oracle replays the same relational plan, so these tests
re-derive the expected numbers a THIRD way — a pure-Python dict bigram
LM computed by hand — plus planted-evidence properties (gibberish →
tail, bucket thirds exact, cutoff-mode/rank-mode agreement on keep
direction)."""

import math

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.operators.curation import ccnet_lm_filter

K = 0.5


def _hand_lm(train_docs):
    """dict-based add-k bigram LM over paragraph-wise token streams."""
    c2, c1, vocab = {}, {}, set()
    for text in train_docs:
        for para in text.split("\n"):
            toks = [t for t in __import__("re").split(r"\W+", para.lower()) if t]
            for a, b in zip(toks, toks[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
                vocab.add(b)
    return c2, c1, len(vocab)


def _hand_score(text, c2, c1, v):
    s, n = 0.0, 0
    for para in text.split("\n"):
        toks = [t for t in __import__("re").split(r"\W+", para.lower()) if t]
        for a, b in zip(toks, toks[1:]):
            s += -math.log((c2.get((a, b), 0) + K) / (c1.get(a, 0) + K * v))
            n += 1
    return n, s


@pytest.fixture(scope="module")
def tiny(spark):
    # doc ids chosen so hash60(id:':split')%100 puts most in train; the
    # operator's split is deterministic, so the referee recomputes it
    # with the same hash instead of guessing
    rows = [
        (i, "en", t)
        for i, t in enumerate(
            [
                "the cat sat on the mat\nthe dog sat on the mat",
                "the cat ran to the house",
                "a dog and a cat and a bird",
                "zq wv qq kjw zzkrp unseen gibberish tokens",
                "the the the of of and",
                "the bird sat on the house",
                "cats chase birds\ndogs chase cats",
                "the mat was flat",
            ]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = ccnet_lm_filter(df).orderBy("doc").toPandas()
    # recover the split the operator used (same md5-based hash)
    import hashlib

    def is_train(doc):
        h = int(hashlib.md5(f"{doc}:split".encode()).hexdigest()[:15], 16)
        return h % 100 < 80
    train = [t for (i, _, t) in rows if is_train(i)]
    return rows, out, train


def test_scores_match_hand_computed_lm(tiny):
    rows, out, train = tiny
    c2, c1, v = _hand_lm(train)
    for i, _, text in rows:
        n, s = _hand_score(text, c2, c1, v)
        got = out[out.doc == i].iloc[0]
        assert got.n_bigrams == n
        if n:
            assert got.log_ppl == pytest.approx(round(s / n, 6), abs=1e-9)
            assert got.ppl == pytest.approx(
                round(math.exp(round(s / n, 6)), 4), abs=1e-6
            )
        else:
            assert got.bucket == "tail" and not got.keep


def test_bucket_thirds_exact(tiny):
    _, out, _ = tiny
    scored = out[out.log_ppl.notna()]
    sizes = scored.groupby("bucket").size()
    # ntile: bucket sizes differ by at most 1, ordered head >= middle >= tail
    assert sizes.max() - sizes.min() <= 1
    # heads have the LOWEST perplexity
    assert scored[scored.bucket == "head"].log_ppl.max() <= (
        scored[scored.bucket == "tail"].log_ppl.min()
    )


def test_gibberish_lands_in_tail(spark):
    rows = [(i, "en", "the cat sat on the mat and the dog ran") for i in range(30)]
    rows.append((99, "en", "zq wv qq kjw zzkrp mxp vvq jjw"))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = ccnet_lm_filter(df).filter(F.col("doc") == 99).first()
    assert out.bucket == "tail" and not out.keep


def test_cutoff_mode_agrees_on_extremes(spark):
    """The percentile-cutoff scale path need not match ntile membership
    at the boundary, but the planted extremes (gibberish worst, repeated
    boilerplate best) must land in the same buckets both ways."""
    rows = [
        (i, "en", f"the cat number {i} sat on the mat while the dog ran home")
        for i in range(40)
    ]
    # 98: only high-frequency training bigrams (drops the per-doc unique
    # "number {i}" bigrams every train doc carries) -> best score; note
    # "the the"-style soup would NOT work: an unseen bigram with a
    # frequent prefix (big c1) scores WORSE than pure gibberish (c1=0)
    rows.append((98, "en", "the cat sat on the mat while the dog ran home"))
    rows.append((99, "en", "zq wv qq kjw zzkrp mxp vvq jjw"))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    for mode in ("rank", "cutoff"):
        got = {
            r.doc: r.bucket
            for r in ccnet_lm_filter(df, bucket_mode=mode)
            .filter(F.col("doc").isin(98, 99))
            .collect()
        }
        assert got[99] == "tail", mode
        assert got[98] == "head", mode


def test_language_isolation(spark):
    """A bigram frequent in lang A must not lower perplexity in lang B:
    the LM is per-language by construction."""
    rows = [(i, "en", "alpha beta alpha beta alpha beta") for i in range(12)]
    # same text, different language tag, plus in-language neighbors so
    # the 'xx' LM trains on OTHER bigrams only
    rows += [(100 + i, "xx", "gamma delta gamma delta") for i in range(12)]
    rows.append((200, "xx", "alpha beta alpha beta alpha beta"))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r.doc: r for r in ccnet_lm_filter(df).collect()}
    # doc 200's bigrams are unseen in the xx LM -> strictly worse score
    # than the xx natives, and worse than the identical text scored in en
    assert out[200].log_ppl > out[100].log_ppl
    assert out[200].log_ppl > out[0].log_ppl


def test_cutoff_mode_plan_has_no_window(spark):
    """The scale path's plan contract: percentile cutoffs broadcast back,
    NO window operator anywhere (rank mode's ntile sort is the exact
    gate path, not the 100-TB shape)."""
    rows = [(i, "en", "the cat sat on the mat") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = ccnet_lm_filter(df, bucket_mode="cutoff")
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan
