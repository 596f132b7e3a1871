"""Independent referee for exact_substr_dedup (ExactSubstr removal,
Lee et al. 2022 §4.1): a from-scratch pure-Python implementation of the
same policy — positional n-gram spans duplicated across >= min_docs
distinct documents, every occurrence removed, overlapping/adjacent spans
merged to maximal intervals — compared row-for-row with the Spark
operator on hand-built and randomized corpora. The referee shares no
code with the operator (no tokens_expr/hash60: it uses re + dict
counting), closing the co-authored-oracle gap for this operator.
"""

from __future__ import annotations

import re
import random

import pytest

from ohsome_planet_spark.operators.dedup import exact_substr_dedup


def _ref_exact_substr(docs: dict[int, str], n: int, min_docs: int):
    toks = {
        d: [t for t in re.split(r"\W+", text.lower()) if t]
        for d, text in docs.items()
    }
    span_docs: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            span_docs.setdefault(tuple(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        starts = [
            i
            for i in range(len(ts) - n + 1)
            if len(span_docs[tuple(ts[i : i + n])]) >= min_docs
        ]
        covered = set()
        for i in starts:
            covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _run_operator(spark, docs: dict[int, str], n: int, min_docs: int):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = exact_substr_dedup(df, "doc_id", "text", n=n, min_docs=min_docs).collect()
    return {r.doc: (r.n_tokens, r.n_removed, r.dedup_text) for r in rows}


def _check(spark, docs, n=4, min_docs=2):
    got = _run_operator(spark, docs, n, min_docs)
    want = _ref_exact_substr(docs, n, min_docs)
    assert got == want


def test_planted_shared_passage(spark):
    boiler = "alpha beta gamma delta epsilon zeta"
    docs = {
        1: f"one two three {boiler} four five six",
        2: f"seven eight {boiler} nine ten eleven twelve",
        3: "completely unrelated words here nothing shared at all",
    }
    got = _run_operator(spark, docs, 4, 2)
    want = _ref_exact_substr(docs, 4, 2)
    assert got == want
    # the shared 6-token passage is cut from both carriers as ONE island
    assert got[1][1] == 6 and got[2][1] == 6
    assert "alpha" not in got[1][2] and "zeta" not in got[2][2]
    assert got[3][1] == 0


def test_overlapping_islands_merge(spark):
    # two duplicated 4-gram families overlapping by 2 tokens in doc 1:
    # removal must be the union range, not double-counted
    docs = {
        1: "p q a b c d e f r s",
        2: "x a b c d y",
        3: "z c d e f w",
    }
    _check(spark, docs, n=4, min_docs=2)


def test_adjacent_spans_single_island(spark):
    shared = "a b c d e f g h"  # every 4-gram inside is shared
    docs = {1: f"left {shared} right", 2: shared}
    got = _run_operator(spark, docs, 4, 2)
    assert got[1] == _ref_exact_substr(docs, 4, 2)[1]
    assert got[1][1] == 8  # one maximal island, full shared run
    assert got[1][2] == "left right"


def test_full_removal_and_short_docs(spark):
    docs = {
        1: "a b c d",  # exactly n tokens, fully duplicated
        2: "a b c d",
        3: "x y",  # shorter than n: no spans, untouched
        4: "",  # empty
    }
    got = _run_operator(spark, docs, 4, 2)
    want = _ref_exact_substr(docs, 4, 2)
    assert got == want
    assert got[1] == (4, 4, "")
    assert got[3] == (2, 0, "x y")
    assert got[4] == (0, 0, "")


def test_within_doc_repeat_not_cut(spark):
    # policy: duplication is cross-document (min_docs distinct docs);
    # a span repeated twice WITHIN one doc only does not trigger removal
    docs = {1: "a b c d x a b c d", 2: "totally different words here now"}
    got = _run_operator(spark, docs, 4, 2)
    assert got[1][1] == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_vs_referee(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for d in range(20)
    }
    _check(spark, docs, n=3, min_docs=2)


def test_curate_funnel_integration(spark, tmp_path):
    """exact_substr_n in the curation funnel: the boilerplate passage is
    cut from the WRITTEN text, and without it the two carrier docs
    become exact duplicates that the dedup stage then catches."""
    from ohsome_planet_spark.operators.curation import curate

    boiler = " ".join(f"b{i}" for i in range(10))
    body = " ".join(f"w{i}" for i in range(30))
    keeper = (
        "the cat and the dog are in the house with a friend and they "
        "stay for the day and this is a fine plain sentence to keep"
    )
    docs = spark.createDataFrame(
        [
            (1, f"{body} {boiler}"),
            (2, f"{body} {boiler}"),
            (3, keeper),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "curated")
    report = curate(
        docs, out, exact_substr_n=4,
        min_quality=0.0, min_tokens=1, max_tokens=10_000,
        max_punct=1.0, max_dup_token_frac=1.0,
    )
    # both the boilerplate AND the shared body are cross-doc duplicated
    # spans -> docs 1/2 collapse to empty text and become exact dups
    # (one flagged); only the untouched English doc survives quality
    assert report["total"] == 3 and report["exact_dups"] == 1
    assert report["kept"] == 1
    back = spark.read.parquet(out)
    texts = {r.doc_id: r.text for r in back.collect()}
    assert set(texts) == {3} and texts[3] == keeper


# --- exact_substr_rewrite (original-text cuts, ADVICE round 10) ------------


def test_rewrite_preserves_untouched_docs_byte_for_byte(spark):
    from ohsome_planet_spark.operators.dedup import exact_substr_rewrite

    dup = "the quick brown fox jumps over the lazy dog"
    originals = [
        "No Duplicates HERE: punctuation! (and CASING) survive -- 100%.",
        f"Lead-in, THEN {dup}; trailing tail.",
        f"Second copy: {dup} -- end.",
    ]
    df = spark.createDataFrame(
        list(enumerate(originals)), "doc_id long, text string"
    )
    out = {
        r.doc: r
        for r in exact_substr_rewrite(df, "doc_id", "text", n=8).collect()
    }
    # untouched doc: BYTE-identical original (the old normalized-space
    # rewrite lowercased and stripped it)
    assert out[0].text == originals[0] and out[0].n_removed == 0
    # cut docs keep their casing/punctuation outside the cut span, and
    # the separators BORDERING the cut survive
    assert out[1].text == "Lead-in, THEN ; trailing tail."
    assert out[2].text == "Second copy:  -- end."
    assert out[1].n_removed == 9 and out[2].n_removed == 9


def test_rewrite_differential_vs_dedup_tokens(spark):
    """Independent cross-check: lowercased tokens of the rewrite output
    must equal exact_substr_dedup's dedup_text tokens on every doc (the
    two operators share island semantics, differ only in output space)."""
    import re as _re

    from ohsome_planet_spark.operators.dedup import exact_substr_rewrite

    rng = random.Random(0xE5)
    words = ["alpha", "Bravo", "charlie", "DELTA", "echo", "fox", "golf"]
    boiler = "SHARED boiler plate chunk run sequence block nine ten"
    docs = []
    for d in range(40):
        toks = [rng.choice(words) for _ in range(rng.randrange(0, 30))]
        if d % 3 == 0:
            pos = rng.randrange(0, len(toks) + 1)
            toks = toks[:pos] + boiler.split() + toks[pos:]
        sep = lambda: rng.choice([" ", ", ", "! ", " -- ", "  "])  # noqa: E731
        text = "".join(t + sep() for t in toks)
        docs.append((d, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rw = {
        r.doc: r
        for r in exact_substr_rewrite(df, "doc_id", "text", n=4).collect()
    }
    dd = {
        r.doc: r
        for r in exact_substr_dedup(df, "doc_id", "text", n=4).collect()
    }
    for d, _ in docs:
        got = [t for t in _re.split(r"\W+", rw[d].text.lower()) if t]
        want = [t for t in dd[d].dedup_text.split(" ") if t]
        assert got == want, (d, got, want)
        assert rw[d].n_tokens == dd[d].n_tokens
        assert rw[d].n_removed == dd[d].n_removed


def test_curate_rewrite_keeps_punctuation_for_quality_gate(spark, tmp_path):
    """The ADVICE bug: curate(exact_substr_n=...) used to replace EVERY
    doc's text with the normalized join, zeroing punct_ratio corpus-wide.
    Now untouched docs flow through byte-identical and a high-punct doc
    still fails the punctuation gate."""
    from ohsome_planet_spark.operators.curation import curate

    good = "This is a perfectly normal sentence with modest punctuation."
    punchy = "w!!! h??? a!!! t??? i!!! s!!! t!!! h!!! i!!! s!!!"
    docs = spark.createDataFrame(
        [(1, good), (2, punchy)], "doc_id long, text string"
    )
    out = str(tmp_path / "curated2")
    report = curate(
        docs, out, exact_substr_n=4,
        min_quality=0.0, min_tokens=1, max_tokens=10_000,
        max_punct=0.3, max_dup_token_frac=1.0,
    )
    assert report["fail_quality"] == 1 and report["kept"] == 1
    back = spark.read.parquet(out)
    texts = {r.doc_id: r.text for r in back.collect()}
    assert texts == {1: good}  # byte-identical, punctuation intact


# --- CCNet line dedup -------------------------------------------------------


def test_line_dedup_first_occurrence_and_normalization(spark):
    from ohsome_planet_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "Unique alpha.\nSubscribe NOW!\n\nBody one."),
            (2, "Body two.\nsubscribe   now!\nUnique beta."),
            (3, "Page 3 of 10\nUnique gamma."),
            (4, "Page 7 of 99\nUnique delta.\n\n"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in line_dedup(docs, "doc_id", "text").collect()}
    # first occurrence (min doc, pos) wins; normalization folds case and
    # whitespace runs, so doc 2's variant drops
    assert out[1].text == "Unique alpha.\nSubscribe NOW!\n\nBody one."
    assert out[2].text == "Body two.\nUnique beta."
    assert out[2].n_lines == 3 and out[2].n_kept == 2
    # digit runs normalize to '0': 'Page 3 of 10' == 'Page 7 of 99'
    assert out[3].text == "Page 3 of 10\nUnique gamma."
    assert out[4].text == "Unique delta.\n\n"
    # trailing "\n\n" splits into TWO empty lines: 4 lines total, the
    # duplicated 'Page N of M' dropped, both empties kept
    assert out[4].n_lines == 4 and out[4].n_kept == 3
    # blank lines always survive (doc 1 keeps its empty line; doc 4
    # keeps both trailing empties); empty doc passes through
    assert out[5].text == "" and out[5].n_lines == 1 and out[5].n_kept == 1


def test_line_dedup_within_doc_repeats(spark):
    from ohsome_planet_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(7, "same line\nsame line\nsame line\nother")],
        "doc_id long, text string",
    )
    r = line_dedup(docs, "doc_id", "text").collect()[0]
    # global first-occurrence applies WITHIN a doc too (CCNet hashes the
    # whole corpus's paragraphs into one table)
    assert r.text == "same line\nother"
    assert r.n_lines == 4 and r.n_kept == 2


def test_line_dedup_huge_doc_ids(spark):
    """ADVICE r11: the old packed order key (doc*2^20+pos) overflowed /
    collided for hash-derived doc ids >= ~2^43. The struct-min key must
    pick the true minimum (doc, pos) winner at any id magnitude."""
    from ohsome_planet_spark.operators.dedup import line_dedup

    hi, lo = (1 << 50) + 7, (1 << 50) + 3
    docs = spark.createDataFrame(
        [(hi, "shared line\nonly hi"), (lo, "shared line\nonly lo")],
        "doc_id bigint, text string",
    )
    out = {r.doc: r for r in line_dedup(docs, "doc_id", "text").collect()}
    assert out[lo].n_kept == 2 and out[lo].text == "shared line\nonly lo"
    assert out[hi].n_kept == 1 and out[hi].text == "only hi"
