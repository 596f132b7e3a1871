"""Referee for c4_line_filter (C4 cleaning, Raffel et al. 2020 §2.2):
a from-scratch pure-Python implementation of the line and document rules
compared with the Spark operator on multi-line fixtures — the gate corpus
is single-line, so the line-granular semantics are certified here.
"""

from __future__ import annotations

import random
import re

import pytest

from ohsome_planet_spark.operators.curation import c4_line_filter


def _ref_c4(
    docs: dict[int, str],
    min_words: int = 5,
    terminal: bool = True,
    min_kept: int = 3,
    doc_markers=("lorem ipsum", "{"),
    line_markers=("javascript",),
):
    out = {}
    for d, text in docs.items():
        lines = text.split("\n")
        kept = []
        for l in lines:  # noqa: E741
            words = [w for w in re.split(r"\s+", l.strip()) if w]
            if len(words) < min_words:
                continue
            if terminal and not re.search(r'[.!?"]$', l.strip()):
                continue
            if any(m in l.lower() for m in line_markers):
                continue
            kept.append(l)
        keep_doc = (
            not any(m in text.lower() for m in doc_markers)
            and len(kept) >= min_kept
        )
        out[d] = (len(lines), len(kept), "\n".join(kept), keep_doc)
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = c4_line_filter(df, "doc_id", "text", **kw).collect()
    return {
        r.doc: (r.n_lines, r.n_kept_lines, r.kept_text, r.keep_doc)
        for r in rows
    }


def test_line_rules(spark):
    docs = {
        1: "This is a fine sentence with enough words in it.\n"
        "too short.\n"
        "No terminal punctuation here even though it is long enough\n"
        "Another good long sentence that ends properly with a period.\n"
        "Enable javascript to view this fancy page please thanks a lot.",
        2: 'A quoted ending line that is long enough to keep here."\n'
        "Second proper sentence of reasonable length for the filter!\n"
        "Third keeper sentence so the document survives the floor?",
    }
    got = _run(spark, docs)
    want = _ref_c4(docs)
    assert got == want
    assert got[1][1] == 2 and got[1][3] is False  # < 3 kept lines
    assert got[2][1] == 3 and got[2][3] is True


def test_doc_markers_drop(spark):
    long = "This sentence is long enough and ends with a period today."
    docs = {
        1: "\n".join([long] * 3) + "\nsome lorem ipsum filler text.",
        2: "\n".join([long] * 3) + '\nvar x = { "a": 1 };',
        3: "\n".join([long] * 3),
    }
    got = _run(spark, docs)
    assert got == _ref_c4(docs)
    assert not got[1][3] and not got[2][3] and got[3][3]


def test_empty_and_whitespace(spark):
    docs = {1: "", 2: "   \n \n  ", 3: "\n\n"}
    assert _run(spark, docs) == _ref_c4(docs)


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_vs_referee(spark, seed):
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "javascript", "lorem", "ipsum", "{x}"]
    ends = [".", "!", "?", '"', "", " "]

    def line():
        return (
            " ".join(rng.choice(words) for _ in range(rng.randint(0, 9)))
            + rng.choice(ends)
        )

    docs = {
        d: "\n".join(line() for _ in range(rng.randint(0, 8)))
        for d in range(25)
    }
    got = _run(spark, docs, min_words_per_line=3, min_kept_lines=2)
    want = _ref_c4(docs, min_words=3, min_kept=2)
    assert got == want
