"""Operator-level checks for normalize_unicode (the gate row's NFC
column is refereed by DuckDB's ICU nfc_normalize; here: known UCD
mappings, idempotence, and null handling through the seam)."""

from __future__ import annotations

import unicodedata

from ohsome_planet_spark.operators.curation import normalize_unicode


def test_known_mappings_and_nulls(spark):
    rows = [
        (1, "café"),  # combining acute -> composed
        (2, "ﬁle ①"),  # ligature + circled digit (NFKC only)
        (3, "Ångström"),  # angstrom sign + combining diaeresis
        (4, "plain ascii"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.nfc_text, r.nfkc_text)
        for r in normalize_unicode(df, "text").collect()
    }
    assert got[1] == ("café", "café")
    assert got[2] == ("ﬁle ①", "file 1")
    assert got[3] == ("Ångström", "Ångström")
    assert got[4] == ("plain ascii", "plain ascii")
    assert got[5] == (None, None)
    # idempotence: normalizing the normalized output is the identity
    for doc_id, (nfc, _) in got.items():
        if nfc is not None:
            assert unicodedata.normalize("NFC", nfc) == nfc
