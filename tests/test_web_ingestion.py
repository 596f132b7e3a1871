"""Referees for the web-ingestion family (sources/warc.py,
functions/html.py, operators/web.py): WARC framing by Content-Length
only, multi-member gzip, HTTP envelope stripping, and an adversarial
HTML corpus with hand-written expected extractions (the gate corpus is
template-generated, so the parser's hard cases are certified here).
"""

from __future__ import annotations

import gzip
import io

import pytest

from ohsome_planet_spark.functions.html import html_to_text
from ohsome_planet_spark.sources.warc import (
    WarcFormatError,
    encode_warc,
    http_response_body,
    http_response_wrap,
    parse_warc,
)


def test_content_length_framing_not_separator_scan():
    # a payload CONTAINING the record separator and a fake version line:
    # only Content-Length framing survives this
    evil = b"\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    recs = [
        {"warc_type": "resource", "payload": evil},
        {"warc_type": "metadata", "payload": b"after"},
    ]
    out = parse_warc(encode_warc(recs))
    assert len(out) == 2
    assert out[0]["payload"] == evil
    assert out[1]["warc_type"] == "metadata"
    assert out[1]["payload"] == b"after"


def test_multi_member_gzip():
    recs = [
        {"warc_type": "warcinfo", "payload": b"a"},
        {"warc_type": "resource", "payload": b"b" * 5000},
        {"warc_type": "metadata", "payload": b""},
    ]
    data = encode_warc(recs, gzip_records=True)
    # really three independent gzip members (zlib member-by-member;
    # GzipFile would transparently concatenate them)
    import zlib

    members = 0
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        d.decompress(rest)
        assert d.eof
        rest = d.unused_data
        members += 1
    assert members == 3
    out = parse_warc(data)
    assert [r["warc_type"] for r in out] == ["warcinfo", "resource", "metadata"]
    assert out[1]["content_length"] == 5000
    # plain and gzipped forms parse identically
    assert [r["payload"] for r in out] == [
        r["payload"] for r in parse_warc(encode_warc(recs))
    ]


def test_warc_headers_case_insensitive_and_fields():
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"WARC-TARGET-URI: http://x/y\r\n"
        b"CONTENT-LENGTH: 4\r\n"
        b"\r\nbody\r\n\r\n"
    )
    (r,) = parse_warc(raw)
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://x/y"
    assert r["payload"] == b"body"


def test_corrupt_warc_rejection():
    with pytest.raises(WarcFormatError):
        parse_warc(b"WARC/9.9\r\n\r\n")
    with pytest.raises(WarcFormatError):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")  # no Content-Length
    good = encode_warc([{"warc_type": "resource", "payload": b"abcdef"}])
    with pytest.raises(WarcFormatError):
        parse_warc(good[:-12])  # payload truncated
    data = encode_warc([{"warc_type": "resource", "payload": b"x"}],
                       gzip_records=True)
    with pytest.raises(WarcFormatError):
        parse_warc(data + b"JUNK")  # garbage between members


def test_http_envelope():
    body = b"<html><body><p>hi</p></body></html>"
    wrapped = http_response_wrap(body)
    assert http_response_body(wrapped) == body
    with pytest.raises(WarcFormatError):
        http_response_body(b"not an http response")


def test_http_envelope_invariance_property():
    """The framing must be invisible: randomized bodies through every
    envelope form (plain / chunked at many chunk sizes / gzip / deflate /
    chunked+compressed) decode byte-identically."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(60):
        n = rng.randrange(0, 4000)
        body = bytes(rng.randrange(256) for _ in range(n))
        forms = [
            http_response_wrap(body),
            http_response_wrap(body, chunked=True,
                               chunk_size=rng.randrange(1, 300)),
            http_response_wrap(body, content_encoding="gzip"),
            http_response_wrap(body, content_encoding="deflate"),
            http_response_wrap(body, chunked=True,
                               chunk_size=rng.randrange(1, 50),
                               content_encoding="gzip"),
            http_response_wrap(body, chunked=True,
                               chunk_size=rng.randrange(1, 50),
                               content_encoding="deflate"),
        ]
        for wire in forms:
            assert http_response_body(wire) == body


def test_http_chunked_details():
    # chunk extensions are tolerated, trailers ignored, bad framing raises
    wire = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5;ext=1\r\nhello\r\n1\r\n!\r\n0\r\nX-Trailer: t\r\n\r\n")
    assert http_response_body(wire) == b"hello!"
    bad_size = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                b"zz\r\nhello\r\n0\r\n\r\n")
    with pytest.raises(WarcFormatError):
        http_response_body(bad_size)
    truncated = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                 b"ff\r\nshort\r\n")
    with pytest.raises(WarcFormatError):
        http_response_body(truncated)
    no_crlf = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"5\r\nhelloXX0\r\n\r\n")
    with pytest.raises(WarcFormatError):
        http_response_body(no_crlf)


def test_http_content_encoding_errors():
    # br without the optional brotli lib: the DISTINCT quarantine class,
    # still a WarcFormatError (ADVICE r11)
    from ohsome_planet_spark.sources.warc import UnsupportedEncodingError

    with pytest.raises(UnsupportedEncodingError):
        http_response_body(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx"
        )
    with pytest.raises(UnsupportedEncodingError):
        http_response_body(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\nxxxx"
        )
    assert issubclass(UnsupportedEncodingError, WarcFormatError)
    with pytest.raises(WarcFormatError):  # garbage gzip
        http_response_body(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip"
        )
    with pytest.raises(WarcFormatError):  # truncated gzip
        good = http_response_wrap(b"x" * 1000, content_encoding="gzip")
        http_response_body(good[:-5])


def test_gzip_bomb_guard():
    """A single bomb member must raise, not OOM the task (ADVICE round
    10): 1 MiB ceiling vs a member expanding to 4 MiB."""
    import zlib

    from ohsome_planet_spark.sources.warc import _split_members

    bomb_plain = b"\x00" * (4 << 20)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(bomb_plain)
    with pytest.raises(WarcFormatError, match="bomb guard"):
        _split_members(buf.getvalue(), max_member_bytes=1 << 20)
    # the same guard bounds Content-Encoding bodies
    comp = zlib.compress(b"\x00" * (300 << 20), 9)
    wire = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + comp)
    with pytest.raises(WarcFormatError, match="bomb guard"):
        http_response_body(wire)
    # non-bomb members still split fine under the default ceiling
    recs = [{"warc_type": "resource", "payload": b"ok"}]
    assert parse_warc(encode_warc(recs, gzip_records=True))[0]["payload"] == b"ok"


HTML_CASES = [
    # raw-text element: the </div> inside script must not close anything
    (
        '<div><p>a</p><script>if (x < 3) { s = "</div>"; }</script><p>b</p></div>',
        "a\nb",
    ),
    # style + head dropped entirely, title included in head
    (
        "<head><title>nope</title><style>p { c: </style?>; }</style></head>"
        "<body><p>kept</p></body>",
        "kept",
    ),
    # entities: named, numeric decimal, numeric hex
    ("<p>&lt;tag&gt; &amp; &#65;&#x42;</p>", "<tag> & AB"),
    # inline tags join, block tags split
    ("<p>one <b>two</b> three</p><div>four</div>", "one two three\nfour"),
    # br splits inside a paragraph, both syntaxes
    ("<p>a<br>b<br/>c</p>", "a\nb\nc"),
    # comments and processing instructions vanish
    ("<p>x<!-- <p>ghost</p> -->y</p>", "xy"),
    # whitespace collapse inside blocks, empty blocks vanish
    ("<div>  a\t\n  b  </div><div>   </div><div>c</div>", "a b\nc"),
    # unclosed drop tag at EOF: nothing after it leaks
    ("<p>seen</p><script>var x = 1;", "seen"),
    # stray close tags do not break extraction
    ("</script></div><p>ok</p>", "ok"),
    # nested lists
    ("<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>", "a\nb\nc"),
    # noscript/template dropped
    ("<noscript>no</noscript><template>tpl</template><p>yes</p>", "yes"),
    ("", ""),
]


@pytest.mark.parametrize("html,want", HTML_CASES)
def test_html_extraction_cases(html, want):
    assert html_to_text(html) == want


def test_warc_records_operator_dirty_tolerance(spark):
    from ohsome_planet_spark.operators.web import warc_records

    good = encode_warc(
        [
            {"warc_type": "warcinfo", "payload": b"sw"},
            {"warc_type": "response", "target_uri": "http://a",
             "payload": b"zzz"},
        ]
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage not a warc"))],
        "file_id long, warc binary",
    )
    rows = warc_records(df, "warc").collect()
    assert sorted((r.file_id, r.rec_idx, r.warc_type) for r in rows) == [
        (1, 0, "warcinfo"),
        (1, 1, "response"),
    ]
    assert all(r.file_id == 1 for r in rows)  # dirty archive yields 0 rows


def test_extract_main_text_operator(spark):
    from ohsome_planet_spark.operators.web import extract_main_text

    html = b"<body><h1>T</h1><p>a &amp; b</p></body>"
    df = spark.createDataFrame(
        [
            (1, bytearray(http_response_wrap(html))),
            (2, bytearray(b"not http")),
            (3, None),
        ],
        "id long, payload binary",
    )
    rows = {r.id: r.extracted_text
            for r in extract_main_text(df, "payload", http=True).collect()}
    assert rows[1] == "T\na & b"
    assert rows[2] is None and rows[3] is None


def test_ingest_warc_cli_e2e(spark, tmp_path):
    """End-to-end user flow: WARC files on disk -> cli ingest-warc ->
    documents parquet with extracted text + C4/quality columns."""
    import json
    import subprocess
    import sys

    body1 = (
        b"<html><body><p>This is a fine long sentence that ends properly.</p>"
        b"<p>Another keeper sentence with enough words to pass!</p>"
        b"<p>Third good sentence so the document clears the floor?</p>"
        b"</body></html>"
    )
    body2 = b"<html><body><p>too short.</p></body></html>"
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(
        encode_warc(
            [
                {"warc_type": "warcinfo", "payload": b"sw"},
                {"warc_type": "response", "target_uri": "http://x/1",
                 "payload": http_response_wrap(body1)},
            ]
        )
    )
    (wdir / "b.warc.gz").write_bytes(
        encode_warc(
            [
                {"warc_type": "response", "target_uri": "http://x/2",
                 "payload": http_response_wrap(body2)},
                {"warc_type": "request", "target_uri": "http://x/2",
                 "payload": b"GET /2"},
            ],
            gzip_records=True,
        )
    )
    out = tmp_path / "docs_out"
    proc = subprocess.run(
        [sys.executable, "-m", "ohsome_planet_spark.cli", "ingest-warc",
         "--input", str(wdir), "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["archives"] == 2 and report["responses"] == 2
    assert report["kept"] == 1  # body2 fails the line rules
    rows = {r.target_uri: r for r in spark.read.parquet(str(out)).collect()}
    assert rows["http://x/1"].keep_doc and rows["http://x/1"].n_kept_lines == 3
    assert "fine long sentence" in rows["http://x/1"].text
    assert not rows["http://x/2"].keep_doc


def test_canonical_url_grammar(spark):
    from ohsome_planet_spark.operators.web import canonical_url_expr
    from pyspark.sql import functions as F

    cases = [
        ("HTTP://ExAmPlE.COM:80/A/B?z=1&a=2#frag", "http://example.com/A/B?a=2&z=1"),
        ("https://h.com:443/x", "https://h.com/x"),
        ("https://h.com:8443/x", "https://h.com:8443/x"),
        ("http://h.com", "http://h.com/"),
        ("http://h.com?utm_source=a&gclid=b&fbclid=c", "http://h.com/"),
        ("http://h.com/p?utm_x=1&real=2", "http://h.com/p?real=2"),
        # path case preserved; only scheme/host fold
        ("http://H.com/CaSe", "http://h.com/CaSe"),
        # ADVICE r11: '?' inside the fragment is NOT a query — the whole
        # fragment goes, no bogus params survive
        ("http://h.com/p#frag?a=1", "http://h.com/p"),
        ("http://h.com/p?real=1#frag?bogus=2", "http://h.com/p?real=1"),
        # userinfo dropped; host behind it still case-folds, port strips
        ("http://u:pw@H.com:80/p?a=1", "http://h.com/p?a=1"),
        ("https://token@h.com/p", "https://h.com/p"),
        # bracketed IPv6: host kept whole (colons inside brackets are not
        # a port), case-folded; non-default port kept, default stripped
        ("http://[2001:DB8::1]:8080/x", "http://[2001:db8::1]:8080/x"),
        ("http://[2001:DB8::1]:80/x", "http://[2001:db8::1]/x"),
        ("http://u@[::1]/x?b=2&a=1", "http://[::1]/x?a=1&b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "id long, url string"
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", canonical_url_expr(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_content_encoding_lists_and_quarantine(spark):
    """ADVICE r11: list-valued Content-Encoding ('gzip, identity') must
    decode (RFC 9110 stacking, applied in reverse header order), and one
    exotic-encoding record in a batch must null out WITHOUT aborting the
    task or the neighboring rows."""
    import gzip as _gzip

    from ohsome_planet_spark.sources.warc import http_response_body

    html = b"<html><body><p>hello stacked world</p></body></html>"
    gz = _gzip.compress(html, mtime=0)
    listed = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip, identity\r\n\r\n" + gz
    )
    assert http_response_body(listed) == html
    spaced = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding:  identity , gzip \r\n\r\n"
        + gz
    )
    assert http_response_body(spaced) == html

    # batch with one br record: only that row quarantines
    from ohsome_planet_spark.operators.web import extract_main_text

    rows = [
        (0, b"HTTP/1.1 200 OK\r\n\r\n" + html),
        (1, b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n\x1b*N"),
        (2, listed),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        r.doc_id: r.extracted_text
        for r in extract_main_text(df, "payload", http=True).collect()
    }
    assert out[1] is None
    assert out[0] == out[2] == "hello stacked world"
