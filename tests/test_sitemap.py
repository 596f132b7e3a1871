"""Sitemap parsing: grammar fixtures, the W3C-datetime epoch formula
refereed against CPython's datetime over a randomized grid, error
contract, and the operator seam."""

from __future__ import annotations

import datetime as dt
import gzip
import random

import pytest

from ohsome_planet_spark.functions.sitemap import (
    SitemapFormatError,
    _W3C_DT,
    _epoch_ms,
    parse_sitemap,
)

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://h.test/a?x=1&amp;y=2</loc><lastmod>2024-03-05</lastmod>
<changefreq>Daily</changefreq><priority>0.8</priority></url>
<url><loc>http://h.test/b</loc>
<lastmod>2023-11-30T12:34:56.789+02:00</lastmod></url>
<url><loc>http://h.test/c</loc><priority>3.5</priority></url>
</urlset>"""


def test_urlset_grammar():
    r = parse_sitemap(URLSET)
    assert r["kind"] == "urlset" and len(r["entries"]) == 3
    e0, e1, e2 = r["entries"]
    assert e0["loc"] == "http://h.test/a?x=1&y=2"  # entity decoded
    assert e0["changefreq"] == "daily"
    assert e0["priority"] == 0.8
    assert e0["lastmod_ms"] == int(
        dt.datetime(2024, 3, 5, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    tz = dt.timezone(dt.timedelta(hours=2))
    assert e1["lastmod_ms"] == int(
        dt.datetime(2023, 11, 30, 12, 34, 56, 789000, tzinfo=tz).timestamp()
        * 1000
    )
    assert e2["priority"] == 1.0  # spec clamp


def test_index_plain_and_gzip():
    idx = ("<sitemapindex><sitemap><loc>http://h.test/s1.xml</loc>"
           "</sitemap></sitemapindex>")
    r = parse_sitemap(gzip.compress(idx.encode()))
    assert r["kind"] == "index"
    assert r["entries"][0]["loc"] == "http://h.test/s1.xml"
    r2 = parse_sitemap("http://a.test/1\n\nhttps://a.test/2\n")
    assert r2["kind"] == "plain" and len(r2["entries"]) == 2


def test_epoch_formula_matches_stdlib():
    """The civil-calendar arithmetic IS the referee — check it against
    an independent implementation (CPython datetime) across years,
    leap days, fractional seconds and offsets."""
    rng = random.Random(17)
    cases = ["2000-02-29T23:59:59.999Z", "1972-02-29", "2100-03-01",
             "1970-01-01T00:00:00Z"]
    for _ in range(300):
        y, mo = rng.randrange(1971, 2400), rng.randrange(1, 13)
        d = rng.randrange(1, 29)
        if rng.random() < 0.5:
            cases.append(f"{y:04d}-{mo:02d}-{d:02d}")
        else:
            off = rng.choice(["Z", "+05:30", "-08:00", "+00:00"])
            cases.append(
                f"{y:04d}-{mo:02d}-{d:02d}T{rng.randrange(24):02d}:"
                f"{rng.randrange(60):02d}:{rng.randrange(60):02d}{off}"
            )
    for s in cases:
        m = _W3C_DT.match(s)
        assert m, s
        if "T" in s:
            iso = s.replace("Z", "+00:00")
            exp = int(dt.datetime.fromisoformat(iso).timestamp() * 1000)
        else:
            exp = int(
                dt.datetime.fromisoformat(s)
                .replace(tzinfo=dt.timezone.utc)
                .timestamp() * 1000
            )
        assert _epoch_ms(m) == exp, s


def test_error_contract():
    with pytest.raises(SitemapFormatError, match="loc"):
        parse_sitemap("<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>")
    with pytest.raises(SitemapFormatError, match="lastmod"):
        parse_sitemap("<urlset><url><loc>http://x/</loc>"
                      "<lastmod>March 5</lastmod></url></urlset>")
    with pytest.raises(SitemapFormatError, match="changefreq"):
        parse_sitemap("<urlset><url><loc>http://x/</loc>"
                      "<changefreq>sometimes</changefreq></url></urlset>")
    with pytest.raises(SitemapFormatError, match="entry inside"):
        parse_sitemap("<urlset><sitemap><loc>http://x/</loc>"
                      "</sitemap></urlset>")
    with pytest.raises(SitemapFormatError, match="non-URL"):
        parse_sitemap("not a url line\n")
    with pytest.raises(SitemapFormatError, match="empty"):
        parse_sitemap("   \n  \n")
    with pytest.raises(SitemapFormatError, match="month"):
        parse_sitemap("<urlset><url><loc>http://x/</loc>"
                      "<lastmod>2024-13-05</lastmod></url></urlset>")


def test_operator_seam(spark):
    from ohsome_planet_spark.operators.web import sitemap_entries

    rows = [
        (1, bytearray(URLSET.encode())),
        (2, bytearray(b"http://p.test/only\n")),
        (3, bytearray(b"<urlset><url></url></urlset>")),  # quarantined
    ]
    df = spark.createDataFrame(rows, "sid bigint, sitemap binary")
    got = sitemap_entries(df, "sitemap").collect()
    assert [(r["sid"], r["kind"], r["entry_idx"]) for r in got] == [
        (1, "urlset", 0), (1, "urlset", 1), (1, "urlset", 2),
        (2, "plain", 0)]
    assert got[0]["loc"] == "http://h.test/a?x=1&y=2"
    assert got[3]["lastmod_ms"] is None
