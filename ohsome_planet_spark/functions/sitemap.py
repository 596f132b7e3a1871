"""Sitemap parsing (sitemaps.org XML protocol + the plain-text form):
the crawl-frontier side of politeness — robots.txt names the sitemaps,
sitemaps enumerate the URLs, and a pipeline joins the two before a
single fetch is spent.

What is REAL here: the ``<urlset>`` and ``<sitemapindex>`` document
shapes (urlset → page entries, index → child sitemap pointers), the
per-entry fields (``loc`` required; ``lastmod`` W3C datetime parsed to
epoch millis incl. date-only and timezone-offset forms; ``changefreq``
vocabulary check; ``priority`` float with the spec's 0.0-1.0 clamp),
entity decoding in loc (``&amp;`` URLs are the common case), the
gzip envelope (``sitemap.xml.gz``), and the newline-delimited
plain-text fallback. A lightweight tag scanner — not a full XML
parser — is used deliberately: real-world sitemaps carry broken
namespaces/DOCTYPEs that strict parsers reject, and the element
vocabulary here is closed."""

from __future__ import annotations

import re
import zlib

__all__ = ["SitemapFormatError", "parse_sitemap"]


class SitemapFormatError(ValueError):
    pass


_ENTRY_RE = re.compile(r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S | re.I)
_FIELD_RE = re.compile(
    r"<(loc|lastmod|changefreq|priority)\b[^>]*>(.*?)</\1>", re.S | re.I
)
_CHANGEFREQS = frozenset(
    ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")
)
_W3C_DT = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:[Tt](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?"
    r"(Z|z|[+-]\d{2}:\d{2}))?$"
)

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&apos;": "'"}


def _unescape(s: str) -> str:
    for ent, rep in _ENTITIES.items():
        s = s.replace(ent, rep)
    return s


_DAYS_BEFORE = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]


def _epoch_ms(m: re.Match) -> int:
    """W3C datetime → epoch milliseconds, proleptic-Gregorian civil
    arithmetic (no stdlib datetime: the formula is the referee)."""
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not 1 <= mo <= 12:
        raise SitemapFormatError(f"bad month in lastmod: {mo}")
    leap = mo > 2 and (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0))
    days = (
        (y - 1970) * 365
        + ((y - 1) // 4 - 1969 // 4)
        - ((y - 1) // 100 - 1969 // 100)
        + ((y - 1) // 400 - 1969 // 400)
        + _DAYS_BEFORE[mo - 1]
        + leap
        + d
        - 1
    )
    ms = days * 86_400_000
    if m.group(4) is not None:
        hh, mi = int(m.group(4)), int(m.group(5))
        ss = int(m.group(6) or 0)
        frac = (m.group(7) or "").ljust(3, "0")[:3]
        ms += ((hh * 60 + mi) * 60 + ss) * 1000 + int(frac or 0)
        tz = m.group(8)
        if tz and tz not in ("Z", "z"):
            sign = -1 if tz[0] == "+" else 1
            ms += sign * (int(tz[1:3]) * 60 + int(tz[4:6])) * 60_000
    return ms


def parse_sitemap(payload: bytes | str) -> dict:
    """→ ``{"kind": "urlset"|"index"|"plain", "entries": [{"loc",
    "lastmod_ms", "changefreq", "priority"}]}``. Raises on documents
    that are neither sitemap XML nor plausible URL-per-line text."""
    if isinstance(payload, (bytes, bytearray)):
        data = bytes(payload)
        if data[:2] == b"\x1f\x8b":
            try:
                data = zlib.decompress(data, 16 + zlib.MAX_WBITS)
            except zlib.error as exc:
                raise SitemapFormatError(f"bad gzip envelope: {exc}") from exc
        text = data.decode("utf-8", "replace")
    else:
        text = payload
    text = text.lstrip("﻿")
    low = text.lower()
    if "<urlset" in low or "<sitemapindex" in low:
        kind = "urlset" if "<urlset" in low else "index"
        want = "url" if kind == "urlset" else "sitemap"
        entries = []
        for m in _ENTRY_RE.finditer(text):
            if m.group(1).lower() != want:
                raise SitemapFormatError(
                    f"<{m.group(1)}> entry inside a {kind} document"
                )
            fields = {
                k.lower(): v.strip()
                for k, v in _FIELD_RE.findall(m.group(2))
            }
            if "loc" not in fields or not fields["loc"]:
                raise SitemapFormatError("entry without <loc>")
            lastmod_ms = None
            if "lastmod" in fields:
                dm = _W3C_DT.match(fields["lastmod"])
                if not dm:
                    raise SitemapFormatError(
                        f"bad lastmod {fields['lastmod']!r}"
                    )
                lastmod_ms = _epoch_ms(dm)
            changefreq = fields.get("changefreq")
            if changefreq is not None:
                changefreq = changefreq.lower()
                if changefreq not in _CHANGEFREQS:
                    raise SitemapFormatError(
                        f"bad changefreq {changefreq!r}"
                    )
            priority = None
            if "priority" in fields:
                try:
                    priority = float(fields["priority"])
                except ValueError as exc:
                    raise SitemapFormatError(
                        f"bad priority {fields['priority']!r}"
                    ) from exc
                priority = min(1.0, max(0.0, priority))
            entries.append(
                {
                    "loc": _unescape(fields["loc"]),
                    "lastmod_ms": lastmod_ms,
                    "changefreq": changefreq,
                    "priority": priority,
                }
            )
        return {"kind": kind, "entries": entries}
    # plain-text form: one URL per line
    entries = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if not re.match(r"^https?://", line, re.I):
            raise SitemapFormatError(f"non-URL line in plain sitemap: {line!r}")
        entries.append(
            {"loc": line, "lastmod_ms": None, "changefreq": None,
             "priority": None}
        )
    if not entries:
        raise SitemapFormatError("empty sitemap")
    return {"kind": "plain", "entries": entries}
