"""WARC (Web ARChive, ISO 28500) reader in pure stdlib Python — the
ingestion format of Common Crawl, the dominant source corpus for
large-scale training-data pipelines.

Wire format: a WARC file is a sequence of records, each

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (named fields)
    \\r\\n                                     (blank line)
    <Content-Length octets of payload>
    \\r\\n\\r\\n                                 (record separator)

optionally gzip-compressed PER RECORD (multi-member gzip — the form
Common Crawl ships). The reader walks records by their declared
Content-Length (never by scanning for separators, which can occur inside
payloads), parses the named headers, and exposes
(offset, warc_type, target_uri, record_id, date, content_type,
content_length, payload).

Scale shape: one WARC member is independently decodable, so a 100 TB
crawl shards by (file, member) ranges; here the per-file walk runs
inside ``mapInPandas`` over binary payload columns — bytes never leave
the executors, mirroring the multimodal seam.
"""

from __future__ import annotations

import gzip
import io

WARC_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


class WarcFormatError(ValueError):
    pass


def _split_members(data: bytes) -> list[bytes]:
    """Split multi-member gzip (per-record compression) or return the
    raw bytes as a single pseudo-member when not gzipped. GzipFile
    transparently concatenates consecutive members, so member boundaries
    come from ``zlib.decompressobj(31)`` + ``unused_data`` instead."""
    import zlib

    if data[:2] != b"\x1f\x8b":
        return [data]
    out = []
    rest = data
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise WarcFormatError(
                f"garbage between gzip members at offset {len(data) - len(rest)}"
            )
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(rest))
        except zlib.error as exc:
            raise WarcFormatError(f"corrupt gzip member: {exc}") from exc
        if not d.eof:
            raise WarcFormatError("truncated gzip member")
        rest = d.unused_data
    return out


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or per-record gzip) → list of record
    dicts. Payload framing comes exclusively from Content-Length."""
    records = []
    for member_idx, member in enumerate(_split_members(bytes(data))):
        pos = 0
        n = len(member)
        while pos < n:
            # tolerate trailing separator runs between records
            while pos < n and member[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= n:
                break
            eol = member.find(b"\r\n", pos)
            if eol < 0:
                raise WarcFormatError("unterminated version line")
            version = member[pos:eol]
            if version not in WARC_VERSIONS:
                raise WarcFormatError(f"bad WARC version line {version!r}")
            pos = eol + 2
            headers: dict[str, str] = {}
            while True:
                eol = member.find(b"\r\n", pos)
                if eol < 0:
                    raise WarcFormatError("unterminated header block")
                line = member[pos:eol]
                pos = eol + 2
                if not line:
                    break
                if b":" not in line:
                    raise WarcFormatError(f"malformed header line {line!r}")
                k, v = line.split(b":", 1)
                headers[k.decode("ascii").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
            try:
                clen = int(headers["content-length"])
            except KeyError:
                raise WarcFormatError("record missing Content-Length")
            except ValueError:
                raise WarcFormatError("non-integer Content-Length")
            if pos + clen > n:
                raise WarcFormatError("payload extends past end of member")
            payload = member[pos : pos + clen]
            pos += clen
            records.append(
                {
                    "member": member_idx,
                    "warc_type": headers.get("warc-type"),
                    "target_uri": headers.get("warc-target-uri"),
                    "record_id": headers.get("warc-record-id"),
                    "date": headers.get("warc-date"),
                    "content_type": headers.get("content-type"),
                    "content_length": clen,
                    "payload": payload,
                }
            )
    return records


def http_response_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record's
    payload (status line + headers + blank line → body), the step between
    a WARC response record and its HTML."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5] == b"HTTP/":
        raise WarcFormatError("payload is not an HTTP response")
    return payload[sep + 4 :]


# --- fixture encoder ----------------------------------------------------------


def encode_warc(
    records: list[dict],
    gzip_records: bool = False,
) -> bytes:
    """Emit genuine WARC/1.0 bytes (fixture encoder). Each record dict:
    ``warc_type`` (required), ``payload`` (bytes), plus optional
    ``target_uri`` / ``record_id`` / ``date`` / ``content_type``."""
    out = bytearray()
    for r in records:
        payload = bytes(r.get("payload", b""))
        lines = [b"WARC/1.0"]
        lines.append(b"WARC-Type: " + r["warc_type"].encode())
        if r.get("target_uri"):
            lines.append(b"WARC-Target-URI: " + r["target_uri"].encode())
        if r.get("record_id"):
            lines.append(b"WARC-Record-ID: " + r["record_id"].encode())
        if r.get("date"):
            lines.append(b"WARC-Date: " + r["date"].encode())
        if r.get("content_type"):
            lines.append(b"Content-Type: " + r["content_type"].encode())
        lines.append(b"Content-Length: " + str(len(payload)).encode())
        rec = b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_records:
            buf = io.BytesIO()
            # fixed mtime keeps fixture bytes deterministic
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


def http_response_wrap(body: bytes, content_type: str = "text/html") -> bytes:
    """Wrap a body in a minimal HTTP/1.1 response envelope (fixture side
    of :func:`http_response_body`)."""
    head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + content_type.encode()
        + b"\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
    )
    return head + body
