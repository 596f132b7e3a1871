"""EBML/WebM probe: hand-built varint/element fixtures (independent of
the encoder), unknown-size segments, non-minimal widths, error
contract, and the operator seam."""

from __future__ import annotations

import struct

import pytest

from ohsome_planet_spark.functions.ebml import (
    EbmlFormatError,
    _read_size,
    _read_vint,
    encode_webm,
    probe_webm,
)


def test_varint_known_answers():
    """RFC 8794 §4 worked examples: the same value in several widths."""
    # value 2 in widths 1..4 (ids keep the marker, sizes strip it)
    assert _read_vint(b"\x82", 0, keep_marker=False) == (2, 1)
    assert _read_vint(b"\x40\x02", 0, keep_marker=False) == (2, 2)
    assert _read_vint(b"\x20\x00\x02", 0, keep_marker=False) == (2, 3)
    assert _read_vint(b"\x10\x00\x00\x02", 0, keep_marker=False) == (2, 4)
    # id form keeps the marker bit
    assert _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True) == (
        0x1A45DFA3, 4)
    # all-ones size = unknown
    assert _read_size(b"\xff", 0) == (None, 1)
    assert _read_size(b"\x7f\xff", 0) == (None, 2)
    with pytest.raises(EbmlFormatError):
        _read_vint(b"\x00\x01", 0, keep_marker=False)


def _el(eid: int, body: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    w = 1
    while n >= (1 << (7 * w)) - 1:
        w += 1
    return idb + (n | (1 << (7 * w))).to_bytes(w, "big") + body


def test_hand_built_tree_with_unknown_size_segment():
    """Segment with the all-ones unknown size (the live-stream shape),
    assembled by hand: the walk must run it to EOF."""
    header = _el(
        0x1A45DFA3,
        _el(0x4282, b"webm") + _el(0x4285, b"\x02"),
    )
    info = _el(0x1549A966,
               _el(0x2AD7B1, b"\x0f\x42\x40")        # 1_000_000
               + _el(0x4489, struct.pack(">f", 500.0)))
    tracks = _el(
        0x1654AE6B,
        _el(0xAE,
            _el(0xD7, b"\x01") + _el(0x83, b"\x01") + _el(0x86, b"V_VP8")
            + _el(0xE0, _el(0xB0, b"\x01\x40") + _el(0xBA, b"\xf0"))),
    )
    body = info + tracks
    segment = (
        b"\x18\x53\x80\x67" + b"\xff" + body  # unknown size
    )
    r = probe_webm(header + segment)
    assert r["doctype"] == "webm"
    assert (r["width"], r["height"]) == (320, 240)
    assert r["video_codec"] == "V_VP8" and r["n_tracks"] == 1
    assert r["duration_ms"] == 500
    assert r["audio_codec"] is None


def test_nonminimal_size_widths_parse():
    s = encode_webm(wide_sizes=True, width=100, height=50)
    r = probe_webm(s)
    assert (r["width"], r["height"]) == (100, 50)


def test_error_contract():
    good = encode_webm()
    with pytest.raises(EbmlFormatError):
        probe_webm(b"\x42\x82" + good[2:])  # garbled magic
    # structurally valid stream whose first element is not the header
    with pytest.raises(EbmlFormatError, match="EBML header"):
        probe_webm(_el(0x1549A966, b"") + good)
    # child overruns parent: corrupt an inner size upward
    with pytest.raises(EbmlFormatError):
        probe_webm(good[: len(good) - 10])
    # wrong doctype
    bad = encode_webm(doctype="avi!")
    with pytest.raises(EbmlFormatError, match="DocType"):
        probe_webm(bad)
    # DocTypeReadVersion beyond reader
    s = bytearray(encode_webm())
    i = s.find(b"\x42\x85")  # DocTypeReadVersion id
    s[i + 3] = 9
    with pytest.raises(EbmlFormatError, match="DocTypeReadVersion"):
        probe_webm(bytes(s))


def test_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.multimodal import probe_webm_stream

    good = encode_webm(width=640, height=480, n_clusters=2,
                       blocks_per_cluster=4)
    rows = [(1, bytearray(good)), (2, bytearray(b"\x1a\x45\xdf"))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in probe_webm_stream(df).collect()}
    assert out[1]["width"] == 640 and out[1]["n_blocks"] == 8
    assert out[2]["width"] is None and out[2]["doctype"] is None
