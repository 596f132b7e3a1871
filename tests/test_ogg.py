"""Ogg/Opus/Vorbis probe: CRC known-answer referee, hand-built page
fixtures (independent of the encoder), spanning-packet assembly,
error contract, and the operator seam."""

from __future__ import annotations

import random
import struct

import pytest

from ohsome_planet_spark.functions.ogg import (
    OggFormatError,
    encode_ogg_opus,
    encode_ogg_vorbis,
    ogg_crc,
    probe_ogg,
)


def test_crc_known_answers():
    """CRC-32/Ogg (unreflected, init 0, xor 0) published check values:
    the 9-byte ASCII '123456789' check input gives 0x89A1897F
    (CRC-32/POSIX family table, no final complement)."""
    assert ogg_crc(b"123456789") == 0x89A1897F
    assert ogg_crc(b"") == 0
    # linearity sanity: a single zero byte shifts, not identity
    assert ogg_crc(b"\x00") == 0


def _hand_page(body_packets, granule, serial, seq, htype):
    """Page assembled field-by-field here, not via the encoder."""
    lacing = bytearray()
    body = bytearray()
    for pkt in body_packets:
        body += pkt
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
    page = bytearray(b"OggS")
    page += struct.pack("<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing))
    page += lacing + body
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def test_hand_built_opus_stream_referee():
    head = b"OpusHead" + struct.pack("<BBHIhB", 1, 2, 156, 16000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 1) + b"x" + struct.pack("<I", 0)
    audio = bytes(range(100))
    stream = (
        _hand_page([head], 0, 7, 0, 0x02)
        + _hand_page([tags], 0, 7, 1, 0)
        + _hand_page([audio, audio], 156 + 2 * 960, 7, 2, 0x04)
    )
    r = probe_ogg(stream)
    assert r["codec"] == "opus" and r["channels"] == 2
    assert r["sample_rate"] == 16000 and r["pre_skip"] == 156
    assert r["n_pages"] == 3 and r["n_packets"] == 4
    assert r["duration_us"] == 2 * 960 * 1_000_000 // 48000
    assert r["serial"] == 7


def test_255_boundary_lacing():
    """A packet of exactly 255 bytes needs a 0-length terminating lace."""
    head = b"OpusHead" + struct.pack("<BBHIhB", 1, 1, 0, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    pkt255 = bytes(255)
    stream = (
        _hand_page([head], 0, 1, 0, 0x02)
        + _hand_page([tags], 0, 1, 1, 0)
        + _hand_page([pkt255], 960, 1, 2, 0x04)
    )
    r = probe_ogg(stream)
    assert r["n_packets"] == 3


def test_roundtrip_property():
    rng = random.Random(3)
    for _ in range(40):
        na = rng.randrange(1, 10)
        ppp = rng.randrange(1, 4)
        span = rng.random() < 0.5 and na > ppp
        if rng.random() < 0.5:
            s = encode_ogg_opus(
                channels=rng.randrange(1, 3),
                input_rate=rng.choice((48000, 24000, 8000)),
                pre_skip=rng.randrange(0, 1000),
                n_audio=na, serial=rng.randrange(1, 1 << 31),
                seed=rng.randrange(99), packets_per_page=ppp, span_page=span,
            )
            r = probe_ogg(s)
            assert r["codec"] == "opus"
            assert r["n_packets"] == 2 + na + span
            assert r["duration_us"] == na * 960 * 1_000_000 // 48000
        else:
            rate = rng.choice((44100, 22050, 11025))
            s = encode_ogg_vorbis(
                channels=rng.randrange(1, 5), rate=rate, n_audio=na,
                serial=rng.randrange(1, 1 << 31), seed=rng.randrange(99),
                packets_per_page=ppp, span_page=span,
            )
            r = probe_ogg(s)
            assert r["codec"] == "vorbis"
            assert r["n_packets"] == 3 + na + span
            assert r["duration_us"] == na * 128 * 1_000_000 // rate


def test_error_contract():
    good = encode_ogg_opus()
    with pytest.raises(OggFormatError):
        probe_ogg(b"NotOggS" + good[7:])
    # CRC flip in a body byte
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(OggFormatError):
        probe_ogg(bytes(bad))
    # truncation mid-page
    with pytest.raises(OggFormatError):
        probe_ogg(good[: len(good) - 5])
    # sequence gap: drop the middle page (find 2nd OggS)
    i1 = good.find(b"OggS", 4)
    i2 = good.find(b"OggS", i1 + 4)
    with pytest.raises(OggFormatError):
        probe_ogg(good[:i1] + good[i2:])


def test_continued_flag_consistency():
    """A continued page with no pending packet must raise, as must a
    pending packet hitting a non-continued page."""
    s = encode_ogg_opus(n_audio=6, packets_per_page=2, span_page=True)
    # find the continued page (htype bit 0 set) and clear the flag
    pos, pages = 0, []
    while pos < len(s):
        pages.append(pos)
        nsegs = s[pos + 26]
        body = sum(s[pos + 27 : pos + 27 + nsegs])
        pos = pos + 27 + nsegs + body
    broken = bytearray(s)
    for p in pages:
        if broken[p + 5] & 0x01:
            broken[p + 5] &= ~0x01
            page_end = None
            nsegs = broken[p + 26]
            page_end = p + 27 + nsegs + sum(broken[p + 27 : p + 27 + nsegs])
            page = bytearray(broken[p:page_end])
            page[22:26] = b"\x00\x00\x00\x00"
            broken[p + 22 : p + 26] = struct.pack("<I", ogg_crc(bytes(page)))
            break
    with pytest.raises(OggFormatError):
        probe_ogg(bytes(broken))


def test_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.multimodal import probe_ogg_stream

    good = encode_ogg_vorbis(channels=2, rate=44100, n_audio=4)
    rows = [(1, bytearray(good)), (2, bytearray(b"OggX....."))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in probe_ogg_stream(df).collect()}
    assert out[1]["codec"] == "vorbis" and out[1]["n_packets"] == 7
    assert out[2]["codec"] is None and out[2]["n_pages"] is None
