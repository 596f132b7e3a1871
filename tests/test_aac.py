"""AAC ADTS probe: hand-packed header referee (independent of the
fixture encoder), frame-walk properties, error contract, and the
operator seam."""

from __future__ import annotations

import random

import pytest

from ohsome_planet_spark.functions.aac import (
    SAMPLE_RATES,
    AdtsFormatError,
    encode_adts,
    probe_adts,
)


def _hand_frame(frame_length: int) -> bytes:
    """One CRC-less MPEG-4 LC 44.1 kHz stereo frame packed bit-by-bit
    from the spec field layout (not via encode_adts): syncword FFF,
    ID=0, layer=00, protection_absent=1 → h1=0xF1; profile=01,
    sf_index=0100, private=0, channel_config=010 → h2=0x50, h3 top
    bits 10."""
    h = bytearray(7)
    h[0] = 0xFF
    h[1] = 0xF1
    h[2] = (1 << 6) | (4 << 2) | 0  # LC, sf_index 4, chan cfg high bit 0
    h[3] = (2 << 6) | ((frame_length >> 11) & 3)
    h[4] = (frame_length >> 3) & 0xFF
    h[5] = ((frame_length & 7) << 5) | 0x1F
    h[6] = 0xFC  # fullness low bits, 1 raw data block
    return bytes(h) + bytes((frame_length - 7) * [0xA5])


def test_hand_packed_header_referee():
    r = probe_adts(_hand_frame(100) + _hand_frame(2500))
    assert r["profile"] == 1 and r["profile_name"] == "LC"
    assert r["sample_rate"] == 44100 and r["channels"] == 2
    assert r["n_frames"] == 2 and r["n_samples"] == 2048
    assert r["crc_frames"] == 0 and r["mpeg2"] is False
    assert r["duration_us"] == 2 * (1024 * 1_000_000 // 44100)
    assert r["total_bytes"] == 2600
    # byte-weighted bitrate: 2600*8*44100 // 2048 // 1000
    assert r["bitrate_kbps"] == 2600 * 8 * 44100 // 2048 // 1000


def test_framelength_13bit_straddle():
    """frame_length spans h3/h4/h5; a frame > 2047 bytes exercises the
    2-bit high part in h3."""
    r = probe_adts(_hand_frame(4095))
    assert r["total_bytes"] == 4095 and r["n_frames"] == 1


def test_roundtrip_property():
    rng = random.Random(11)
    for _ in range(80):
        profile = rng.randrange(4)
        sf = rng.randrange(13)
        cc = rng.randrange(1, 8)
        nf = rng.randrange(1, 7)
        sizes = tuple(rng.randrange(10, 600) for _ in range(nf))
        crc = bool(rng.randrange(2))
        blocks = rng.randrange(1, 5)
        mpeg2 = rng.randrange(2)
        s = encode_adts(profile, sf, cc, sizes, mpeg2, crc, blocks, seed=rng.randrange(99))
        r = probe_adts(s)
        assert r["profile"] == profile
        assert r["sample_rate"] == SAMPLE_RATES[sf]
        assert r["channels"] == (8 if cc == 7 else cc)
        assert r["mpeg2"] == bool(mpeg2)
        assert r["n_frames"] == nf
        assert r["n_samples"] == nf * blocks * 1024
        assert r["crc_frames"] == (nf if crc else 0)
        hdr = 9 if crc else 7
        assert r["total_bytes"] == sum(sizes) + nf * hdr
        assert r["duration_us"] == nf * (
            blocks * 1024 * 1_000_000 // SAMPLE_RATES[sf]
        )


def test_error_contract():
    with pytest.raises(AdtsFormatError):
        probe_adts(b"")
    with pytest.raises(AdtsFormatError):
        probe_adts(b"\x12\x34\x56\x78\x9a\xbc\xde")  # bad sync
    with pytest.raises(AdtsFormatError):
        probe_adts(_hand_frame(100)[:-5])  # truncated final frame
    with pytest.raises(AdtsFormatError):
        probe_adts(_hand_frame(100) + b"\xff")  # trailing garbage
    # reserved sampling_frequency_index 13
    bad = bytearray(_hand_frame(50))
    bad[2] = (1 << 6) | (13 << 2)
    with pytest.raises(AdtsFormatError):
        probe_adts(bytes(bad))
    # mid-stream parameter change
    a = encode_adts(sf_index=4, payload_sizes=(40,))
    b = encode_adts(sf_index=5, payload_sizes=(40,))
    with pytest.raises(AdtsFormatError):
        probe_adts(a + b)


def test_crc_skip_keeps_frame_walk_aligned():
    """A missed 2-byte CRC would desync every following frame."""
    s = encode_adts(with_crc=True, payload_sizes=(33, 47, 61))
    r = probe_adts(s)
    assert r["n_frames"] == 3 and r["crc_frames"] == 3
    assert r["total_bytes"] == 33 + 47 + 61 + 3 * 9


def test_probe_adts_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.multimodal import probe_adts_stream

    good = encode_adts(payload_sizes=(50, 60))
    rows = [(1, bytearray(good)), (2, bytearray(b"\x00\x01\x02"))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in probe_adts_stream(df).collect()}
    assert out[1]["n_frames"] == 2 and out[1]["profile_name"] == "LC"
    assert out[2]["n_frames"] is None and out[2]["profile_name"] is None
