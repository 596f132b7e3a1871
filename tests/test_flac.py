"""FLAC codec tests: independent referees for functions/flac.py.

Referee strategy (the per-operator discipline VERDICT r9 asked to keep):
- CRC-8 / CRC-16 pinned to PUBLISHED check values (not our own output);
- extended-UTF-8 number coding pinned to standard UTF-8 byte sequences;
- decoder branches our encoder never emits (LPC, wasted bits) driven by
  HAND-BUILT bitstreams with hand-computed expected samples;
- randomized encode→decode round-trips across every wire shape;
- cross-referee through the Spark seam: the same PCM signal via WAV and
  via FLAC must yield identical decode_audio summaries.
"""

import random

import pytest

from ohsome_planet_spark.functions.flac import (
    CH_LEFT_SIDE,
    CH_MID_SIDE,
    CH_RIGHT_SIDE,
    FlacFormatError,
    _BitWriter,
    _crc8,
    _crc16,
    _read_utf8_number,
    _BitReader,
    _utf8_number,
    decode_flac,
    decode_flac_summary,
    encode_flac,
)


def test_crc8_published_check_value():
    # CRC-8 poly 0x07, init 0, no reflection: check("123456789") == 0xF4
    assert _crc8(b"123456789") == 0xF4


def test_crc16_published_check_value():
    # CRC-16/UMTS (poly 0x8005, init 0, no reflection): check == 0xFEE8
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_number_standard_sequences():
    # FLAC's coded numbers coincide with UTF-8 for code-point range values
    assert _utf8_number(0x00) == b"\x00"
    assert _utf8_number(0x7F) == b"\x7f"
    assert _utf8_number(0x80) == b"\xc2\x80"
    assert _utf8_number(0x7FF) == b"\xdf\xbf"
    assert _utf8_number(0x800) == b"\xe0\xa0\x80"
    assert _utf8_number(0xFFFF) == b"\xef\xbf\xbf"
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1, (1 << 36) - 1):
        assert _read_utf8_number(_BitReader(_utf8_number(v))) == v


def _rand_frames(rng, ch, bits, n, kind):
    lim = 1 << (bits - 1)
    out = []
    for i in range(n):
        if kind == "noise":
            out.append(tuple(rng.randint(-lim, lim - 1) for _ in range(ch)))
        elif kind == "ramp":
            out.append(tuple(min(lim - 1, max(-lim, i * 3 - 40 + c)) for c in range(ch)))
        elif kind == "const":
            out.append(tuple(17 - c for c in range(ch)))
        else:  # smooth
            out.append(tuple(int((lim // 2 - 1) * ((i % 18) - 9) / 9) for c in range(ch)))
    return out


def test_roundtrip_randomized_all_wire_shapes():
    rng = random.Random(20260815)
    for trial in range(120):
        ch = rng.choice([1, 2, 2, 3, 4])
        bits = rng.choice([8, 16])
        n = rng.randint(0, 700)
        kind = rng.choice(["noise", "ramp", "const", "smooth"])
        frames = _rand_frames(rng, ch, bits, n, kind)
        mode = (
            rng.choice([None, CH_LEFT_SIDE, CH_RIGHT_SIDE, CH_MID_SIDE])
            if ch == 2
            else None
        )
        enc = encode_flac(
            ch,
            rng.choice([8000, 11025, 44100, 96000]),
            bits,
            frames,
            block_size=rng.choice([16, 100, 192, 256, 4096]),
            stereo_mode=mode,
            partition_order=rng.choice([0, 1, 2, 3]),
            force_verbatim=rng.random() < 0.15,
            rice2=rng.random() < 0.2,
            force_escape=rng.random() < 0.15,
            pad_metadata=rng.choice([0, 0, 0, 9]),
        )
        c2, _r2, b2, out = decode_flac(enc)
        assert (c2, b2) == (ch, bits), f"trial {trial}"
        assert [tuple(f) for f in out] == frames, f"trial {trial} {kind} {mode}"


def test_stereo_modes_decode_identically():
    frames = [(i * 5 - 300, -i * 3 + 40) for i in range(500)]
    ref = None
    for mode in (None, CH_LEFT_SIDE, CH_RIGHT_SIDE, CH_MID_SIDE):
        enc = encode_flac(2, 44100, 16, frames, stereo_mode=mode, block_size=192)
        _, _, _, out = decode_flac(enc)
        if ref is None:
            ref = out
        assert out == ref == frames


def test_corruption_rejected_everywhere():
    frames = [(i % 100 - 50, (i * 7) % 90 - 45) for i in range(400)]
    enc = encode_flac(2, 8000, 16, frames, stereo_mode=CH_MID_SIDE, block_size=256)
    # flip one bit at a spread of offsets: header, audio payload, tail
    for off in (5, 20, len(enc) // 3, len(enc) // 2, len(enc) - 3):
        bad = bytearray(enc)
        bad[off] ^= 0x10
        with pytest.raises(FlacFormatError):
            decode_flac(bytes(bad))
    with pytest.raises(FlacFormatError):
        decode_flac(b"fLaX" + enc[4:])
    with pytest.raises(FlacFormatError):
        decode_flac(enc[: len(enc) - 4])  # truncated final frame


def _handmade_stream(subframe_bits, n_samples, bits=8, channels=1):
    """Assemble a syntactically-complete one-frame FLAC stream whose
    subframe section is supplied as raw (value, nbits) pairs — lets tests
    drive decoder branches (LPC, wasted bits) our encoder never emits."""
    import hashlib
    import struct

    info = bytearray()
    info += struct.pack(">HH", n_samples, n_samples)
    info += b"\x00\x00\x00" * 2
    packed = (8000 << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | n_samples
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16  # md5 omitted -> decoder skips md5 verify
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    wr = _BitWriter()
    wr.write(0b11111111111110, 14)
    wr.write(0, 2)
    wr.write(6, 4)          # 8-bit block size follows
    wr.write(4, 4)          # 8000 Hz
    wr.write(channels - 1, 4)
    wr.write({8: 1, 16: 4}[bits], 3)
    wr.write(0, 1)
    wr.write(0, 8)          # frame number 0
    wr.write(n_samples - 1, 8)
    header = bytes(wr.buf)
    wr.write(_crc8(header), 8)
    for v, nb in subframe_bits:
        wr.write(v, nb)
    wr.align()
    body = bytes(wr.buf)
    wr.write(_crc16(body), 16)
    return bytes(out + wr.bytes())


def test_lpc_subframe_decode_handbuilt():
    # LPC order 2, precision 4, shift 1, coefs [3, -1]:
    #   pred_i = (3*s[i-1] - s[i-2]) >> 1   (arithmetic shift)
    # warmup 10, 12; residuals +1, -2, 0 ->
    #   s2 = ((36-10)>>1) + 1 = 14
    #   s3 = ((42-12)>>1) - 2 = 13
    #   s4 = ((39-14)>>1) + 0 = 12
    sub = [
        (0, 1), (0b100001, 6), (0, 1),       # LPC order 2, no wasted bits
        (10 & 0xFF, 8), (12 & 0xFF, 8),      # warmups
        (3, 4),                               # precision-1 = 3 -> 4 bits
        (1, 5),                               # shift = 1
        (3 & 0xF, 4), ((-1) & 0xF, 4),        # coefs
        (0, 2), (0, 4),                       # rice 4-bit, partition order 0
        (2, 4),                               # rice parameter k=2
        # residual +1 -> zigzag 2 -> q=0 (1), low bits 10
        (0b1, 1), (0b10, 2),
        # residual -2 -> zigzag 3 -> q=0 (1), low bits 11
        (0b1, 1), (0b11, 2),
        # residual 0 -> zigzag 0 -> q=0 (1), low bits 00
        (0b1, 1), (0b00, 2),
    ]
    stream = _handmade_stream(sub, 5)
    ch, rate, bits, frames = decode_flac(stream)
    assert (ch, rate, bits) == (1, 8000, 8)
    assert [f[0] for f in frames] == [10, 12, 14, 13, 12]


def test_wasted_bits_decode_handbuilt():
    # CONSTANT subframe, wasted = 2 (flag 1 + unary 1 -> one 0 then 1),
    # stored value 5 over 8-2=6 bits -> decoded sample 5 << 2 = 20
    sub = [
        (0, 1), (0, 6),      # CONSTANT
        (1, 1),              # wasted-bits flag
        (0b01, 2),           # unary 1 -> wasted = 2
        (5, 6),              # constant value in 6 effective bits
    ]
    stream = _handmade_stream(sub, 4)
    _, _, _, frames = decode_flac(stream)
    assert [f[0] for f in frames] == [20, 20, 20, 20]


def test_md5_mismatch_rejected():
    enc = bytearray(encode_flac(1, 8000, 8, [(i % 50,) for i in range(100)]))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the file
    # (4 magic + 4 block header + 18 fixed fields)
    enc[30] ^= 0xFF
    with pytest.raises(FlacFormatError, match="MD5"):
        decode_flac(bytes(enc))


def test_summary_matches_full_decode():
    frames = [((i * 13) % 200 - 100, (i * 7) % 200 - 100) for i in range(333)]
    enc = encode_flac(2, 16000, 16, frames, stereo_mode=CH_LEFT_SIDE)
    ch, rate, bits, n, total = decode_flac_summary(enc)
    assert (ch, rate, bits, n) == (2, 16000, 16, 333)
    assert total == sum(s for fr in frames for s in fr)


def test_decode_audio_seam_wav_flac_cross_referee(spark):
    """The same PCM signal through two independent codecs and decoders
    (RIFF/WAVE stdlib path vs FLAC bitstream path) must produce identical
    decode_audio summary rows."""
    import pandas as pd

    from ohsome_planet_spark.functions.flac import encode_flac as enc_flac
    from ohsome_planet_spark.functions.wav import encode_wav
    from ohsome_planet_spark.operators.multimodal import decode_audio

    rows = []
    for d in range(12):
        ch = d % 2 + 1
        n = d * 9 + 1
        frames = [
            tuple((d * 13 + f * 7 + c * 3) % 200 - 100 for c in range(ch))
            for f in range(n)
        ]
        rows.append((2 * d, encode_wav(ch, 8000, 16, frames)))
        rows.append((2 * d + 1, bytes(enc_flac(ch, 8000, 16, frames,
                                               block_size=16,
                                               partition_order=d % 3))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["media_id", "media"]),
                               "media_id bigint, media binary")
    out = {
        r["media_id"]: (r["channels"], r["sample_rate"], r["bits"],
                        r["n_frames"], r["sample_sum"])
        for r in decode_audio(df).collect()
    }
    for d in range(12):
        assert out[2 * d] == out[2 * d + 1], f"doc {d}: wav != flac"
        assert out[2 * d][4] is not None
