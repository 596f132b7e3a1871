"""RIFF/AVI MJPEG tests: independent referees for functions/avi.py and
the sample_video_frames operator.

- a HAND-ASSEMBLED container (struct-packed in the test, byte layout from
  the AVI spec — not produced by our encoder) must parse;
- randomized encoder→parser round-trips across index/junk/rate shapes;
- every idx1 field, header agreement rule and truncation must reject;
- frames decoded out of the container must equal decoding the same JPEG
  bytes directly (container layer cannot touch payloads);
- the probe_video seam dispatches AVI and ISO-BMFF by magic.
"""

import random
import struct

import pytest

from ohsome_planet_spark.functions.avi import (
    AviFormatError,
    encode_avi_mjpeg,
    parse_avi,
    probe_avi,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def test_handmade_container_parses():
    """Container assembled field-by-field from the spec layout."""
    frames = [b"frame-one!", b"frame-2"]
    avih = struct.pack("<10I16x", 1_000_000 // 25, 0, 0, 0x10, 2, 0, 1, 0, 64, 48)
    strh = (
        struct.pack("<4s4sIHHIIIIIIiHHHH", b"vids", b"MJPG", 0, 0, 0, 0,
                    1, 25, 0, 2, 0, -1, 0, 0, 0, 0)
        + struct.pack("<HH", 64, 48)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 64, 48, 1, 24, b"MJPG",
                       64 * 48 * 3, 0, 0, 0, 0)
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih)
                  + _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                           + _chunk(b"strf", strf)))
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for fr in frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, len(movi_body), len(fr))
        movi_body += _chunk(b"00dc", fr)
    body = b"AVI " + hdrl + _chunk(b"LIST", bytes(movi_body)) + _chunk(b"idx1", bytes(idx))
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    info = parse_avi(payload)
    assert (info["width"], info["height"]) == (64, 48)
    assert (info["rate"], info["scale"]) == (25, 1)
    assert info["handler"] == "MJPG"
    assert info["frames"] == frames
    assert probe_avi(payload) == (64, 48, 2, 2 * 1000 // 25)


def test_roundtrip_randomized():
    rng = random.Random(11)
    for _ in range(40):
        n = rng.randint(0, 9)
        frames = [bytes(rng.randrange(256) for _ in range(rng.randint(1, 50)))
                  for _ in range(n)]
        rate, scale = rng.choice([(30, 1), (25, 1), (24000, 1001), (15, 2)])
        enc = encode_avi_mjpeg(
            rng.randrange(8, 640), rng.randrange(8, 480), frames,
            rate=rate, scale=scale,
            write_index=rng.random() < 0.7,
            junk_bytes=rng.choice([0, 0, 7, 16]),
        )
        info = parse_avi(enc)
        assert info["frames"] == frames
        assert (info["rate"], info["scale"]) == (rate, scale)


def test_rejections():
    enc = encode_avi_mjpeg(16, 16, [b"aaaa", b"bbbbb"], rate=10)
    with pytest.raises(AviFormatError):
        parse_avi(b"RIFX" + enc[4:])
    with pytest.raises(AviFormatError):
        parse_avi(enc[:8] + b"WAVE" + enc[12:])
    with pytest.raises(AviFormatError):
        parse_avi(enc[:-6])  # truncated inside idx1
    # idx1 offset corruption
    bad = bytearray(enc)
    off = bad.rindex(b"idx1")
    struct.pack_into("<I", bad, off + 8 + 8, 9999)
    with pytest.raises(AviFormatError, match="offset"):
        parse_avi(bytes(bad))
    # idx1 size corruption
    bad = bytearray(enc)
    struct.pack_into("<I", bad, off + 8 + 12, 3)
    with pytest.raises(AviFormatError, match="size"):
        parse_avi(bytes(bad))
    # frame-count disagreement
    bad = bytearray(enc)
    avih_off = bad.index(b"avih")
    struct.pack_into("<I", bad, avih_off + 8 + 16, 7)  # dwTotalFrames
    with pytest.raises(AviFormatError, match="frame count"):
        parse_avi(bytes(bad))
    # strf/avih dimension disagreement
    bad = bytearray(enc)
    strf_off = bad.index(b"strf")
    struct.pack_into("<i", bad, strf_off + 8 + 4, 999)  # biWidth
    with pytest.raises(AviFormatError, match="dimensions"):
        parse_avi(bytes(bad))


def test_container_is_payload_transparent():
    """Cross-referee: JPEG frames decoded out of the container must equal
    decoding the same bytes directly — two paths that share only the
    payload."""
    from ohsome_planet_spark.functions.jpeg import decode_jpeg, encode_jpeg

    jpegs, direct = [], []
    for f in range(5):
        rows = [bytes(((f * 29 + (c // 8) * 11 + (r // 8) * 23) % 256)
                      for c in range(16)) for r in range(8)]
        j = encode_jpeg(16, 8, rows, channels=1, quant=1)
        jpegs.append(j)
        direct.append(decode_jpeg(j))
    enc = encode_avi_mjpeg(16, 8, jpegs, rate=30)
    out = [decode_jpeg(fr) for fr in parse_avi(enc)["frames"]]
    assert out == direct


def test_probe_video_seam_dispatch(spark):
    import pandas as pd

    from ohsome_planet_spark.functions.isobmff import encode_mp4_header
    from ohsome_planet_spark.operators.multimodal import probe_video

    avi = encode_avi_mjpeg(32, 24, [b"x" * 10] * 6, rate=12, scale=1)
    mp4 = encode_mp4_header(320, 240, duration=6000, timescale=1000)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "media": [avi, mp4]}),
        "media_id bigint, media binary",
    )
    out = {r["media_id"]: (r["width"], r["height"], r["duration_ms"])
           for r in probe_video(df).collect()}
    assert out[1] == (32, 24, 6 * 1000 // 12)
    assert out[2] == (320, 240, 6000)


def test_sample_video_frames_stride_and_cap(spark):
    import pandas as pd

    from ohsome_planet_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from ohsome_planet_spark.operators.multimodal import sample_video_frames

    jpegs = []
    for f in range(11):
        rows = [bytes(((f * 13 + c) % 256) for c in range(8)) for _ in range(8)]
        jpegs.append(encode_jpeg(8, 8, rows, channels=1, quant=8))
    enc = encode_avi_mjpeg(8, 8, jpegs, rate=30)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "media": [enc]}),
        "media_id bigint, media binary",
    )
    out = sorted(
        (r["frame_idx"], r["n_frames"], r["pixel_sum"])
        for r in sample_video_frames(df, every_n=3, max_frames=3).collect()
    )
    expect = []
    for i in (0, 3, 6):
        _, _, _, prows = decode_jpeg(jpegs[i])
        expect.append((i, 11, sum(sum(r) for r in prows)))
    assert out == expect
