"""Referees for the MPEG-audio probe (functions/mp3.py): published
known-answer frame geometry (the canonical 417/418-byte 128 kbps @ 44100
Layer III frame and friends), ID3v2 syncsafe skipping, Xing/Info VBR
headers at their channel-mode offsets, and corrupt-input rejection.
"""

from __future__ import annotations

import pytest

from ohsome_planet_spark.functions.mp3 import (
    Mp3FormatError,
    encode_mp3,
    probe_mp3,
)


def test_canonical_frame_sizes():
    # the textbook values: MPEG1 Layer III 128 kbps @ 44100 Hz
    # -> floor(144*128000/44100) = 417 bytes unpadded, 418 padded
    b = encode_mp3(3, 2, [9, 9], 0, channels=2, padding_pattern=0b10)
    r = probe_mp3(b)
    assert r["total_frame_bytes"] == 417 + 418
    assert r["bitrate_kbps"] == 128 and r["sample_rate"] == 44100
    # MPEG1 Layer I 384 kbps @ 48000 -> (12*384000/48000)*4 = 384 bytes
    b = encode_mp3(3, 0, [12], 1, channels=2)
    assert probe_mp3(b)["total_frame_bytes"] == 384
    # MPEG2 Layer III 64 kbps @ 24000 -> 72*64000/24000 = 192 bytes
    b = encode_mp3(2, 2, [8], 1, channels=1)
    r = probe_mp3(b)
    assert r["total_frame_bytes"] == 192
    # MPEG2 Layer III granule: 576 samples @ 24000 Hz = 24 ms exactly
    assert r["duration_us"] == 24000


def test_duration_arithmetic():
    # 38 MPEG1 Layer III frames @ 44100: each 1152 samples
    b = encode_mp3(3, 2, [9] * 38, 0)
    r = probe_mp3(b)
    assert r["n_frames"] == 38
    assert r["duration_us"] == 38 * (1152 * 1_000_000 // 44100)


def test_id3v2_skip():
    plain = encode_mp3(3, 2, [9] * 3, 0)
    tagged = encode_mp3(3, 2, [9] * 3, 0, id3_bytes=1000)
    a, b = probe_mp3(plain), probe_mp3(tagged)
    assert a == b  # the tag is transparent to the probe
    # syncsafe length: a tag body > 127 bytes exercises the 7-bit packing
    assert tagged[:3] == b"ID3" and len(tagged) == len(plain) + 10 + 1000


@pytest.mark.parametrize("channels,version,xo", [
    (1, 3, 21), (2, 3, 36), (1, 2, 13), (2, 2, 21),
])
def test_xing_offsets(channels, version, xo):
    # the Xing tag must sit at 4 + side-info bytes (17/32 MPEG1,
    # 9/17 MPEG2 for mono/stereo) — the published offsets
    b = encode_mp3(version, 2, [9, 10, 11], 0, channels=channels, xing=True)
    assert b[xo : xo + 4] == b"Xing"
    r = probe_mp3(b)
    assert r["is_vbr"] and r["xing_frames"] == 3


def test_vbr_weighted_average():
    # varying bitrates: byte-weighted integer average, not the header max
    b = encode_mp3(3, 2, [1, 14], 0, channels=2)  # 32 and 320 kbps
    r = probe_mp3(b)
    total = 144 * 32000 // 44100 + 144 * 320000 // 44100
    assert r["total_frame_bytes"] == total
    assert r["bitrate_kbps"] == total * 8 * 44100 // (2 * 1152) // 1000
    assert r["is_vbr"]


def test_corrupt_rejection():
    with pytest.raises(Mp3FormatError):
        probe_mp3(b"\x00\x01\x02\x03\x04\x05")  # no sync
    good = encode_mp3(3, 2, [9] * 2, 0)
    with pytest.raises(Mp3FormatError):
        probe_mp3(good[: len(good) - 10])  # truncated final frame
    with pytest.raises(Mp3FormatError):
        probe_mp3(b"ID3\x04\x00\x00\x00\x00")  # truncated ID3 header
    # free-format bitrate (index 0) is rejected, not guessed
    h = bytes([0xFF, 0xFB, 0x00, 0x00])
    with pytest.raises(Mp3FormatError):
        probe_mp3(h + bytes(100))
    # mid-file parameter change is an error, not silently averaged
    a = encode_mp3(3, 2, [9], 0)
    b = encode_mp3(2, 2, [9], 0)
    with pytest.raises(Mp3FormatError):
        probe_mp3(a + b)


def test_truncated_xing_raises_format_error():
    # a first frame cut INSIDE the Xing words must raise Mp3FormatError
    # (the module's declared contract), never a bare struct.error —
    # direct probe_mp3 callers don't route through probe_audio_stream
    full = encode_mp3(3, 2, [9, 10, 11], 0, channels=2, xing=True)
    assert full[36:40] == b"Xing"
    for cut in (38, 40, 41, 43, 47):  # tag visible, words truncated
        with pytest.raises(Mp3FormatError):
            probe_mp3(full[:cut])


def test_seam_routing(spark):
    from ohsome_planet_spark.operators.multimodal import (
        probe_audio_stream,
        with_media_meta,
    )

    payload = encode_mp3(3, 2, [9] * 4, 0, id3_bytes=50)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"notmp3bytes"))],
        "id long, media binary",
    )
    rows = {r.id: r for r in probe_audio_stream(df).collect()}
    assert rows[1].n_frames == 4 and rows[1].sample_rate == 44100
    assert rows[2].n_frames is None  # nulls out, job survives
    kinds = {r.id: r.kind for r in with_media_meta(df).collect()}
    assert kinds[1] == "mp3"


# --- Layer I sample decode ---------------------------------------------------


def test_mp1_requantization_known_values():
    from ohsome_planet_spark.functions.mp3 import (
        SCALEFACTORS,
        decode_mp1_subbands,
        encode_mp1,
    )

    # published scalefactor law: scf(0)=2.0, scf(3)=1.0, scf(6)=0.5
    assert SCALEFACTORS[0] == 2.0 and SCALEFACTORS[3] == 1.0
    assert SCALEFACTORS[6] == 0.5
    # nb=2: raw 0..3 -> fraction -1+1/2 .. 1/2+... ; hand-check extremes
    alloc = [[0] * 32]
    alloc[0][0] = 1  # nb = 2
    scf = [[0] * 32]
    scf[0][0] = 3  # scf = 1.0
    samples = [[[0] * 12 for _ in range(32)]]
    samples[0][0] = [0, 1, 2, 3] * 3
    _, _, _, frames = decode_mp1_subbands(
        encode_mp1(alloc, scf, samples, channels=1)
    )
    got = frames[0][0][0][:4]
    # s = (4/3) * ((raw ^ 2)/2 - 1 + 1/4): the exact symmetric grid
    want = [(4.0 / 3.0) * ((r ^ 2) / 2.0 - 1.0 + 0.25) for r in (0, 1, 2, 3)]
    assert got == want
    assert want == [1.0 / 3.0, 1.0, -1.0, -1.0 / 3.0]
    # ISO property: codes land on the exact symmetric [-1, +1] range
    assert max(got) == 1.0 and min(got) == -1.0
    assert sorted(got) == sorted(-v for v in got)


def test_mp1_bit_order_and_interleave():
    from ohsome_planet_spark.functions.mp3 import (
        decode_mp1_subbands,
        encode_mp1,
    )

    # stereo: samples interleave (s, sb, ch) — flipping one channel's raw
    # must change only that channel's value
    alloc = [[1] + [0] * 31, [1] + [0] * 31]
    scf = [[3] + [0] * 31, [3] + [0] * 31]
    base = [[[1] * 12 for _ in range(32)], [[1] * 12 for _ in range(32)]]
    import copy

    mod = copy.deepcopy(base)
    mod[1][0][5] = 3  # channel 1, subband 0, sample 5
    _, _, _, fa = decode_mp1_subbands(encode_mp1(alloc, scf, base, channels=2))
    _, _, _, fb = decode_mp1_subbands(encode_mp1(alloc, scf, mod, channels=2))
    assert fa[0][0][0] == fb[0][0][0]  # channel 0 untouched
    diffs = [s for s in range(12) if fa[0][1][0][s] != fb[0][1][0][s]]
    assert diffs == [5]


def test_mp1_rejects_out_of_scope():
    from ohsome_planet_spark.functions.mp3 import (
        Mp3FormatError,
        decode_mp1_subbands,
        encode_mp1,
        encode_mp3,
    )

    with pytest.raises(Mp3FormatError):  # Layer III stream
        decode_mp1_subbands(encode_mp3(3, 2, [9], 0))
    good = encode_mp1(
        [[1] + [0] * 31], [[3] + [0] * 31],
        [[[1] * 12 for _ in range(32)]], channels=1,
    )
    with pytest.raises(Mp3FormatError):
        decode_mp1_subbands(good[: len(good) - 30])  # truncated frame
    # forbidden allocation value 15
    bad = bytearray(good)
    bad[4] = 0xFF  # first two 4-bit allocations -> 15,15
    with pytest.raises(Mp3FormatError):
        decode_mp1_subbands(bytes(bad))


def test_mp1_geometry_agrees_with_probe():
    from ohsome_planet_spark.functions.mp3 import (
        decode_mp1_subbands,
        encode_mp1,
        probe_mp3,
    )

    b = encode_mp1(
        [[2] * 32], [[0] * 32], None,
        sr_idx=1, br_idx=14, channels=1, n_frames=4,
        sample_fn=lambda f, c, sb, s: (f + sb + s) % 8,
    )
    probe = probe_mp3(b)
    rate, ch, nf, _ = decode_mp1_subbands(b)
    assert (probe["sample_rate"], probe["channels"], probe["n_frames"]) == (
        rate, ch, nf,
    )
    assert probe["layer"] == 1 and probe["bitrate_kbps"] == 448
