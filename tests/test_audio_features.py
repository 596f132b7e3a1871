"""audio_features: integer-exact PCM features with two referees —
a pure-Python replay, and codec cross-checking (the same signal through
the WAV path and the FLAC path must feature identically)."""

import pandas as pd


def _expected(frames, frame_len=16):
    mono = [sum(fr) // len(fr) for fr in frames]
    energy = sum(v * v for v in mono)
    zc = sum(1 for a, b in zip(mono, mono[1:]) if (a < 0) != (b < 0))
    peak = max(abs(v) for v in mono) if mono else 0
    nf = -(-len(mono) // frame_len) if mono else 0
    return nf, energy, zc, peak


def test_audio_features_python_replay_and_codec_cross_check(spark):
    from ohsome_planet_spark.functions.flac import CH_MID_SIDE, encode_flac
    from ohsome_planet_spark.functions.wav import encode_wav
    from ohsome_planet_spark.operators.multimodal import audio_features

    rows = []
    expected = {}
    for d in range(8):
        ch = d % 2 + 1
        n = d * 11 + 3
        frames = [
            tuple((d * 13 + f * 7 + c * 3) % 200 - 100 for c in range(ch))
            for f in range(n)
        ]
        expected[d] = _expected(frames)
        rows.append((3 * d, encode_wav(ch, 8000, 16, frames)))
        rows.append((3 * d + 1, bytes(encode_flac(
            ch, 8000, 16, frames, block_size=16,
            stereo_mode=CH_MID_SIDE if ch == 2 else None))))
    rows.append((999, b"junk payload"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["media_id", "media"]),
                               "media_id bigint, media binary")
    out = {r["media_id"]: (r["n_analysis_frames"], r["energy_total"],
                           r["zero_crossings"], r["peak_abs"])
           for r in audio_features(df, frame_len=16).collect()}
    for d in range(8):
        assert out[3 * d] == expected[d], f"wav doc {d}"
        assert out[3 * d + 1] == expected[d], f"flac doc {d}"
        assert out[3 * d] == out[3 * d + 1]
    assert out[999] == (None, None, None, None)


def test_g711_expansion_matches_stdlib_audioop():
    """Independent referee: every one of the 256 wire bytes must expand
    exactly like the stdlib audioop tables for both laws. (This test
    caught a real bug on landing: A-law's sign bit means POSITIVE when
    set — inverted relative to µ-law — and the co-authored oracle had
    faithfully replayed the same wrong convention.)"""
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from ohsome_planet_spark.functions.wav import alaw_to_linear, ulaw_to_linear

    for b in range(256):
        assert ulaw_to_linear(b) == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([b]), 2))[0], f"ulaw byte {b}"
        assert alaw_to_linear(b) == struct.unpack(
            "<h", audioop.alaw2lin(bytes([b]), 2))[0], f"alaw byte {b}"


def test_g711_wav_seam(spark):
    import pandas as pd

    from ohsome_planet_spark.functions.wav import (
        TAG_ALAW,
        TAG_ULAW,
        alaw_to_linear,
        encode_wav_g711,
        ulaw_to_linear,
    )
    from ohsome_planet_spark.operators.multimodal import decode_audio

    raw = bytes(range(0, 250, 3))
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2],
            "media": [encode_wav_g711(1, 8000, TAG_ULAW, raw),
                      encode_wav_g711(2, 8000, TAG_ALAW, raw)],
        }),
        "media_id bigint, media binary",
    )
    out = {r["media_id"]: r.asDict() for r in decode_audio(df).collect()}
    assert out[1]["bits"] == 16 and out[1]["n_frames"] == len(raw)
    assert out[1]["sample_sum"] == sum(ulaw_to_linear(b) for b in raw)
    assert out[2]["n_frames"] == len(raw) // 2  # stereo interleave
    assert out[2]["sample_sum"] == sum(alaw_to_linear(b) for b in raw)
