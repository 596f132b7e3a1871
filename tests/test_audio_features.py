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


def test_ima_adpcm_step_matches_stdlib_audioop():
    """Independent referee: every (nibble, step-index bucket) transition
    of the IMA state machine must match stdlib audioop's Intel/DVI
    decoder. audioop consumes HIGH nibble first; WAV is low-first — the
    test packs accordingly."""
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from ohsome_planet_spark.functions.wav import ima_adpcm_step

    for idx0 in range(0, 89, 7):
        for pred0 in (-32768, -1234, 0, 77, 32767):
            nibs = [(idx0 * 3 + pred0 + i * 5) % 16 for i in range(16)]
            pred, idx = pred0, idx0
            mine = []
            for nb in nibs:
                pred, idx = ima_adpcm_step(pred, idx, nb)
                mine.append(pred)
            packed = bytes(
                (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
            )
            out, state = audioop.adpcm2lin(packed, 2, (pred0, idx0))
            ref = list(struct.unpack(f"<{len(nibs)}h", out))
            assert mine == ref, (idx0, pred0)
            assert state == (pred, idx)


def test_ima_adpcm_wav_seam(spark):
    import pandas as pd

    from ohsome_planet_spark.functions.wav import (
        encode_wav_ima,
        ima_adpcm_step,
    )
    from ohsome_planet_spark.operators.multimodal import decode_audio

    nibs = [(i * 11 + 2) % 16 for i in range(40)]
    pred0, idx0 = 99, 33
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1],
                      "media": [encode_wav_ima(16000, pred0, idx0, nibs)]}),
        "media_id bigint, media binary",
    )
    row = decode_audio(df).collect()[0]
    pred, idx = pred0, idx0
    total = pred0
    for nb in nibs:
        pred, idx = ima_adpcm_step(pred, idx, nb)
        total += pred
    assert (row["channels"], row["sample_rate"], row["bits"]) == (1, 16000, 16)
    assert row["n_frames"] == len(nibs) + 1
    assert row["sample_sum"] == total


def test_ima_adpcm_rejections():
    import pytest as _pytest

    from ohsome_planet_spark.functions.wav import (
        WavFormatError,
        decode_wav_frames,
        encode_wav_ima,
    )

    good = encode_wav_ima(8000, 0, 0, [1, 2, 3, 4])
    bad = bytearray(good)
    bad[bad.index(b"data") + 4 + 4 + 2] = 89  # step index out of range
    with _pytest.raises(WavFormatError, match="step index"):
        decode_wav_frames(bytes(bad))
