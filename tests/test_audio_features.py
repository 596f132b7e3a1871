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
