"""ID3v2 parsing: hand-packed fixtures (independent of the encoder),
encoding/version grid, unsync and padding edges, error contract, and
the operator seam."""

from __future__ import annotations

import pytest

from ohsome_planet_spark.functions.id3 import (
    Id3FormatError,
    encode_id3v2,
    parse_id3v2,
)


def _hand_v23_tag() -> bytes:
    """v2.3 tag with one Latin-1 TIT2 and one UTF-16 TPE1, packed
    byte-by-byte here (not via the encoder)."""
    tit2_body = b"\x00Hand Title"
    tpe1_body = b"\x01" + "Ärtist".encode("utf-16")
    frames = (
        b"TIT2" + len(tit2_body).to_bytes(4, "big") + b"\x00\x00" + tit2_body
        + b"TPE1" + len(tpe1_body).to_bytes(4, "big") + b"\x00\x00" + tpe1_body
    )
    size = len(frames)
    ss = bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3\x03\x00\x00" + ss + frames


def test_hand_packed_v23_referee():
    r = parse_id3v2(_hand_v23_tag())
    assert r["version"] == 3
    assert r["title"] == "Hand Title"
    assert r["artist"] == "Ärtist"
    assert r["album"] is None and r["comment"] is None
    assert r["n_frames"] == 2


@pytest.mark.parametrize("major", [2, 3, 4])
@pytest.mark.parametrize("enc", [0, 1, 2, 3])
def test_roundtrip_grid(major, enc):
    fields = {
        "title": "t one",
        "artist": "someone",
        "album": "the album",
        "year": "1999",
        "track": "3/9",
        "genre": "jazz",
    }
    tag = encode_id3v2(fields, major=major, enc=enc, comment="hi there",
                       unsync=major < 4, padding=9)
    r = parse_id3v2(tag + b"\xff\xfb\x90\x00")
    for k, v in fields.items():
        assert r[k] == v, (major, enc, k)
    assert r["comment"] == "hi there"
    assert r["version"] == major and r["n_frames"] == 7


def test_unsync_restores_ff_bytes():
    """A UTF-16 title containing 0xFF bytes must survive the
    unsynchronization round trip byte-exactly."""
    tag = encode_id3v2({"title": "世界"}, major=3, enc=1,
                       unsync=True)
    assert b"\xff\x00" in tag  # unsync actually fired
    assert parse_id3v2(tag)["title"] == "世界"


def test_v24_multivalue_and_syncsafe_sizes():
    # hand-build a v2.4 TPE1 with two null-separated values
    body = b"\x03first\x00second"
    n = len(body)
    frame = b"TPE1" + bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0)) \
        + b"\x00\x00" + body
    size = len(frame)
    tag = (b"ID3\x04\x00\x00"
           + bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0)) + frame)
    r = parse_id3v2(tag)
    assert r["frames"]["TPE1"] == ["first", "second"]
    assert r["artist"] == "first"


def test_error_contract():
    with pytest.raises(Id3FormatError, match="no ID3v2"):
        parse_id3v2(b"\xff\xfb\x90\x00")
    with pytest.raises(Id3FormatError, match="unsupported"):
        parse_id3v2(b"ID3\x05\x00\x00\x00\x00\x00\x00")
    good = encode_id3v2({"title": "x"})
    with pytest.raises(Id3FormatError, match="truncated"):
        parse_id3v2(good[:-3])
    with pytest.raises(Id3FormatError, match="syncsafe"):
        parse_id3v2(b"ID3\x03\x00\x00\x80\x00\x00\x00")


def test_operator_quarantines_untagged(spark):
    from ohsome_planet_spark.operators.multimodal import audio_tags

    tagged = encode_id3v2({"title": "ok", "genre": "rock"}, major=4, enc=3)
    rows = [(1, bytearray(tagged)), (2, bytearray(b"\xff\xfb\x90\x00raw"))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in audio_tags(df).collect()}
    assert out[1]["title"] == "ok" and out[1]["genre"] == "rock"
    assert out[2]["title"] is None and out[2]["version"] is None
