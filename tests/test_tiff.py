"""Referees for the baseline TIFF decoder (functions/tiff.py):

1. an INDEPENDENT LZW decoder transcribed from the TIFF 6.0 spec
   pseudocode (different structure: int->bytes table dict, explicit bit
   cursor) fuzz-checked against the module's encoder and decoder;
2. the TIFF 6.0 spec's published PackBits known-answer vector;
3. a cross-DECODER seam check: the same pixel grid encoded as PNG and as
   TIFF must decode to identical rows (the PNG decoder has its own
   referee lineage, so agreement certifies the TIFF container walk
   without trusting the TIFF encoder);
4. early-change boundary coverage (streams crossing the 511/1023 code
   widths) and corrupt-input rejection.
"""

from __future__ import annotations

import random

import pytest

from ohsome_planet_spark.functions.tiff import (
    TiffFormatError,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


# --- independent LZW referee (TIFF 6.0 spec pseudocode transcription) --------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def get(self, width: int) -> int:
        v = 0
        for _ in range(width):
            byte = self.bitpos // 8
            if byte >= len(self.data):
                return 257  # EOI on exhaustion
            bit = 7 - self.bitpos % 8
            v = (v << 1) | ((self.data[byte] >> bit) & 1)
            self.bitpos += 1
        return v


def _spec_lzw_decode(data: bytes) -> bytes:
    # straight transcription of the TIFF 6.0 "LZW Decoding" pseudocode;
    # the decoder-side early-change thresholds 510/1022/2046 are the
    # published constants (TIFF 6.0 LZW section / libtiff LZWDecode):
    # the reader widens one table entry before the natural power of two
    # because its table lags the encoder's by exactly one entry
    rd = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []

    def init_table():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))

    def width() -> int:
        f = len(table)
        if f < 510:
            return 9
        if f < 1022:
            return 10
        if f < 2046:
            return 11
        return 12

    init_table()
    code = rd.get(width())
    old = None
    while code != 257:
        if code == 256:
            init_table()
            code = rd.get(width())
            if code == 257:
                break
            out += table[code]
            old = code
        else:
            if code < len(table):
                entry = table[code]
                out += entry
                if old is not None:
                    table.append(table[old] + entry[:1])
            else:
                entry = table[old] + table[old][:1]
                out += entry
                table.append(entry)
            old = code
        code = rd.get(width())
    return bytes(out)


@pytest.mark.parametrize("seed", range(6))
def test_lzw_vs_spec_referee(seed):
    rng = random.Random(seed)
    n = rng.choice([0, 1, 17, 400, 3000, 9000])
    alphabet = rng.choice([2, 5, 256])
    data = bytes(rng.randrange(alphabet) for _ in range(n))
    enc = _lzw_encode(data)
    assert _spec_lzw_decode(enc) == data
    assert _lzw_decode(enc) == data


def test_lzw_early_change_boundaries():
    # highly incompressible stream forces the table past 511 and 1023,
    # crossing both early-change boundaries; referee must still agree
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(6000))
    enc = _lzw_encode(data)
    assert _spec_lzw_decode(enc) == data
    assert _lzw_decode(enc) == data


def test_packbits_spec_vector():
    # TIFF 6.0 specification, PackBits section, published example
    packed = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    unpacked = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert _packbits_decode(packed, len(unpacked)) == unpacked
    # and the encoder round-trips the same plaintext
    assert (
        _packbits_decode(_packbits_encode(unpacked), len(unpacked)) == unpacked
    )


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 32773, 5])
def test_container_roundtrip_grid(big_endian, compression):
    rng = random.Random(compression + big_endian)
    for ch, photo in ((1, 1), (3, 2), (1, 0)):
        w, h = rng.randint(1, 9), rng.randint(1, 7)
        rows = [
            bytes(rng.randrange(256) for _ in range(w * ch))
            for _ in range(h)
        ]
        for pred in (1, 2) if compression == 5 else (1,):
            t = encode_tiff(
                w, h, rows, channels=ch, compression=compression,
                big_endian=big_endian, rows_per_strip=rng.randint(1, h),
                predictor=pred, photometric=photo,
            )
            W, H, C, out = decode_tiff(t)
            assert (W, H, C) == (w, h, ch)
            want = (
                [bytes(255 - b for b in r) for r in rows]
                if photo == 0
                else rows
            )
            assert out == want


def test_palette_fold():
    pal = (
        [((i * 3) % 256) << 8 for i in range(256)]
        + [((i * 5) % 256) << 8 for i in range(256)]
        + [((i * 7) % 256) << 8 for i in range(256)]
    )
    idx_rows = [bytes((x + 2 * y) % 256 for x in range(5)) for y in range(3)]
    t = encode_tiff(
        5, 3, idx_rows, channels=1, compression=32773,
        photometric=3, colormap=pal,
    )
    w, h, c, rows = decode_tiff(t)
    assert (w, h, c) == (5, 3, 3)
    for y in range(3):
        for x in range(5):
            i = (x + 2 * y) % 256
            assert rows[y][3 * x : 3 * x + 3] == bytes(
                ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
            )


def test_cross_decoder_png_agreement():
    from ohsome_planet_spark.functions.png import encode_png, decode_png

    rng = random.Random(7)
    for ch in (1, 3):
        w, h = 11, 6
        rows = [
            bytes(rng.randrange(256) for _ in range(w * ch))
            for _ in range(h)
        ]
        p_w, p_h, p_c, p_rows = decode_png(
            encode_png(w, h, rows, color_type=0 if ch == 1 else 2)
        )
        t_w, t_h, t_c, t_rows = decode_tiff(
            encode_tiff(w, h, rows, channels=ch, compression=5,
                        rows_per_strip=2, predictor=2)
        )
        assert (p_w, p_h, p_c) == (t_w, t_h, t_c)
        assert [bytes(r) for r in p_rows] == [bytes(r) for r in t_rows]


def test_corrupt_rejection():
    good = encode_tiff(3, 2, [b"abc", b"def"], channels=1)
    with pytest.raises(TiffFormatError):
        decode_tiff(b"II*\x00" + b"\xff\xff\xff\xff")  # IFD out of range
    with pytest.raises(TiffFormatError):
        decode_tiff(good[:20])  # truncated strips
    with pytest.raises((TiffFormatError, ValueError)):
        decode_tiff(b"XX*\x00" + good[4:])  # bad byte-order mark
    # unsupported features fail fast, not silently wrong:
    # flip compression tag value to something unsupported (7 = JPEG)
    t = encode_tiff(3, 2, [b"abc", b"def"], channels=1, compression=1)
    idx = t.find((259).to_bytes(2, "little"))
    bad = bytearray(t)
    bad[idx + 8] = 7
    with pytest.raises(TiffFormatError):
        decode_tiff(bytes(bad))


def test_multimodal_seam_routes_tiff(spark):
    from ohsome_planet_spark.operators.multimodal import decode_media

    payload = encode_tiff(
        4, 3,
        [bytes((x * 10 + y) % 256 for x in range(4)) for y in range(3)],
        channels=1, compression=5,
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "id long, media binary")
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.channels) == (4, 3, 1)
    assert row.pixel_sum == sum(
        (x * 10 + y) % 256 for x in range(4) for y in range(3)
    )


@pytest.mark.parametrize("compression", [1, 32773, 5])
def test_tiled_organization(compression):
    rng = random.Random(compression)
    # 37x21 is not a multiple of 16: right/bottom tiles are zero-padded
    # on encode and must crop back exactly on decode
    w, h, ch = 37, 21, 3
    rows = [bytes(rng.randrange(256) for _ in range(w * ch)) for _ in range(h)]
    t = encode_tiff(
        w, h, rows, channels=ch, compression=compression,
        predictor=2 if compression == 5 else 1, tile_size=(16, 16),
    )
    W, H, C, out = decode_tiff(t)
    assert (W, H, C) == (w, h, ch)
    assert out == rows
    # tiled and strip encodings of the same pixels decode identically
    t2 = encode_tiff(w, h, rows, channels=ch, compression=compression,
                     rows_per_strip=5)
    assert decode_tiff(t2)[3] == out


def test_tiled_rejects_bad_geometry():
    rows = [bytes(range(16))] * 16
    with pytest.raises(ValueError):
        encode_tiff(16, 16, rows, channels=1, tile_size=(10, 16))
    good = encode_tiff(16, 16, rows, channels=1, tile_size=(16, 16))
    # corrupt the tile count: drop the final bytes so a tile runs off the end
    with pytest.raises(TiffFormatError):
        decode_tiff(good[:-8])
