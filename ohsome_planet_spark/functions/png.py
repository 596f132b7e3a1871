"""Pure-stdlib PNG codec (struct + zlib) — the real decoder behind the
multimodal decode seam (``operators/multimodal.py``).

Supports bit depth 8, color types 0 (grayscale), 2 (RGB) and 6 (RGBA),
non-interlaced, with all five scanline filters (None/Sub/Up/Average/
Paeth). That covers every PNG this engine's own encoder emits and the
overwhelming majority of real-world 8-bit PNGs; anything else raises
``PngFormatError`` so callers can fall back to the stub path.

The encoder exists so tests and registry queries can build REAL encoded
bytes with varied per-row filters — decoding them is a genuine
round-trip through the un-filter logic, not a header peek.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngFormatError(ValueError):
    """Not a PNG, or a PNG feature outside the supported profile."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(row))
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = row[i]
        elif ftype == 1:
            out[i] = (row[i] - a) & 0xFF
        elif ftype == 2:
            out[i] = (row[i] - b) & 0xFF
        elif ftype == 3:
            out[i] = (row[i] - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (row[i] - _paeth(a, b, c)) & 0xFF
        else:
            raise PngFormatError(f"bad filter type {ftype}")
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(filt))
    for i in range(len(filt)):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = filt[i]
        elif ftype == 1:
            out[i] = (filt[i] + a) & 0xFF
        elif ftype == 2:
            out[i] = (filt[i] + b) & 0xFF
        elif ftype == 3:
            out[i] = (filt[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (filt[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngFormatError(f"bad filter type {ftype}")
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    rows: list[bytes],
    color_type: int = 0,
    row_filters: list[int] | None = None,
) -> bytes:
    """Encode 8-bit scanlines (each ``width * channels`` bytes) to PNG.
    ``row_filters`` picks the per-row filter type (default 0/None) — vary
    it to make decoding exercise the full un-filter matrix."""
    if color_type not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color_type}")
    stride = width * _CHANNELS[color_type]
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = bytes(rows[r])
        if len(row) != stride:
            raise PngFormatError(
                f"row {r}: expected {stride} bytes, got {len(row)}"
            )
        ftype = row_filters[r] if row_filters is not None else 0
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev, _CHANNELS[color_type])
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode PNG bytes → (width, height, channels, scanline rows).

    Full pixel decode: inflate the IDAT stream and reverse the per-row
    filters. Raises :class:`PngFormatError` on non-PNG input or features
    outside the supported profile (16-bit, palette, interlace)."""
    data = bytes(data)
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise PngFormatError("missing PNG signature")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise PngFormatError("truncated chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + payload + crc
    if width is None:
        raise PngFormatError("no IHDR chunk")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise PngFormatError(
            f"unsupported profile: depth={bit_depth} color={color_type}"
            f" interlace={interlace}"
        )
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise PngFormatError(
            f"IDAT size {len(raw)} != {height} rows of {stride}+1 bytes"
        )
    rows: list[bytes] = []
    prev = bytes(stride)
    for r in range(height):
        off = r * (stride + 1)
        row = _unfilter_row(raw[off], raw[off + 1 : off + 1 + stride], prev, channels)
        rows.append(row)
        prev = row
    return width, height, channels, rows
