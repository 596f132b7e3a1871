"""Stdlib GIF codec — REAL decode of GIF87a/89a image data for the
multimodal seam: logical screen descriptor, global/local color tables,
graphic-control/comment/application extension skipping, interlaced row
de-scrambling, and the full variable-width LZW decompressor (dictionary
growth to 4096, clear-code resets, the KwKwK self-reference case).

GIF is LOSSLESS, so decoded pixel sums are exact and SQL-replayable like
PNG/WAV. ``encode_gif`` writes real LZW-compressed fixtures (the same
dictionary algorithm in reverse) so round-trip tests exercise dictionary
resets and code-width growth on both sides.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class GifFormatError(ValueError):
    pass


# --- LZW ---------------------------------------------------------------------


class _LzwBitReader:
    """LSB-first bit reader over concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise GifFormatError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF LZW: variable code width starting at min_code_size+1, CLEAR
    resets the dictionary, EOI terminates; stops after n_pixels indices."""
    if not 2 <= min_code_size <= 11:
        raise GifFormatError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LzwBitReader(data)
    out: list[int] = []

    def reset():
        return {i: [i] for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifFormatError("LZW code before any literal")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise GifFormatError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise GifFormatError("LZW stream ended early")
    return out[:n_pixels]


class _LzwBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """The matching compressor: emits CLEAR, dictionary-codes the index
    stream (resetting at 4096), EOI at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LzwBitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    w.write(clear, width)
    seq: tuple[int, ...] = ()
    for idx in indices:
        if idx >= clear:
            raise ValueError(f"index {idx} exceeds palette")
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        w.write(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's dictionary lags this one by exactly one entry
            # (it only adds from its second code onward), so width grows
            # one addition LATER than the decoder-side next_code==2^width
            # rule — classic LZW-GIF synchronization
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            w.write(clear, width)
            table, next_code, width = reset()
        seq = (idx,)
    if seq:
        w.write(table[seq], width)
    w.write(eoi, width)
    return w.finish()


# --- container ---------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def decode_gif(payload: bytes):
    """First image of a GIF → ``(width, height, 3, rows)`` with RGB rows
    (same shape as the PNG/JPEG decoders). Transparency/animation
    semantics are out of scope — this is the pixel-decode seam."""
    buf = bytes(payload)
    if len(buf) < 13 or buf[:6] not in GIF_MAGICS:
        raise GifFormatError("not a GIF")
    try:
        return _decode_gif_body(buf)
    except (struct.error, IndexError) as exc:
        raise GifFormatError(f"truncated GIF: {exc}") from exc


def _decode_gif_body(buf: bytes):
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(buf[off + 3 * i : off + 3 * i + 3]) for i in range(n)]
        if off + 3 * n > len(buf):
            raise GifFormatError("truncated global color table")
        off += 3 * n
    while off < len(buf):
        b = buf[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            off += 1
            while off < len(buf) and buf[off]:
                off += 1 + buf[off]
            off += 1
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", buf, off)
        off += 9
        if iw == 0 or ih == 0:
            raise GifFormatError("zero image dimension")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = [tuple(buf[off + 3 * i : off + 3 * i + 3]) for i in range(n)]
            off += 3 * n
        if ct is None:
            raise GifFormatError("no color table")
        min_code_size = buf[off]
        off += 1
        chunks = []
        while off < len(buf) and buf[off]:
            ln = buf[off]
            chunks.append(buf[off + 1 : off + 1 + ln])
            off += 1 + ln
        off += 1
        idx = lzw_decode(min_code_size, b"".join(chunks), iw * ih)
        if max(idx) >= len(ct):
            raise GifFormatError("palette index out of range")
        # row order (interlace de-scramble)
        if ipacked & 0x40:
            order = _interlace_order(ih)
        else:
            order = list(range(ih))
        rows_rgb: list[bytes | None] = [None] * ih
        for src, dst in enumerate(order):
            line = idx[src * iw : (src + 1) * iw]
            rows_rgb[dst] = b"".join(bytes(ct[i]) for i in line)
        return iw, ih, 3, rows_rgb
    raise GifFormatError("no image block found")


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[int],
    interlace: bool = False,
    n_extensions: int = 0,
) -> bytes:
    """Fixture writer: one-frame GIF89a with a global color table padded
    to a power of two, real LZW image data (interlaced row order when
    asked) and optional skippable extensions."""
    if len(indices) != width * height:
        raise ValueError("index count != width*height")
    n = max(2, len(palette))
    bits = max(1, (n - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << bits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for r, g, b in table:
        out += bytes((r, g, b))
    for i in range(n_extensions):
        body = bytes([i % 251]) * (2 + i % 5)
        out += bytes([0x21, 0xFE, len(body)]) + body + b"\x00"
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    if interlace:
        order = _interlace_order(height)
        stream: list[int] = []
        for y in order:
            stream.extend(indices[y * width : (y + 1) * width])
    else:
        stream = list(indices)
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    data = lzw_encode(min_code_size, stream)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
