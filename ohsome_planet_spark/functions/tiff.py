"""Baseline TIFF decode in pure stdlib Python — the fourth REAL image
decoder behind the multimodal seam (PNG/GIF/JPEG in their sibling
modules).

Scope: baseline TIFF 6.0 images —

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- photometric 0/1 (grayscale, incl. WhiteIsZero inversion), 2 (RGB8)
  and 3 (palette, 16-bit ColorMap folded to 8-bit RGB);
- compression 1 (none), 32773 (PackBits) and 5 (LZW — MSB-first bit
  packing WITH the spec's "early change" quirk: the code width bumps one
  code before the table actually fills, at 510/1022/2046) plus the
  horizontal differencing predictor (tag 317 = 2);
- multiple strips via RowsPerStrip/StripOffsets/StripByteCounts, AND
  the tiled organization (TileWidth/TileLength/TileOffsets/TileByteCounts,
  multiple-of-16 tiles, zero-padded edge tiles cropped on decode).

Anything outside this scope (16-bit samples, planar config 2,
JPEG-in-TIFF, ...) raises :class:`TiffFormatError`; callers fall back to
the deterministic stub, mirroring the JPEG header-only fallback.

The encoder exists for wire-byte fixtures (tests + gate queries): it
emits genuine TIFF files through the same tag/strip/LZW machinery a real
writer uses, so the decoder is exercised on authentic container bytes,
never on a private intermediate form.
"""

from __future__ import annotations

import struct

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


class TiffFormatError(ValueError):
    pass


# --- LZW (TIFF flavor: MSB-first, early change) -----------------------------

_CLEAR = 256
_EOI = 257


def _lzw_decode(data: bytes) -> bytes:
    # TIFF early change (libtiff LZWDecode timing): the DECODER widens its
    # read size when its next free entry reaches 510/1022/2046 — one entry
    # before the encoder, because its table lags the encoder's by one.
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    def width() -> int:
        f = len(table)
        if f < 510:
            return 9
        if f < 1022:
            return 10
        if f < 2046:
            return 11
        return 12

    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        w = width()
        while nbits < w:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate truncation at end
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - w)) & ((1 << w) - 1)
        nbits -= w
        if code == _CLEAR:
            reset()
            prev = None
            continue
        if code == _EOI:
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise TiffFormatError("first LZW code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffFormatError("LZW code beyond table")
        out += entry
        prev = entry


def _lzw_encode(data: bytes) -> bytes:
    # TIFF early change (libtiff LZWEncode timing): the ENCODER widens when
    # its next free entry reaches 511/1023/2047, and emits a Clear when the
    # table approaches the 12-bit ceiling.
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def enc_width(next_code: int) -> int:
        if next_code < 511:
            return 9
        if next_code < 1023:
            return 10
        if next_code < 2047:
            return 11
        return 12

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(_CLEAR, enc_width(next_code))
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        put(table[w], enc_width(next_code))
        table[w + c] = next_code
        next_code += 1
        if next_code >= 4094:
            put(_CLEAR, enc_width(next_code))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
        w = c
    if w:
        put(table[w], enc_width(next_code))
        # the decoder adds an entry after this code; mirror the bookkeeping
        # so the EOI below is written at the width the decoder will read it
        next_code += 1
    put(_EOI, enc_width(next_code))
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- PackBits ----------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise TiffFormatError("PackBits strip underrun")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and data[j] == data[j + 1])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


# --- IFD ----------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def _read_ifd(buf: bytes, off: int, e: str) -> dict[int, list[int]]:
    if off + 2 > len(buf):
        raise TiffFormatError("IFD offset out of range")
    try:
        (count,) = struct.unpack_from(e + "H", buf, off)
        tags: dict[int, list[int]] = {}
        for k in range(count):
            base = off + 2 + 12 * k
            tag, typ, n = struct.unpack_from(e + "HHI", buf, base)
            if typ not in _TYPE_SIZE:
                continue  # rational etc. — not needed for the supported scope
            size = _TYPE_SIZE[typ] * n
            if size <= 4:
                vbase = base + 8
            else:
                (vbase,) = struct.unpack_from(e + "I", buf, base + 8)
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            tags[tag] = list(struct.unpack_from(e + str(n) + fmt, buf, vbase))
    except struct.error as exc:
        raise TiffFormatError(f"truncated IFD: {exc}") from exc
    return tags


def decode_tiff(payload: bytes):
    """Decode baseline TIFF bytes → (width, height, channels, rows) with
    rows as ``bytes`` of packed 8-bit samples, matching the PNG/GIF/JPEG
    decoder contract."""
    buf = bytes(payload)
    if buf[:4] not in TIFF_MAGICS:
        raise TiffFormatError("not a TIFF stream")
    e = "<" if buf[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
    tags = _read_ifd(buf, ifd_off, e)

    def one(tag: int, default=None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffFormatError(f"missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    rows_per_strip = one(278, height if height else 1)
    predictor = one(317, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise TiffFormatError("only 8-bit samples supported")
    if one(284, 1) != 1:
        raise TiffFormatError("planar configuration 2 unsupported")
    if compression not in (1, 5, 32773):
        raise TiffFormatError(f"compression {compression} unsupported")
    if photometric not in (0, 1, 2, 3):
        raise TiffFormatError(f"photometric {photometric} unsupported")
    if photometric == 2 and spp < 3:
        raise TiffFormatError("RGB needs >= 3 samples per pixel")
    if photometric == 3:
        if spp != 1:
            raise TiffFormatError("palette images are single-sample")
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise TiffFormatError("palette image without 3x256 ColorMap")

    def _decode_chunk(chunk: bytes, expected: int, n_rows: int,
                      row_bytes: int) -> bytes:
        if compression == 1:
            data = chunk[:expected]
            if len(data) < expected:
                raise TiffFormatError("uncompressed chunk underrun")
        elif compression == 32773:
            data = _packbits_decode(chunk, expected)
        else:
            data = _lzw_decode(chunk)
            if len(data) < expected:
                raise TiffFormatError("LZW chunk underrun")
            data = data[:expected]
        if predictor == 2:
            d = bytearray(data)
            for r in range(n_rows):
                base = r * row_bytes
                for i in range(spp, row_bytes):
                    d[base + i] = (d[base + i] + d[base + i - spp]) & 0xFF
            return bytes(d)
        if predictor != 1:
            raise TiffFormatError(f"predictor {predictor} unsupported")
        return data

    if 322 in tags:  # tiled organization (tags 322-325)
        tw = one(322)
        th = one(323)
        t_offsets = tags.get(324)
        t_counts = tags.get(325)
        if not tw or not th:
            raise TiffFormatError("zero tile dimensions")
        if tw % 16 or th % 16:
            raise TiffFormatError("tile dimensions must be multiples of 16")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if (
            not t_offsets
            or not t_counts
            or len(t_offsets) != len(t_counts)
            or len(t_offsets) != across * down
        ):
            raise TiffFormatError("tile offsets/counts missing or mismatched")
        row_bytes = width * spp
        tile_row_bytes = tw * spp
        raw = bytearray(height * row_bytes)
        for ti, (so, sc) in enumerate(zip(t_offsets, t_counts)):
            chunk = buf[so : so + sc]
            if len(chunk) != sc:
                raise TiffFormatError("tile extends past end of file")
            data = _decode_chunk(chunk, th * tile_row_bytes, th,
                                 tile_row_bytes)
            ty, tx = divmod(ti, across)
            y0 = ty * th
            x0 = tx * tw
            copy_rows = min(th, height - y0)
            copy_bytes = min(tw, width - x0) * spp
            for r in range(copy_rows):
                dst = (y0 + r) * row_bytes + x0 * spp
                src = r * tile_row_bytes
                raw[dst : dst + copy_bytes] = data[src : src + copy_bytes]
        return _assemble(width, height, spp, photometric, tags, bytes(raw))

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffFormatError("strip offsets/counts missing or mismatched")

    row_bytes = width * spp
    raw = bytearray()
    remaining_rows = height
    for so, sc in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        remaining_rows -= strip_rows
        expected = strip_rows * row_bytes
        chunk = buf[so : so + sc]
        if len(chunk) != sc:
            raise TiffFormatError("strip extends past end of file")
        raw += _decode_chunk(chunk, expected, strip_rows, row_bytes)
    if len(raw) != height * row_bytes:
        raise TiffFormatError("decoded size mismatch")
    return _assemble(width, height, spp, photometric, tags, bytes(raw))


def _assemble(width, height, spp, photometric, tags, raw: bytes):
    """Shared final stage for strip and tile paths: palette fold or
    WhiteIsZero inversion, then packed 8-bit rows."""
    row_bytes = width * spp
    if photometric == 3:
        cmap = tags[320]
        rows = []
        for r in range(height):
            row = bytearray()
            for x in range(width):
                idx = raw[r * row_bytes + x]
                row += bytes(
                    (
                        cmap[idx] >> 8,
                        cmap[256 + idx] >> 8,
                        cmap[512 + idx] >> 8,
                    )
                )
            rows.append(bytes(row))
        return width, height, 3, rows

    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero convention
        raw = bytes(255 - b for b in raw)
    rows = [
        raw[r * row_bytes : (r + 1) * row_bytes] for r in range(height)
    ]
    return width, height, spp, rows


# --- fixture encoder ----------------------------------------------------------


def encode_tiff(
    width: int,
    height: int,
    rows: list[bytes],
    channels: int = 1,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    photometric: int | None = None,
    colormap: list[int] | None = None,
    tile_size: tuple[int, int] | None = None,
) -> bytes:
    """Emit genuine baseline-TIFF bytes (fixture encoder). ``rows`` are
    packed 8-bit sample rows; for palette images pass the index rows plus
    a flat 3*256 16-bit ``colormap``. ``tile_size=(tw, th)`` switches to
    the tiled organization (tags 322-325, multiples of 16, edge tiles
    zero-padded per spec) instead of strips."""
    e = "<" if not big_endian else ">"
    if photometric is None:
        photometric = 2 if channels >= 3 else 1
    spp = channels if photometric != 3 else 1
    row_bytes = width * spp
    if rows_per_strip is None:
        rows_per_strip = height if height else 1

    def _compress(data: bytes, n_rows: int, rb: int) -> bytes:
        if predictor == 2:
            d = bytearray(data)
            for rr in range(n_rows):
                base = rr * rb
                for i in range(rb - 1, spp - 1, -1):
                    d[base + i] = (d[base + i] - d[base + i - spp]) & 0xFF
            data = bytes(d)
        if compression == 1:
            return data
        if compression == 32773:
            return _packbits_encode(data)
        if compression == 5:
            return _lzw_encode(data)
        raise ValueError(f"compression {compression} unsupported")

    strips: list[bytes] = []
    if tile_size is not None:
        tw, th = tile_size
        if tw % 16 or th % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        trb = tw * spp
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        for ty in range(down):
            for tx in range(across):
                tile = bytearray(th * trb)
                for r in range(min(th, height - ty * th)):
                    src = rows[ty * th + r]
                    x0 = tx * tw * spp
                    seg = src[x0 : x0 + trb]
                    tile[r * trb : r * trb + len(seg)] = seg
                strips.append(_compress(bytes(tile), th, trb))
    else:
        r = 0
        while r < height:
            sr = min(rows_per_strip, height - r)
            data = b"".join(rows[r : r + sr])
            if len(data) != sr * row_bytes:
                raise ValueError("row byte length mismatch")
            strips.append(_compress(data, sr, row_bytes))
            r += sr

    tags: list[tuple[int, int, list[int]]] = [
        (256, 4, [width]),
        (257, 4, [height]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
    ]
    if tile_size is not None:
        tags.append((322, 4, [tile_size[0]]))
        tags.append((323, 4, [tile_size[1]]))
    else:
        tags.append((278, 4, [rows_per_strip]))
    if predictor != 1:
        tags.append((317, 3, [predictor]))
    if photometric == 3:
        if colormap is None or len(colormap) != 3 * 256:
            raise ValueError("palette encode needs a 3*256 colormap")
        tags.append((320, 3, list(colormap)))

    # layout: header(8) + IFD + out-of-line tag values + strips
    n_entries = len(tags) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    heap_off = ifd_off + ifd_size

    heap = bytearray()

    def value_field(typ: int, vals: list[int]) -> bytes:
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        raw = struct.pack(e + str(len(vals)) + fmt, *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = heap_off + len(heap)
        heap.extend(raw)
        return struct.pack(e + "I", off)

    # strip placement comes after all heap values; reserve by two passes
    entries: list[tuple[int, int, int, bytes]] = []
    for tag, typ, vals in tags:
        entries.append((tag, typ, len(vals), value_field(typ, vals)))

    n_strips = len(strips)
    so_field_off = heap_off + len(heap)
    if n_strips > 1:
        heap.extend(b"\x00" * 4 * n_strips)  # StripOffsets placeholder
    sc_vals = [len(s) for s in strips]
    sc_field = value_field(4, sc_vals)

    strips_base = heap_off + len(heap)
    strip_offsets = []
    pos = strips_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    if n_strips > 1:
        struct.pack_into(
            e + str(n_strips) + "I",
            heap,
            so_field_off - heap_off,
            *strip_offsets,
        )
        so_field = struct.pack(e + "I", so_field_off)
    else:
        so_field = struct.pack(e + "I", strip_offsets[0])
    off_tag, cnt_tag = (324, 325) if tile_size is not None else (273, 279)
    entries.append((off_tag, 4, n_strips, so_field))
    entries.append((cnt_tag, 4, n_strips, sc_field))
    entries.sort(key=lambda t: t[0])

    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n_entries)
    for tag, typ, cnt, field in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt) + field
    out += struct.pack(e + "I", 0)  # next IFD
    out += heap
    for s in strips:
        out += s
    return bytes(out)
