"""Stdlib ISO-BMFF (MP4/MOV) box walk — REAL video container metadata
for the multimodal seam: duration/timescale from ``moov/mvhd`` and track
dimensions from ``moov/trak/tkhd``. Frame pixel decode stays behind the
documented external-library stub (H.264/AV1 are out of stdlib reach);
this makes the *probe* step — what a training-data pipeline runs on
every video before deciding to decode at all — genuine.

Box layout per ISO/IEC 14496-12: ``<size:4 BE> <type:4> <payload>``,
``size == 1`` switches to a 64-bit largesize, ``size == 0`` means
"to end of file"; containers (``moov``, ``trak``, ...) nest boxes
directly in their payload.
"""

from __future__ import annotations

import struct


class BmffFormatError(ValueError):
    pass


def _walk(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, off)
        btype = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if body + 8 > end:
                raise BmffFormatError("truncated largesize")
            (size,) = struct.unpack_from(">Q", buf, body)
            body += 8
            if size < 16:
                raise BmffFormatError("bad largesize")
            box_end = off + size
        elif size == 0:
            box_end = end
        else:
            if size < 8:
                raise BmffFormatError(f"bad box size {size}")
            box_end = off + size
        if box_end > end:
            raise BmffFormatError(f"box {btype!r} overruns container")
        yield btype, body, box_end
        off = box_end


def probe_mp4(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, duration, timescale) from the moov header boxes.

    Width/height come from the first ``tkhd`` with non-zero dimensions
    (16.16 fixed point, rounded); duration/timescale from ``mvhd``
    (version 0 or 1). Raises :class:`BmffFormatError` when the stream is
    not ISO-BMFF or carries no movie header.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise BmffFormatError("not an ISO-BMFF stream (missing ftyp)")
    mvhd = None
    dims = None
    for btype, body, box_end in _walk(buf, 0, len(buf)):
        if btype != b"moov":
            continue
        for t2, b2, e2 in _walk(buf, body, box_end):
            if t2 == b"mvhd":
                version = buf[b2]
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", buf, b2 + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", buf, b2 + 12)
                mvhd = (duration, timescale)
            elif t2 == b"trak":
                for t3, b3, e3 in _walk(buf, b2, e2):
                    if t3 != b"tkhd":
                        continue
                    if e3 - b3 < 8:
                        raise BmffFormatError("tkhd too short")
                    # width/height are the LAST 8 bytes of the tkhd box
                    # (version-independent)
                    w_fixed, h_fixed = struct.unpack_from(">II", buf, e3 - 8)
                    w = (w_fixed + (1 << 15)) >> 16
                    h = (h_fixed + (1 << 15)) >> 16
                    if dims is None and (w or h):
                        dims = (w, h)
    if mvhd is None:
        raise BmffFormatError("no mvhd box")
    w, h = dims if dims is not None else (0, 0)
    return w, h, mvhd[0], mvhd[1]


def encode_mp4_header(
    width: int,
    height: int,
    duration: int,
    timescale: int = 1000,
    version: int = 0,
    extra_boxes: int = 0,
) -> bytes:
    """Fixture writer: minimal structurally-valid ftyp+moov(mvhd, trak
    (tkhd)) stream (+ ``extra_boxes`` free boxes so the walk is
    exercised). No media data — probe parity only, like real files'
    metadata prefix."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    if version == 1:
        mvhd = (
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80
        )
        tkhd = (
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIIQ", 0, 0, 1, 0, duration)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16)
        )
    else:
        mvhd = (
            bytes([0, 0, 0, 0])
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + b"\x00" * 80
        )
        tkhd = (
            bytes([0, 0, 0, 0])
            + struct.pack(">IIIII", 0, 0, 1, 0, duration)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16)
        )
    moov_body = box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd))
    out = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    for i in range(extra_boxes):
        out += box(b"free", bytes([i % 256]) * (5 + i % 7))
    return out + box(b"moov", moov_body)
