"""EBML / Matroska / WebM container probe (RFC 8794 + the Matroska
element registry): the web's other video container (WebM is the
<video>-tag shape; Matroska the archival one).

What is REAL here: EBML variable-length integers (width from the
leading-one marker; element IDs keep the marker, sizes strip it,
non-minimal size spellings accepted, the all-ones unknown-size form
recognized), the document header (DocType/version checks), the
Segment walk — Info (TimestampScale with its 1 ms default, Duration as
a 4- or 8-byte float), Tracks (TrackEntry/TrackType/CodecID, Video
PixelWidth/PixelHeight, Audio SamplingFrequency/Channels) — Void/CRC
skipping, cluster and SimpleBlock counting with per-block track-number
varints. Frame payloads (VP8/VP9/AV1, Opus-in-WebM) stay behind the
documented external-codec stub; this probe is the training-data
lane's metadata pass.

The fixture encoder emits conformant trees (including NON-minimal
varint widths and Void padding) so the gate row's oracle can replay
every output.
"""

from __future__ import annotations

import struct

__all__ = ["EbmlFormatError", "probe_webm", "encode_webm"]


class EbmlFormatError(ValueError):
    pass


# element IDs (marker bit kept, as they appear on the wire)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
DOCTYPE_READ_VERSION = 0x4285
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
VOID = 0xEC
CRC32 = 0xBF


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """RFC 8794 §4: width = leading zero bits of the first byte + 1."""
    if pos >= len(data):
        raise EbmlFormatError("EOF inside varint")
    first = data[pos]
    if first == 0:
        raise EbmlFormatError("varint width > 8")
    width = 9 - first.bit_length()
    if pos + width > len(data):
        raise EbmlFormatError("truncated varint")
    v = first if keep_marker else first & ((1 << (8 - width)) - 1)
    for i in range(1, width):
        v = (v << 8) | data[pos + i]
    return v, width


def _read_size(data: bytes, pos: int) -> tuple[int | None, int]:
    """Element size; None = unknown size (all value bits set)."""
    first = data[pos] if pos < len(data) else 0
    if first == 0:
        raise EbmlFormatError("varint width > 8")
    width = 9 - first.bit_length()
    v, w = _read_vint(data, pos, keep_marker=False)
    if v == (1 << (7 * width)) - 1:
        return None, w
    return v, w


def _walk(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for one EBML level."""
    pos = start
    while pos < end:
        eid, w = _read_vint(data, pos, keep_marker=True)
        pos += w
        size, w = _read_size(data, pos)
        pos += w
        if size is None:
            # unknown-size element: runs to the parent's end (the
            # streaming-Segment form)
            yield eid, pos, end
            return
        if pos + size > end:
            raise EbmlFormatError(
                f"element 0x{eid:X} overruns its parent"
            )
        yield eid, pos, pos + size
        pos += size
    if pos != end:
        raise EbmlFormatError("element level misaligned")


def _uint(data: bytes, a: int, b: int) -> int:
    v = 0
    for i in range(a, b):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    raise EbmlFormatError("EBML float must be 4 or 8 bytes")


def probe_webm(payload: bytes) -> dict:
    """Parse header + Segment → dict(doctype, timescale_ns, duration_ms,
    video_codec, width, height, audio_codec, sample_rate, channels,
    n_tracks, n_clusters, n_blocks)."""
    data = bytes(payload)
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != EBML_HEADER:
        raise EbmlFormatError("missing EBML header")
    doctype = None
    for eid, a, b in _walk(data, top[0][1], top[0][2]):
        if eid == DOCTYPE:
            doctype = data[a:b].split(b"\0", 1)[0].decode("utf-8", "replace")
        elif eid == DOCTYPE_READ_VERSION and _uint(data, a, b) > 2:
            raise EbmlFormatError("DocTypeReadVersion beyond this reader")
    if doctype not in ("webm", "matroska"):
        raise EbmlFormatError(f"unsupported DocType {doctype!r}")
    seg = next(((a, b) for eid, a, b in top[1:] if eid == SEGMENT), None)
    if seg is None:
        raise EbmlFormatError("no Segment")

    timescale = 1_000_000  # ns per timestamp unit (Matroska default)
    duration_units = None
    out = {
        "doctype": doctype,
        "video_codec": None,
        "width": None,
        "height": None,
        "audio_codec": None,
        "sample_rate": None,
        "channels": None,
        "n_tracks": 0,
        "n_clusters": 0,
        "n_blocks": 0,
    }
    for eid, a, b in _walk(data, seg[0], seg[1]):
        if eid in (VOID, CRC32):
            continue
        if eid == INFO:
            for e2, c, d in _walk(data, a, b):
                if e2 == TIMESTAMP_SCALE:
                    timescale = _uint(data, c, d)
                elif e2 == DURATION:
                    duration_units = _float(data, c, d)
        elif eid == TRACKS:
            for e2, c, d in _walk(data, a, b):
                if e2 != TRACK_ENTRY:
                    continue
                out["n_tracks"] += 1
                ttype = codec = None
                fields: dict = {}
                for e3, g, h in _walk(data, c, d):
                    if e3 == TRACK_TYPE:
                        ttype = _uint(data, g, h)
                    elif e3 == CODEC_ID:
                        codec = data[g:h].decode("utf-8", "replace")
                    elif e3 == VIDEO:
                        for e4, p, q in _walk(data, g, h):
                            if e4 == PIXEL_WIDTH:
                                fields["width"] = _uint(data, p, q)
                            elif e4 == PIXEL_HEIGHT:
                                fields["height"] = _uint(data, p, q)
                    elif e3 == AUDIO:
                        for e4, p, q in _walk(data, g, h):
                            if e4 == SAMPLING_FREQUENCY:
                                fields["sample_rate"] = int(
                                    round(_float(data, p, q))
                                )
                            elif e4 == CHANNELS:
                                fields["channels"] = _uint(data, p, q)
                if ttype == 1:
                    out["video_codec"] = codec
                    out["width"] = fields.get("width")
                    out["height"] = fields.get("height")
                elif ttype == 2:
                    out["audio_codec"] = codec
                    out["sample_rate"] = fields.get("sample_rate")
                    out["channels"] = fields.get("channels")
        elif eid == CLUSTER:
            out["n_clusters"] += 1
            for e2, c, d in _walk(data, a, b):
                if e2 == SIMPLE_BLOCK:
                    # per-block track number is itself a varint
                    _tn, _w = _read_vint(data, c, keep_marker=False)
                    out["n_blocks"] += 1
    out["timescale_ns"] = timescale
    out["duration_ms"] = (
        int(duration_units * timescale // 1_000_000)
        if duration_units is not None
        else None
    )
    return out


# ---------------------------------------------------------------------------
# fixture encoder


def _vint(value: int, keep_marker_id: bool = False, width: int = 0) -> bytes:
    if keep_marker_id:
        # element IDs are written verbatim
        n = (value.bit_length() + 7) // 8
        return value.to_bytes(n, "big")
    w = width
    if w == 0:
        w = 1
        while value >= (1 << (7 * w)) - 1:
            w += 1
    if value >= (1 << (7 * w)) - 1:
        raise ValueError("size does not fit requested varint width")
    out = value | (1 << (7 * w))
    return out.to_bytes(w, "big")


def _el(eid: int, body: bytes, size_width: int = 0) -> bytes:
    return _vint(eid, keep_marker_id=True) + _vint(len(body), width=size_width) + body


def _uint_body(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def encode_webm(
    doctype: str = "webm",
    width: int = 640,
    height: int = 360,
    video_codec: str = "V_VP9",
    audio_codec: str = "A_OPUS",
    sample_rate: int = 48000,
    channels: int = 2,
    timescale: int = 1_000_000,
    duration_units: float = 12345.0,
    n_clusters: int = 2,
    blocks_per_cluster: int = 3,
    float8: bool = False,
    wide_sizes: bool = False,
    with_void: bool = False,
    seed: int = 0,
) -> bytes:
    """Conformant EBML tree; ``wide_sizes`` spells several sizes with
    NON-minimal varint widths (legal per RFC 8794 §4.1), ``float8``
    writes Duration as a double, ``with_void`` interposes Void
    padding the walk must skip."""
    sw = 3 if wide_sizes else 0
    header = _el(
        EBML_HEADER,
        _el(0x4286, _uint_body(1))        # EBMLVersion
        + _el(0x42F7, _uint_body(1))      # EBMLReadVersion
        + _el(0x42F2, _uint_body(4))      # EBMLMaxIDLength
        + _el(0x42F3, _uint_body(8))      # EBMLMaxSizeLength
        + _el(DOCTYPE, doctype.encode())
        + _el(0x4287, _uint_body(2))      # DocTypeVersion
        + _el(DOCTYPE_READ_VERSION, _uint_body(2)),
    )
    dur = struct.pack(">d", duration_units) if float8 else struct.pack(
        ">f", duration_units
    )
    info = _el(
        INFO,
        _el(TIMESTAMP_SCALE, _uint_body(timescale))
        + _el(DURATION, dur),
        size_width=sw,
    )
    video_tr = _el(
        TRACK_ENTRY,
        _el(TRACK_NUMBER, _uint_body(1))
        + _el(TRACK_TYPE, _uint_body(1))
        + _el(CODEC_ID, video_codec.encode())
        + _el(
            VIDEO,
            _el(PIXEL_WIDTH, _uint_body(width), size_width=sw)
            + _el(PIXEL_HEIGHT, _uint_body(height)),
        ),
    )
    audio_tr = _el(
        TRACK_ENTRY,
        _el(TRACK_NUMBER, _uint_body(2))
        + _el(TRACK_TYPE, _uint_body(2))
        + _el(CODEC_ID, audio_codec.encode())
        + _el(
            AUDIO,
            _el(SAMPLING_FREQUENCY, struct.pack(">f", float(sample_rate)))
            + _el(CHANNELS, _uint_body(channels)),
        ),
    )
    tracks = _el(TRACKS, video_tr + audio_tr)
    clusters = b""
    for ci in range(n_clusters):
        body = _el(TIMESTAMP, _uint_body(ci * 1000))
        for bi in range(blocks_per_cluster):
            frame = bytes(
                (seed * 31 + ci * 17 + bi * 7 + k) % 256
                for k in range((seed + ci + bi) % 40 + 4)
            )
            blk = (
                _vint(1 + (bi % 2))                # track number varint
                + struct.pack(">h", bi * 10)       # relative timestamp
                + bytes([0x80 if bi == 0 else 0])  # keyframe flag
                + frame
            )
            body += _el(SIMPLE_BLOCK, blk)
        clusters += _el(CLUSTER, body, size_width=sw)
    void = _el(VOID, b"\0" * (seed % 17 + 1)) if with_void else b""
    segment = _el(SEGMENT, info + void + tracks + clusters)
    return header + segment
