"""ID3v2 tag parsing (id3.org informal standards v2.2/v2.3/v2.4): the
metadata pass an audio-corpus pipeline runs to attribute/caption audio
before any sample decode. ``functions/mp3.py`` only SKIPS the tag;
this module reads it.

What is REAL here: the 10-byte header (version gate, flag bits,
syncsafe 28-bit size), whole-tag unsynchronization reversal (v2.2/2.3
``FF 00`` → ``FF``), extended-header skip (plain-size v2.3, syncsafe
v2.4), the three frame layouts (3-byte ids/sizes in v2.2, plain 32-bit
sizes in v2.3, syncsafe sizes + per-frame unsync flag in v2.4), and
text-frame decoding across all four encodings (Latin-1, UTF-16 with
BOM, UTF-16BE, UTF-8) with v2.4 null-separated multi-values, plus the
COMM/COM comment layout (language + description + body). Compressed or
encrypted frames are skipped, never misparsed."""

from __future__ import annotations

__all__ = ["Id3FormatError", "parse_id3v2", "encode_id3v2"]


class Id3FormatError(ValueError):
    pass


# canonical field -> frame ids per major version (v2.2 first)
_FIELDS = {
    "title": ("TT2", "TIT2"),
    "artist": ("TP1", "TPE1"),
    "album": ("TAL", "TALB"),
    "year": ("TYE", "TYER", "TDRC"),
    "track": ("TRK", "TRCK"),
    "genre": ("TCO", "TCON"),
}


def _syncsafe(data: bytes) -> int:
    v = 0
    for b in data:
        if b & 0x80:
            raise Id3FormatError("syncsafe byte with high bit set")
        v = (v << 7) | b
    return v


def _deunsync(data: bytes) -> bytes:
    return data.replace(b"\xff\x00", b"\xff")


def _decode_text(body: bytes) -> list[str]:
    if not body:
        return []
    enc = body[0]
    raw = body[1:]
    if enc == 0:
        codec, sep = "latin-1", b"\x00"
    elif enc == 1:
        codec, sep = "utf-16", b"\x00\x00"
    elif enc == 2:
        codec, sep = "utf-16-be", b"\x00\x00"
    elif enc == 3:
        codec, sep = "utf-8", b"\x00"
    else:
        raise Id3FormatError(f"unknown text encoding {enc}")
    if enc in (1, 2):
        # align the terminator split on 16-bit units
        units = [raw[i : i + 2] for i in range(0, len(raw) - len(raw) % 2, 2)]
        parts, cur = [], b""
        for u in units:
            if u == b"\x00\x00":
                parts.append(cur)
                cur = b""
            else:
                cur += u
        parts.append(cur)
    else:
        parts = raw.split(sep)
    out = [p.decode(codec, "replace") for p in parts]
    return [s for s in out if s != ""] or [""]


def parse_id3v2(payload: bytes) -> dict:
    """Parse the leading ID3v2 tag → dict(version, n_frames, title,
    artist, album, year, track, genre, comment, frames={id: [values]}).
    Missing fields are None."""
    data = bytes(payload)
    if data[:3] != b"ID3":
        raise Id3FormatError("no ID3v2 tag")
    major, _rev = data[3], data[4]
    if major not in (2, 3, 4):
        raise Id3FormatError(f"unsupported ID3v2.{major}")
    flags = data[5]
    size = _syncsafe(data[6:10])
    body = data[10 : 10 + size]
    if len(body) < size:
        raise Id3FormatError("truncated tag body")
    if flags & 0x80 and major < 4:
        body = _deunsync(body)
    pos = 0
    if flags & 0x40:  # extended header
        if major == 4:
            ehs = _syncsafe(body[0:4])
        else:
            ehs = int.from_bytes(body[0:4], "big") + 4
        pos = ehs
    frames: dict[str, list[str]] = {}
    comment = None
    id_len, size_len = (3, 3) if major == 2 else (4, 4)
    while pos + id_len + size_len <= len(body):
        fid = body[pos : pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        fid_s = fid.decode("latin-1")
        pos += id_len
        if major == 2:
            fsize = int.from_bytes(body[pos : pos + 3], "big")
            pos += 3
            fflags = 0
        else:
            raw_size = body[pos : pos + 4]
            fsize = (
                _syncsafe(raw_size) if major == 4
                else int.from_bytes(raw_size, "big")
            )
            pos += 4
            fflags = int.from_bytes(body[pos : pos + 2], "big")
            pos += 2
        fbody = body[pos : pos + fsize]
        if len(fbody) < fsize:
            raise Id3FormatError(f"truncated frame {fid_s}")
        pos += fsize
        if major == 3 and fflags & 0x00C0:
            continue  # compressed/encrypted: skipped, never misparsed
        if major == 4 and fflags & 0x000C:
            continue
        if major == 4 and fflags & 0x0002:
            fbody = _deunsync(fbody)
        if fid_s.startswith("T") and fid_s not in ("TXX", "TXXX"):
            frames.setdefault(fid_s, []).extend(_decode_text(fbody))
        elif fid_s in ("COM", "COMM") and len(fbody) >= 4:
            enc = fbody[0:1]
            rest = fbody[4:]  # skip 3-byte language
            vals = _decode_text(enc + rest)
            # description \0 body: _decode_text split them already
            comment = vals[-1] if vals else None
        else:
            frames.setdefault(fid_s, []).append(fbody.hex())
    out = {
        "version": major,
        "n_frames": sum(len(v) for v in frames.values())
        + (1 if comment is not None else 0),
        "comment": comment,
        "frames": frames,
    }
    for field, ids in _FIELDS.items():
        val = None
        for fid in ids:
            if fid in frames and frames[fid]:
                val = frames[fid][0]
                break
        out[field] = val
    return out


# ---------------------------------------------------------------------------
# fixture encoder


def _encode_text_body(value: str, enc: int) -> bytes:
    if enc == 0:
        return b"\x00" + value.encode("latin-1", "replace")
    if enc == 1:
        return b"\x01" + value.encode("utf-16")  # BOM included
    if enc == 2:
        return b"\x02" + value.encode("utf-16-be")
    return b"\x03" + value.encode("utf-8")


def encode_id3v2(
    fields: dict[str, str],
    major: int = 3,
    enc: int = 0,
    comment: str | None = None,
    unsync: bool = False,
    padding: int = 0,
) -> bytes:
    """Conformant ID3v2.{2,3,4} tag from canonical field names."""
    if major not in (2, 3, 4):
        raise ValueError("major must be 2, 3 or 4")
    frames = bytearray()

    def add(fid: str, body: bytes) -> None:
        if major == 2:
            frames.extend(fid[:3].encode())
            frames.extend(len(body).to_bytes(3, "big"))
        else:
            frames.extend(fid.encode())
            if major == 4:
                n = len(body)
                frames.extend(
                    bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
                )
            else:
                frames.extend(len(body).to_bytes(4, "big"))
            frames.extend(b"\x00\x00")
        frames.extend(body)

    for field, value in fields.items():
        ids = _FIELDS[field]
        fid = ids[0] if major == 2 else ids[1]
        add(fid, _encode_text_body(value, enc))
    if comment is not None:
        fid = "COM" if major == 2 else "COMM"
        body = (
            bytes([enc]) + b"eng"
            + _encode_text_body("desc", enc)[1:]
            + (b"\x00\x00" if enc in (1, 2) else b"\x00")
            + _encode_text_body(comment, enc)[1:]
        )
        add(fid, body)
    body = bytes(frames) + b"\x00" * padding
    flags = 0
    if unsync and major < 4:
        body = body.replace(b"\xff", b"\xff\x00")
        flags |= 0x80
    size = len(body)
    header = b"ID3" + bytes([major, 0, flags]) + bytes(
        ((size >> s) & 0x7F) for s in (21, 14, 7, 0)
    )
    return header + body
