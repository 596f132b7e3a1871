"""Subtitle/caption parsing — SubRip (.srt) and WebVTT (W3C spec):
caption tracks are the highest-quality parallel text attached to web
video, so a video training pipeline extracts them long before it
spends frame-decode cycles.

What is REAL here: the SRT cue grammar (index line, ``HH:MM:SS,mmm -->
HH:MM:SS,mmm`` timings, multi-line payload, blank-line separation, BOM
and CRLF tolerance), the WebVTT grammar (``WEBVTT`` signature, optional
cue identifiers, dot-millisecond timings with optional hour field, cue
settings after the arrow, NOTE/STYLE/REGION block skipping), and
markup stripping (``<b>``, ``<c.class>``, voice spans and inline
``<00:01:02.000>`` karaoke timestamps) with ``&amp;/&lt;/&gt;/&nbsp;``
entity decoding. Malformed cues raise — dirty-crawl quarantining
happens per row at the operator seam."""

from __future__ import annotations

import re

__all__ = ["SubtitleFormatError", "parse_srt", "parse_vtt", "parse_subtitles"]


class SubtitleFormatError(ValueError):
    pass


_SRT_TIME = re.compile(
    r"^(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*$"
)
# WebVTT allows omitting the hour field
_VTT_TIME = re.compile(
    r"^(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})(?:\s+(?P<settings>.*))?$"
)
_TAG = re.compile(r"<[^>]*>")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&nbsp;": " ",
             "&lrm;": "", "&rlm;": ""}


def _ms(h, m, s, frac) -> int:
    m, s = int(m), int(s)
    if m > 59 or s > 59:
        raise SubtitleFormatError("minutes/seconds out of range")
    return ((int(h or 0) * 60 + m) * 60 + s) * 1000 + int(frac)


def strip_markup(text: str) -> str:
    out = _TAG.sub("", text)
    for ent, rep in _ENTITIES.items():
        out = out.replace(ent, rep)
    return out


def parse_srt(text: str) -> list[dict]:
    """SubRip → [{"start_ms", "end_ms", "text"}] in file order."""
    body = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    cues = []
    for block in re.split(r"\n{2,}", body.strip()):
        lines = [ln for ln in block.split("\n")]
        if not lines or not any(ln.strip() for ln in lines):
            continue
        # optional numeric index line
        if re.fullmatch(r"\d+", lines[0].strip()) and len(lines) > 1:
            lines = lines[1:]
        m = _SRT_TIME.match(lines[0].strip())
        if not m:
            raise SubtitleFormatError(f"bad SRT timing line: {lines[0]!r}")
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end < start:
            raise SubtitleFormatError("cue ends before it starts")
        cues.append(
            {
                "start_ms": start,
                "end_ms": end,
                "text": strip_markup("\n".join(lines[1:]).strip()),
            }
        )
    return cues


def parse_vtt(text: str) -> list[dict]:
    """WebVTT → [{"start_ms", "end_ms", "text", "settings"}]."""
    body = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    if not body.startswith("WEBVTT"):
        raise SubtitleFormatError("missing WEBVTT signature")
    blocks = re.split(r"\n{2,}", body.strip())
    cues = []
    for block in blocks[1:]:
        lines = block.split("\n")
        if not lines or not any(ln.strip() for ln in lines):
            continue
        head = lines[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        # optional cue identifier line (no arrow in it)
        if "-->" not in head:
            lines = lines[1:]
            if not lines:
                raise SubtitleFormatError("cue identifier without timings")
            head = lines[0].strip()
        m = _VTT_TIME.match(head)
        if not m:
            raise SubtitleFormatError(f"bad VTT timing line: {head!r}")
        g = m.groups()
        start = _ms(g[0], g[1], g[2], g[3])
        end = _ms(g[4], g[5], g[6], g[7])
        if end < start:
            raise SubtitleFormatError("cue ends before it starts")
        cues.append(
            {
                "start_ms": start,
                "end_ms": end,
                "text": strip_markup("\n".join(lines[1:]).strip()),
                "settings": m.group("settings") or "",
            }
        )
    return cues


def parse_subtitles(payload: bytes | str) -> tuple[str, list[dict]]:
    """Magic-sniffed entry point: (format, cues)."""
    text = (
        bytes(payload).decode("utf-8", "replace")
        if isinstance(payload, (bytes, bytearray))
        else payload
    )
    if text.lstrip("﻿").startswith("WEBVTT"):
        return "vtt", parse_vtt(text)
    return "srt", parse_srt(text)
