"""MPEG transport stream probe (ISO/IEC 13818-1): the container HLS
segments ship in — the last broadcast-shaped format in the video
lane's metadata pass (next to ISO-BMFF, RIFF/AVI, EBML and Annex-B).

What is REAL here: the 188-byte packet walk (sync verification, PID /
PUSI / adaptation-field-control decode, per-PID continuity-counter
checking — STRICT: a repeated CC counts as a cc_error, i.e. the ISO
13818-1 §2.4.3.3 single-duplicate allowance is deliberately not
granted, which over-counts by design on streams that carry legal
duplicate packets), adaptation fields with
PCR decode (33-bit 90 kHz base + 9-bit 27 MHz extension → the
first/last-PCR duration arithmetic players actually use), PAT and PMT
section parsing behind the pointer field with MPEG-2 CRC-32
VERIFICATION (the unreflected 0x04C11DB7 polynomial with 0xFFFFFFFF
init — table shared with the Ogg CRC machinery but a different init),
elementary-stream inventory (stream_type → codec name for the common
registry entries), and PES start counting per PID (PUSI + the
00 00 01 prefix). The elementary codecs themselves stay behind the
documented external-codec stub; H.264/ADTS payloads hand off to the
dedicated probes."""

from __future__ import annotations

import struct

from .ogg import _CRC_TABLE

__all__ = ["TsFormatError", "probe_ts", "encode_ts"]

PACKET = 188

STREAM_TYPES = {
    0x01: "mpeg1-video", 0x02: "mpeg2-video", 0x03: "mp3", 0x04: "mp2",
    0x0F: "aac-adts", 0x11: "aac-latm", 0x1B: "h264", 0x24: "hevc",
    0x81: "ac3",
}


class TsFormatError(ValueError):
    pass


def mpeg_crc32(data: bytes) -> int:
    """CRC-32/MPEG-2: poly 0x04C11DB7 unreflected, init 0xFFFFFFFF,
    no final xor (the PSI section CRC)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _section(payload: bytes, expect_table: int) -> bytes:
    """Pointer-field skip + section framing + CRC verify → section
    bytes from table_id through the byte before the CRC."""
    if not payload:
        raise TsFormatError("empty PSI payload")
    pos = 1 + payload[0]  # pointer_field
    if pos + 3 > len(payload):
        raise TsFormatError("truncated PSI section header")
    table_id = payload[pos]
    if table_id != expect_table:
        raise TsFormatError(
            f"table_id 0x{table_id:02X}, expected 0x{expect_table:02X}"
        )
    sec_len = struct.unpack_from(">H", payload, pos + 1)[0] & 0x0FFF
    end = pos + 3 + sec_len
    if end > len(payload):
        raise TsFormatError("PSI section spans packets (unsupported)")
    section = payload[pos:end]
    if mpeg_crc32(section) != 0:
        # CRC over the section INCLUDING its trailing CRC yields 0
        raise TsFormatError("PSI section CRC mismatch")
    return section[:-4]


def probe_ts(payload: bytes) -> dict:
    """Walk a transport stream → dict(n_packets, n_null, pmt_pid,
    pcr_pid, program_number, streams=[(pid, stream_type, codec)],
    video_pid, audio_pid, n_video_pes, n_audio_pes, duration_ms,
    cc_errors)."""
    data = bytes(payload)
    if len(data) % PACKET:
        raise TsFormatError("stream length is not a packet multiple")
    n = len(data) // PACKET
    if n == 0:
        raise TsFormatError("no packets")
    pmt_pid = None
    program_number = None
    pcr_pid = None
    streams: list[tuple[int, int]] = []
    pes_counts: dict[int, int] = {}
    first_pcr = last_pcr = None
    cc_state: dict[int, int] = {}
    cc_errors = 0
    n_null = 0
    for i in range(n):
        pkt = data[i * PACKET : (i + 1) * PACKET]
        if pkt[0] != 0x47:
            raise TsFormatError(f"sync byte lost at packet {i}")
        pusi = (pkt[1] >> 6) & 1
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        afc = (pkt[3] >> 4) & 3
        cc = pkt[3] & 0x0F
        if pid == 0x1FFF:
            n_null += 1
            continue
        if afc in (1, 3):  # payload present: continuity advances
            prev = cc_state.get(pid)
            if prev is not None and cc != (prev + 1) % 16:
                cc_errors += 1
            cc_state[pid] = cc
        pos = 4
        if afc in (2, 3):
            af_len = pkt[4]
            pos = 5 + af_len
            if af_len > 0:
                flags = pkt[5]
                if flags & 0x10 and af_len >= 7:  # PCR flag
                    b = pkt[6:12]
                    base = (
                        (b[0] << 25) | (b[1] << 17) | (b[2] << 9)
                        | (b[3] << 1) | (b[4] >> 7)
                    )
                    ext = ((b[4] & 1) << 8) | b[5]
                    pcr = base * 300 + ext  # 27 MHz units
                    if first_pcr is None:
                        first_pcr = pcr
                    last_pcr = pcr
        if afc in (2, 0) or pos >= PACKET:
            continue
        body = pkt[pos:]
        if pid == 0 and pusi:
            sec = _section(body, 0)
            # one program: program_number(16) + reserved(3) + PMT PID(13)
            program_number = struct.unpack_from(">H", sec, 8)[0]
            pmt_pid = struct.unpack_from(">H", sec, 10)[0] & 0x1FFF
        elif pmt_pid is not None and pid == pmt_pid and pusi:
            sec = _section(body, 2)
            pcr_pid = struct.unpack_from(">H", sec, 8)[0] & 0x1FFF
            pil = struct.unpack_from(">H", sec, 10)[0] & 0x0FFF
            p = 12 + pil
            streams = []
            while p + 5 <= len(sec):
                stype = sec[p]
                epid = struct.unpack_from(">H", sec, p + 1)[0] & 0x1FFF
                esl = struct.unpack_from(">H", sec, p + 3)[0] & 0x0FFF
                streams.append((epid, stype))
                p += 5 + esl
        elif pusi and body[:3] == b"\x00\x00\x01":
            pes_counts[pid] = pes_counts.get(pid, 0) + 1
    if pmt_pid is None:
        raise TsFormatError("no PAT seen")
    video_pid = audio_pid = None
    for epid, stype in streams:
        name = STREAM_TYPES.get(stype)
        if name in ("h264", "hevc", "mpeg1-video", "mpeg2-video") and video_pid is None:
            video_pid = epid
        elif name and video_pid != epid and audio_pid is None and name not in (
            "h264", "hevc", "mpeg1-video", "mpeg2-video"
        ):
            audio_pid = epid
    duration_ms = (
        (last_pcr - first_pcr) // 27_000
        if first_pcr is not None and last_pcr != first_pcr
        else None
    )
    return {
        "n_packets": n,
        "n_null": n_null,
        "program_number": program_number,
        "pmt_pid": pmt_pid,
        "pcr_pid": pcr_pid,
        "streams": [
            (epid, stype, STREAM_TYPES.get(stype, "other"))
            for epid, stype in streams
        ],
        "video_pid": video_pid,
        "audio_pid": audio_pid,
        "n_video_pes": pes_counts.get(video_pid, 0),
        "n_audio_pes": pes_counts.get(audio_pid, 0),
        "duration_ms": duration_ms,
        "cc_errors": cc_errors,
    }


# ---------------------------------------------------------------------------
# fixture encoder


def _packet(
    pid: int, cc: int, payload: bytes, pusi: bool = False,
    pcr_27mhz: int | None = None,
) -> bytes:
    hdr = bytearray(4)
    hdr[0] = 0x47
    hdr[1] = (0x40 if pusi else 0) | (pid >> 8)
    hdr[2] = pid & 0xFF
    af = b""
    if pcr_27mhz is not None:
        base, ext = divmod(pcr_27mhz, 300)
        af_body = bytearray([0x10])  # PCR flag
        af_body += bytes(
            (
                (base >> 25) & 0xFF, (base >> 17) & 0xFF, (base >> 9) & 0xFF,
                (base >> 1) & 0xFF,
                ((base & 1) << 7) | 0x7E | ((ext >> 8) & 1), ext & 0xFF,
            )
        )
        af = bytes([len(af_body)]) + bytes(af_body)
    room = PACKET - 4 - len(af) - (1 if af else 0)
    if len(payload) > room:
        raise ValueError("payload too large for one packet")
    pad = room - len(payload)
    if pad and not af:
        # stuff via adaptation field (spec padding form)
        af_body = b"\x00" + b"\xff" * (pad - 2) if pad >= 2 else b""
        af = bytes([len(af_body)]) + af_body if pad >= 2 else b""
        if pad == 1:
            af = b"\x00"
        hdr[3] = 0x30 | (cc & 0x0F)
        return bytes(hdr) + af + payload
    hdr[3] = (0x30 if af else 0x10) | (cc & 0x0F)
    out = bytes(hdr) + (af + b"\xff" * pad if af else b"") + payload
    if len(out) != PACKET:
        out = out[:4] + out[4:].ljust(PACKET - 4, b"\xff")
    return out


def _psi_packet(pid: int, cc: int, table_id: int, body: bytes) -> bytes:
    sec_len = len(body) + 4  # + CRC
    sec = bytes([table_id, 0xB0 | (sec_len >> 8), sec_len & 0xFF]) + body
    crc = mpeg_crc32(sec)
    payload = b"\x00" + sec + struct.pack(">I", crc)
    return _packet(pid, cc, payload, pusi=True)


def encode_ts(
    program_number: int = 1,
    pmt_pid: int = 0x100,
    video_pid: int = 0x101,
    audio_pid: int = 0x102,
    video_type: int = 0x1B,
    audio_type: int = 0x0F,
    n_video_pes: int = 3,
    n_audio_pes: int = 2,
    duration_ms: int = 2000,
    n_null: int = 1,
    seed: int = 0,
) -> bytes:
    """Conformant single-program transport stream: PAT + PMT (correct
    MPEG CRCs), PCR packets bracketing ``duration_ms`` on the video
    PID, PES starts with real 00 00 01 prefixes, null stuffing."""
    out = bytearray()
    cc: dict[int, int] = {}

    def nextcc(pid: int) -> int:
        v = cc.get(pid, -1)
        cc[pid] = (v + 1) % 16
        return cc[pid]

    # PAT body: transport_stream_id(16), version/current_next(8),
    # section_number(8), last_section_number(8), then the program loop
    pat_body = (
        struct.pack(">H", 1) + bytes([0xC1, 0, 0])
        + struct.pack(">H", program_number)
        + struct.pack(">H", 0xE000 | pmt_pid)
    )
    out += _psi_packet(0, nextcc(0), 0, pat_body)
    pmt_body = (
        struct.pack(">H", 1) + bytes([0xC1, 0, 0])
        + struct.pack(">H", 0xE000 | video_pid)  # PCR PID
        + struct.pack(">H", 0xF000)  # program_info_length 0
        + bytes([video_type]) + struct.pack(">H", 0xE000 | video_pid)
        + struct.pack(">H", 0xF000)
        + bytes([audio_type]) + struct.pack(">H", 0xE000 | audio_pid)
        + struct.pack(">H", 0xF000)
    )
    out += _psi_packet(pmt_pid, nextcc(pmt_pid), 2, pmt_body)
    base_pcr = (seed % 1000 + 1) * 27_000
    out += _packet(video_pid, nextcc(video_pid), b"", pcr_27mhz=base_pcr)
    for i in range(n_video_pes):
        pes = (
            b"\x00\x00\x01\xe0" + struct.pack(">H", 0)
            + bytes((seed * 31 + i * 7 + k) % 256 for k in range(20))
        )
        out += _packet(video_pid, nextcc(video_pid), pes, pusi=True)
    for i in range(n_audio_pes):
        pes = (
            b"\x00\x00\x01\xc0" + struct.pack(">H", 0)
            + bytes((seed * 17 + i * 11 + k) % 256 for k in range(16))
        )
        out += _packet(audio_pid, nextcc(audio_pid), pes, pusi=True)
    for _ in range(n_null):
        out += _packet(0x1FFF, 0, b"\xff" * 10)
    out += _packet(
        video_pid, nextcc(video_pid), b"",
        pcr_27mhz=base_pcr + duration_ms * 27_000,
    )
    return bytes(out)
