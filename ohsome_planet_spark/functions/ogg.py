"""Ogg container walk (RFC 3533) + Opus (RFC 7845) / Vorbis (Xiph
spec §4.2) identification headers — the audio-container probe for the
web's other codec family (Opus-in-Ogg is the WebRTC/podcast shape,
Vorbis the legacy one).

What is REAL here: the 27-byte page header decode, the lacing-value
segment table with 255-continuation packet assembly INCLUDING packets
spanning pages (header_type continued flag), per-page CRC-32
verification (the Ogg polynomial 0x04c11db7, unreflected, init/xor 0 —
a table-driven implementation, not zlib's reflected CRC), BOS/EOS
accounting, granule-position duration arithmetic (48 kHz-fixed minus
pre-skip for Opus per RFC 7845 §4.2, sample-rate-relative for Vorbis),
and the OpusHead / ``\\x01vorbis`` header field layouts. The audio
packets themselves (SILK/CELT, MDCT floors/residues) stay behind the
documented external-codec stub — this probe serves the training-data
lane's metadata pass.

The fixture encoder emits conformant streams (correct CRCs, lacing
tables, spanning packets, EOS granules) so the gate row's oracle can
replay every output.
"""

from __future__ import annotations

import struct

__all__ = ["OggFormatError", "probe_ogg", "encode_ogg_opus", "encode_ogg_vorbis"]


class OggFormatError(ValueError):
    pass


def _make_crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _make_crc_table()


def ogg_crc(data: bytes) -> int:
    """CRC-32/Ogg: poly 0x04c11db7, no bit reflection, init 0, xor 0."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _parse_pages(data: bytes):
    pos = 0
    pages = []
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] != b"OggS":
            raise OggFormatError("bad Ogg capture pattern")
        if pos + 27 > n:
            raise OggFormatError("truncated page header")
        (version, htype, granule, serial, seq, crc, nsegs) = struct.unpack_from(
            "<BBqIIIB", data, pos + 4
        )
        if version != 0:
            raise OggFormatError("unsupported Ogg version")
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise OggFormatError("truncated segment table")
        body_len = sum(seg_table)
        end = pos + 27 + nsegs + body_len
        if end > n:
            raise OggFormatError("truncated page body")
        page = bytearray(data[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise OggFormatError("page CRC mismatch")
        pages.append(
            {
                "htype": htype,
                "granule": granule,
                "serial": serial,
                "seq": seq,
                "lacing": list(seg_table),
                "body": data[pos + 27 + nsegs : end],
            }
        )
        pos = end
    if not pages:
        raise OggFormatError("no Ogg pages")
    return pages


def _assemble_packets(pages) -> list[bytes]:
    packets: list[bytes] = []
    partial = bytearray()
    for page in pages:
        continued = bool(page["htype"] & 0x01)
        if continued and not partial:
            raise OggFormatError("continued page without a pending packet")
        if not continued and partial:
            raise OggFormatError("pending packet not continued")
        off = 0
        body = page["body"]
        for lace in page["lacing"]:
            partial += body[off : off + lace]
            off += lace
            if lace < 255:
                packets.append(bytes(partial))
                partial = bytearray()
    if partial:
        raise OggFormatError("stream ends mid-packet")
    return packets


def probe_ogg(payload: bytes) -> dict:
    """Walk pages (CRC-verified), assemble packets, parse the codec ID
    header → dict(codec, channels, sample_rate, pre_skip, n_pages,
    n_packets, duration_us, serial)."""
    data = bytes(payload)
    pages = _parse_pages(data)
    if not pages[0]["htype"] & 0x02:
        raise OggFormatError("first page is not BOS")
    if not pages[-1]["htype"] & 0x04:
        raise OggFormatError("last page is not EOS")
    serial = pages[0]["serial"]
    if any(p["serial"] != serial for p in pages):
        raise OggFormatError("multiplexed streams unsupported in probe")
    if [p["seq"] for p in pages] != list(range(len(pages))):
        raise OggFormatError("page sequence gap")
    packets = _assemble_packets(pages)
    first = packets[0] if packets else b""
    last_granule = pages[-1]["granule"]
    if first.startswith(b"OpusHead"):
        if len(first) < 19:
            raise OggFormatError("truncated OpusHead")
        version = first[8]
        if version >> 4 != 0:
            raise OggFormatError("unsupported Opus header version")
        channels = first[9]
        pre_skip = struct.unpack_from("<H", first, 10)[0]
        input_rate = struct.unpack_from("<I", first, 12)[0]
        # granule positions are ALWAYS 48 kHz for Opus (RFC 7845 §4)
        duration_us = max(0, last_granule - pre_skip) * 1_000_000 // 48_000
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": input_rate,
            "pre_skip": pre_skip,
            "n_pages": len(pages),
            "n_packets": len(packets),
            "duration_us": duration_us,
            "serial": serial,
        }
    if first[:7] == b"\x01vorbis":
        if len(first) < 30:
            raise OggFormatError("truncated Vorbis ID header")
        vversion, channels, rate = struct.unpack_from("<IBI", first, 7)
        if vversion != 0:
            raise OggFormatError("unsupported Vorbis version")
        if rate == 0:
            raise OggFormatError("zero Vorbis sample rate")
        duration_us = last_granule * 1_000_000 // rate
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "pre_skip": 0,
            "n_pages": len(pages),
            "n_packets": len(packets),
            "duration_us": duration_us,
            "serial": serial,
        }
    raise OggFormatError("unknown codec ID header")


# ---------------------------------------------------------------------------
# fixture encoders


def _lacing(size: int) -> bytes:
    out = bytearray()
    while size >= 255:
        out.append(255)
        size -= 255
    out.append(size)
    return bytes(out)


def _page(
    packets: list[bytes],
    granule: int,
    serial: int,
    seq: int,
    bos: bool = False,
    eos: bool = False,
    continued: bool = False,
    open_tail: bool = False,
) -> bytes:
    """One page. ``open_tail`` leaves the final packet unterminated
    (all-255 lacing) so the next page continues it."""
    lacing = bytearray()
    body = bytearray()
    for i, pkt in enumerate(packets):
        body += pkt
        if open_tail and i == len(packets) - 1:
            if len(pkt) % 255:
                raise ValueError("open-tail packet fragment must be 255-aligned")
            lacing += b"\xff" * (len(pkt) // 255)
        else:
            lacing += _lacing(len(pkt))
    htype = (0x01 if continued else 0) | (0x02 if bos else 0) | (0x04 if eos else 0)
    head = bytearray(b"OggS")
    head += struct.pack("<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing))
    head += lacing
    page = bytes(head) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _audio_packet(seed: int, i: int, size: int) -> bytes:
    return bytes((seed * 31 + i * 17 + k * 7) % 256 for k in range(size))


def _encode_stream(
    id_packet: bytes,
    comment_packets: list[bytes],
    n_audio: int,
    samples_per_packet: int,
    granule_offset: int,
    serial: int,
    seed: int,
    packets_per_page: int,
    span_page: bool,
) -> bytes:
    out = bytearray()
    out += _page([id_packet], 0, serial, 0, bos=True)
    out += _page(comment_packets, 0, serial, 1)
    seq = 2
    audio = [
        _audio_packet(seed, i, (seed + i * 13) % 120 + 40) for i in range(n_audio)
    ]
    done = 0
    while done < len(audio):
        chunk = audio[done : done + packets_per_page]
        done += len(chunk)
        granule = granule_offset + done * samples_per_packet
        is_last = done >= len(audio)
        if span_page and not is_last and len(chunk) == packets_per_page:
            # split one oversized packet across this page and the next:
            # page A carries a 510-byte head (two 255 laces, open tail),
            # page B opens with the continued 60-byte remainder
            big = _audio_packet(seed, 1000 + done, 570)
            out += _page(
                chunk + [big[:510]],
                # a page whose last packet continues carries NO final
                # granule for it; -1 is the RFC 3533 convention
                -1,
                serial,
                seq,
                open_tail=True,
            )
            seq += 1
            chunk2 = audio[done : done + 1]
            done += len(chunk2)
            is_last = done >= len(audio)
            granule = granule_offset + done * samples_per_packet
            out += _page(
                [big[510:]] + chunk2,
                granule,
                serial,
                seq,
                continued=True,
                eos=is_last,
            )
            seq += 1
            span_page = False  # one spanning packet per fixture stream
            continue
        out += _page(chunk, granule, serial, seq, eos=is_last)
        seq += 1
    return bytes(out)


def encode_ogg_opus(
    channels: int = 2,
    input_rate: int = 48000,
    pre_skip: int = 312,
    n_audio: int = 5,
    serial: int = 0x1234,
    seed: int = 0,
    packets_per_page: int = 3,
    span_page: bool = False,
) -> bytes:
    """Conformant Ogg Opus stream: OpusHead BOS page, OpusTags page,
    audio pages of 960-sample (20 ms) packets; the final granule
    includes pre-skip per RFC 7845 §4.2."""
    head = b"OpusHead" + struct.pack(
        "<BBHIhB", 1, channels, pre_skip, input_rate, 0, 0
    )
    tags = b"OpusTags" + struct.pack("<I", 7) + b"fixture" + struct.pack("<I", 0)
    return _encode_stream(
        head, [tags], n_audio, 960, pre_skip, serial, seed,
        packets_per_page, span_page,
    )


def encode_ogg_vorbis(
    channels: int = 2,
    rate: int = 44100,
    n_audio: int = 5,
    serial: int = 0x5678,
    seed: int = 0,
    packets_per_page: int = 3,
    span_page: bool = False,
) -> bytes:
    """Conformant-shaped Ogg Vorbis stream: ID header, comment + setup
    header packets on one page, audio pages of fixed 128-sample packets."""
    ident = b"\x01vorbis" + struct.pack(
        "<IBIiiiB", 0, channels, rate, 0, 0, 0, (8 << 4) | 8
    ) + b"\x01"
    comment = b"\x03vorbis" + struct.pack("<II", 7, 0) + b"fixture" + b"\x01"
    setup = b"\x05vorbis" + _audio_packet(seed, 999, 48) + b"\x01"
    return _encode_stream(
        ident, [comment, setup], n_audio, 128, 0, serial, seed,
        packets_per_page, span_page,
    )
