"""AAC ADTS transport probe (ISO/IEC 14496-3 §1.A.3 / 13818-7 §6.2):
frame-by-frame sync walk over the Audio Data Transport Stream framing
Common-Crawl-adjacent audio actually ships in.

What is REAL here: the 56-bit fixed+variable ADTS header decode
(syncword, MPEG version flag, protection_absent, profile/audio object
type, sampling_frequency_index, channel_configuration,
frame_length/buffer_fullness, number_of_raw_data_blocks), the optional
16-bit CRC skip, per-frame 1024-samples-per-block duration arithmetic
and byte-weighted average bitrate — everything a pipeline needs to
inventory, slice and budget audio before decode. The AAC filterbank
itself (huffman spectral data, TNS, 2048-point IMDCT) stays behind the
documented external-codec stub, consistent with reference parity
(ohsome-planet ships no audio codec; this serves the training-data
lane's metadata pass).

The fixture encoder emits conformant ADTS streams (deterministic
payload bytes, optional CRC, multi-raw-data-block frames) so the gate
row's DuckDB oracle can replay the arithmetic exactly.
"""

from __future__ import annotations

import struct

__all__ = ["AdtsFormatError", "probe_adts", "encode_adts"]

# ISO/IEC 14496-3 Table 1.18 sampling_frequency_index
SAMPLE_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)

# profile bits in ADTS are (audio_object_type - 1): 0=Main 1=LC 2=SSR 3=LTP
PROFILE_NAMES = ("Main", "LC", "SSR", "LTP")

# channel_configuration → output channel count (Table 1.19; config 7 = 7.1)
_CHANNELS = (0, 1, 2, 3, 4, 5, 6, 8)

SAMPLES_PER_BLOCK = 1024


class AdtsFormatError(ValueError):
    pass


def probe_adts(payload: bytes) -> dict:
    """Walk every ADTS frame → dict(profile, profile_name, sample_rate,
    channels, mpeg2, n_frames, n_blocks, n_samples, duration_us,
    bitrate_kbps, crc_frames, total_bytes). Integer-exact:
    ``duration_us`` sums per-frame ``blocks * 1024 * 1_000_000 // rate``;
    ``bitrate_kbps`` is ``total_bytes * 8 * rate // n_samples // 1000``.
    Raises :class:`AdtsFormatError` on bad sync, reserved indices,
    mid-stream parameter changes, or truncation."""
    buf = bytes(payload)
    pos = 0
    first = None
    n_frames = n_blocks = total_bytes = crc_frames = 0
    duration_us = 0
    while pos + 7 <= len(buf):
        h0, h1, h2, h3, h4, h5, h6 = buf[pos : pos + 7]
        if h0 != 0xFF or (h1 & 0xF6) != 0xF0:
            raise AdtsFormatError("bad ADTS syncword")
        mpeg2 = (h1 >> 3) & 1
        protection_absent = h1 & 1
        profile = (h2 >> 6) & 3
        sf_index = (h2 >> 2) & 0xF
        if sf_index >= len(SAMPLE_RATES):
            raise AdtsFormatError("reserved sampling_frequency_index")
        rate = SAMPLE_RATES[sf_index]
        channel_config = ((h2 & 1) << 2) | ((h3 >> 6) & 3)
        channels = _CHANNELS[channel_config] if channel_config < 8 else None
        frame_length = ((h3 & 3) << 11) | (h4 << 3) | ((h5 >> 5) & 7)
        raw_blocks = (h6 & 3) + 1
        header_len = 7 if protection_absent else 9
        if frame_length < header_len:
            raise AdtsFormatError("frame_length smaller than its header")
        if pos + frame_length > len(buf):
            raise AdtsFormatError("truncated final frame")
        params = (mpeg2, profile, rate, channel_config)
        if first is None:
            first = params
        elif params != first:
            raise AdtsFormatError("stream parameters change mid-file")
        n_frames += 1
        n_blocks += raw_blocks
        crc_frames += not protection_absent
        total_bytes += frame_length
        duration_us += raw_blocks * SAMPLES_PER_BLOCK * 1_000_000 // rate
        pos += frame_length
    if first is None:
        raise AdtsFormatError("no ADTS frames")
    if pos != len(buf):
        raise AdtsFormatError("trailing bytes after final frame")
    mpeg2, profile, rate, channel_config = first
    n_samples = n_blocks * SAMPLES_PER_BLOCK
    return {
        "profile": profile,
        "profile_name": PROFILE_NAMES[profile],
        "sample_rate": rate,
        "channels": _CHANNELS[channel_config] if channel_config < 8 else None,
        "mpeg2": bool(mpeg2),
        "n_frames": n_frames,
        "n_blocks": n_blocks,
        "n_samples": n_samples,
        "duration_us": duration_us,
        "bitrate_kbps": total_bytes * 8 * rate // n_samples // 1000,
        "crc_frames": crc_frames,
        "total_bytes": total_bytes,
    }


def encode_adts(
    profile: int = 1,
    sf_index: int = 4,
    channel_config: int = 2,
    payload_sizes: tuple[int, ...] = (64, 80, 96),
    mpeg2: int = 0,
    with_crc: bool = False,
    raw_blocks: int = 1,
    seed: int = 0,
) -> bytes:
    """Conformant ADTS fixture stream: one frame per payload size, each
    carrying ``raw_blocks`` raw data blocks and deterministic payload
    bytes (so truncation/overrun bugs shift real content, not zeros)."""
    if raw_blocks not in (1, 2, 3, 4):
        raise ValueError("raw_blocks must be 1..4")
    out = bytearray()
    header_len = 9 if with_crc else 7
    for i, size in enumerate(payload_sizes):
        frame_length = header_len + size
        if frame_length >= 1 << 13:
            raise ValueError("frame_length exceeds 13 bits")
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF0 | (mpeg2 << 3) | (0 if with_crc else 1)
        h[2] = (profile << 6) | (sf_index << 2) | ((channel_config >> 2) & 1)
        h[3] = ((channel_config & 3) << 6) | ((frame_length >> 11) & 3)
        h[4] = (frame_length >> 3) & 0xFF
        h[5] = ((frame_length & 7) << 5) | 0x1F  # buffer_fullness hi (0x7FF VBR)
        h[6] = (0x3F << 2) | (raw_blocks - 1)  # buffer_fullness lo + blocks
        out += h
        if with_crc:
            out += struct.pack(">H", (seed * 7919 + i) & 0xFFFF)
        out += bytes((seed * 31 + i * 17 + k * 7) % 256 for k in range(size))
    return bytes(out)
