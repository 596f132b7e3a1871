"""MPEG audio (MP3) frame walk in pure stdlib Python — container-level
probe for the multimodal seam, the audio sibling of the ISO-BMFF/AVI
probes: genuine sync-word frame headers are parsed and walked
frame-by-frame (no guessing from file size), ID3v2 prefixes are skipped
by their syncsafe length, and a Xing/Info VBR header in the first frame
is read from its channel-mode-dependent offset.

Scope: MPEG-1/2/2.5, Layers I/II/III, all standard bitrate and
sample-rate table entries, padding bit, mono/stereo modes. Payload
SAMPLES are not decoded — MP3's hybrid filterbank needs huffman tables +
IMDCT + polyphase synthesis; the frame geometry, timing, and VBR
bookkeeping here are the real wire-format arithmetic (the same tables a
full decoder starts from). This is honestly a PROBE, like probe_mp4.

All tables below are the published ISO/IEC 11172-3 / 13818-3 values.
"""

from __future__ import annotations

import struct

MP3_SYNC = 0xFFE0  # 11 set bits

# bitrate_kbps[version_group][layer][index]; version_group 0 = MPEG1,
# 1 = MPEG2/2.5; layer index 0 = Layer I, 1 = II, 2 = III; index 0 = free
_BITRATES = {
    (0, 0): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 2): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 0): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 1): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

# sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_RATES = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}

_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


class Mp3FormatError(ValueError):
    pass


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _parse_header(h: int):
    """32-bit big-endian frame header → (version_bits, layer_idx,
    bitrate_kbps, sample_rate, padding, channels, frame_bytes,
    samples_per_frame)."""
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3FormatError("lost sync")
    version = (h >> 19) & 3  # 0=2.5, 1=reserved, 2=2, 3=1
    layer_code = (h >> 17) & 3  # 3=I, 2=II, 1=III, 0=reserved
    if version == 1 or layer_code == 0:
        raise Mp3FormatError("reserved version/layer")
    layer = 3 - layer_code  # 0=I, 1=II, 2=III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise Mp3FormatError("free/bad bitrate or bad sample rate")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 3 = mono
    vgroup = 0 if version == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _RATES[version][sr_idx]
    if layer == 0:  # Layer I: slots of 4 bytes
        frame_bytes = (12 * bitrate // rate + padding) * 4
        spf = 384
    elif layer == 1 or vgroup == 0:  # Layer II, or MPEG1 Layer III
        frame_bytes = 144 * bitrate // rate + padding
        spf = 1152
    else:  # MPEG2/2.5 Layer III: 576-sample granule
        frame_bytes = 72 * bitrate // rate + padding
        spf = 576
    channels = 1 if mode == 3 else 2
    return version, layer, bitrate, rate, padding, channels, frame_bytes, spf


def _xing_offset(version: int, channels: int) -> int:
    # 4 header bytes + Layer III side-info length
    if version == 3:  # MPEG1
        return 4 + (17 if channels == 1 else 32)
    return 4 + (9 if channels == 1 else 17)


def probe_mp3(payload: bytes):
    """Walk every frame → dict(version, layer, sample_rate, channels,
    n_frames, total_frame_bytes, duration_us, bitrate_kbps, is_vbr,
    xing_frames). ``duration_us`` is exact integer arithmetic
    (sum of per-frame ``spf * 1_000_000 // rate``); ``bitrate_kbps`` is
    the header value when constant across frames, else the byte-weighted
    integer average. ``xing_frames`` is the frame count claimed by a
    Xing/Info header when present (None otherwise)."""
    buf = bytes(payload)
    pos = 0
    if buf[:3] == b"ID3":
        if len(buf) < 10:
            raise Mp3FormatError("truncated ID3v2 header")
        pos = 10 + _syncsafe(buf[6:10])
    first = None
    n_frames = 0
    total_bytes = 0
    duration_us = 0
    bitrates = set()
    xing_frames = None
    while pos + 4 <= len(buf):
        (h,) = struct.unpack_from(">I", buf, pos)
        version, layer, bitrate, rate, _pad, channels, fb, spf = _parse_header(h)
        if first is None:
            first = (version, layer, rate, channels)
            xo = _xing_offset(version, channels)
            tag = buf[pos + xo : pos + xo + 4]
            if tag in (b"Xing", b"Info"):
                # bounds-check BEFORE unpacking: a truncated first frame
                # with a Xing tag must raise Mp3FormatError (the module's
                # declared error contract), not struct.error
                if pos + xo + 12 > len(buf):
                    raise Mp3FormatError("truncated Xing/Info header")
                flags = struct.unpack_from(">I", buf, pos + xo + 4)[0]
                if flags & 1:
                    xing_frames = struct.unpack_from(
                        ">I", buf, pos + xo + 8
                    )[0]
        elif (version, layer, rate, channels) != first:
            raise Mp3FormatError("stream parameters change mid-file")
        if pos + fb > len(buf):
            raise Mp3FormatError("truncated final frame")
        n_frames += 1
        total_bytes += fb
        duration_us += spf * 1_000_000 // rate
        bitrates.add(bitrate)
        pos += fb
    if first is None:
        raise Mp3FormatError("no MPEG audio frames")
    version, layer, rate, channels = first
    if len(bitrates) == 1:
        kbps = next(iter(bitrates)) // 1000
        is_vbr = xing_frames is not None
    else:
        # byte-weighted average over the walked frames, integer math
        kbps = total_bytes * 8 * rate // (
            n_frames * (384 if layer == 0 else 1152 if layer == 1 or version == 3 else 576)
        ) // 1000
        is_vbr = True
    return {
        "version": _VERSION_NAME[version],
        "layer": layer + 1,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "total_frame_bytes": total_bytes,
        "duration_us": duration_us,
        "bitrate_kbps": kbps,
        "is_vbr": is_vbr,
        "xing_frames": xing_frames,
    }


# --- fixture encoder ----------------------------------------------------------


def encode_mp3(
    version: int,
    layer: int,
    bitrate_indices: list[int],
    sr_idx: int,
    channels: int = 2,
    padding_pattern: int = 0,
    id3_bytes: int = 0,
    xing: bool = False,
) -> bytes:
    """Emit genuine MPEG-audio frame sequences (fixture encoder): real
    sync headers with the requested version (3=MPEG1, 2=MPEG2, 0=2.5),
    layer (0/1/2 for I/II/III), per-frame bitrate indices, optional
    ID3v2 prefix and first-frame Xing header; payloads are zero-filled
    (the probe never reads them)."""
    out = bytearray()
    if id3_bytes:
        body = bytes(id3_bytes)
        out += b"ID3\x04\x00\x00" + bytes(
            (
                (id3_bytes >> 21) & 0x7F,
                (id3_bytes >> 14) & 0x7F,
                (id3_bytes >> 7) & 0x7F,
                id3_bytes & 0x7F,
            )
        )
        out += body
    vgroup = 0 if version == 3 else 1
    mode = 3 if channels == 1 else 0
    for k, br_idx in enumerate(bitrate_indices):
        pad = (padding_pattern >> (k % 8)) & 1
        h = (
            (0x7FF << 21)
            | (version << 19)
            | ((3 - layer) << 17)
            | (1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | (mode << 6)
        )
        bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
        rate = _RATES[version][sr_idx]
        if layer == 0:
            fb = (12 * bitrate // rate + pad) * 4
        elif layer == 1 or vgroup == 0:
            fb = 144 * bitrate // rate + pad
        else:
            fb = 72 * bitrate // rate + pad
        frame = bytearray(struct.pack(">I", h)) + bytes(fb - 4)
        if xing and k == 0:
            xo = _xing_offset(version, channels)
            frame[xo : xo + 4] = b"Xing"
            struct.pack_into(">II", frame, xo + 4, 0x1, len(bitrate_indices))
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# Layer I sample decode (subband domain)
# ---------------------------------------------------------------------------

# ISO 11172-3 Table B.1 scalefactors: scf(idx) = 2.0 * 2^(-idx/3).
# Index multiples of 3 are exact dyadic doubles (2.0, 1.0, 0.5, ...).
SCALEFACTORS = [2.0 * 2.0 ** (-i / 3.0) for i in range(63)]


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise Mp3FormatError("bitstream underrun")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


def decode_mp1_subbands(payload: bytes):
    """REAL MPEG-1 Layer I sample decode, subband domain: walk every
    frame, read the 4-bit allocations, 6-bit scalefactor indices and
    MSB-packed samples from the genuine bitstream, and requantize per
    ISO 11172-3 §2.4.3.3:

        s'''    = (raw XOR 2^(nb-1)) / 2^(nb-1) - 1   (inverted MSB)
        sample   = scf * (2^nb / (2^nb - 1)) * (s''' + 2^-nb)

    which lands codes on the exact symmetric grid [-1, +1] (the all-ones
    positive code decodes to exactly +1.0, its mirror to -1.0).

    Output: (sample_rate, channels, n_frames, samples) with ``samples``
    a per-frame list of per-channel lists of 32x12 subband values. The
    synthesis polyphase filterbank (the lossy perceptual half) is
    deliberately NOT applied — subband samples are the exact decodable
    content of the bitstream, and every arithmetic step above is
    IEEE-deterministic, so the result is oracle-replayable bit-for-bit.
    Only Layer I mono/stereo without CRC is in scope; anything else
    raises and callers fall back to :func:`probe_mp3`."""
    buf = bytes(payload)
    pos = 0
    if buf[:3] == b"ID3":
        pos = 10 + _syncsafe(buf[6:10])
    first = None
    frames = []
    while pos + 4 <= len(buf):
        (h,) = struct.unpack_from(">I", buf, pos)
        version, layer, bitrate, rate, _pad, channels, fb, _spf = _parse_header(h)
        if layer != 0 or version != 3:
            raise Mp3FormatError("only MPEG-1 Layer I sample decode")
        if not (h >> 16) & 1:
            raise Mp3FormatError("CRC-protected Layer I not supported")
        if first is None:
            first = (rate, channels)
        elif (rate, channels) != first:
            raise Mp3FormatError("stream parameters change mid-file")
        if pos + fb > len(buf):
            raise Mp3FormatError("truncated frame")
        rd = _BitReader(buf[pos : pos + fb], pos_bits=32)
        alloc = [
            [rd.read(4) for _ in range(32)] for _ in range(channels)
        ]
        if any(a == 15 for ch in alloc for a in ch):
            raise Mp3FormatError("forbidden allocation 15")
        scf = [
            [rd.read(6) if alloc[c][sb] else 0 for sb in range(32)]
            for c in range(channels)
        ]
        chans = [[[0.0] * 12 for _ in range(32)] for _ in range(channels)]
        for s in range(12):
            for sb in range(32):
                for c in range(channels):
                    a = alloc[c][sb]
                    if a == 0:
                        continue
                    nb = a + 1
                    raw = rd.read(nb)
                    half = 1 << (nb - 1)
                    s3 = (raw ^ half) / float(half) - 1.0
                    val = (
                        SCALEFACTORS[scf[c][sb]]
                        * (float(1 << nb) / float((1 << nb) - 1))
                        * (s3 + 2.0 ** (-nb))
                    )
                    chans[c][sb][s] = val
        frames.append(chans)
        pos += fb
    if first is None:
        raise Mp3FormatError("no frames")
    rate, channels = first
    return rate, channels, len(frames), frames


def encode_mp1(
    alloc: list[list[int]],
    scf_idx: list[list[int]],
    samples: list[list[list[int]]],
    sr_idx: int = 0,
    br_idx: int = 12,
    channels: int = 1,
    n_frames: int = 1,
    sample_fn=None,
) -> bytes:
    """Emit genuine MPEG-1 Layer I frames (fixture encoder): real header,
    4-bit allocations, 6-bit scalefactors, MSB-packed raw samples
    (``samples[c][sb]`` lists of 12 ints, or ``sample_fn(f, c, sb, s)``
    for multi-frame streams), zero-padded to the exact frame length."""
    out = bytearray()
    rate = _RATES[3][sr_idx]
    bitrate = _BITRATES[(0, 0)][br_idx] * 1000
    fb = (12 * bitrate // rate) * 4
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
    )
    for f in range(n_frames):
        bits = bytearray()
        acc = 0
        nacc = 0

        def put(v: int, n: int):
            nonlocal acc, nacc
            acc = (acc << n) | (v & ((1 << n) - 1))
            nacc += n
            while nacc >= 8:
                bits.append((acc >> (nacc - 8)) & 0xFF)
                nacc -= 8

        for c in range(channels):
            for sb in range(32):
                put(alloc[c][sb], 4)
        for c in range(channels):
            for sb in range(32):
                if alloc[c][sb]:
                    put(scf_idx[c][sb], 6)
        for s in range(12):
            for sb in range(32):
                for c in range(channels):
                    a = alloc[c][sb]
                    if a:
                        raw = (
                            sample_fn(f, c, sb, s)
                            if sample_fn is not None
                            else samples[c][sb][s]
                        )
                        put(raw, a + 1)
        if nacc:
            bits.append((acc << (8 - nacc)) & 0xFF)
        frame = struct.pack(">I", h) + bytes(bits)
        if len(frame) > fb:
            raise ValueError("frame payload exceeds frame length")
        out += frame + bytes(fb - len(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Layer II sample decode (subband domain)
# ---------------------------------------------------------------------------
# ISO 11172-3 Annex B allocation tables. Each subband's entry lists the
# possible quantization step counts; the allocation index read from the
# bitstream picks one. List length fixes the allocation field width
# (16 -> 4 bits, 8 -> 3, 4 -> 2). Published table values (B.2a-d).

_L16A = (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023,
         2047, 4095, 8191, 16383, 32767, 65535)
_L16B = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255,
         511, 1023, 2047, 4095, 8191, 65535)
_L8 = (0, 3, 5, 7, 9, 15, 31, 65535)
_L4 = (0, 3, 5, 65535)
_LC16 = (0, 3, 5, 9, 15, 31, 63, 127, 255, 511,
         1023, 2047, 4095, 8191, 16383, 32767)
_LC8 = (0, 3, 5, 9, 15, 31, 63, 127)

# steps -> group code bits for the three GROUPED quantizations (three
# consecutive samples share one code word: 3^3<=2^5, 5^3<=2^7, 9^3<=2^10)
_MP2_GROUP_BITS = {3: 5, 5: 7, 9: 10}
# steps -> per-sample code width nb (ungrouped: steps = 2^nb - 1;
# grouped: width each sample would need, used by the C/D closed forms)
_MP2_NB = {3: 2, 5: 3, 7: 3, 9: 4, 15: 4, 31: 5, 63: 6, 127: 7, 255: 8,
           511: 9, 1023: 10, 2047: 11, 4095: 12, 8191: 13, 16383: 14,
           32767: 15, 65535: 16}
# scfsi (2 bits) -> which TRANSMITTED scalefactor each of the three
# 12-granule parts uses (ISO 11172-3 2.4.2.3: 0 -> three transmitted,
# 1 -> first shared by parts 0-1, 2 -> one for all, 3 -> second shared
# by parts 1-2)
_MP2_SCFSI_PARTS = {0: (0, 1, 2), 1: (0, 0, 1), 2: (0, 0, 0), 3: (0, 1, 1)}
_MP2_SCFSI_COUNT = {0: 3, 1: 2, 2: 1, 3: 2}


def mp2_alloc_table(name: str) -> list[tuple[int, ...]]:
    """Annex B table name ('a'|'b'|'c'|'d') -> per-subband step tuples
    (the list length IS sblimit: 27 / 30 / 8 / 12)."""
    if name == "a":
        return [_L16A] * 3 + [_L16B] * 8 + [_L8] * 12 + [_L4] * 4
    if name == "b":
        return [_L16A] * 3 + [_L16B] * 8 + [_L8] * 12 + [_L4] * 7
    if name == "c":
        return [_LC16] * 2 + [_LC8] * 6
    if name == "d":
        return [_LC16] * 2 + [_LC8] * 10
    raise ValueError(name)


def mp2_table_for(rate: int, kbps_per_channel: int) -> str:
    """Allocation-table selection per ISO 11172-3 2.4.2.3 (MPEG-1 rates
    only): low per-channel bitrates use the 8/12-subband tables, mid uses
    B.2a, high uses B.2b except at 48 kHz where B.2a always applies."""
    if kbps_per_channel <= 48:
        return "d" if rate == 32000 else "c"
    if kbps_per_channel <= 80:
        return "a"
    return "a" if rate == 48000 else "b"


def _mp2_nbal(steps: tuple[int, ...]) -> int:
    return {16: 4, 8: 3, 4: 2}[len(steps)]


def decode_mp2_subbands(payload: bytes):
    """REAL MPEG-1 Layer II sample decode, subband domain: walk every
    frame, read the table-selected allocations, scfsi, shared
    scalefactors and (de)grouped sample codes from the genuine
    bitstream, and requantize per ISO 11172-3 §2.4.3.4:

        s''' = c / 2^(nb-1) - 1        (code fraction; no code is
                                        all-ones for ungrouped steps)
        s''  = C * (s''' + D)          C = 2^nb / steps
                                       D = (2^nb - steps + 1) / 2^nb
        s    = scf * s''

    C and D reproduce the published Table 3-C.3 constants exactly
    (refereed in tests against the printed decimals), and the closed
    form collapses to the symmetric odd grid (2c - steps + 1)/steps —
    the independent referee path. Grouped quantizations (3/5/9 steps)
    carry three samples per code word, degrouped least-significant
    first.

    Output: (sample_rate, channels, n_frames, frames) with
    ``frames[f][ch][sb]`` a list of 36 subband samples (12 granules x 3).
    Like the Layer I decoder the synthesis filterbank is deliberately
    NOT applied — subband samples are the bitstream's exact decodable
    content and every step above is IEEE-deterministic, so the result is
    oracle-replayable bit-for-bit. Scope: MPEG-1 Layer II mono, stereo,
    and JOINT (intensity) stereo without CRC. In joint stereo
    (mode 01) the bound is 4·(mode_extension+1) subbands: below it
    everything is per-channel; from the bound up each subband carries
    ONE allocation and ONE set of sample codes shared by both channels,
    while scfsi/scalefactors stay per-channel — each channel applies its
    own scalefactor to the shared codes (ISO 11172-3 §2.4.1.6,
    §A.2.2.2)."""
    buf = bytes(payload)
    pos = 0
    if buf[:3] == b"ID3":
        pos = 10 + _syncsafe(buf[6:10])
    first = None
    frames = []
    while pos + 4 <= len(buf):
        (h,) = struct.unpack_from(">I", buf, pos)
        version, layer, bitrate, rate, _pad, channels, fb, _spf = _parse_header(h)
        if layer != 1 or version != 3:
            raise Mp3FormatError("only MPEG-1 Layer II sample decode")
        if not (h >> 16) & 1:
            raise Mp3FormatError("CRC-protected Layer II not supported")
        mode = (h >> 6) & 3
        if first is None:
            first = (rate, channels, bitrate, mode, (h >> 4) & 3)
        elif (rate, channels, bitrate, mode, (h >> 4) & 3) != first:
            raise Mp3FormatError("stream parameters change mid-file")
        if pos + fb > len(buf):
            raise Mp3FormatError("truncated frame")
        table = mp2_alloc_table(mp2_table_for(rate, bitrate // 1000 // channels))
        sblimit = len(table)
        # intensity-stereo bound: shared allocation + sample codes at and
        # above it (joint stereo only; else every subband is per-channel)
        bound = 4 * (((h >> 4) & 3) + 1) if mode == 1 else sblimit
        bound = min(bound, sblimit)
        rd = _BitReader(buf[pos : pos + fb], pos_bits=32)
        alloc = [[0] * sblimit for _ in range(channels)]
        for sb in range(sblimit):
            if sb < bound:
                for c in range(channels):
                    alloc[c][sb] = rd.read(_mp2_nbal(table[sb]))
            else:
                shared = rd.read(_mp2_nbal(table[sb]))
                for c in range(channels):
                    alloc[c][sb] = shared
        scfsi = [[0] * sblimit for _ in range(channels)]
        for sb in range(sblimit):
            for c in range(channels):
                if alloc[c][sb]:
                    scfsi[c][sb] = rd.read(2)
        scf = [[(0.0, 0.0, 0.0)] * sblimit for _ in range(channels)]
        for sb in range(sblimit):
            for c in range(channels):
                if alloc[c][sb]:
                    si = scfsi[c][sb]
                    vals = [rd.read(6) for _ in range(_MP2_SCFSI_COUNT[si])]
                    scf[c][sb] = tuple(
                        SCALEFACTORS[vals[i]] for i in _MP2_SCFSI_PARTS[si]
                    )
        chans = [
            [[0.0] * 36 for _ in range(sblimit)] for _ in range(channels)
        ]
        def read_codes(m, nb):
            if m in _MP2_GROUP_BITS:
                v = rd.read(_MP2_GROUP_BITS[m])
                if v >= m * m * m:
                    raise Mp3FormatError("group code out of range")
                return (v % m, (v // m) % m, v // (m * m))
            codes = tuple(rd.read(nb) for _ in range(3))
            if any(cd >= m for cd in codes):
                raise Mp3FormatError("forbidden all-ones sample code")
            return codes

        for g in range(12):
            for sb in range(sblimit):
                shared_codes = None
                for c in range(channels):
                    a = alloc[c][sb]
                    if not a:
                        continue
                    m = table[sb][a]
                    nb = _MP2_NB[m]
                    half = 1 << (nb - 1)
                    C = float(1 << nb) / float(m)
                    D = float((1 << nb) - m + 1) / float(1 << nb)
                    if sb >= bound:
                        # intensity: ONE code set per subband, each
                        # channel scales it with its own scalefactor
                        if shared_codes is None:
                            shared_codes = read_codes(m, nb)
                        codes = shared_codes
                    else:
                        codes = read_codes(m, nb)
                    scfv = scf[c][sb][g // 4]
                    for k in range(3):
                        s3 = codes[k] / float(half) - 1.0
                        chans[c][sb][g * 3 + k] = scfv * (C * (s3 + D))
        frames.append(chans)
        pos += fb
    if first is None:
        raise Mp3FormatError("no frames")
    rate, channels = first[0], first[1]
    return rate, channels, len(frames), frames


def encode_mp2(
    alloc_idx: list[list[int]],
    scfsi: list[list[int]],
    scf_fn,
    code_fn,
    sr_idx: int = 0,
    br_idx: int = 4,
    channels: int = 1,
    n_frames: int = 1,
    joint_ext: int | None = None,
) -> bytes:
    """Emit genuine MPEG-1 Layer II frames (fixture encoder): real
    header, table-width allocations, scfsi, shared scalefactors, and
    grouped/ungrouped sample codes. ``scf_fn(c, sb, i)`` returns the
    i-th TRANSMITTED 6-bit scalefactor index; ``code_fn(f, c, sb, g, k)``
    the raw sample code in [0, steps-1] (grouping is applied here,
    least-significant first, matching §2.4.3.4's degrouping).
    ``joint_ext`` (0-3, stereo only) emits JOINT stereo with bound
    4·(joint_ext+1): above the bound one allocation and one code set per
    subband (taken from channel 0 — ``alloc_idx`` must agree across
    channels there), scalefactors still per-channel."""
    rate = _RATES[3][sr_idx]
    bitrate = _BITRATES[(0, 1)][br_idx] * 1000
    fb = 144 * bitrate // rate
    table = mp2_alloc_table(mp2_table_for(rate, bitrate // 1000 // channels))
    sblimit = len(table)
    if joint_ext is not None:
        if channels != 2:
            raise ValueError("joint stereo needs channels=2")
        mode = 1
        bound = min(4 * (joint_ext + 1), sblimit)
        for sb in range(bound, sblimit):
            if alloc_idx[0][sb] != alloc_idx[1][sb]:
                raise ValueError(
                    f"intensity subband {sb}: allocations must agree"
                )
    else:
        mode = 3 if channels == 1 else 0
        bound = sblimit
    h = (
        (0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
        | ((joint_ext or 0) << 4)
    )
    out = bytearray()
    for f in range(n_frames):
        bits = bytearray()
        acc = 0
        nacc = 0

        def put(v: int, n: int):
            nonlocal acc, nacc
            acc = (acc << n) | (v & ((1 << n) - 1))
            nacc += n
            while nacc >= 8:
                bits.append((acc >> (nacc - 8)) & 0xFF)
                nacc -= 8

        for sb in range(sblimit):
            for c in range(channels if sb < bound else 1):
                put(alloc_idx[c][sb], _mp2_nbal(table[sb]))
        for sb in range(sblimit):
            for c in range(channels):
                if alloc_idx[c][sb]:
                    put(scfsi[c][sb], 2)
        for sb in range(sblimit):
            for c in range(channels):
                if alloc_idx[c][sb]:
                    for i in range(_MP2_SCFSI_COUNT[scfsi[c][sb]]):
                        put(scf_fn(c, sb, i), 6)
        for g in range(12):
            for sb in range(sblimit):
                for c in range(channels if sb < bound else 1):
                    a = alloc_idx[c][sb]
                    if not a:
                        continue
                    m = table[sb][a]
                    codes = [code_fn(f, c, sb, g, k) for k in range(3)]
                    if any(cd < 0 or cd >= m for cd in codes):
                        raise ValueError(f"sample code out of [0,{m})")
                    if m in _MP2_GROUP_BITS:
                        v = codes[0] + m * codes[1] + m * m * codes[2]
                        put(v, _MP2_GROUP_BITS[m])
                    else:
                        for cd in codes:
                            put(cd, _MP2_NB[m])
        if nacc:
            bits.append((acc << (8 - nacc)) & 0xFF)
        frame = struct.pack(">I", h) + bytes(bits)
        if len(frame) > fb:
            raise ValueError(
                f"frame payload {len(frame)} exceeds frame length {fb}"
            )
        out += frame + bytes(fb - len(frame))
    return bytes(out)
