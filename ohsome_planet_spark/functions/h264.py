"""H.264/AVC Annex-B bitstream probe: NAL walk, emulation-prevention
removal, and real exp-Golomb SPS/PPS/slice-header parsing (ITU-T H.264
§7.3-7.4, §8.2) — the metadata pass a video training pipeline runs on
every clip before spending (external-codec) decode cycles.

What is REAL here: start-code scanning (3- and 4-byte), the
00 00 03 emulation-prevention-byte strip (§7.4.1.1), ue(v)/se(v)
exp-Golomb decode (§9.1), the full seq_parameter_set_rbsp walk
including the High-profile chroma/bit-depth branch and scaling-list
skip, pic_parameter_set_rbsp, and the slice-header prefix through
slice_type/frame_num — enough to classify every access unit
(IDR/P/B/I) and derive true display dimensions from the macroblock
grid + frame cropping (§7.4.2.1.1 crop-unit arithmetic, 4:2:0 and
4:4:4). Macroblock reconstruction (CAVLC/CABAC residuals, intra
prediction, deblocking) stays behind the documented external-codec
stub — consistent with reference parity: ohsome-planet ships no video
codec either; this probe exists for the training-data lane.

The fixture encoder emits spec-conformant streams (exp-Golomb writer,
EPB insertion, RBSP trailing bits) so round-trip properties and the
DuckDB oracle can replay the parameter arithmetic exactly.
"""

from __future__ import annotations

import struct

__all__ = [
    "parse_annexb",
    "parse_sps",
    "parse_pps",
    "encode_annexb_stream",
    "strip_emulation_prevention",
    "insert_emulation_prevention",
]

# nal_unit_type values we walk (§7.4.1 Table 7-1)
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9

_SLICE_TYPE_NAMES = ("P", "B", "I", "SP", "SI")

# profile_idc values that carry the chroma_format/bit_depth branch
# (§7.3.2.1.1 "if( profile_idc == 100 || ... )")
_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


# ---------------------------------------------------------------------------
# bit-level I/O


class _BitReader:
    """MSB-first bit reader over an RBSP (EPBs already stripped)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("bitstream exhausted")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Exp-Golomb unsigned (§9.1): leadingZeroBits zeros, a one,
        then leadingZeroBits info bits; codeNum = 2^lz - 1 + info."""
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 31:
                raise ValueError("exp-Golomb code too long")
        return (1 << lz) - 1 + (self.u(lz) if lz else 0)

    def se(self) -> int:
        """Exp-Golomb signed (§9.1.1): codeNum k maps to
        (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        """§7.3.2.11: stop bit then zero-align."""
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# ---------------------------------------------------------------------------
# emulation prevention (§7.4.1.1)


def strip_emulation_prevention(data: bytes) -> bytes:
    """Drop the 0x03 in every 00 00 03 run (the escaped forms of
    00 00 00 / 00 00 01 / 00 00 02 / 00 00 03 inside an RBSP)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """Escape 00 00 0x (x ≤ 3) byte pairs with a 0x03 so no NAL body
    ever contains a start-code prefix."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# parameter-set parsing


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    """§7.3.2.1.1.1 scaling_list — values are discarded, but the
    delta_scale walk must consume exactly the right bits."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_sps(rbsp: bytes) -> dict:
    """seq_parameter_set_rbsp (§7.3.2.1.1) → parameter dict including
    derived display ``width``/``height`` (§7.4.2.1.1: crop units are
    SubWidthC/SubHeightC·(2-frame_mbs_only_flag) for chroma formats
    1-3, 1/(2-fmof) for monochrome/4:4:4-separate)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    constraint_flags = r.u(8)
    level_idc = r.u(8)
    sps_id = r.ue()

    chroma_format_idc = 1
    bit_depth_luma = bit_depth_chroma = 8
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        bit_depth_luma = r.ue() + 8
        bit_depth_chroma = r.ue() + 8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)

    log2_max_frame_num = r.ue() + 4
    pic_order_cnt_type = r.ue()
    log2_max_poc_lsb = 0
    if pic_order_cnt_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif pic_order_cnt_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only_flag = r.u(1)
    if not frame_mbs_only_flag:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag

    crop_left = crop_right = crop_top = crop_bottom = 0
    if r.u(1):  # frame_cropping_flag
        crop_left = r.ue()
        crop_right = r.ue()
        crop_top = r.ue()
        crop_bottom = r.ue()
    vui_present = r.u(1)

    # §7.4.2.1.1 crop-unit derivation: ChromaArrayType is 0 for
    # monochrome or separate colour planes → units are luma samples
    chroma_array_type = 0 if separate_colour_plane else chroma_format_idc
    if chroma_array_type == 0:
        crop_unit_x = 1
        crop_unit_y = 2 - frame_mbs_only_flag
    else:
        sub_w = 2 if chroma_array_type in (1, 2) else 1
        sub_h = 2 if chroma_array_type == 1 else 1
        crop_unit_x = sub_w
        crop_unit_y = sub_h * (2 - frame_mbs_only_flag)

    width = pic_width_in_mbs * 16 - crop_unit_x * (crop_left + crop_right)
    height = (
        (2 - frame_mbs_only_flag) * pic_height_in_map_units * 16
        - crop_unit_y * (crop_top + crop_bottom)
    )
    return {
        "profile_idc": profile_idc,
        "constraint_flags": constraint_flags,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "bit_depth_chroma": bit_depth_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": pic_order_cnt_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "max_num_ref_frames": max_num_ref_frames,
        "pic_width_in_mbs": pic_width_in_mbs,
        "pic_height_in_map_units": pic_height_in_map_units,
        "frame_mbs_only_flag": frame_mbs_only_flag,
        "crop": (crop_left, crop_right, crop_top, crop_bottom),
        "width": width,
        "height": height,
        "vui_present": vui_present,
    }


def parse_pps(rbsp: bytes) -> dict:
    """pic_parameter_set_rbsp (§7.3.2.2) through the fixed prefix."""
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_coding_mode = r.u(1)  # 0=CAVLC 1=CABAC
    bottom_field_poc_present = r.u(1)
    num_slice_groups = r.ue() + 1
    if num_slice_groups > 1:
        raise ValueError("FMO slice groups unsupported in probe")
    num_ref_idx_l0 = r.ue() + 1
    num_ref_idx_l1 = r.ue() + 1
    weighted_pred = r.u(1)
    weighted_bipred = r.u(2)
    pic_init_qp = r.se() + 26
    pic_init_qs = r.se() + 26
    chroma_qp_offset = r.se()
    deblocking_control_present = r.u(1)
    constrained_intra_pred = r.u(1)
    redundant_pic_cnt_present = r.u(1)
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_coding_mode": entropy_coding_mode,
        "bottom_field_poc_present": bottom_field_poc_present,
        "num_ref_idx_l0": num_ref_idx_l0,
        "num_ref_idx_l1": num_ref_idx_l1,
        "weighted_pred": weighted_pred,
        "weighted_bipred": weighted_bipred,
        "pic_init_qp": pic_init_qp,
        "pic_init_qs": pic_init_qs,
        "chroma_qp_offset": chroma_qp_offset,
        "deblocking_control_present": deblocking_control_present,
        "constrained_intra_pred": constrained_intra_pred,
        "redundant_pic_cnt_present": redundant_pic_cnt_present,
    }


def _parse_slice_prefix(rbsp: bytes, sps: dict, pps: dict, idr: bool) -> dict:
    """slice_header (§7.3.3) through frame_num / idr_pic_id / poc_lsb —
    the prefix every conformant slice carries regardless of entropy
    mode (the header is always CAVLC-coded)."""
    r = _BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    pps_id = r.ue()
    frame_num = r.u(sps["log2_max_frame_num"])
    idr_pic_id = r.ue() if idr else None
    poc_lsb = (
        r.u(sps["log2_max_poc_lsb"]) if sps["pic_order_cnt_type"] == 0 else None
    )
    return {
        "first_mb_in_slice": first_mb,
        "slice_type": slice_type,
        "slice_type_name": _SLICE_TYPE_NAMES[slice_type % 5],
        "pps_id": pps_id,
        "frame_num": frame_num,
        "idr_pic_id": idr_pic_id,
        "poc_lsb": poc_lsb,
    }


# ---------------------------------------------------------------------------
# Annex-B stream walk


def _split_nals(data: bytes) -> list[bytes]:
    """Split on 00 00 01 start codes (a preceding 00 belongs to a
    4-byte code); returns raw NAL units (header byte + EBSP body)."""
    nals = []
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    while i >= 0:
        start = i + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = nxt if nxt >= 0 else len(data)
        # trailing zeros before the next start code are the next code's
        # zero_byte / leading zeros, not NAL payload
        while end > start and data[end - 1] == 0:
            end -= 1
        if end > start:
            nals.append(data[start:end])
        i = nxt
    return nals


def parse_annexb(data: bytes) -> dict:
    """Walk an Annex-B byte stream → stream summary + per-NAL list.

    Returns ``{"sps": .., "pps": .., "nals": [...], "n_nals": ..,
    "n_slices": .., "n_idr": .., "slice_types": [...]}``. Non-VCL NAL
    types outside SPS/PPS/SEI/AUD are inventoried but not parsed."""
    nals_out = []
    sps = pps = None
    n_slices = n_idr = 0
    slice_types = []
    for raw in _split_nals(bytes(data)):
        hdr = raw[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        ref_idc = (hdr >> 5) & 3
        ntype = hdr & 0x1F
        rbsp = strip_emulation_prevention(raw[1:])
        entry = {"type": ntype, "ref_idc": ref_idc, "size": len(raw)}
        if ntype == NAL_SPS:
            sps = parse_sps(rbsp)
        elif ntype == NAL_PPS:
            pps = parse_pps(rbsp)
        elif ntype in (NAL_SLICE, NAL_IDR):
            if sps is None or pps is None:
                raise ValueError("slice before parameter sets")
            sh = _parse_slice_prefix(rbsp, sps, pps, ntype == NAL_IDR)
            entry["slice"] = sh
            slice_types.append(sh["slice_type_name"])
            n_slices += 1
            n_idr += ntype == NAL_IDR
        nals_out.append(entry)
    return {
        "sps": sps,
        "pps": pps,
        "nals": nals_out,
        "n_nals": len(nals_out),
        "n_slices": n_slices,
        "n_idr": n_idr,
        "slice_types": slice_types,
    }


# ---------------------------------------------------------------------------
# fixture encoder


def _encode_sps(
    profile_idc: int,
    level_idc: int,
    pic_width_in_mbs: int,
    pic_height_in_map_units: int,
    frame_mbs_only: int,
    crop: tuple[int, int, int, int] | None,
    pic_order_cnt_type: int,
    max_num_ref_frames: int,
    log2_max_frame_num: int,
) -> bytes:
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)
    w.u(level_idc, 8)
    w.ue(0)  # sps_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(log2_max_frame_num - 4)
    w.ue(pic_order_cnt_type)
    if pic_order_cnt_type == 0:
        w.ue(0)  # log2_max_poc_lsb_minus4
    w.ue(max_num_ref_frames)
    w.u(0, 1)
    w.ue(pic_width_in_mbs - 1)
    w.ue(pic_height_in_map_units - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field
    w.u(1, 1)  # direct_8x8_inference
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    w.rbsp_trailing()
    return w.tobytes()


def _encode_pps(entropy_cabac: int) -> bytes:
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(entropy_cabac, 1)
    w.u(0, 1)
    w.ue(0)  # one slice group
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(0)
    w.se(0)
    w.se(0)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.rbsp_trailing()
    return w.tobytes()


def _encode_slice(
    slice_type: int,
    frame_num: int,
    idr: bool,
    sps_poc_type: int,
    log2_max_frame_num: int,
    payload_seed: int,
) -> bytes:
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(slice_type)
    w.ue(0)  # pps_id
    w.u(frame_num % (1 << log2_max_frame_num), log2_max_frame_num)
    if idr:
        w.ue(frame_num & 1)  # idr_pic_id
    if sps_poc_type == 0:
        w.u((frame_num * 2) % 16, 4)  # poc_lsb (log2=4)
    w.rbsp_trailing()
    head = w.tobytes()
    # deterministic dummy macroblock payload with zero runs so the EPB
    # path is exercised on VCL NALs too; terminated nonzero because a
    # conformant NAL never ends in 0x00 (trailing zeros belong to the
    # next start code)
    body = bytes(
        (payload_seed * 31 + k * 7) % 256 if k % 5 else 0
        for k in range(payload_seed % 23 + 8)
    )
    return head + body + b"\x80"


def _nal(ref_idc: int, ntype: int, rbsp: bytes, long_start: bool) -> bytes:
    start = b"\x00\x00\x00\x01" if long_start else b"\x00\x00\x01"
    return start + bytes([(ref_idc << 5) | ntype]) + insert_emulation_prevention(rbsp)


def encode_annexb_stream(
    profile_idc: int = 66,
    level_idc: int = 30,
    pic_width_in_mbs: int = 4,
    pic_height_in_map_units: int = 3,
    frame_mbs_only: int = 1,
    crop: tuple[int, int, int, int] | None = None,
    n_frames: int = 3,
    entropy_cabac: int = 0,
    pic_order_cnt_type: int = 0,
    max_num_ref_frames: int = 1,
    with_sei: bool = False,
    long_start_codes: bool = True,
) -> bytes:
    """Deterministic, spec-conformant Annex-B stream: SPS, PPS,
    optional zero-heavy SEI (guarantees emulation-prevention bytes on
    the wire), one IDR slice then P slices."""
    log2_mfn = 4 + (pic_width_in_mbs + pic_height_in_map_units) % 3
    out = bytearray()
    out += _nal(
        3,
        NAL_SPS,
        _encode_sps(
            profile_idc,
            level_idc,
            pic_width_in_mbs,
            pic_height_in_map_units,
            frame_mbs_only,
            crop,
            pic_order_cnt_type,
            max_num_ref_frames,
            log2_mfn,
        ),
        True,
    )
    out += _nal(3, NAL_PPS, _encode_pps(entropy_cabac), long_start_codes)
    if with_sei:
        # user_data_unregistered-shaped payload full of zero bytes:
        # forces 00 00 03 escapes through the EPB round trip
        sei = bytes([5, 18]) + b"\x00" * 16 + struct.pack(">H", level_idc) + b"\x80"
        out += _nal(0, NAL_SEI, sei, long_start_codes)
    for f in range(n_frames):
        idr = f == 0
        stype = 7 if idr else (0 if f % 2 else 5)  # I then P (both ue forms)
        out += _nal(
            3 if idr else 2,
            NAL_IDR if idr else NAL_SLICE,
            _encode_slice(
                stype, f, idr, pic_order_cnt_type, log2_mfn, payload_seed=f + level_idc
            ),
            long_start_codes if not idr else True,
        )
    return bytes(out)
