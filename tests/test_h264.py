"""H.264 Annex-B probe: hand-assembled known-answer referee (built
bit-by-bit WITHOUT the fixture encoder), randomized encode→parse
round-trip properties, emulation-prevention vectors, and the
operator-level Spark seam."""

from __future__ import annotations

import random

import pytest

from ohsome_planet_spark.functions.h264 import (
    _BitWriter,
    encode_annexb_stream,
    insert_emulation_prevention,
    parse_annexb,
    parse_pps,
    parse_sps,
    strip_emulation_prevention,
)


def _hand_sps_64x48() -> bytes:
    """Baseline-profile SPS for 64x48 assembled field-by-field here (the
    independent referee: if the encoder and parser shared a wrong bit
    layout, this catches it)."""
    w = _BitWriter()
    w.u(66, 8)      # profile_idc baseline
    w.u(0, 8)       # constraint flags
    w.u(30, 8)      # level_idc 3.0
    w.ue(0)         # sps_id
    w.ue(0)         # log2_max_frame_num_minus4 -> 4
    w.ue(2)         # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)         # max_num_ref_frames
    w.u(0, 1)       # gaps_in_frame_num
    w.ue(3)         # pic_width_in_mbs_minus1 -> 4 MBs -> 64
    w.ue(2)         # pic_height_in_map_units_minus1 -> 3 -> 48
    w.u(1, 1)       # frame_mbs_only
    w.u(1, 1)       # direct_8x8_inference
    w.u(0, 1)       # frame_cropping_flag
    w.u(0, 1)       # vui
    w.rbsp_trailing()
    return w.tobytes()


def test_hand_assembled_sps_referee():
    sps = parse_sps(_hand_sps_64x48())
    assert sps["profile_idc"] == 66
    assert sps["level_idc"] == 30
    assert (sps["width"], sps["height"]) == (64, 48)
    assert sps["frame_mbs_only_flag"] == 1
    assert sps["pic_order_cnt_type"] == 2
    assert sps["max_num_ref_frames"] == 1


def test_hand_assembled_cropped_field_sps():
    """Field-coded (frame_mbs_only=0) + cropping: height doubles per map
    unit and vertical crop units double too (§7.4.2.1.1)."""
    w = _BitWriter()
    w.u(77, 8)
    w.u(0, 8)
    w.u(40, 8)
    w.ue(0)
    w.ue(1)         # log2_max_frame_num_minus4 -> 5
    w.ue(0)         # poc type 0
    w.ue(0)         # log2_max_poc_lsb_minus4 -> 4
    w.ue(2)
    w.u(0, 1)
    w.ue(9)         # 10 MBs wide -> 160
    w.ue(4)         # 5 map units -> 2*5*16 = 160 tall
    w.u(0, 1)       # frame_mbs_only = 0
    w.u(0, 1)       # mb_adaptive_frame_field
    w.u(1, 1)
    w.u(1, 1)       # cropping
    w.ue(1)         # left
    w.ue(2)         # right
    w.ue(3)         # top
    w.ue(1)         # bottom
    w.u(0, 1)
    w.rbsp_trailing()
    sps = parse_sps(w.tobytes())
    assert sps["width"] == 10 * 16 - 2 * (1 + 2)
    assert sps["height"] == 2 * 5 * 16 - 2 * 2 * (3 + 1)
    assert sps["log2_max_frame_num"] == 5


def test_high_profile_chroma_branch():
    """profile_idc=100 carries chroma_format_idc/bit-depth fields; a
    parser missing that branch reads garbage dimensions."""
    s = encode_annexb_stream(profile_idc=100, pic_width_in_mbs=7,
                             pic_height_in_map_units=5)
    r = parse_annexb(s)
    assert r["sps"]["chroma_format_idc"] == 1
    assert (r["sps"]["width"], r["sps"]["height"]) == (112, 80)


def test_epb_known_vectors():
    assert strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert strip_emulation_prevention(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    # 0x03 not preceded by two zeros passes through
    assert strip_emulation_prevention(b"\x00\x03\x00") == b"\x00\x03\x00"
    assert insert_emulation_prevention(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    # the escape resets the zero run: 00 00 00 00 needs only one 03
    assert insert_emulation_prevention(b"\x00\x00\x00\x00") == (
        b"\x00\x00\x03\x00\x00"
    )
    assert insert_emulation_prevention(b"\x00\x00\x00\x00\x00\x01") == (
        b"\x00\x00\x03\x00\x00\x03\x00\x01"
    )


def test_epb_inverse_property():
    rng = random.Random(42)
    for _ in range(300):
        raw = bytes(
            rng.choice((0, 0, 0, 1, 2, 3, 0x80, 0xFF))
            for _ in range(rng.randrange(0, 64))
        )
        assert strip_emulation_prevention(insert_emulation_prevention(raw)) == raw


def test_roundtrip_property_grid():
    rng = random.Random(7)
    for _ in range(60):
        prof = rng.choice((66, 77, 88, 100, 110))
        fmo = rng.randrange(2)
        crop = (
            (rng.randrange(3), rng.randrange(3), rng.randrange(3), rng.randrange(3))
            if rng.randrange(2)
            else None
        )
        wmb = rng.randrange(1, 130)
        hmu = rng.randrange(1, 70)
        nf = rng.randrange(1, 9)
        poc = rng.choice((0, 2))
        cabac = rng.randrange(2)
        s = encode_annexb_stream(
            profile_idc=prof,
            level_idc=rng.choice((10, 30, 51)),
            pic_width_in_mbs=wmb,
            pic_height_in_map_units=hmu,
            frame_mbs_only=fmo,
            crop=crop,
            n_frames=nf,
            entropy_cabac=cabac,
            pic_order_cnt_type=poc,
            max_num_ref_frames=rng.randrange(16),
            with_sei=bool(rng.randrange(2)),
            long_start_codes=bool(rng.randrange(2)),
        )
        r = parse_annexb(s)
        sps, pps = r["sps"], r["pps"]
        cl, cr, ct, cb = crop or (0, 0, 0, 0)
        assert sps["width"] == wmb * 16 - 2 * (cl + cr)
        assert sps["height"] == (2 - fmo) * hmu * 16 - 2 * (2 - fmo) * (ct + cb)
        assert sps["profile_idc"] == prof
        assert pps["entropy_coding_mode"] == cabac
        assert r["n_slices"] == nf and r["n_idr"] == 1
        assert r["slice_types"] == ["I"] + ["P"] * (nf - 1)
        # frame_num must survive the log2_max_frame_num-wide fixed read
        fns = [n["slice"]["frame_num"] for n in r["nals"] if "slice" in n]
        assert fns == [f % (1 << sps["log2_max_frame_num"]) for f in range(nf)]


def test_sei_forces_epb_on_wire():
    s = encode_annexb_stream(with_sei=True)
    assert b"\x00\x00\x03" in s
    assert parse_annexb(s)["n_nals"] == 3 + 3


def test_malformed_streams_raise():
    with pytest.raises(ValueError):
        parse_annexb(b"\xff\xfe\xfd")  # no start code
    with pytest.raises(ValueError):
        # forbidden_zero_bit set
        parse_annexb(b"\x00\x00\x01\x80\x10")
    with pytest.raises(ValueError):
        # slice before parameter sets
        parse_annexb(b"\x00\x00\x01\x65\x88\x80")


def test_probe_h264_operator_quarantines_bad_rows(spark):
    from ohsome_planet_spark.operators.multimodal import probe_h264

    good = encode_annexb_stream(pic_width_in_mbs=2, pic_height_in_map_units=2,
                                n_frames=2)
    rows = [(1, bytearray(good)), (2, bytearray(b"\x01\x02\x03"))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r["doc_id"]: r for r in probe_h264(df).collect()}
    assert out[1]["width"] == 32 and out[1]["n_slices"] == 2
    assert out[1]["slice_types"] == "IP"
    assert out[2]["width"] is None and out[2]["n_nals"] is None
