"""Referees for the MPEG-1 Layer III decode (functions/mp3_l3.py).

The central discipline (same as the MP1/MP2 rows): the BITSTREAM path
(encode_mp3_l3 → real frames → decode_mp3_subbands) is checked against
an INDEPENDENT parameter path — a numpy re-derivation in this file that
never touches the bitstream: requantization from the granule dicts,
reorder, MS stereo, alias butterflies, IMDCT/window matrices built from
the printed formulas, the overlap-add chain, frequency inversion.
Any bit-packing or table bug desynchronizes the two paths.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from ohsome_planet_spark.functions.mp3 import Mp3FormatError
from ohsome_planet_spark.functions.mp3_l3 import (
    ALIAS_C,
    PRETAB,
    SFB_LONG,
    SFB_SHORT,
    SLEN,
    TABLE_SHAPES,
    _CODEBOOKS,
    _COUNT1_CODEBOOKS,
    decode_mp3_subbands,
    encode_mp3_l3,
)

# --- independent parameter-path decoder (numpy, no bitstream) ---------------


def _np_imdct_matrix(bt: int) -> np.ndarray:
    """Re-derived from ISO §2.4.3.4.12 formulas — NOT imported from the
    module under test."""
    M = np.zeros((36, 18))
    if bt != 2:
        n = np.arange(36)
        if bt == 0:
            w = np.sin(np.pi / 36 * (n + 0.5))
        elif bt == 1:
            # right half mates with the NEXT short block's rise, so it
            # falls: sin(pi/12 (n - 18 + 0.5)) for n = 24..29 descends
            # from ~1 to ~0 (arguments 6.5..11.5)
            w = np.concatenate([
                np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
                np.ones(6),
                np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5)),
                np.zeros(6),
            ])
        else:  # stop
            w = np.concatenate([
                np.zeros(6),
                np.sin(np.pi / 12 * (np.arange(6) + 0.5)),
                np.ones(6),
                np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5)),
            ])
        for nn in range(36):
            for k in range(18):
                M[nn, k] = w[nn] * math.cos(
                    math.pi / 72 * (2 * nn + 1 + 18) * (2 * k + 1)
                )
        return M
    for win in range(3):
        for m in range(12):
            wv = math.sin(math.pi / 12 * (m + 0.5))
            for k in range(6):
                M[6 + win * 6 + m, win * 6 + k] += wv * math.cos(
                    math.pi / 24 * (2 * m + 1 + 6) * (2 * k + 1)
                )
    return M


def _np_expected(granules_params, sr_idx, channels, ms):
    """granules_params: list over global granule index of per-channel
    granule dicts (the exact dicts fed to encode_mp3_l3). Returns
    expected [g][ch][sb][18] samples."""
    long_bands = SFB_LONG[sr_idx]
    short_bands = SFB_SHORT[sr_idx]
    sfb_long = np.zeros(576, dtype=int)
    for sfb in range(22):
        sfb_long[long_bands[sfb]:long_bands[sfb + 1]] = sfb
    sfb_short = np.zeros(192, dtype=int)
    for sfb in range(13):
        sfb_short[short_bands[sfb]:short_bands[sfb + 1]] = sfb

    mats = {bt: _np_imdct_matrix(bt) for bt in range(4)}
    cs = 1.0 / np.sqrt(1.0 + np.array(ALIAS_C) ** 2)
    ca = np.array(ALIAS_C) / np.sqrt(1.0 + np.array(ALIAS_C) ** 2)

    tails = np.zeros((channels, 32, 18))
    out = []
    for gparams in granules_params:
        xr_ch = []
        for g in gparams:
            # is values in huffman order: big-values lines then quads
            is_h = np.zeros(576)
            lines = g["lines"]
            is_h[:len(lines)] = lines
            qflat = [q for quad in g["quads"] for q in quad]
            is_h[len(lines):len(lines) + len(qflat)] = qflat
            bt = g["block_type"]
            mult = 0.5 * (1 + g["scalefac_scale"])
            xr = np.zeros(576)
            if bt == 2:
                # reorder + short requant
                hpos = 0
                for sfb in range(13):
                    width = short_bands[sfb + 1] - short_bands[sfb]
                    for w in range(3):
                        for j in range(width):
                            s = short_bands[sfb] + j
                            nat = (s // 6) * 18 + w * 6 + (s % 6)
                            v = is_h[hpos]
                            hpos += 1
                            if v == 0:
                                continue
                            scf = g["sf"][sfb][w] if sfb < 12 else 0
                            gain = (
                                0.25 * (g["global_gain"] - 210)
                                - 2.0 * g["subblock_gain"][w]
                                - mult * scf
                            )
                            xr[nat] = (
                                math.copysign(abs(v) ** (4 / 3), v)
                                * 2.0 ** gain
                            )
            else:
                for i in range(576):
                    v = is_h[i]
                    if v == 0:
                        continue
                    sfb = sfb_long[i]
                    scf = (
                        g["sf"][sfb] + g["preflag"] * PRETAB[sfb]
                        if sfb < 21 else 0
                    )
                    gain = 0.25 * (g["global_gain"] - 210) - mult * scf
                    xr[i] = math.copysign(abs(v) ** (4 / 3), v) * 2.0 ** gain
            xr_ch.append(xr)
        if ms and channels == 2:
            m, s = xr_ch
            xr_ch = [(m + s) / math.sqrt(2), (m - s) / math.sqrt(2)]
        gout = []
        for c in range(channels):
            g = gparams[c]
            xr = xr_ch[c].copy()
            if g["block_type"] != 2:
                for sb in range(1, 32):
                    for t in range(8):
                        lo, hi = 18 * sb - 1 - t, 18 * sb + t
                        a, b = xr[lo], xr[hi]
                        xr[lo] = a * cs[t] - b * ca[t]
                        xr[hi] = b * cs[t] + a * ca[t]
            M = mats[g["block_type"]]
            sbs = []
            for sb in range(32):
                raw = M @ xr[18 * sb:18 * (sb + 1)]
                s = raw[:18] + tails[c, sb]
                tails[c, sb] = raw[18:]
                if sb % 2:
                    s[1::2] = -s[1::2]
                sbs.append(s)
            gout.append(sbs)
        out.append(gout)
    return out


# --- fixtures ----------------------------------------------------------------


def _mk_granule(rng, bt, sr_idx, allow_esc=True):
    sc = rng.randrange(16)
    slen1, slen2 = SLEN[sc]
    # region tables: [r0, r1, (r2)]; keep magnitudes legal per table
    if bt == 0:
        tsel = [rng.choice([1, 2, 5, 7, 13]) for _ in range(2)]
        tsel.append(rng.choice([0, 1, 5]))
        if allow_esc and rng.random() < 0.5:
            tsel[rng.randrange(2)] = rng.choice([16, 24])
    else:
        tsel = [rng.choice([1, 5, 13] + ([16, 24] if allow_esc else []))
                for _ in range(2)] + [0]
    npairs = rng.randrange(4, 30)
    lines = []
    # region ends in huffman lines (mirror of _region_ends)
    if bt == 0:
        bands = SFB_LONG[sr_idx]
        r0e = bands[8]  # region0_count default 7
        r1e = bands[14]  # +region1_count default 5 -> index 14
    else:
        r0e, r1e = 36, 10 ** 9
    for i in range(npairs * 2):
        region = 0 if i < r0e else (1 if i < r1e else 2)
        tid = tsel[region]
        xlen, _, linbits = TABLE_SHAPES[tid] if tid else (1, 1, 0)
        if tid == 0:
            lines.append(0)
            continue
        mx = xlen - 1
        v = rng.randrange(-mx, mx + 1)
        if abs(v) == 15 and linbits:
            v = int(math.copysign(15 + rng.randrange(1 << linbits), v or 1))
        lines.append(v)
    quads = [tuple(rng.choice([-1, 0, 1]) for _ in range(4))
             for _ in range(rng.randrange(0, 8))]
    g = dict(
        block_type=bt,
        global_gain=rng.randrange(190, 220),
        scalefac_compress=sc,
        preflag=rng.randrange(2) if bt != 2 else 0,
        scalefac_scale=rng.randrange(2),
        subblock_gain=[rng.randrange(4) for _ in range(3)]
        if bt == 2 else [0, 0, 0],
        table_select=tsel,
        count1table_select=rng.randrange(2),
        lines=lines,
        quads=quads,
    )
    if bt == 2:
        g["sf"] = [
            [rng.randrange(1 << (slen1 if sfb < 6 else slen2))
             for _ in range(3)]
            for sfb in range(12)
        ]
    else:
        g["sf"] = [
            rng.randrange(1 << (slen1 if sfb < 11 else slen2))
            for sfb in range(21)
        ]
    return g


def _roundtrip_case(seed, sr_idx, channels, n_frames, ms, with_short=True):
    rng = random.Random(seed)
    plan = {}

    def granule_fn(f, gr, ch):
        key = (f, gr, ch)
        if key not in plan:
            bts = [0, 1, 2, 3] if with_short else [0, 1, 3]
            bt = rng.choice(bts)
            if ms:  # keep channel block types aligned under MS
                bt = rng.choice(bts) if ch == 0 else plan[(f, gr, 0)]["block_type"]
            plan[key] = _mk_granule(rng, bt, sr_idx)
        return plan[key]

    payload = encode_mp3_l3(
        granule_fn, sr_idx=sr_idx, br_idx=14, channels=channels,
        n_frames=n_frames, ms_stereo=ms,
    )
    rate, ch, ng, got = decode_mp3_subbands(payload)
    assert ch == channels and ng == 2 * n_frames
    gparams = [
        [plan[(f, gr, c)] for c in range(channels)]
        for f in range(n_frames) for gr in range(2)
    ]
    want = _np_expected(gparams, sr_idx, channels, ms)
    for g in range(ng):
        for c in range(channels):
            for sb in range(32):
                np.testing.assert_allclose(
                    got[g][c][sb], want[g][c][sb], atol=1e-10,
                    err_msg=f"granule {g} ch {c} sb {sb}",
                )


# --- tests --------------------------------------------------------------------


def test_printed_structural_tables():
    for sr in range(3):
        lb, sb = SFB_LONG[sr], SFB_SHORT[sr]
        assert lb[0] == 0 and lb[-1] == 576 and len(lb) == 23
        assert sb[0] == 0 and sb[-1] == 192 and len(sb) == 14
        assert all(a < b for a, b in zip(lb, lb[1:]))
        assert all(a < b for a, b in zip(sb, sb[1:]))
        # every MPEG-1 rate has long_bands[8] == 36 — the fixed split
        # point for window-switching granules
        assert lb[8] == 36
    assert len(PRETAB) == 21 and PRETAB[:11] == [0] * 11
    assert len(SLEN) == 16 and SLEN[0] == (0, 0) and SLEN[15] == (4, 3)
    assert [round(c, 4) for c in ALIAS_C] == [
        -0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]


def test_codebooks_prefix_free_and_complete():
    """Kraft equality == complete prefix code: every bit sequence decodes
    uniquely with no dead branches — the property a real Annex B.7 drop-in
    must also satisfy."""
    from fractions import Fraction

    for tid, cb in _CODEBOOKS.items():
        total = sum(Fraction(1, 2 ** ln) for ln, _ in cb.values())
        assert total == 1, f"table {tid} not complete"
        codes = sorted((ln, code) for ln, code in cb.values())
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1:]:
                assert c2 >> (l2 - l1) != c1, f"table {tid} prefix clash"
    for k, cb in _COUNT1_CODEBOOKS.items():
        total = sum(Fraction(1, 2 ** ln) for ln, _ in cb.values())
        assert total == 1, f"count1 {k} not complete"


def test_imdct_matrices_match_independent_derivation():
    from ohsome_planet_spark.functions.mp3_l3 import imdct_matrix

    for bt in range(4):
        np.testing.assert_allclose(
            np.array(imdct_matrix(bt)), _np_imdct_matrix(bt), atol=1e-12)


def test_single_line_impulse_known_answer():
    """One nonzero spectral line: the first granule's output must be
    exactly xr · M[:, k] (no overlap history), with the hand-computed
    requantization — pins requant, IMDCT, window, and freq inversion in
    one closed form."""
    k_line = 40  # subband 2, k=4
    sf = [0] * 21

    def granule_fn(f, gr, ch):
        lines = [0] * 40 + [3, 0]  # pair (3, 0) at positions 40, 41
        return dict(
            block_type=0, global_gain=210, scalefac_compress=0,
            preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
            # region 0 widened to cover line 41 (bands[9] = 44)
            region0_count=8, region1_count=5,
            table_select=[5, 0, 0], count1table_select=0,
            lines=lines, quads=[], sf=sf,
        )

    payload = encode_mp3_l3(granule_fn, sr_idx=0, channels=1, n_frames=1)
    _, _, _, got = decode_mp3_subbands(payload)
    xr = 3.0 ** (4 / 3)  # 2^0 gains
    # alias reduction at the sb1/sb2 boundary mixes line 36+t / 35-t,
    # t<8: line 40 participates (hi side, t=4)
    cs4 = 1 / math.sqrt(1 + ALIAS_C[4] ** 2)
    M = _np_imdct_matrix(0)
    # butterfly at the sb1/sb2 boundary, hi side t=4: out[40] = xr·cs4,
    # out[31] = -xr·ca4 (k = 31-18 = 13 within sb1)
    ca4 = ALIAS_C[4] / math.sqrt(1 + ALIAS_C[4] ** 2)
    exp_sb2 = M[:18, 4] * (xr * cs4)
    exp_sb1 = M[:18, 13] * (-xr * ca4)
    got_sb2 = np.array(got[0][0][2])
    got_sb1 = np.array(got[0][0][1])
    # freq inversion on odd sb (sb1): odd samples negated
    exp_sb1[1::2] = -exp_sb1[1::2]
    np.testing.assert_allclose(got_sb2, exp_sb2, atol=1e-12)
    np.testing.assert_allclose(got_sb1, exp_sb1, atol=1e-12)
    assert abs(got[0][0][5][0]) < 1e-15  # untouched subband silent


@pytest.mark.parametrize("seed", range(6))
def test_roundtrip_randomized(seed):
    rng = random.Random(seed * 31 + 7)
    sr = rng.randrange(3)
    channels = rng.choice([1, 2])
    ms = channels == 2 and rng.random() < 0.5
    _roundtrip_case(seed, sr, channels, rng.randrange(1, 4), ms)


def test_scfsi_shares_granule0_scalefactors():
    plan = {}
    rng = random.Random(99)

    def granule_fn(f, gr, ch):
        key = (f, gr, ch)
        if key not in plan:
            plan[key] = _mk_granule(rng, 0, 0)  # both granules LONG
        return plan[key]

    payload = encode_mp3_l3(
        granule_fn, sr_idx=0, channels=1, n_frames=1,
        scfsi_fn=lambda c: [1, 0, 1, 0],
    )
    _, _, _, got = decode_mp3_subbands(payload)
    # expected: granule 1's effective sf in shared bands = granule 0's
    eff = dict(plan[(0, 1, 0)])
    sf = list(eff["sf"])
    g0sf = plan[(0, 0, 0)]["sf"]
    for band, (lo, hi) in zip([1, 0, 1, 0], [(0, 6), (6, 11), (11, 16), (16, 21)]):
        if band:
            sf[lo:hi] = g0sf[lo:hi]
    eff["sf"] = sf
    want = _np_expected(
        [[plan[(0, 0, 0)]], [eff]], 0, 1, False)
    for g in range(2):
        for sb in range(32):
            np.testing.assert_allclose(
                got[g][0][sb], want[g][0][sb], atol=1e-10)


def test_bit_reservoir_backpointer():
    """main_data_begin > 0: frame 2's granule data starts inside frame
    1's padding. Hand-packed from encoder internals; must decode
    identically to the begin=0 stream."""
    import struct as _struct

    from ohsome_planet_spark.functions.mp3_l3 import (
        _BitWriter, _encode_granule)

    rng = random.Random(5)
    gdicts = [[_mk_granule(rng, 0, 0) for _gr in range(2)]
              for _f in range(2)]

    def granule_fn(f, gr, ch):
        return gdicts[f][gr]

    # smallest bitrate that fits keeps the frame padding (and so the
    # 9-bit main_data_begin) small
    for br_idx in range(1, 15):
        try:
            plain = encode_mp3_l3(
                granule_fn, sr_idx=0, channels=1, n_frames=2,
                br_idx=br_idx)
        except ValueError:
            continue
        # one step of headroom so frame 1 has padding to park bytes in
        br_idx = min(br_idx + 1, 14)
        plain = encode_mp3_l3(
            granule_fn, sr_idx=0, channels=1, n_frames=2, br_idx=br_idx)
        break
    want = decode_mp3_subbands(plain)

    # rebuild with frame 2's main data shifted back into frame 1
    def build_frame(gr_dicts, begin):
        w = _BitWriter()
        p23s = [_encode_granule(w, g, 0, gr, [0, 0, 0, 0])
                for gr, g in enumerate(gr_dicts)]
        main = w.flush()
        sw = _BitWriter()
        sw.put(begin, 9)
        sw.put(0, 5)
        for _ in range(4):
            sw.put(0, 1)
        for g, p23 in zip(gr_dicts, p23s):
            sw.put(p23, 12)
            sw.put(len(g["lines"]) // 2, 9)
            sw.put(g["global_gain"], 8)
            sw.put(g["scalefac_compress"], 4)
            sw.put(0, 1)
            for t in g["table_select"]:
                sw.put(t, 5)
            sw.put(7, 4)
            sw.put(5, 3)
            sw.put(g["preflag"], 1)
            sw.put(g["scalefac_scale"], 1)
            sw.put(g["count1table_select"], 1)
        return sw.flush(), main

    h = _struct.unpack(">I", plain[:4])[0]
    fb = len(plain) // 2
    side1, main1 = build_frame(gdicts[0], 0)
    _, main2 = build_frame(gdicts[1], 0)
    # park as many of frame 2's bytes in frame 1 as fit (<= 40) — at the
    # END of frame 1's area, contiguous with frame 2's area (the pool is
    # the concatenation of whole areas, so reservoir bytes must touch
    # the next area; stuffing lives BETWEEN frame 1's own data and them)
    area_cap = fb - 4 - len(side1)
    k = min(40, area_cap - len(main1))
    assert k > 0, "no reservoir headroom — widen br_idx"
    area1 = main1 + bytes(area_cap - len(main1) - k) + main2[:k]
    f1 = _struct.pack(">I", h) + side1 + area1
    assert len(f1) == fb
    side2b, _ = build_frame(gdicts[1], k)
    f2 = _struct.pack(">I", h) + side2b + main2[k:]
    f2 += bytes(fb - len(f2))
    rate, ch, ng, got = decode_mp3_subbands(bytes(f1 + f2))
    assert ng == want[2]
    for g in range(ng):
        for sb in range(32):
            np.testing.assert_allclose(
                got[g][0][sb], want[3][g][0][sb], atol=0)


def test_fences():
    from ohsome_planet_spark.functions.mp3 import encode_mp3

    # MPEG-2 Layer III
    with pytest.raises(Mp3FormatError):
        decode_mp3_subbands(encode_mp3(2, 2, [8], 0, channels=1))
    # Layer II stream into the L3 decoder
    with pytest.raises(Mp3FormatError):
        decode_mp3_subbands(encode_mp3(3, 1, [8], 0, channels=1))
    # reservoir underrun: main_data_begin points before the pool
    def granule_fn(f, gr, ch):
        return _mk_granule(random.Random(1), 0, 0)

    p = bytearray(encode_mp3_l3(granule_fn, sr_idx=0, channels=1))
    p[4] = 0x01  # main_data_begin high bit of the 9-bit field
    with pytest.raises(Mp3FormatError):
        decode_mp3_subbands(bytes(p))


# --- long-block intensity stereo (§2.4.3.4.9.3) ------------------------------


def _intensity_pair(is_pos, ms=False, right_sf_value=None):
    """Stereo stream: left carries an impulse, right is all-zero (bound
    = 0 -> every band intensity); right's scalefactor slots carry
    ``is_pos``. Returns (intensity decode, plain-stereo decode) of the
    same left-channel content."""
    sfv = is_pos if right_sf_value is None else right_sf_value

    def granule_fn(f, gr, c):
        if c == 0:
            return dict(
                block_type=0, global_gain=210, scalefac_compress=0,
                preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
                region0_count=8, region1_count=5,
                table_select=[5, 0, 0], count1table_select=0,
                lines=[0] * 40 + [3, 0], quads=[], sf=[0] * 21,
            )
        return dict(
            block_type=0, global_gain=210, scalefac_compress=13,
            preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
            table_select=[0, 0, 0], count1table_select=0,
            lines=[], quads=[], sf=[sfv] * 21,
        )

    kw = dict(sr_idx=0, br_idx=14, channels=2, n_frames=1)
    got_i = decode_mp3_subbands(
        encode_mp3_l3(granule_fn, intensity=True, ms_stereo=ms, **kw))
    got_p = decode_mp3_subbands(encode_mp3_l3(granule_fn, **kw))
    return got_i, got_p


@pytest.mark.parametrize("is_pos", range(7))
def test_intensity_ratio_scales_both_channels(is_pos):
    """Everything after the stereo stage is linear per channel, so the
    intensity decode must equal the plain decode's LEFT channel scaled
    by tan-ratio kl on the left and kr on the right — for every legal
    is_pos including the p=6 all-left limit."""
    (_, _, _, gi), (_, _, _, gp) = _intensity_pair(is_pos)
    t = math.tan(is_pos * math.pi / 12)
    kl, kr = (1.0, 0.0) if is_pos == 6 else (t / (1 + t), 1 / (1 + t))
    for g in range(2):
        for sb in range(32):
            base = np.array(gp[g][0][sb])
            np.testing.assert_allclose(gi[g][0][sb], base * kl, atol=1e-12)
            np.testing.assert_allclose(gi[g][1][sb], base * kr, atol=1e-12)


def test_intensity_illegal_position_falls_back():
    # is_pos 7, no MS flag: left/right pass through untouched
    (_, _, _, gi), (_, _, _, gp) = _intensity_pair(7)
    for g in range(2):
        for sb in range(32):
            np.testing.assert_allclose(gi[g][0][sb], gp[g][0][sb], atol=0)
            np.testing.assert_allclose(gi[g][1][sb], gp[g][1][sb], atol=0)
    # is_pos 7 WITH the MS flag: the illegal band processes as MS
    (_, _, _, gm), _ = _intensity_pair(7, ms=True)
    for g in range(2):
        for sb in range(32):
            base = np.array(gp[g][0][sb])  # right channel is silent
            np.testing.assert_allclose(
                gm[g][0][sb], base / math.sqrt(2), atol=1e-12)
            np.testing.assert_allclose(
                gm[g][1][sb], base / math.sqrt(2), atol=1e-12)


def test_intensity_bound_splits_ms_and_intensity_regions():
    """mode_ext = 3: below the right channel's zero bound MS applies, at
    and above it intensity does. Right channel carries genuine lines up
    to band boundary 36 (bound_sfb = 8), sf slots above carry is_pos 3."""
    def granule_fn(f, gr, c):
        if c == 0:
            return dict(
                block_type=0, global_gain=210, scalefac_compress=0,
                preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
                table_select=[5, 5, 0], count1table_select=0,
                # impulses below (line 4) and above (line 100) the bound
                lines=[0, 0, 0, 0, 2, 0] + [0] * 30
                + [0] * 64 + [3, 0], quads=[], sf=[0] * 21,
            )
        return dict(
            block_type=0, global_gain=210, scalefac_compress=13,
            preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
            table_select=[5, 5, 0], count1table_select=0,
            # 18 pairs = 36 lines -> rzero = 36 = bands[8]
            lines=[1 if i == 4 else 0 for i in range(36)],
            quads=[], sf=[3] * 21,
        )

    kw = dict(sr_idx=0, br_idx=14, channels=2, n_frames=1)
    got = decode_mp3_subbands(
        encode_mp3_l3(granule_fn, intensity=True, ms_stereo=True, **kw))
    plain = decode_mp3_subbands(encode_mp3_l3(granule_fn, **kw))
    t = math.tan(3 * math.pi / 12)
    kl, kr = t / (1 + t), 1 / (1 + t)
    # subband 5+ carry only the line-100 impulse (sb 5): intensity
    base5 = np.array(plain[3][0][0][5])
    np.testing.assert_allclose(got[3][0][0][5], base5 * kl, atol=1e-12)
    np.testing.assert_allclose(got[3][0][1][5], base5 * kr, atol=1e-12)
    # subband 0 carries the below-bound impulses of BOTH channels: MS
    l0 = np.array(plain[3][0][0][0])
    r0 = np.array(plain[3][0][1][0])
    np.testing.assert_allclose(
        got[3][0][0][0], (l0 + r0) / math.sqrt(2), atol=1e-12)
    np.testing.assert_allclose(
        got[3][0][1][0], (l0 - r0) / math.sqrt(2), atol=1e-12)


def test_intensity_mismatched_block_types_fenced():
    """Short-block intensity is now implemented; the remaining fence is
    a short right channel against a long left one (and vice versa)."""
    def granule_fn(f, gr, c):
        if c == 0:
            return dict(
                block_type=0, global_gain=210, scalefac_compress=0,
                preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
                table_select=[1, 1, 0], count1table_select=0,
                lines=[], quads=[], sf=[0] * 21,
            )
        return dict(
            block_type=2, global_gain=210, scalefac_compress=13,
            preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
            table_select=[1, 1, 0], count1table_select=0,
            lines=[], quads=[],
            sf=[[0] * 3 for _ in range(12)],
        )

    p = encode_mp3_l3(granule_fn, sr_idx=0, channels=2, n_frames=1,
                      intensity=True)
    with pytest.raises(Mp3FormatError, match="mismatched"):
        decode_mp3_subbands(p)


def _short_granule(lines, sf=None, c_sf=0):
    return dict(
        block_type=2, global_gain=210, scalefac_compress=13,
        preflag=0, scalefac_scale=0, subblock_gain=[0, 0, 0],
        table_select=[1, 1, 0], count1table_select=0,
        lines=list(lines), quads=[],
        sf=sf if sf is not None else [[c_sf] * 3 for _ in range(12)],
    )


def test_short_intensity_per_window_referee():
    """Independent referee for §2.4.3.4.9.3 short blocks, built from
    LINEARITY (everything after the stereo stage is linear per
    channel): decode each impulse alone with no stereo flags, then
    check the joint decode equals the spec-rule combination.

    Layout (sr 0, bands [0,4,8,12,16,22,...]): the RIGHT channel's only
    line sits at (sfb 2, window 1) — so window 1's intensity bound is
    sfb 3 while windows 0 and 2 have bound 0 (fully intensity). Left
    impulses probe all three regimes inside ONE granule:
      A (sfb2,w0)  -> intensity with is_pos = sf_r[2][0] = 2
      B (sfb2,w1)  -> BELOW window-1 bound -> MS
      D (sfb5,w2)  -> intensity with is_pos = sf_r[5][2] = 5
    and the right impulse C (sfb2,w1) itself processes as MS."""
    # huffman positions (band-major, window inside): h(sfb,w,j) =
    # 3*bands[sfb] + w*width + j; band 2 is 4 wide, band 5 is 8 wide
    hA = 3 * 8 + 0 * 4 + 0   # (2,0,0) -> 24
    hB = 3 * 8 + 1 * 4 + 1   # (2,1,1) -> 29
    hC = 3 * 8 + 1 * 4 + 0   # (2,1,0) -> 28
    hD = 3 * 22 + 2 * 8 + 0  # (5,2,0) -> 82

    def lines_with(*hs):
        n = max(hs) + 1
        n += n % 2
        return [1 if h in hs else 0 for h in range(n)]

    sf_r = [[7] * 3 for _ in range(12)]
    sf_r[2][0] = 2
    sf_r[5][2] = 5
    sf_r[2][1] = 0  # REAL scalefactor for the below-bound right line

    def joint_fn(f, gr, c):
        if c == 0:
            return _short_granule(lines_with(hA, hB, hD))
        return _short_granule(lines_with(hC), sf=sf_r)

    kw = dict(sr_idx=0, br_idx=14, channels=2, n_frames=1)
    got = decode_mp3_subbands(
        encode_mp3_l3(joint_fn, intensity=True, ms_stereo=True, **kw))[3]

    def solo(h, sf=None):
        def fn(f, gr, c):
            return _short_granule(lines_with(h) if c == 0 else [],
                                  sf=sf)
        return np.array(
            decode_mp3_subbands(encode_mp3_l3(fn, **kw))[3]
        )[:, 0]  # [g][sb][18] of the left channel

    outA = solo(hA)
    outB = solo(hB)
    outC = solo(hC, sf=sf_r)  # same requant grid as the right channel
    outD = solo(hD)
    r2 = math.sqrt(2.0)
    t2, t5 = math.tan(2 * math.pi / 12), math.tan(5 * math.pi / 12)
    kl2, kr2 = t2 / (1 + t2), 1 / (1 + t2)
    kl5, kr5 = t5 / (1 + t5), 1 / (1 + t5)
    exp_l = kl2 * outA + (outB + outC) / r2 + kl5 * outD
    exp_r = kr2 * outA + (outB - outC) / r2 + kr5 * outD
    np.testing.assert_allclose(np.array(got)[:, 0], exp_l, atol=1e-12)
    np.testing.assert_allclose(np.array(got)[:, 1], exp_r, atol=1e-12)


def test_short_intensity_without_ms_leaves_below_bound_lr():
    """Same layout, MS flag OFF: below-bound lines pass through LR and
    is_pos-7 bands leave the (zero) right channel untouched."""
    hB = 3 * 8 + 1 * 4 + 1
    hC = 3 * 8 + 1 * 4 + 0
    sf_r = [[7] * 3 for _ in range(12)]
    sf_r[2][1] = 0

    def lines_with(h):
        n = h + 1 + (h + 1) % 2
        return [1 if i == h else 0 for i in range(n)]

    def joint_fn(f, gr, c):
        if c == 0:
            return _short_granule(lines_with(hB))
        return _short_granule(lines_with(hC), sf=sf_r)

    kw = dict(sr_idx=0, br_idx=14, channels=2, n_frames=1)
    got = decode_mp3_subbands(encode_mp3_l3(joint_fn, intensity=True, **kw))[3]
    plain = decode_mp3_subbands(encode_mp3_l3(joint_fn, **kw))[3]
    for g in range(2):
        for sb in range(32):
            np.testing.assert_allclose(got[g][0][sb], plain[g][0][sb], atol=0)
            np.testing.assert_allclose(got[g][1][sb], plain[g][1][sb], atol=0)


def _mixed_granule(lines, sf_long=None, sf_short=None, preflag=0,
                   subblock_gain=None):
    return dict(
        block_type=2, mixed_block_flag=1, global_gain=210,
        scalefac_compress=13, preflag=preflag, scalefac_scale=0,
        subblock_gain=subblock_gain or [0, 0, 0],
        table_select=[1, 1, 0], count1table_select=0,
        lines=list(lines), quads=[],
        sf_long=sf_long or [0] * 8,
        sf_short=sf_short or [[0] * 3 for _ in range(9)],
    )


def test_mixed_long_region_matches_pure_long():
    """Mixed subbands 0-1 use the LONG window and the one in-region
    alias boundary, so an impulse confined there (line 4: below every
    butterfly's reach from outside) must decode exactly like a pure
    long granule with matching scalefactors — including preflag/pretab
    on the long region."""
    def fmixed(f, gr, c):
        return _mixed_granule([0, 0, 0, 0, 1, 0], sf_long=[1] * 8,
                              preflag=1)

    def flong(f, gr, c):
        return dict(
            block_type=0, global_gain=210, scalefac_compress=13,
            preflag=1, scalefac_scale=0, subblock_gain=[0, 0, 0],
            table_select=[1, 1, 0], count1table_select=0,
            lines=[0, 0, 0, 0, 1, 0], quads=[], sf=[1] * 21,
        )

    kw = dict(sr_idx=0, br_idx=14, channels=1, n_frames=1)
    gm = decode_mp3_subbands(encode_mp3_l3(fmixed, **kw))[3]
    gl = decode_mp3_subbands(encode_mp3_l3(flong, **kw))[3]
    np.testing.assert_allclose(np.array(gm), np.array(gl), atol=1e-12)


def test_mixed_short_region_matches_pure_short():
    """A line in the short region (natural index >= 36) must decode
    exactly like the pure-short granule carrying the same line with the
    same (sfb, window) scalefactor and subblock gains."""
    from ohsome_planet_spark.functions.mp3_l3 import (
        mixed_reorder_permutation,
        reorder_permutation,
    )

    nat = 40  # window 0, short line 16, sfb 4
    hm = mixed_reorder_permutation(0)[nat]
    hs = reorder_permutation(0)[nat]

    def lines_for(h):
        n = h + 1 + (h + 1) % 2
        return [1 if i == h else 0 for i in range(n)]

    def fmixed(f, gr, c):
        return _mixed_granule(
            lines_for(hm),
            sf_short=[[2] * 3 if i == 1 else [0] * 3 for i in range(9)],
            subblock_gain=[1, 2, 0],
        )

    def fshort(f, gr, c):
        return dict(
            block_type=2, global_gain=210, scalefac_compress=13,
            preflag=0, scalefac_scale=0, subblock_gain=[1, 2, 0],
            table_select=[1, 1, 0], count1table_select=0,
            lines=lines_for(hs), quads=[],
            sf=[[2] * 3 if i == 4 else [0] * 3 for i in range(12)],
        )

    kw = dict(sr_idx=0, br_idx=14, channels=1, n_frames=1)
    gm = decode_mp3_subbands(encode_mp3_l3(fmixed, **kw))[3]
    gs = decode_mp3_subbands(encode_mp3_l3(fshort, **kw))[3]
    np.testing.assert_allclose(np.array(gm), np.array(gs), atol=1e-12)


def test_mixed_alias_stops_at_long_boundary():
    """An impulse in the short region adjacent to subband 1 (line 36+,
    lo-side of boundary 2) must NOT alias in a mixed granule, while the
    equivalent pure-long granule does alias it — the sblim contract."""
    from ohsome_planet_spark.functions.mp3_l3 import mixed_reorder_permutation

    nat = 20  # sb 1, offset 2: hi-side of boundary 1 -> DOES alias (in-region)
    nat2 = 38  # sb 2, offset 2: lo-side of boundary 2 -> must NOT alias
    hm1 = mixed_reorder_permutation(0)[nat]
    hm2 = mixed_reorder_permutation(0)[nat2]

    def lines_for(h):
        n = h + 1 + (h + 1) % 2
        return [1 if i == h else 0 for i in range(n)]

    kw = dict(sr_idx=0, br_idx=14, channels=1, n_frames=1)

    # impulse at nat2 (short region): output must live ONLY in subband 2
    # (no alias leakage into subband 1)
    def f2(f, gr, c):
        return _mixed_granule(lines_for(hm2))

    g2 = np.array(decode_mp3_subbands(encode_mp3_l3(f2, **kw))[3])
    assert np.abs(g2[:, 0, 1]).max() == 0.0  # sb 1 silent
    assert np.abs(g2[:, 0, 2]).max() > 0.0

    # impulse at nat (long region, hi side of the in-region boundary):
    # alias leaks into subband 0 — the butterfly is live inside the
    # long region
    def f1(f, gr, c):
        return _mixed_granule(lines_for(hm1))

    g1 = np.array(decode_mp3_subbands(encode_mp3_l3(f1, **kw))[3])
    assert np.abs(g1[:, 0, 0]).max() > 0.0


def test_mixed_intensity_fenced():
    def granule_fn(f, gr, c):
        return _mixed_granule([])

    p = encode_mp3_l3(granule_fn, sr_idx=0, channels=2, n_frames=1,
                      intensity=True)
    with pytest.raises(Mp3FormatError, match="mixed"):
        decode_mp3_subbands(p)
