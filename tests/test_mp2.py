"""Referees for the MPEG-1 Layer II sample decode (functions/mp3.py):
the published ISO 11172-3 Table 3-C.3 requantization constants, a
hand-computed known-answer frame, the closed-form symmetric-grid twin,
scalefactor-selection sharing, degrouping order, allocation-table
selection, and corrupt/out-of-scope rejection.
"""

from __future__ import annotations

import pytest

from ohsome_planet_spark.functions.mp3 import (
    SCALEFACTORS,
    Mp3FormatError,
    _MP2_NB,
    decode_mp2_subbands,
    encode_mp2,
    mp2_alloc_table,
    mp2_table_for,
)

# ISO 11172-3 Table 3-C.3 ("Layer II classes of quantization") as
# PRINTED in the spec — the independent referee for the closed forms
# C = 2^nb/steps, D = (2^nb - steps + 1)/2^nb used by the decoder.
_TABLE_C3 = {
    3: (1.33333333333, 0.50000000000),
    5: (1.60000000000, 0.50000000000),
    7: (1.14285714286, 0.25000000000),
    9: (1.77777777777, 0.50000000000),
    15: (1.06666666666, 0.12500000000),
    31: (1.03225806452, 0.06250000000),
    63: (1.01587301587, 0.03125000000),
    127: (1.00787401575, 0.01562500000),
    255: (1.00392156863, 0.00781250000),
    511: (1.00195694716, 0.00390625000),
    1023: (1.00097751711, 0.00195312500),
    2047: (1.00048851979, 0.00097656250),
    4095: (1.00024420024, 0.00048828125),
    8191: (1.00012208522, 0.00024414063),
    16383: (1.00006103888, 0.00012207031),
    32767: (1.00003051851, 0.00006103516),
    65535: (1.00001525902, 0.00003051758),
}


def test_c3_constants_match_closed_forms():
    for steps, (c_pub, d_pub) in _TABLE_C3.items():
        nb = _MP2_NB[steps]
        c = float(1 << nb) / float(steps)
        d = float((1 << nb) - steps + 1) / float(1 << nb)
        assert abs(c - c_pub) < 5e-11, steps
        assert abs(d - d_pub) < 5e-9, steps


def test_allocation_tables_shape():
    a, b, c, d = (mp2_alloc_table(n) for n in "abcd")
    assert (len(a), len(b), len(c), len(d)) == (27, 30, 8, 12)
    # published nbal widths: 4,4,3,2 classes in a/b; 4,3 in c/d
    assert [len(t) for t in a[:3]] == [16] * 3
    assert [len(t) for t in a[3:11]] == [16] * 8
    assert [len(t) for t in a[11:23]] == [8] * 12
    assert [len(t) for t in a[23:]] == [4] * 4
    assert b[:27] == a and [len(t) for t in b[27:]] == [4] * 3
    assert [len(t) for t in c] == [16] * 2 + [8] * 6
    assert d[:8] == c and d[8:] == [c[-1]] * 4
    # spot values from the printed tables
    assert a[0][2] == 7 and a[3][2] == 5 and a[11][-1] == 65535
    assert c[0][3] == 9 and c[2][3] == 9 and c[2][-1] == 127
    # every steps value has a width entry
    for t in (a, b, c, d):
        for lst in t:
            for m in lst[1:]:
                assert m in _MP2_NB


def test_table_selection_published_matrix():
    # (rate, kbps/ch) -> table, per ISO 11172-3 2.4.2.3
    cases = [
        (44100, 32, "c"), (44100, 48, "c"), (44100, 56, "a"),
        (44100, 80, "a"), (44100, 96, "b"), (44100, 192, "b"),
        (48000, 32, "c"), (48000, 48, "c"), (48000, 56, "a"),
        (48000, 96, "a"), (48000, 192, "a"),
        (32000, 32, "d"), (32000, 48, "d"), (32000, 56, "a"),
        (32000, 80, "a"), (32000, 96, "b"), (32000, 160, "b"),
    ]
    for rate, kbps, want in cases:
        assert mp2_table_for(rate, kbps) == want, (rate, kbps)


def test_known_answer_hand_decode():
    # mono, 48 kHz, 64 kbps -> table A. Subband 0 allocation 1 -> 3
    # steps, grouped. scfsi=0, transmitted scf indices (0, 3, 6) ->
    # scalefactors 2.0, 1.0, 0.5 per part. Codes cycle 0,1,2 -> the
    # 3-step grid is exactly {-2/3, 0, +2/3}.
    alloc = [[0] * 27]
    alloc[0][0] = 1
    scfsi = [[0] * 27]
    b = encode_mp2(
        alloc, scfsi, lambda c, sb, i: 3 * i,
        lambda f, c, sb, g, k: k, sr_idx=1, br_idx=4, channels=1,
    )
    rate, ch, nf, frames = decode_mp2_subbands(b)
    assert (rate, ch, nf) == (48000, 1, 1)
    sb0 = frames[0][0][0]
    grid = [-2.0 / 3.0, 0.0, 2.0 / 3.0]
    for g in range(12):
        scf = [2.0, 1.0, 0.5][g // 4]
        for k in range(3):
            assert sb0[g * 3 + k] == pytest.approx(grid[k] * scf, abs=1e-15)
    # all other subbands silent
    assert all(v == 0.0 for sb in frames[0][0][1:] for v in sb)


def test_degrouping_order_lsb_first():
    # group code v = c0 + m*c1 + m^2*c2: sample 0 comes from v % m.
    alloc = [[0] * 27]
    alloc[0][0] = 1  # m = 3
    scfsi = [[0] * 27]
    b = encode_mp2(
        alloc, scfsi, lambda c, sb, i: 0,
        lambda f, c, sb, g, k: [2, 0, 1][k], sr_idx=1, br_idx=4,
    )
    _, _, _, frames = decode_mp2_subbands(b)
    got = frames[0][0][0][:3]
    scf = 2.0  # index 0
    assert got == pytest.approx(
        [2.0 / 3.0 * scf, -2.0 / 3.0 * scf, 0.0], abs=1e-15
    )


def test_scfsi_sharing_modes():
    # scfsi 1 -> parts (0,0,1); 2 -> (0,0,0); 3 -> (0,1,1): the decoder
    # must consume exactly 2/1/2 transmitted scalefactors and share them
    alloc = [[0] * 27]
    alloc[0][1] = 1
    for si, want_parts in [(1, (0, 0, 1)), (2, (0, 0, 0)), (3, (0, 1, 1))]:
        scfsi = [[0] * 27]
        scfsi[0][1] = si
        b = encode_mp2(
            alloc, scfsi, lambda c, sb, i: 3 * (i + 1),
            lambda f, c, sb, g, k: 2, sr_idx=1, br_idx=4,
        )
        _, _, _, frames = decode_mp2_subbands(b)
        sb1 = frames[0][0][1]
        for g in range(12):
            scf = SCALEFACTORS[3 * (want_parts[g // 4] + 1)]
            assert sb1[g * 3] == pytest.approx(2.0 / 3.0 * scf, rel=1e-12)


def test_closed_form_grid_referee_randomized():
    """Independent arithmetic path: every decoded sample must equal
    scf * (2c - m + 1)/m — the symmetric odd grid the C/D machinery
    collapses to — including EXACT extremes at dyadic scalefactors."""
    import random

    rng = random.Random(0x11172)
    for _ in range(15):
        ch = rng.choice([1, 2])
        sr_idx = rng.randrange(3)
        br_idx = rng.choice([6, 8, 10, 12])  # 96..192 total
        from ohsome_planet_spark.functions.mp3 import _BITRATES, _RATES

        rate = _RATES[3][sr_idx]
        kbps = _BITRATES[(0, 1)][br_idx] // ch
        table = mp2_alloc_table(mp2_table_for(rate, kbps))
        sblimit = len(table)
        alloc = [
            [
                rng.randrange(min(4, len(table[sb])))
                if rng.random() < 0.4 else 0
                for sb in range(sblimit)
            ]
            for c in range(ch)
        ]
        scfsi = [
            [rng.randrange(4) for _ in range(sblimit)] for _ in range(ch)
        ]
        scf_tbl = {
            (c, sb, i): 3 * rng.randrange(21)
            for c in range(ch)
            for sb in range(sblimit)
            for i in range(3)
        }
        codes = {}

        def code_fn(f, c, sb, g, k):
            m = table[sb][alloc[c][sb]]
            codes[(f, c, sb, g, k)] = rng.randrange(m)
            return codes[(f, c, sb, g, k)]

        b = encode_mp2(
            alloc, scfsi, lambda c, sb, i: scf_tbl[(c, sb, i)], code_fn,
            sr_idx=sr_idx, br_idx=br_idx, channels=ch, n_frames=2,
        )
        got_rate, got_ch, nf, frames = decode_mp2_subbands(b)
        assert (got_rate, got_ch, nf) == (rate, ch, 2)
        from ohsome_planet_spark.functions.mp3 import (
            _MP2_SCFSI_COUNT,
            _MP2_SCFSI_PARTS,
        )

        for f in range(2):
            for c in range(ch):
                for sb in range(sblimit):
                    a = alloc[c][sb]
                    for g in range(12):
                        parts = _MP2_SCFSI_PARTS[scfsi[c][sb]]
                        for k in range(3):
                            got = frames[f][c][sb][g * 3 + k]
                            if not a:
                                assert got == 0.0
                                continue
                            m = table[sb][a]
                            cd = codes[(f, c, sb, g, k)]
                            scf = SCALEFACTORS[scf_tbl[(c, sb, parts[g // 4])]]
                            want = scf * (2 * cd - m + 1) / m
                            assert got == pytest.approx(want, rel=1e-12,
                                                        abs=1e-15)
                    # scfsi modes 1/2/3 really share (bit budget check is
                    # implicit: a miscount desyncs the whole stream)
                    assert _MP2_SCFSI_COUNT[scfsi[c][sb]] <= 3


def test_rejections():
    from ohsome_planet_spark.functions.mp3 import encode_mp1, encode_mp3

    # Layer I / MPEG-2 input out of scope
    with pytest.raises(Mp3FormatError):
        decode_mp2_subbands(encode_mp1([[0] * 32], [[0] * 32], None))
    with pytest.raises(Mp3FormatError):
        decode_mp2_subbands(encode_mp3(2, 1, [8], 1, channels=1))
    # truncated frame
    alloc = [[0] * 27]
    scfsi = [[0] * 27]
    good = encode_mp2(alloc, scfsi, lambda c, sb, i: 0,
                      lambda f, c, sb, g, k: 0, sr_idx=1, br_idx=4)
    with pytest.raises(Mp3FormatError):
        decode_mp2_subbands(good[:-8])
    with pytest.raises(Mp3FormatError):
        decode_mp2_subbands(b"\x00" * 16)


def test_joint_stereo_intensity_bound():
    """Joint stereo (mode 01, ISO 11172-3 §A.2.2.2): above the bound
    4·(ext+1) one allocation + one code set per subband is SHARED by both
    channels, each applying its OWN scalefactors; below the bound pure
    per-channel stereo."""
    for ext in (0, 1, 2, 3):
        bound = 4 * (ext + 1)
        sblimit = 27  # 48 kHz, 192 kbps/ch total 384 -> table A
        alloc = [[0] * sblimit for _ in range(2)]
        # one stereo subband below bound, one intensity subband above
        lo, hi = 1, min(bound + 1, sblimit - 1)
        alloc[0][lo] = alloc[1][lo] = 1
        alloc[0][hi] = alloc[1][hi] = 1
        scfsi = [[2] * sblimit for _ in range(2)]  # one scf for all parts

        def scf_fn(c, sb, i):
            return 3 * (1 + c)  # ch0 scf=1.0, ch1 scf=0.5

        def code_fn(f, c, sb, g, k):
            # per-channel codes below bound; shared (c arrives as 0) above
            return (g + k + c + sb) % 3

        b = encode_mp2(alloc, scfsi, scf_fn, code_fn,
                       sr_idx=1, br_idx=13, channels=2, joint_ext=ext)
        rate, ch, nf, frames = decode_mp2_subbands(b)
        assert (rate, ch, nf) == (48000, 2, 1)
        grid = {0: -2.0 / 3.0, 1: 0.0, 2: 2.0 / 3.0}
        for g in range(12):
            for k in range(3):
                s = g * 3 + k
                # below bound: channels carry DIFFERENT codes
                want0 = grid[(g + k + 0 + lo) % 3] * 1.0
                want1 = grid[(g + k + 1 + lo) % 3] * 0.5
                assert frames[0][0][lo][s] == pytest.approx(want0, abs=1e-15)
                assert frames[0][1][lo][s] == pytest.approx(want1, abs=1e-15)
                # above bound: SAME code (channel-0 derivation), own scf —
                # ch1 is exactly half of ch0 everywhere
                shared = grid[(g + k + 0 + hi) % 3]
                assert frames[0][0][hi][s] == pytest.approx(shared * 1.0,
                                                            abs=1e-15)
                assert frames[0][1][hi][s] == pytest.approx(shared * 0.5,
                                                            abs=1e-15)


def test_joint_stereo_roundtrip_randomized():
    import random

    from ohsome_planet_spark.functions.mp3 import (
        _BITRATES,
        _MP2_SCFSI_PARTS,
        _RATES,
    )

    rng = random.Random(0xA222)
    for _ in range(10):
        ext = rng.randrange(4)
        sr_idx = rng.randrange(3)
        br_idx = rng.choice([10, 12, 13])
        rate = _RATES[3][sr_idx]
        kbps = _BITRATES[(0, 1)][br_idx] // 2
        table = mp2_alloc_table(mp2_table_for(rate, kbps))
        sblimit = len(table)
        bound = min(4 * (ext + 1), sblimit)
        alloc = [[0] * sblimit for _ in range(2)]
        for sb in range(sblimit):
            if rng.random() < 0.3:
                a = rng.randrange(1, min(4, len(table[sb])))
                alloc[0][sb] = a
                alloc[1][sb] = (
                    a if sb >= bound
                    else (rng.randrange(1, min(4, len(table[sb])))
                          if rng.random() < 0.7 else 0)
                )
        scfsi = [[rng.randrange(4) for _ in range(sblimit)] for _ in range(2)]
        scf_tbl = {(c, sb, i): 3 * rng.randrange(21)
                   for c in range(2) for sb in range(sblimit)
                   for i in range(3)}
        codes = {}

        def code_fn(f, c, sb, g, k):
            m = table[sb][alloc[c][sb]]
            codes[(f, c, sb, g, k)] = rng.randrange(m)
            return codes[(f, c, sb, g, k)]

        b = encode_mp2(alloc, scfsi,
                       lambda c, sb, i: scf_tbl[(c, sb, i)], code_fn,
                       sr_idx=sr_idx, br_idx=br_idx, channels=2,
                       n_frames=1, joint_ext=ext)
        _, _, _, frames = decode_mp2_subbands(b)
        for c in range(2):
            for sb in range(sblimit):
                a = alloc[c][sb]
                for g in range(12):
                    for k in range(3):
                        got = frames[0][c][sb][g * 3 + k]
                        if not a:
                            assert got == 0.0
                            continue
                        m = table[sb][a]
                        # shared codes above the bound come from the
                        # encoder's c=0 calls
                        src_c = 0 if sb >= bound else c
                        cd = codes[(0, src_c, sb, g, k)]
                        parts = _MP2_SCFSI_PARTS[scfsi[c][sb]]
                        scf = SCALEFACTORS[scf_tbl[(c, sb, parts[g // 4])]]
                        want = scf * (2 * cd - m + 1) / m
                        assert got == pytest.approx(want, rel=1e-12,
                                                    abs=1e-15)


def test_gate_grid_coverage_at_120():
    """The gate rows trim their doc grid to doc_id < 120 (round-11
    verdict item 6). This referee re-derives the grid and asserts the
    trim loses NO coverage dimension: all four allocation tables, both
    channel modes, all three sample rates, all scfsi modes, grouped
    (3/5/9) and each table's max step class, and the high-subband
    4th-allocation-slot case all still occur."""
    rates = [44100, 48000, 32000]
    per_ch_kbps = [48, 64, 96, 160]
    def grid(n):
        tables, chans, srs, scfsis, steps = set(), set(), set(), set(), set()
        slots, slot4_hi = set(), set()
        for d in range(n):
            ch = 1 + d % 2
            rate = rates[d % 3]
            p = d % 4
            name = mp2_table_for(rate, per_ch_kbps[p])
            table = mp2_alloc_table(name)
            sblimit = len(table)
            tables.add(name)
            chans.add(ch)
            srs.add(rate)
            for c in range(ch):
                for sb in range(sblimit):
                    scfsis.add((d + sb + c) % 4)
                    if (d + sb + c) % 2 != 0:
                        idx = 0
                    elif sb == d % 3:
                        idx = 3
                    elif sb == 24 and p >= 2 and (d + c) % 5 == 2:
                        idx = 3
                        slot4_hi.add((name, sb))
                    else:
                        idx = 1 + (d + sb + 2 * c) % 2
                    slots.add((name, sb, idx))
                    if idx:
                        steps.add(table[sb][idx])
        return tables, chans, srs, scfsis, steps, slots, slot4_hi

    t120, t500 = grid(120), grid(500)
    # the strong property: the trim loses NOTHING the 500-doc grid had —
    # every (table, subband, allocation-slot) combo, every step class,
    # every scfsi mode, every rate/channel mode
    assert t120 == t500
    tables, chans, srs, scfsis, steps, _, slot4_hi = t120
    assert tables == {"a", "b", "c", "d"}
    assert chans == {1, 2} and srs == set(rates)
    assert scfsis == {0, 1, 2, 3}
    assert {3, 5, 9} <= steps          # every grouped class
    assert slot4_hi                     # the sb-24 4th-slot branch fires
    # joint-stereo row: bounds 4*(ext+1) for ext = d%4 all occur below 120
    assert {4 * (d % 4 + 1) for d in range(120)} == {4, 8, 12, 16}
