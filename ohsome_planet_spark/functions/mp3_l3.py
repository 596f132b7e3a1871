"""MPEG-1 Layer III sample decode (hybrid-filterbank domain) + fixture
encoder — the Layer III completion of the Layer I/II machinery in
``functions/mp3.py`` (round-11 verdict item 5).

Scope and honesty
-----------------
- REAL data path per ISO/IEC 11172-3 §2.4.3.4.7: side information
  (including the bit-reservoir ``main_data_begin`` pool walk),
  scalefactor decode with scfsi sharing, Huffman big-values/count1
  regions with linbits escapes and sign bits, requantization
  |is|^(4/3) · 2^(gain terms) with preflag/pretab, subblock gains,
  short-block reorder, MS stereo, alias-reduction butterflies (the
  printed cᵢ constants), 36/12-point IMDCT with all four window types
  (long / start / short / stop), overlap-add across granules AND
  frames, and frequency inversion. Output stops at the 32×18
  subband-time samples per granule — the same scope boundary as the
  Layer I/II rows (the polyphase synthesis window to PCM is a fixed
  linear post-map shared by all three layers).
- Huffman CODEBOOKS are fixture-canonical: deterministic canonical
  prefix codes built over the PUBLISHED table alphabet — the standard's
  (xlen, ylen) shapes, the Table B.7 linbits column, the 15+linbits
  escape rule, the count1 quadruple alphabet — but NOT the printed
  codeword bit patterns (no authoritative copy is available in this
  environment to transcribe from; guessing them from memory would be
  silently wrong). The decode machinery is codebook-agnostic (a bitwise
  prefix-tree walk); dropping in the Annex B.7 patterns is a pure data
  swap in ``_CODEBOOKS``. Consequence: frames produced by
  :func:`encode_mp3_l3` exercise the full real decode path but are not
  bit-interoperable with external decoders until that swap.
- Fenced (raise, never wrong): MPEG-2/2.5 LSF, CRC-protected frames,
  intensity stereo combined with MIXED blocks or with mismatched
  left/right block types. Intensity stereo itself (§2.4.3.4.9.3) is
  implemented for BOTH long and short blocks: the right channel's zero
  region sets the bound (per window for short blocks), its scalefactor
  slots carry is_pos, ratios tan(is_pos·π/12), is_pos 7 falls back to
  MS/LR, and the MS flag still governs the region below the bound.
  MIXED blocks (§2.4.2.7: two long subbands under a short granule) are
  implemented end-to-end: the 8-long + short-sfb-3..11 scalefactor
  layout, the identity-below-36 reorder, long/short split
  requantization, single-boundary alias reduction, and the per-subband
  long/short IMDCT window choice.

Everything downstream of the Huffman symbols follows the printed spec
arithmetic exactly and is referee'd in tests/test_mp3_l3.py against
independently re-derived formulas (numpy IMDCT matrices, hand
requantization), the printed alias/pretab/slen constants, and a
randomized encoder↔decoder roundtrip over the whole parameter space.
"""

from __future__ import annotations

import math
import struct

from .mp3 import Mp3FormatError, _BitReader, _parse_header

# --- published structural tables (ISO 11172-3, MPEG-1) ----------------------

# Table B.8 scalefactor band boundaries, indexed by header sr_idx
# (44100, 48000, 32000). Long: 23 boundaries / 22 bands (sfb 21 has no
# scalefactor and requantizes with 0). Short: 14 boundaries / 13 bands
# per window (sfb 12 likewise).
SFB_LONG = {
    0: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
        162, 196, 238, 288, 342, 418, 576],
    1: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
        156, 190, 230, 276, 330, 384, 576],
    2: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
        194, 240, 296, 364, 448, 550, 576],
}
SFB_SHORT = {
    0: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    1: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    2: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}

# §2.4.3.4.5 preemphasis table (one value per long sfb 0..20)
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2]

# §2.4.2.7 scalefac_compress -> (slen1, slen2)
SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# §2.4.3.4.10.1 alias-reduction coefficients c_i; cs = 1/sqrt(1+c²),
# ca = c/sqrt(1+c²)
ALIAS_C = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
ALIAS_CS = [1.0 / math.sqrt(1.0 + c * c) for c in ALIAS_C]
ALIAS_CA = [c / math.sqrt(1.0 + c * c) for c in ALIAS_C]

# Table B.7 shapes: table id -> (xlen, ylen, linbits). Ids 4 and 14 are
# unused in the standard; id 0 codes the all-zero region.
TABLE_SHAPES = {
    0: (1, 1, 0),
    1: (2, 2, 0), 2: (3, 3, 0), 3: (3, 3, 0),
    5: (4, 4, 0), 6: (4, 4, 0),
    7: (6, 6, 0), 8: (6, 6, 0), 9: (6, 6, 0),
    10: (8, 8, 0), 11: (8, 8, 0), 12: (8, 8, 0),
    13: (16, 16, 0), 15: (16, 16, 0),
    16: (16, 16, 1), 17: (16, 16, 2), 18: (16, 16, 3), 19: (16, 16, 4),
    20: (16, 16, 6), 21: (16, 16, 8), 22: (16, 16, 10), 23: (16, 16, 13),
    24: (16, 16, 4), 25: (16, 16, 5), 26: (16, 16, 6), 27: (16, 16, 7),
    28: (16, 16, 8), 29: (16, 16, 9), 30: (16, 16, 11), 31: (16, 16, 13),
}


def _canonical_code(weights: list[int]) -> list[tuple[int, int]]:
    """Canonical Huffman code for integer ``weights`` (symbol i has
    weights[i] > 0): classic two-queue merge with deterministic
    tie-breaks, then canonical (len, code) assignment sorted by
    (length, symbol). Returns [(len, code)] per symbol."""
    n = len(weights)
    if n == 1:
        return [(1, 0)]
    import heapq

    lens = [0] * n
    # depth = number of merges a symbol participates in: replay the
    # classic merge with explicit per-symbol depths
    heap = [(w, i, {i: 0}) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    tick = n
    while len(heap) > 1:
        w1, _, d1 = heapq.heappop(heap)
        w2, _, d2 = heapq.heappop(heap)
        merged = {s: d + 1 for s, d in d1.items()}
        merged.update({s: d + 1 for s, d in d2.items()})
        heapq.heappush(heap, (w1 + w2, tick, merged))
        tick += 1
    for s, d in heap[0][2].items():
        lens[s] = max(d, 1)
    order = sorted(range(n), key=lambda s: (lens[s], s))
    out: list[tuple[int, int]] = [(0, 0)] * n
    code = 0
    prev_len = lens[order[0]]
    for s in order:
        code <<= lens[s] - prev_len
        prev_len = lens[s]
        out[s] = (lens[s], code)
        code += 1
    return out


def _build_pair_codebook(xlen: int, ylen: int) -> dict:
    """Codebook over the (x, y) pair alphabet: smaller magnitudes get
    exponentially larger weights, so the canonical code is genuinely
    variable-length with realistic shape (short codes at (0,0))."""
    symbols = [(x, y) for x in range(xlen) for y in range(ylen)]
    top = xlen + ylen
    # quadratic (not exponential) decay keeps the rarest symbol's code
    # ~16 bits — exponential weights drove (15,15) past 60 bits and
    # overflowed real frame budgets
    weights = [(1 + top - x - y) ** 2 for (x, y) in symbols]
    codes = _canonical_code(weights)
    enc = {sym: codes[i] for i, sym in enumerate(symbols)}
    return enc


def _build_quad_codebook(table_b: bool) -> dict:
    """count1 quadruple codebooks (v, w, x, y each 0/1). Table B is the
    fixed 4-bit form; table A is a canonical variable-length code
    weighted toward sparse quads."""
    syms = [(v, w, x, y) for v in range(2) for w in range(2)
            for x in range(2) for y in range(2)]
    if table_b:
        return {s: (4, (s[0] << 3) | (s[1] << 2) | (s[2] << 1) | s[3])
                for s in syms}
    weights = [1 << (3 * (4 - sum(s))) for s in syms]
    codes = _canonical_code(weights)
    return {s: codes[i] for i, s in enumerate(syms)}


_CODEBOOKS: dict[int, dict] = {
    tid: _build_pair_codebook(x, y)
    for tid, (x, y, _lin) in TABLE_SHAPES.items() if tid != 0
}
_COUNT1_CODEBOOKS = {0: _build_quad_codebook(False),
                     1: _build_quad_codebook(True)}


def _decode_tree(codebook: dict) -> dict:
    """(len, code) map -> bit-walk tree: nested dicts keyed by bit."""
    root: dict = {}
    for sym, (ln, code) in codebook.items():
        node = root
        for b in range(ln - 1, -1, -1):
            bit = (code >> b) & 1
            if b == 0:
                node[bit] = sym
            else:
                node = node.setdefault(bit, {})
                if not isinstance(node, dict):
                    raise ValueError("codebook not prefix-free")
    return root


_PAIR_TREES = {tid: _decode_tree(cb) for tid, cb in _CODEBOOKS.items()}
_QUAD_TREES = {k: _decode_tree(cb) for k, cb in _COUNT1_CODEBOOKS.items()}


def _walk(r: _BitReader, tree: dict):
    node = tree
    while isinstance(node, dict):
        node = node[r.read(1)]
    return node


# --- IMDCT / window matrices (computed once; the oracle inlines their
# repr()s — same precedent as the geodesic SPHERE_FACT constant) -------------


def _long_window(block_type: int) -> list[float]:
    w = [0.0] * 36
    if block_type == 0:
        for n in range(36):
            w[n] = math.sin(math.pi / 36 * (n + 0.5))
    elif block_type == 1:  # start
        for n in range(18):
            w[n] = math.sin(math.pi / 36 * (n + 0.5))
        for n in range(18, 24):
            w[n] = 1.0
        for n in range(24, 30):
            w[n] = math.sin(math.pi / 12 * (n - 18 + 0.5))
        # 30..35 stay 0
    elif block_type == 3:  # stop
        for n in range(6, 12):
            w[n] = math.sin(math.pi / 12 * (n - 6 + 0.5))
        for n in range(12, 18):
            w[n] = 1.0
        for n in range(18, 36):
            w[n] = math.sin(math.pi / 36 * (n + 0.5))
    else:
        raise ValueError("short blocks use imdct_matrix(2)")
    return w


def imdct_matrix(block_type: int) -> list[list[float]]:
    """36×18 linear map M with out[n] = Σ_k M[n][k] · X[18·sb + k]:
    window ∘ IMDCT for long types; for short (type 2) the composition of
    the de-interleaved three 6-point IMDCTs, the short window, and the
    +6-offset overlap placement. X for short blocks is in NATURAL
    (post-reorder) order: X[w·6 + i] is line i of window w."""
    M = [[0.0] * 18 for _ in range(36)]
    if block_type != 2:
        w = _long_window(block_type)
        for n in range(36):
            for k in range(18):
                M[n][k] = w[n] * math.cos(
                    math.pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1)
                )
        return M
    for win in range(3):
        for m in range(12):
            wv = math.sin(math.pi / 12 * (m + 0.5))
            n = 6 + win * 6 + m
            for k in range(6):
                M[n][win * 6 + k] += wv * math.cos(
                    math.pi / 24.0 * (2 * m + 1 + 6) * (2 * k + 1)
                )
    return M


_IMDCT_M = {bt: imdct_matrix(bt) for bt in range(4)}


# --- side info --------------------------------------------------------------


class _GranuleInfo:
    __slots__ = (
        "part2_3_length", "big_values", "global_gain", "scalefac_compress",
        "window_switching", "block_type", "mixed_block_flag",
        "table_select", "subblock_gain", "region0_count", "region1_count",
        "preflag", "scalefac_scale", "count1table_select",
    )


def _read_side_info(data: bytes, channels: int):
    r = _BitReader(data)
    main_data_begin = r.read(9)
    r.read(5 if channels == 1 else 3)  # private bits
    scfsi = [[r.read(1) for _ in range(4)] for _ in range(channels)]
    grs = []
    for _gr in range(2):
        chs = []
        for _ch in range(channels):
            g = _GranuleInfo()
            g.part2_3_length = r.read(12)
            g.big_values = r.read(9)
            g.global_gain = r.read(8)
            g.scalefac_compress = r.read(4)
            g.window_switching = r.read(1)
            if g.window_switching:
                g.block_type = r.read(2)
                g.mixed_block_flag = r.read(1)
                if g.block_type == 0:
                    raise Mp3FormatError(
                        "window_switching with block_type 0 is reserved"
                    )
                if g.mixed_block_flag and g.block_type != 2:
                    raise Mp3FormatError(
                        "mixed_block_flag with long switching block types"
                        " is reserved"
                    )
                g.table_select = [r.read(5), r.read(5), 0]
                g.subblock_gain = [r.read(3) for _ in range(3)]
                g.region0_count = 8 if g.block_type == 2 else 7
                g.region1_count = 20 - g.region0_count
            else:
                g.block_type = 0
                g.mixed_block_flag = 0
                g.table_select = [r.read(5), r.read(5), r.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = r.read(4)
                g.region1_count = r.read(3)
            g.preflag = r.read(1)
            g.scalefac_scale = r.read(1)
            g.count1table_select = r.read(1)
            chs.append(g)
        grs.append(chs)
    return main_data_begin, scfsi, grs


# scfsi band -> long sfb range (§2.4.2.7)
_SCFSI_BANDS = [(0, 6), (6, 11), (11, 16), (16, 21)]


def _read_scalefacs(r: _BitReader, g: _GranuleInfo, gr: int,
                    scfsi_ch: list[int], prev: list[int] | None):
    slen1, slen2 = SLEN[g.scalefac_compress]
    if g.window_switching and g.block_type == 2 and g.mixed_block_flag:
        # §2.4.2.7 mixed layout: 8 long sfb (slen1), then short sfb
        # 3..11 per window (slen1 through sfb 5, slen2 above)
        long_sf = [r.read(slen1) for _ in range(8)]
        short_sf = []
        for sfb in range(3, 12):
            slen = slen1 if sfb < 6 else slen2
            short_sf.append([r.read(slen) for _ in range(3)])
        return {"long": long_sf, "short": short_sf}
    if g.window_switching and g.block_type == 2:
        sf = []
        for sfb in range(12):
            slen = slen1 if sfb < 6 else slen2
            sf.append([r.read(slen) for _ in range(3)])
        return sf
    sf = [0] * 21
    for band, (lo, hi) in enumerate(_SCFSI_BANDS):
        if gr == 1 and scfsi_ch[band]:
            if prev is None:
                raise Mp3FormatError("scfsi set but granule 0 was short")
            sf[lo:hi] = prev[lo:hi]
        else:
            for sfb in range(lo, hi):
                sf[sfb] = r.read(slen1 if sfb < 11 else slen2)
    return sf


# --- huffman region layout ---------------------------------------------------


def _region_ends(g: _GranuleInfo, sr_idx: int) -> list[int]:
    """Line indices (in huffman order) where big-values regions end.
    Switching granules have two regions with the fixed 36-line split
    (long_bands[8] == 36 at every MPEG-1 rate; short uses 36 too)."""
    lines = 2 * g.big_values
    if g.window_switching:
        return [min(36, lines), lines]
    bands = SFB_LONG[sr_idx]
    r0 = bands[min(g.region0_count + 1, 22)]
    r1 = bands[min(g.region0_count + g.region1_count + 2, 22)]
    return [min(r0, lines), min(r1, lines), lines]


def _decode_huffman(r: _BitReader, g: _GranuleInfo, sr_idx: int,
                    end_bit: int) -> list[int]:
    xs = [0] * 576
    pos = 0
    for region, rend in enumerate(_region_ends(g, sr_idx)):
        tid = g.table_select[region]
        if tid in (4, 14):
            raise Mp3FormatError(f"reserved huffman table {tid}")
        _, _, linbits = TABLE_SHAPES[tid]
        tree = _PAIR_TREES.get(tid)
        while pos < rend:
            if tid == 0:
                xs[pos], xs[pos + 1] = 0, 0
                pos += 2
                continue
            x, y = _walk(r, tree)
            for val in (x, y):
                if val == 15 and linbits:
                    val += r.read(linbits)
                if val:
                    if r.read(1):
                        val = -val
                xs[pos] = val
                pos += 1
    qtree = _QUAD_TREES[g.count1table_select]
    while r.pos < end_bit and pos <= 572:
        quad = _walk(r, qtree)
        for q in quad:
            v = q
            if v and r.read(1):
                v = -v
            xs[pos] = v
            pos += 1
    if r.pos > end_bit:
        raise Mp3FormatError("huffman data overruns part2_3_length")
    r.pos = end_bit  # stuffing bits
    return xs, pos


# --- requantize / reorder / stereo / alias ----------------------------------


def _sfb_of_line_long(sr_idx: int) -> list[int]:
    bands = SFB_LONG[sr_idx]
    out = []
    for sfb in range(22):
        out += [sfb] * (bands[sfb + 1] - bands[sfb])
    return out


def _sfb_of_sline_short(sr_idx: int) -> list[int]:
    bands = SFB_SHORT[sr_idx]
    out = []
    for sfb in range(13):
        out += [sfb] * (bands[sfb + 1] - bands[sfb])
    return out


def reorder_permutation(sr_idx: int) -> list[int]:
    """natural[i] = huffman[perm[i]] for short (non-mixed) granules.
    Huffman order: per band, the band's lines for window 0, then 1,
    then 2. Natural order: subband-major, window-major inside each
    18-line subband (X[18·sb + 6·w + j] = window w, short line
    6·sb + j)."""
    bands = SFB_SHORT[sr_idx]
    perm = [0] * 576
    hpos = 0
    for sfb in range(13):
        width = bands[sfb + 1] - bands[sfb]
        for w in range(3):
            for j in range(width):
                s = bands[sfb] + j  # short-line index within the window
                nat = (s // 6) * 18 + w * 6 + (s % 6)
                perm[nat] = hpos
                hpos += 1
    return perm


_REORDER = {sr: reorder_permutation(sr) for sr in range(3)}


def mixed_reorder_permutation(sr_idx: int) -> list[int]:
    """natural[i] = huffman[perm[i]] for MIXED granules: the first 36
    lines (two long subbands) keep huffman order; the short region
    starts at short sfb 3 (short line 12 == natural line 36) and
    follows the pure-short band-major layout above it."""
    bands = SFB_SHORT[sr_idx]
    perm = list(range(36)) + [0] * 540
    hpos = 36
    for sfb in range(3, 13):
        width = bands[sfb + 1] - bands[sfb]
        for w in range(3):
            for j in range(width):
                s = bands[sfb] + j
                nat = (s // 6) * 18 + w * 6 + (s % 6)
                perm[nat] = hpos
                hpos += 1
    assert hpos == 576
    return perm


_MIXED_REORDER = {sr: mixed_reorder_permutation(sr) for sr in range(3)}


def _requantize(xs: list[int], g: _GranuleInfo, sf, sr_idx: int) -> list[float]:
    out = [0.0] * 576
    mult = 0.5 * (1 + g.scalefac_scale)
    if g.window_switching and g.block_type == 2 and g.mixed_block_flag:
        sfb_long = _sfb_of_line_long(sr_idx)
        sfb_short = _sfb_of_sline_short(sr_idx)
        perm = _MIXED_REORDER[sr_idx]
        for i in range(576):
            v = xs[perm[i]]
            if v == 0:
                continue
            if i < 36:
                sfb = sfb_long[i]  # 0..7 at every MPEG-1 rate
                scf = sf["long"][sfb] + g.preflag * PRETAB[sfb]
                gain = 0.25 * (g.global_gain - 210.0) - mult * scf
            else:
                w = (i % 18) // 6
                s = (i // 18) * 6 + (i % 6)
                sfb = sfb_short[s]
                scf = sf["short"][sfb - 3][w] if sfb < 12 else 0
                gain = (0.25 * (g.global_gain - 210.0)
                        - 2.0 * g.subblock_gain[w] - mult * scf)
            out[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * 2.0 ** gain
        return out
    if g.window_switching and g.block_type == 2:
        sfb_of = _sfb_of_sline_short(sr_idx)
        perm = _REORDER[sr_idx]
        for i in range(576):
            v = xs[perm[i]]
            if v == 0:
                continue
            w = (i % 18) // 6
            s = (i // 18) * 6 + (i % 6)
            sfb = sfb_of[s]
            scf = sf[sfb][w] if sfb < 12 else 0
            gain = (0.25 * (g.global_gain - 210.0)
                    - 2.0 * g.subblock_gain[w] - mult * scf)
            out[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * 2.0 ** gain
        return out
    sfb_of = _sfb_of_line_long(sr_idx)
    for i in range(576):
        v = xs[i]
        if v == 0:
            continue
        sfb = sfb_of[i]
        scf = (sf[sfb] + g.preflag * PRETAB[sfb]) if sfb < 21 else 0
        gain = 0.25 * (g.global_gain - 210.0) - mult * scf
        out[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * 2.0 ** gain
    return out


def _alias_reduce(xr: list[float], n_boundaries: int = 31) -> list[float]:
    """§2.4.3.4.10.1 butterflies. Long granules reduce all 31 subband
    boundaries; MIXED granules only the boundary inside their two long
    subbands (dist10's ``sblim``) — the short region never aliases."""
    out = list(xr)
    for sb in range(1, n_boundaries + 1):
        for t in range(8):
            lo = 18 * sb - 1 - t
            hi = 18 * sb + t
            a, b = out[lo], out[hi]
            out[lo] = a * ALIAS_CS[t] - b * ALIAS_CA[t]
            out[hi] = b * ALIAS_CS[t] + a * ALIAS_CA[t]
    return out


# §2.4.3.4.9.3 intensity-stereo ratios for is_pos 0..6 (7 = illegal ->
# no intensity; falls back to MS when the MS flag is also set). p = 6 is
# the tan(pi/2) limit: all energy left.
_IS_KL = [0.0] + [
    math.tan(p * math.pi / 12) / (1.0 + math.tan(p * math.pi / 12))
    for p in range(1, 6)
] + [1.0]
_IS_KR = [1.0] + [
    1.0 / (1.0 + math.tan(p * math.pi / 12)) for p in range(1, 6)
] + [0.0]


# --- full decode -------------------------------------------------------------


def decode_mp3_subbands(payload: bytes):
    """REAL MPEG-1 Layer III sample decode to the hybrid-filterbank
    (subband-time) domain. Returns (sample_rate, channels, n_granules,
    granules) with granules[g][ch][sb][0..17] after IMDCT, overlap-add
    and frequency inversion. See the module docstring for scope."""
    frames = []
    pos = 0
    sr_idx = channels = None
    rate = None
    while pos + 4 <= len(payload):
        h = struct.unpack(">I", payload[pos:pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 3
        layer_bits = (h >> 17) & 3
        if version != 3 or layer_bits != 1:
            raise Mp3FormatError("only MPEG-1 Layer III supported")
        if not (h >> 16) & 1:
            raise Mp3FormatError("CRC frames not supported")
        _, _, _, hrate, _, ch, fb, _ = _parse_header(h)
        mode = (h >> 6) & 3
        mode_ext = (h >> 4) & 3
        ms = mode == 1 and bool(mode_ext & 2)
        intensity = mode == 1 and bool(mode_ext & 1)
        if sr_idx is None:
            sr_idx = (h >> 10) & 3
            channels = ch
            rate = hrate
        elif ch != channels or ((h >> 10) & 3) != sr_idx:
            raise Mp3FormatError("parameter change mid-stream")
        side_len = 17 if ch == 1 else 32
        side = payload[pos + 4:pos + 4 + side_len]
        main = payload[pos + 4 + side_len:pos + fb]
        frames.append((side, main, ms, intensity))
        pos += fb
    if not frames:
        raise Mp3FormatError("no Layer III frames found")

    pool = bytearray()
    granules = []
    prev_tail = [[[0.0] * 18 for _ in range(32)] for _ in range(channels)]
    sqrt2 = math.sqrt(2.0)
    for side, main, ms, intensity in frames:
        offset_before = len(pool)
        pool += main
        main_data_begin, scfsi, grs = _read_side_info(side, channels)
        start = offset_before - main_data_begin
        if start < 0:
            raise Mp3FormatError("bit reservoir underrun")
        r = _BitReader(bytes(pool), start * 8)
        prev_sf = [None] * channels
        for gr in range(2):
            xr_ch = []
            sf_ch = []
            rzero_ch = []
            for c in range(channels):
                g = grs[gr][c]
                part_start = r.pos
                sf = _read_scalefacs(r, g, gr, scfsi[c], prev_sf[c])
                if not (g.window_switching and g.block_type == 2):
                    prev_sf[c] = sf
                end_bit = part_start + g.part2_3_length
                xs, nlines = _decode_huffman(r, g, sr_idx, end_bit)
                sf_ch.append(sf)
                rzero_ch.append(nlines)
                xr_ch.append(_requantize(xs, g, sf, sr_idx))
            if intensity and channels == 2 and any(
                grs[gr][cc].mixed_block_flag for cc in range(2)
            ):
                raise Mp3FormatError(
                    "intensity stereo with mixed blocks not supported"
                )
            if intensity and channels == 2 and (
                grs[gr][1].window_switching and grs[gr][1].block_type == 2
            ):
                # SHORT-block intensity (§2.4.3.4.9.3): the zero-part
                # detection runs PER WINDOW on the right channel's
                # requantized values (dist10 III_stereo walks sfb 12→0
                # per window); intensity positions live in the right
                # channel's (sfb, window) scalefactor slots. Channels
                # with mismatched window shapes stay fenced.
                g0 = grs[gr][0]
                if not (g0.window_switching and g0.block_type == 2):
                    raise Mp3FormatError(
                        "intensity stereo with mismatched block types"
                        " not supported"
                    )
                bands = SFB_SHORT[sr_idx]
                L, R = xr_ch
                new_l, new_r = list(L), list(R)

                def _lines(sfb: int, w: int):
                    for s in range(bands[sfb], bands[sfb + 1]):
                        yield (s // 6) * 18 + w * 6 + (s % 6)

                for w in range(3):
                    sfbcnt = -1
                    for sfb in range(12, -1, -1):
                        if any(R[i] != 0.0 for i in _lines(sfb, w)):
                            sfbcnt = sfb
                            break
                    for sfb in range(sfbcnt + 1):
                        if ms:
                            for i in _lines(sfb, w):
                                l_v, r_v = L[i], R[i]
                                new_l[i] = (l_v + r_v) / sqrt2
                                new_r[i] = (l_v - r_v) / sqrt2
                    for sfb in range(sfbcnt + 1, 13):
                        is_pos = sf_ch[1][sfb][w] if sfb < 12 else 7
                        for i in _lines(sfb, w):
                            if is_pos == 7:
                                if ms:
                                    l_v, r_v = L[i], R[i]
                                    new_l[i] = (l_v + r_v) / sqrt2
                                    new_r[i] = (l_v - r_v) / sqrt2
                            else:
                                new_l[i] = L[i] * _IS_KL[is_pos]
                                new_r[i] = L[i] * _IS_KR[is_pos]
                xr_ch = [new_l, new_r]
            elif intensity and channels == 2:
                # long-block intensity (§2.4.3.4.9.3): bands at/above the
                # right channel's zero region carry a POSITION in the
                # right channel's scalefactor slot; below it MS applies
                # when the MS flag is also set.
                if any(
                    grs[gr][cc].window_switching
                    and grs[gr][cc].block_type == 2
                    for cc in range(2)
                ):
                    raise Mp3FormatError(
                        "intensity stereo with mismatched block types"
                        " not supported"
                    )
                bands = SFB_LONG[sr_idx]
                rz = rzero_ch[1]
                bound_idx = next(
                    ix for ix in range(23) if bands[ix] >= rz
                )
                bound_line = bands[bound_idx]
                L, R = xr_ch
                new_l, new_r = list(L), list(R)
                if ms:
                    for i in range(bound_line):
                        new_l[i] = (L[i] + R[i]) / sqrt2
                        new_r[i] = (L[i] - R[i]) / sqrt2
                for sfb in range(bound_idx, 22):
                    is_pos = sf_ch[1][sfb] if sfb < 21 else 7
                    for i in range(bands[sfb], bands[sfb + 1]):
                        if is_pos == 7:
                            if ms:
                                new_l[i] = (L[i] + R[i]) / sqrt2
                                new_r[i] = (L[i] - R[i]) / sqrt2
                        else:
                            new_l[i] = L[i] * _IS_KL[is_pos]
                            new_r[i] = L[i] * _IS_KR[is_pos]
                xr_ch = [new_l, new_r]
            elif ms and channels == 2:
                mid, side_x = xr_ch
                xr_ch = [
                    [(m + s) / sqrt2 for m, s in zip(mid, side_x)],
                    [(m - s) / sqrt2 for m, s in zip(mid, side_x)],
                ]
            out_ch = []
            for c in range(channels):
                g = grs[gr][c]
                xr = xr_ch[c]
                short = g.window_switching and g.block_type == 2
                mixed = short and g.mixed_block_flag
                if not short:
                    xr = _alias_reduce(xr)
                elif mixed:
                    # only the boundary inside the two long subbands
                    xr = _alias_reduce(xr, n_boundaries=1)
                sbs = []
                for sb in range(32):
                    M = (
                        _IMDCT_M[0]
                        if mixed and sb < 2
                        else _IMDCT_M[g.block_type]
                    )
                    X = xr[18 * sb:18 * (sb + 1)]
                    raw = [
                        sum(M[n][k] * X[k] for k in range(18))
                        for n in range(36)
                    ]
                    s = [raw[n] + prev_tail[c][sb][n] for n in range(18)]
                    prev_tail[c][sb] = raw[18:]
                    if sb % 2:
                        for n in range(1, 18, 2):
                            s[n] = -s[n]
                    sbs.append(s)
                out_ch.append(sbs)
            granules.append(out_ch)
    return rate, channels, len(granules), granules


# --- fixture encoder ---------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int):
        if bits and not 0 <= v < (1 << bits):
            raise ValueError(f"{v} does not fit in {bits} bits")
        self.acc = (self.acc << bits) | v
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def bits(self) -> int:
        return len(self.buf) * 8 + self.n

    def flush(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
            self.acc = 0
        return bytes(self.buf)


def _encode_granule(w: _BitWriter, g: dict, sr_idx: int, gr: int,
                    scfsi_ch: list[int]):
    """Write scalefactors + huffman data for one granule-channel; returns
    (part2_3_length, side-info field dict). ``g`` carries block_type,
    global_gain, scalefac_compress, preflag, scalefac_scale,
    subblock_gain, table_select, count1table_select, scalefacs sf,
    big-values list ``lines`` (signed ints with magnitudes legal for
    the region tables) in HUFFMAN order, count1 quads list."""
    start = w.bits()
    bt = g["block_type"]
    mixed = bool(g.get("mixed_block_flag"))
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    if bt == 2 and mixed:
        for sfb in range(8):
            w.put(g["sf_long"][sfb], slen1)
        for sfb in range(3, 12):
            for win in range(3):
                w.put(g["sf_short"][sfb - 3][win],
                      slen1 if sfb < 6 else slen2)
    elif bt == 2:
        for sfb in range(12):
            for win in range(3):
                w.put(g["sf"][sfb][win], slen1 if sfb < 6 else slen2)
    else:
        for band, (lo, hi) in enumerate(_SCFSI_BANDS):
            if gr == 1 and scfsi_ch[band]:
                continue
            for sfb in range(lo, hi):
                w.put(g["sf"][sfb], slen1 if sfb < 11 else slen2)
    lines = g["lines"]
    if len(lines) % 2:
        raise ValueError("big-values lines must be pairs")
    gi = _GranuleInfo()
    gi.big_values = len(lines) // 2
    gi.window_switching = 1 if bt != 0 else 0
    gi.block_type = bt
    if bt:
        gi.region0_count = 8 if bt == 2 else 7
        gi.region1_count = 20 - gi.region0_count
    else:
        gi.region0_count = g.get("region0_count", 7)
        gi.region1_count = g.get("region1_count", 5)
    gi.table_select = g["table_select"]
    ends = _region_ends(gi, sr_idx)
    pos = 0
    for region, rend in enumerate(ends):
        tid = g["table_select"][region]
        xlen, ylen, linbits = TABLE_SHAPES[tid]
        cb = _CODEBOOKS.get(tid)
        while pos < rend:
            x, y = lines[pos], lines[pos + 1]
            if tid == 0:
                if x or y:
                    raise ValueError("table 0 region must be zero")
                pos += 2
                continue
            ax, ay = abs(x), abs(y)
            ex = ax - 15 if ax >= 15 else 0
            ey = ay - 15 if ay >= 15 else 0
            cx, cy = min(ax, 15), min(ay, 15)
            if cx >= xlen or cy >= ylen:
                raise ValueError(f"|{x}| too big for table {tid}")
            if (ex or ey) and not linbits:
                raise ValueError("escape needs a linbits table")
            if linbits and max(ex, ey) >= (1 << linbits):
                raise ValueError("linbits overflow")
            ln, code = cb[(cx, cy)]
            w.put(code, ln)
            for a, c_, e in ((ax, x, ex), (ay, y, ey)):
                if c_ == 0:
                    continue
                if a >= 15 and linbits:
                    w.put(e, linbits)
                w.put(1 if c_ < 0 else 0, 1)
            pos += 2
    qcb = _COUNT1_CODEBOOKS[g["count1table_select"]]
    for quad in g["quads"]:
        key = tuple(abs(q) for q in quad)
        ln, code = qcb[key]
        w.put(code, ln)
        for q in quad:
            if q:
                w.put(1 if q < 0 else 0, 1)
    return w.bits() - start


def encode_mp3_l3(
    granule_fn,
    sr_idx: int = 0,
    br_idx: int = 14,
    channels: int = 1,
    n_frames: int = 1,
    ms_stereo: bool = False,
    intensity: bool = False,
    scfsi_fn=None,
) -> bytes:
    """Emit genuine MPEG-1 Layer III frames (fixture encoder).
    ``granule_fn(f, gr, ch)`` returns the granule dict consumed by
    ``_encode_granule`` (see there); ``scfsi_fn(ch)`` the 4 scfsi bits
    (granule-1 bands flagged there must carry sf=None and both granules
    must be long — the encoder validates). main_data_begin is always 0:
    each frame's main data lives in its own frame (the decoder
    implements the general reservoir pool; a nonzero-reservoir stream
    is exercised separately in tests via hand-packed frames)."""
    from .mp3 import _BITRATES, _RATES

    rate = _RATES[3][sr_idx]
    bitrate = _BITRATES[(0, 2)][br_idx] * 1000  # MPEG-1 LAYER III table
    joint = ms_stereo or intensity
    mode = 3 if channels == 1 else (1 if joint else 0)
    mode_ext = (2 if ms_stereo else 0) | (1 if intensity else 0)
    h = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
         | (br_idx << 12) | (sr_idx << 10) | (mode << 6) | (mode_ext << 4))
    fb = 144 * bitrate // rate
    side_len = 17 if channels == 1 else 32
    out = bytearray()
    for f in range(n_frames):
        scfsi = [list(scfsi_fn(c)) if scfsi_fn else [0, 0, 0, 0]
                 for c in range(channels)]
        w = _BitWriter()
        metas = []
        for gr in range(2):
            for c in range(channels):
                g = granule_fn(f, gr, c)
                if any(scfsi[c]) and g["block_type"] == 2:
                    raise ValueError("scfsi requires both granules long")
                p23 = _encode_granule(w, g, sr_idx, gr, scfsi[c])
                metas.append((gr, c, g, p23))
        main = w.flush()
        sw = _BitWriter()
        sw.put(0, 9)  # main_data_begin
        sw.put(0, 5 if channels == 1 else 3)
        for c in range(channels):
            for b in scfsi[c]:
                sw.put(b, 1)
        for gr, c, g, p23 in metas:
            sw.put(p23, 12)
            sw.put(len(g["lines"]) // 2, 9)
            sw.put(g["global_gain"], 8)
            sw.put(g["scalefac_compress"], 4)
            bt = g["block_type"]
            sw.put(1 if bt else 0, 1)
            if bt:
                sw.put(bt, 2)
                sw.put(1 if g.get("mixed_block_flag") else 0, 1)
                for t in g["table_select"][:2]:
                    sw.put(t, 5)
                for sbg in g["subblock_gain"]:
                    sw.put(sbg, 3)
            else:
                for t in g["table_select"]:
                    sw.put(t, 5)
                sw.put(g.get("region0_count", 7), 4)
                sw.put(g.get("region1_count", 5), 3)
            sw.put(g["preflag"], 1)
            sw.put(g["scalefac_scale"], 1)
            sw.put(g["count1table_select"], 1)
        side = sw.flush()
        if len(side) != side_len:
            raise AssertionError("side info size")
        frame = struct.pack(">I", h) + side + main
        if len(frame) > fb:
            raise ValueError(f"main data {len(main)} overflows frame {fb}")
        out += frame + bytes(fb - len(frame))
    return bytes(out)
