"""Hypothesis property tests for the round's new kernels — shrinkable
randomized referees on top of the hand-built known-answer tests:

- TIFF container round-trip over the full config grid;
- TIFF LZW encoder vs BOTH decoders (module + spec-pseudocode referee);
- WARC round-trip with adversarial payloads (separators inside payloads);
- HTML extraction invariants (plain text is the identity modulo
  whitespace collapse; output is stable under re-extraction);
- Z-order key bijectivity (the interleave is invertible);
- MP3 frame walk vs the published frame-size formula.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ohsome_planet_spark.functions.tiff import (
    _lzw_decode,
    _lzw_encode,
    decode_tiff,
    encode_tiff,
)
from ohsome_planet_spark.sources.warc import encode_warc, parse_warc
from ohsome_planet_spark.functions.html import html_to_text

SET = settings(max_examples=40, deadline=None)


@SET
@given(
    data=st.binary(min_size=0, max_size=4000),
)
def test_lzw_roundtrip_and_spec_referee(data):
    from tests.test_tiff import _spec_lzw_decode

    enc = _lzw_encode(data)
    assert _lzw_decode(enc) == data
    assert _spec_lzw_decode(enc) == data


@SET
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    ch_photo=st.sampled_from([(1, 1), (3, 2), (1, 0)]),
    comp=st.sampled_from([1, 32773, 5]),
    pred=st.sampled_from([1, 2]),
    be=st.booleans(),
    rps=st.integers(1, 9),
    data=st.data(),
)
def test_tiff_roundtrip(w, h, ch_photo, comp, pred, be, rps, data):
    ch, photo = ch_photo
    if comp != 5:
        pred = 1
    rows = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * ch, max_size=w * ch
                )
            )
        )
        for _ in range(h)
    ]
    t = encode_tiff(
        w, h, rows, channels=ch, compression=comp, big_endian=be,
        rows_per_strip=min(rps, h), predictor=pred, photometric=photo,
    )
    W, H, C, out = decode_tiff(t)
    assert (W, H, C) == (w, h, ch)
    want = [bytes(255 - b for b in r) for r in rows] if photo == 0 else rows
    assert out == want


@SET
@given(
    payloads=st.lists(st.binary(max_size=300), min_size=1, max_size=6),
    gz=st.booleans(),
)
def test_warc_roundtrip(payloads, gz):
    recs = [
        {"warc_type": "resource", "target_uri": f"http://t/{i}", "payload": p}
        for i, p in enumerate(payloads)
    ]
    out = parse_warc(encode_warc(recs, gzip_records=gz))
    assert [r["payload"] for r in out] == payloads
    assert [r["content_length"] for r in out] == [len(p) for p in payloads]


_WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=0, max_size=30
)


@SET
@given(words=_WORDS)
def test_html_plaintext_identity(words):
    text = " ".join(words)
    assert html_to_text(f"<p>{text}</p>") == text
    # idempotence: extracting already-extracted text changes nothing
    # (no tags remain, whitespace already collapsed)
    assert html_to_text(html_to_text(f"<div>{text}</div>")) == text


@SET
@given(
    a=st.integers(0, (1 << 16) - 1),
    b=st.integers(0, (1 << 16) - 1),
)
def test_zorder_bijective(a, b):
    from tests.test_zorder import _ref_interleave

    k = _ref_interleave([a, b], 16)
    # invert: collect even bits -> a, odd bits -> b
    ia = sum(((k >> (2 * i)) & 1) << i for i in range(16))
    ib = sum(((k >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (ia, ib) == (a, b)


@SET
@given(
    version=st.sampled_from([3, 2, 0]),
    layer=st.sampled_from([0, 1, 2]),
    sr_idx=st.integers(0, 2),
    channels=st.sampled_from([1, 2]),
    brs=st.lists(st.integers(1, 14), min_size=1, max_size=12),
    padpat=st.integers(0, 255),
)
def test_mp3_walk_matches_formula(version, layer, sr_idx, channels, brs, padpat):
    from ohsome_planet_spark.functions.mp3 import (
        _BITRATES,
        _RATES,
        encode_mp3,
        probe_mp3,
    )

    b = encode_mp3(version, layer, brs, sr_idx, channels=channels,
                   padding_pattern=padpat)
    r = probe_mp3(b)
    vg = 0 if version == 3 else 1
    rate = _RATES[version][sr_idx]
    total = 0
    for k, bi in enumerate(brs):
        br = _BITRATES[(vg, layer)][bi] * 1000
        pad = (padpat >> (k % 8)) & 1
        if layer == 0:
            total += (12 * br // rate + pad) * 4
        elif layer == 1 or vg == 0:
            total += 144 * br // rate + pad
        else:
            total += 72 * br // rate + pad
    assert r["n_frames"] == len(brs)
    assert r["total_frame_bytes"] == total
    assert r["sample_rate"] == rate and r["channels"] == channels


@SET
@given(
    bits=st.integers(2, 8),
    data=st.data(),
)
def test_hilbert_sql_matches_canonical(bits, data):
    import duckdb

    from ohsome_planet_spark.functions.zorder import hilbert_key_sql
    from tests.test_zorder import _xy2d

    n = 1 << bits
    pts = data.draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=1, max_size=20,
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    sql = hilbert_key_sql("SELECT a AS hx, b AS hy, a, b FROM pts", bits)
    rows = con.execute(f"SELECT a, b, hd FROM {sql}").fetchall()
    for a, b, hd in rows:
        assert hd == _xy2d(bits, a, b)


@SET
@given(
    ids_a=st.sets(st.integers(0, 10_000), min_size=1, max_size=300),
    ids_b=st.sets(st.integers(0, 10_000), min_size=1, max_size=300),
)
def test_kmv_merge_commutes_with_union(ids_a, ids_b):
    # pure-Python twin of the sketch invariant: k smallest of the union
    # equals the merge of per-side k smallest
    import hashlib

    k = 32

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    sk_a = sorted({h(i) for i in ids_a})[:k]
    sk_b = sorted({h(i) for i in ids_b})[:k]
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    truth = sorted({h(i) for i in ids_a | ids_b})[:k]
    assert merged == truth
