"""Pure-math function tests: XZ curve, geodesic area/length, WKB codec."""

import math

import numpy as np
import pytest

from ohsome_planet_spark.functions import wkb
from ohsome_planet_spark.functions.geodesic import (
    EARTH_RADIUS_MEAN,
    line_length,
    polygon_area,
    ring_area,
)
from ohsome_planet_spark.functions.xz import G_DEFAULT, _n_elem, xz_codes


def xz_reference(xmin, ymin, xmax, ymax, g=16):
    """Direct scalar port of the Böhm et al. algorithm (oracle for the
    vectorized + closed-form implementations)."""
    xmin = (180.0 + xmin) / 360.0
    ymin = (90.0 + ymin) / 360.0
    xmax = (180.0 + xmax) / 360.0
    ymax = (90.0 + ymax) / 360.0
    ext = max(xmax - xmin, ymax - ymin)
    l1 = g if ext <= 0 else int(math.floor(math.log(ext) / math.log(0.5)))
    length = g
    if l1 < g:
        length = l1 + 1
        w2 = 0.5**length

        def pred(mn, mx):
            return mx <= (math.floor(mn / w2) * w2) + 2 * w2

        if not (pred(xmin, xmax) and pred(ymin, ymax)):
            length = l1
    n_elem = _n_elem(g)
    cs = 0
    cur = [0.0, 1.0, 0.0, 1.0]
    for i in range(length):
        q = 0
        xc = cur[0] + (cur[1] - cur[0]) / 2
        if xmin >= xc:
            q += 1
            cur[0] = xc
        else:
            cur[1] = xc
        yc = cur[2] + (cur[3] - cur[2]) / 2
        if ymin >= yc:
            q += 2
            cur[2] = yc
        else:
            cur[3] = yc
        cs += q * n_elem[i] + 1
    return length, cs


BOXES = [
    (8.0, 49.0, 8.0, 49.0),  # point
    (8.0, 49.0, 8.4, 49.2),
    (-180.0, -90.0, 180.0, 90.0),  # world
    (179.9, 89.9, 180.0, 90.0),  # corner cell (x -> 1.0 clamp path)
    (-0.001, -0.001, 0.001, 0.001),
    (13.3, 52.4, 13.6, 52.6),
    (-122.52, 37.70, -122.35, 37.84),
]


def test_xz_vectorized_matches_scalar_walk():
    xs = np.array([b[0] for b in BOXES])
    ys = np.array([b[1] for b in BOXES])
    xm = np.array([b[2] for b in BOXES])
    ym = np.array([b[3] for b in BOXES])
    levels, codes = xz_codes(xs, ys, xm, ym)
    for i, b in enumerate(BOXES):
        lvl, code = xz_reference(*b)
        assert (levels[i], codes[i]) == (lvl, code), b


def test_xz_spark_expr_matches_numpy(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.xz import xz_code_expr, xz_level_expr

    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d)) for a, b, c, d in BOXES],
        "xmin double, ymin double, xmax double, ymax double",
    )
    rows = df.select(
        xz_level_expr(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")).alias("lvl"),
        xz_code_expr(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")).alias("code"),
    ).collect()
    for row, b in zip(rows, BOXES):
        lvl, code = xz_reference(*b)
        assert (row.lvl, row.code) == (lvl, code), b


def test_equator_degree_length():
    # one degree of longitude at the equator ≈ 111.19 km (mean radius)
    L = line_length(np.array([0.0, 1.0]), np.array([0.0, 0.0]))
    assert L == pytest.approx(EARTH_RADIUS_MEAN * math.pi / 180, rel=1e-9)


def test_small_square_area_roughly_correct():
    # ~1km x 1km square near the equator
    d = 0.009  # ≈ 1km
    ring = (
        np.array([0.0, d, d, 0.0, 0.0]),
        np.array([0.0, 0.0, d, d, 0.0]),
    )
    area = abs(ring_area(*ring))
    assert area == pytest.approx(1.0e6, rel=0.01)


def test_polygon_area_with_hole_clamped():
    outer = (np.array([0.0, 1.0, 1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0, 1.0, 0.0]))
    inner = (
        np.array([0.2, 0.8, 0.8, 0.2, 0.2]),
        np.array([0.2, 0.2, 0.8, 0.8, 0.2]),
    )
    a_outer = polygon_area([outer])
    a_with_hole = polygon_area([outer, inner])
    assert 0 < a_with_hole < a_outer
    # inner larger than outer -> clamped to 0
    assert polygon_area([inner, outer]) == 0.0


def test_wkb_roundtrip_all_types():
    geoms = [
        {"type": "Point", "coords": (8.0, 49.0)},
        {"type": "LineString", "coords": [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]},
        {
            "type": "Polygon",
            "coords": [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)],
            ],
        },
        {
            "type": "MultiPolygon",
            "coords": [
                [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
                [[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]],
            ],
        },
        {
            "type": "GeometryCollection",
            "coords": [
                {"type": "Point", "coords": (1.0, 2.0)},
                {"type": "LineString", "coords": [(0.0, 0.0), (1.0, 1.0)]},
            ],
        },
    ]
    for g in geoms:
        buf = wkb.encode(g)
        assert buf[0] == 0  # big-endian, JTS default
        assert wkb.decode(buf) == g


def test_centroid_semantics():
    # point
    assert wkb.centroid({"type": "Point", "coords": (3.0, 4.0)}) == (3.0, 4.0)
    # line: length-weighted
    cx, cy = wkb.centroid({"type": "LineString", "coords": [(0.0, 0.0), (2.0, 0.0)]})
    assert (cx, cy) == (1.0, 0.0)
    # square polygon centroid
    cx, cy = wkb.centroid(
        {"type": "Polygon", "coords": [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]}
    )
    assert (cx, cy) == pytest.approx((1.0, 1.0))
    # polygon with hole: centroid shifts away from the hole
    cx, _ = wkb.centroid(
        {
            "type": "Polygon",
            "coords": [
                [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                [(2.5, 1.5), (3.5, 1.5), (3.5, 2.5), (2.5, 2.5), (2.5, 1.5)],
            ],
        }
    )
    assert cx < 2.0
    # mixed collection: areal component wins
    cx, cy = wkb.centroid(
        {
            "type": "GeometryCollection",
            "coords": [
                {"type": "Point", "coords": (100.0, 100.0)},
                {
                    "type": "Polygon",
                    "coords": [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]],
                },
            ],
        }
    )
    assert (cx, cy) == pytest.approx((1.0, 1.0))


def test_xz_property_random_boxes():
    """Property test: vectorized implementation == scalar Böhm walk on
    randomized bboxes (including degenerate points and world-spanning)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
    lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)

    @settings(max_examples=200, deadline=None)
    @given(x1=coord, x2=coord, y1=lat, y2=lat)
    def check(x1, x2, y1, y2):
        xmin, xmax = min(x1, x2), max(x1, x2)
        ymin, ymax = min(y1, y2), max(y1, y2)
        levels, codes = xz_codes(
            np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax])
        )
        lvl, code = xz_reference(xmin, ymin, xmax, ymax)
        assert (levels[0], codes[0]) == (lvl, code)
        assert 0 <= levels[0] <= G_DEFAULT

    check()


def test_geodesic_properties():
    """Symmetry + triangle-ish sanity for the segment formula."""
    import itertools

    pts = [(0.0, 0.0), (10.0, 20.0), (-120.0, 45.0), (179.0, -60.0)]
    for (x1, y1), (x2, y2) in itertools.combinations(pts, 2):
        d_ab = line_length(np.array([x1, x2]), np.array([y1, y2]))
        d_ba = line_length(np.array([x2, x1]), np.array([y2, y1]))
        assert d_ab == pytest.approx(d_ba, rel=1e-12)
        assert d_ab > 0


def test_polygon_feature_rules():
    """Port of ConributionGeometryTest.testPolygonFeatureLoading."""
    from ohsome_planet_spark.functions.polygon_features import test_polygon_feature

    assert test_polygon_feature("building", "yes")
    assert test_polygon_feature("natural", "meadow")
    assert test_polygon_feature("waterway", "dock")
    assert not test_polygon_feature("surface", "asphalt")
    assert not test_polygon_feature("highway", "primary")
    assert not test_polygon_feature("natural", "coastline")


def test_decode_flat_batch_matches_rowwise():
    """Differential: the Arrow-batch flat WKB decoder must produce the same
    parts (kind + coords), bboxes, and edge counts as the recursive per-row
    decoder, over every geometry type incl. nulls and empties."""
    import random

    random.seed(11)
    rng = np.random.default_rng(11)

    def ring(npts=None):
        npts = npts or random.randint(3, 8)
        pts = [(float(x), float(y)) for x, y in rng.uniform(-85, 85, (npts, 2))]
        return pts + [pts[0]]

    def rnd(depth=0):
        kinds = ["Point", "LineString", "Polygon", "MultiPoint", "MultiLineString", "MultiPolygon"]
        if depth == 0:
            kinds.append("GeometryCollection")
        t = random.choice(kinds)
        if t == "Point":
            return {"type": t, "coords": (float(rng.uniform(-180, 180)), float(rng.uniform(-85, 85)))}
        if t == "LineString":
            return {"type": t, "coords": [(float(x), float(y)) for x, y in rng.uniform(-90, 90, (random.randint(2, 6), 2))]}
        if t == "Polygon":
            return {"type": t, "coords": [ring() for _ in range(random.randint(1, 3))]}
        if t == "MultiPoint":
            return {"type": t, "coords": [(float(x), float(y)) for x, y in rng.uniform(-90, 90, (random.randint(1, 4), 2))]}
        if t == "MultiLineString":
            return {"type": t, "coords": [[(float(x), float(y)) for x, y in rng.uniform(-90, 90, (random.randint(2, 5), 2))] for _ in range(random.randint(1, 3))]}
        if t == "MultiPolygon":
            return {"type": t, "coords": [[ring() for _ in range(random.randint(1, 2))] for _ in range(random.randint(1, 3))]}
        return {"type": t, "coords": [rnd(1) for _ in range(random.randint(1, 3))]}

    geoms = [rnd() for _ in range(200)]
    bufs = [wkb.encode(g) for g in geoms]
    bufs[3], geoms[3] = None, None
    bufs[9], geoms[9] = b"", None

    batch = wkb.decode_flat_batch(bufs)
    assert batch.n == len(bufs)
    for i, g in enumerate(geoms):
        ref = sorted((k, a.tobytes()) for k, a in wkb._geom_polylines(g))
        got = []
        for p in np.nonzero(batch.part_row == i)[0]:
            s, e = batch.part_off[p], batch.part_off[p + 1]
            got.append((int(batch.part_kind[p]), np.column_stack([batch.vx[s:e], batch.vy[s:e]]).tobytes()))
        assert sorted(got) == ref, f"row {i}"
        if g is None:
            assert batch.empty[i] and np.isnan(batch.row_bbox[i]).all()
        else:
            xs, ys = wkb._all_coords(g)
            assert np.allclose(batch.row_bbox[i], [xs.min(), ys.min(), xs.max(), ys.max()])

    ex1, _, _, _, erow = batch.edges()
    want = int(sum(max(0, int(batch.part_off[p + 1] - batch.part_off[p]) - 1) for p in range(len(batch.part_row))))
    assert len(ex1) == want and len(erow) == want


def test_decode_flat_batch_little_endian():
    """Mixed byte orders in one batch decode correctly."""
    import struct

    le_pt = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 3.5, -7.25)
    le_ls = (
        b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 2) + struct.pack("<dddd", 0.0, 1.0, 2.0, 3.0)
    )
    be_pt = wkb.encode({"type": "Point", "coords": (1.0, 2.0)})
    batch = wkb.decode_flat_batch([le_pt, be_pt, le_ls])
    assert not batch.empty.any()
    assert np.allclose(batch.row_bbox[0], [3.5, -7.25, 3.5, -7.25])
    assert np.allclose(batch.row_bbox[1], [1.0, 2.0, 1.0, 2.0])
    assert np.allclose(batch.row_bbox[2], [0.0, 1.0, 2.0, 3.0])


def test_repetition_and_pii_exprs(spark):
    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import (
        PII_PATTERNS,
        dup_token_fraction_expr,
        ngrams_expr,
        pii_count_expr,
        redact_pii_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat"),
            (2, "one two"),
            (3, ""),
            (4, "mail a.b+c@ex-a.co ip 10.0.12.7 call 555-0142 not 55-0142"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            ngrams_expr(F.col("text"), 2).alias("ng"),
            F.round(dup_token_fraction_expr(F.col("text")), 6).alias("dup"),
            redact_pii_expr(F.col("text")).alias("red"),
            *[
                pii_count_expr(F.col("text"), pat).alias(f"n{i}")
                for i, (pat, _) in enumerate(PII_PATTERNS)
            ],
        ).collect()
    }
    assert rows[1]["ng"][:3] == ["the cat", "cat sat", "sat on"]
    assert len(rows[1]["ng"]) == 8
    assert rows[1]["dup"] == round(1 - 5 / 9, 6)
    # empty text: no n-grams, zero dup fraction (guarded denominator)
    assert rows[3]["ng"] == [] and rows[3]["dup"] == 0.0
    assert rows[2]["ng"] == ["one two"]
    assert (
        rows[4]["red"] == "mail <EMAIL> ip <IP> call <PHONE> not 55-0142"
    )
    assert (rows[4]["n0"], rows[4]["n1"], rows[4]["n2"]) == (1, 1, 1)
    # clean text passes through untouched
    assert rows[1]["red"] == rows[1]["text"] if "text" in rows[1] else True


def test_ngram_dup_properties(spark):
    """Property check (one Spark job for all cases): n-gram count is
    max(0, n_tokens - n + 1), dup fraction stays in [0, 1] and is 0 iff
    all tokens are distinct."""
    import random

    from pyspark.sql import functions as F

    from ohsome_planet_spark.functions.text import (
        dup_token_fraction_expr,
        ngrams_expr,
        token_count_expr,
    )

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "Y_2", "zz"]
    texts = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(64)
    ]
    df = spark.createDataFrame(texts, "i int, text string")
    rows = df.select(
        "i",
        token_count_expr(F.col("text")).alias("n_tok"),
        F.size(ngrams_expr(F.col("text"), 3)).alias("n_3g"),
        dup_token_fraction_expr(F.col("text")).alias("dup"),
        F.size(F.array_distinct(
            F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
        )).alias("n_dist"),
    ).collect()
    for r in rows:
        assert r["n_3g"] == max(0, r["n_tok"] - 2)
        assert 0.0 <= r["dup"] <= 1.0
        if r["n_tok"] > 0:
            assert (r["dup"] == 0.0) == (r["n_dist"] == r["n_tok"])
