"""Grammar + semantics tests for the ohsome filter DSL compiler
(functions/ohsome_filter.py). Semantics under test are the published
ohsome filter docs: k!=v and k!=* match entities WITHOUT the key,
geometry classes cover Multi* variants, 'not' is null-safe, ranges are
inclusive with open ends."""

import pytest

from pyspark.sql import functions as F

from ohsome_planet_spark.functions.ohsome_filter import (
    FilterSchema,
    FilterSyntaxError,
    compile_filter,
    parse_filter,
)


@pytest.fixture(scope="module")
def feats(spark):
    rows = [
        # (osm_id, osm_type, tags, geometry_type, area, length)
        (1, "node", {"natural": "tree"}, "Point", None, None),
        (2, "node", {"amenity": "cafe", "name": "A"}, "Point", None, None),
        (3, "way", {"highway": "residential", "oneway": "yes"},
         "LineString", None, 120.5),
        (4, "way", {"highway": "primary"}, "LineString", None, 3000.0),
        (5, "way", {"building": "yes", "addr:street": "Main St"},
         "Polygon", 250.0, 60.0),
        (6, "way", {"building": "residential"}, "Polygon", 90.0, 40.0),
        (7, "relation", {"building": "yes", "type": "multipolygon"},
         "MultiPolygon", 5000.0, 300.0),
        (8, "relation", {"route": "bus"}, "GeometryCollection", None, None),
        (9, "way", {}, "LineString", None, 10.0),
        (10, "node", None, "Point", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "osm_id bigint, osm_type string, tags map<string,string>,"
        " geometry_type string, area double, length double",
    ).cache()


def ids(feats, flt):
    return sorted(
        r.osm_id for r in feats.filter(compile_filter(flt)).collect()
    )


def test_tag_eq(feats):
    assert ids(feats, "building=yes") == [5, 7]
    assert ids(feats, "highway=residential") == [3]


def test_tag_ne_matches_missing_key(feats):
    # published semantics: k!=v matches entities without the key too
    assert ids(feats, "building!=yes") == [1, 2, 3, 4, 6, 8, 9, 10]


def test_tag_exists_and_not_exists(feats):
    assert ids(feats, "building=*") == [5, 6, 7]
    assert ids(feats, "building!=*") == [1, 2, 3, 4, 8, 9, 10]


def test_tag_in(feats):
    assert ids(feats, "highway in (residential, primary)") == [3, 4]


def test_quoted_key_with_colon_and_space(feats):
    assert ids(feats, '"addr:street"="Main St"') == [5]


def test_unquoted_colon_key_stays_one_token(feats):
    # 'addr:street' has no reserved prefix, so it parses as one key
    assert ids(feats, "addr:street=*") == [5]


def test_type_and_geometry(feats):
    assert ids(feats, "type:relation") == [7, 8]
    assert ids(feats, "geometry:polygon") == [5, 6, 7]
    assert ids(feats, "geometry:point") == [1, 2, 10]
    assert ids(feats, "geometry:other") == [8]


def test_id_filters(feats):
    assert ids(feats, "id:5") == [5]
    assert ids(feats, "id:(1, 5, 8)") == [1, 5, 8]
    assert ids(feats, "id:way/5") == [5]
    assert ids(feats, "id:node/5") == []
    assert ids(feats, "id:(node/1, way/5)") == [1, 5]


def test_ranges(feats):
    assert ids(feats, "area:(100..6000)") == [5, 7]
    assert ids(feats, "area:(..100)") == [6]
    assert ids(feats, "length:(120.5..)") == [3, 4, 7]
    # bounds are inclusive
    assert ids(feats, "area:(250..250)") == [5]


def test_boolean_precedence_and_parens(feats):
    # and binds tighter than or
    assert ids(feats, "building=* and type:way or natural=tree") == [1, 5, 6]
    assert ids(feats, "building=* and (type:way or natural=tree)") == [5, 6]


def test_not_is_null_safe(feats):
    # row 10 has a NULL tags map; 'not oneway=yes' must still match it
    assert ids(feats, "not oneway=yes") == [1, 2, 4, 5, 6, 7, 8, 9, 10]
    assert ids(feats, "type:way and not highway=*") == [5, 6, 9]


def test_scientific_notation_range(feats):
    assert ids(feats, "area:(1E2..1E4)") == [5, 7]


def test_composite_realistic_filter(feats):
    got = ids(
        feats,
        "(building=* or highway in (residential, primary))"
        " and not oneway=yes and geometry:polygon",
    )
    assert got == [5, 6, 7]


def test_custom_schema(feats):
    renamed = feats.withColumnRenamed("tags", "t").withColumnRenamed(
        "osm_type", "kind"
    )
    pred = compile_filter(
        "building=* and type:way",
        FilterSchema(tags_col="t", type_col="kind"),
    )
    assert sorted(r.osm_id for r in renamed.filter(pred).collect()) == [5, 6]


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "building=",
        "building==yes",
        "building!",
        "and building=yes",
        "building=yes or",
        "type:city",
        "geometry:cube",
        "id:abc",
        "area:(..)",
        "area:(1..2",
        '"unterminated=yes',
        "building=yes extra",
        "key in (a, b",
    ],
)
def test_syntax_errors(bad):
    with pytest.raises(FilterSyntaxError):
        parse_filter(bad)


def test_predicate_is_native_column(feats):
    # whole plan stays JVM-side: no Python UDF in the filtered plan
    plan = feats.filter(
        compile_filter("building=* and area:(10..)")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
