"""Property-based tests for the ohsome filter DSL.

1. Round-trip: parse(unparse(ast)) == ast for random ASTs (hypothesis).
2. Differential semantics: the compiled Catalyst predicate agrees with an
   INDEPENDENT Python evaluator of the documented semantics — Kleene
   three-valued logic, k!=v/k!=* matching missing keys, null-safe not —
   over random filters applied to a fixture of adversarial rows (null
   tags map, null geometry, null area).
"""

import random

import pytest
from hypothesis import given, settings, strategies as st

from ohsome_planet_spark.functions import ohsome_filter as of
from ohsome_planet_spark.functions.ohsome_filter import (
    compile_filter,
    parse_filter,
    unparse_filter,
)

KEYS = [
    "highway",
    "building",
    "name",
    "addr:street",
    "weird key",
    "type",
    'quo"ted',
    "back\\slash",
]
VALUES = [
    "residential",
    "primary",
    "yes",
    "no",
    "Main St",
    "multipolygon",
    "",
    "and",          # keyword as a value -> must be quoted by unparse
    "type:route",   # reserved-prefix value -> must be quoted
    'say "hi"',
    "a\\b",
    "1..2",         # range-lookalike -> must be quoted
]
GEOMS = ["Point", "LineString", "Polygon", "MultiPolygon", "GeometryCollection"]

keys = st.sampled_from(KEYS)
values = st.sampled_from(VALUES)


@st.composite
def leaves(draw):
    kind = draw(
        st.sampled_from(
            ["eq", "ne", "ex", "nex", "in", "type", "geom", "id", "range"]
        )
    )
    if kind == "eq":
        return of._TagEq(draw(keys), draw(values))
    if kind == "ne":
        return of._TagNe(draw(keys), draw(values))
    if kind == "ex":
        return of._TagExists(draw(keys))
    if kind == "nex":
        return of._TagNotExists(draw(keys))
    if kind == "in":
        vals = draw(st.lists(values, min_size=1, max_size=3, unique=True))
        return of._TagIn(draw(keys), tuple(vals))
    if kind == "type":
        return of._TypeIs(draw(st.sampled_from(["node", "way", "relation"])))
    if kind == "geom":
        return of._GeomIs(
            draw(st.sampled_from(["point", "line", "polygon", "other"]))
        )
    if kind == "id":
        items = draw(
            st.lists(
                st.tuples(
                    st.sampled_from([None, "node", "way", "relation"]),
                    st.integers(min_value=1, max_value=20),
                ),
                min_size=1,
                max_size=3,
            )
        )
        return of._IdIn(tuple(items))
    lo = draw(st.sampled_from([None, 0.0, 10.0, 99.5, 250.0]))
    hi = draw(st.sampled_from([None, 50.0, 250.0, 1e4]))
    if lo is None and hi is None:
        hi = 250.0
    return of._Range(draw(st.sampled_from(["area", "length"])), lo, hi)


asts = st.recursive(
    leaves(),
    lambda children: st.one_of(
        st.builds(lambda a: of._Not(a), children),
        st.builds(
            lambda items: of._And(tuple(items)),
            st.lists(children, min_size=2, max_size=3),
        ),
        st.builds(
            lambda items: of._Or(tuple(items)),
            st.lists(children, min_size=2, max_size=3),
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=300, deadline=None)
@given(asts)
def test_unparse_parse_roundtrip(ast):
    assert parse_filter(unparse_filter(ast)) == ast


# --- independent reference evaluator (Kleene three-valued logic) -------------


def _ev(node, row):
    """Returns True / False / None, mirroring SQL null semantics."""
    tags = row["tags"]

    def get(k):
        if tags is None:
            return None
        return tags.get(k)

    if isinstance(node, of._Or):
        vals = [_ev(i, row) for i in node.items]
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False
    if isinstance(node, of._And):
        vals = [_ev(i, row) for i in node.items]
        if any(v is False for v in vals):
            return False
        if any(v is None for v in vals):
            return None
        return True
    if isinstance(node, of._Not):
        inner = _ev(node.item, row)
        return not (inner is True)  # not(coalesce(inner, false))
    if isinstance(node, of._TagEq):
        v = get(node.key)
        return None if v is None else v == node.value
    if isinstance(node, of._TagNe):
        v = get(node.key)
        return True if v is None else v != node.value
    if isinstance(node, of._TagExists):
        return get(node.key) is not None
    if isinstance(node, of._TagNotExists):
        return get(node.key) is None
    if isinstance(node, of._TagIn):
        v = get(node.key)
        return None if v is None else v in node.values
    if isinstance(node, of._TypeIs):
        t = row["osm_type"]
        return None if t is None else t == node.osm_type
    if isinstance(node, of._GeomIs):
        g = row["geometry_type"]
        if node.geom_class == "other":
            if g is None:
                return False
            excluded = [t for c in of._GEOM_CLASSES.values() for t in c]
            return g not in excluded
        return None if g is None else g in of._GEOM_CLASSES[node.geom_class]
    if isinstance(node, of._IdIn):
        oid, typ = row["osm_id"], row["osm_type"]
        plain = [i for t, i in node.items if t is None]
        # Kleene OR over the per-item results
        vals = []
        if plain:
            vals.append(oid in plain)
        for t, i in node.items:
            if t is not None:
                vals.append(
                    None if typ is None else (typ == t and oid == i)
                )
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False
    if isinstance(node, of._Range):
        col = "area" if node.field == "area" else "length"
        v = row[col]
        if v is None:
            return None
        if node.lo is not None and node.hi is not None:
            return node.lo <= v <= node.hi
        if node.lo is not None:
            return v >= node.lo
        return v <= node.hi
    raise AssertionError(node)


def _random_rows(rng, n=120):
    rows = []
    for i in range(n):
        tags = None
        if rng.random() > 0.15:
            tags = {
                k: rng.choice(VALUES)
                for k in KEYS
                if rng.random() < 0.4
            }
        rows.append(
            dict(
                osm_id=rng.randint(1, 20),
                osm_type=rng.choice(["node", "way", "relation", None]),
                tags=tags,
                geometry_type=rng.choice(GEOMS + [None]),
                area=rng.choice([None, 5.0, 99.5, 250.0, 8000.0]),
                length=rng.choice([None, 0.0, 49.9, 250.0]),
            )
        )
    return rows


def test_compiled_predicate_matches_reference_evaluator(spark):
    rng = random.Random(1234)
    rows = _random_rows(rng)
    df = spark.createDataFrame(
        [
            (
                i,
                r["osm_id"],
                r["osm_type"],
                r["tags"],
                r["geometry_type"],
                r["area"],
                r["length"],
            )
            for i, r in enumerate(rows)
        ],
        "row_id bigint, osm_id bigint, osm_type string,"
        " tags map<string,string>, geometry_type string,"
        " area double, length double",
    ).cache()
    df.count()

    # fixed seeds → reproducible failures
    for seed in range(40):
        ast = _random_ast(random.Random(seed), depth=3)
        src = unparse_filter(ast)
        got = sorted(
            r.row_id for r in df.filter(compile_filter(src)).collect()
        )
        want = sorted(
            i for i, r in enumerate(rows) if _ev(ast, r) is True
        )
        assert got == want, f"seed={seed} filter={src!r}"


def _random_ast(rng, depth):
    if depth == 0 or rng.random() < 0.35:
        kind = rng.choice(
            ["eq", "ne", "ex", "nex", "in", "type", "geom", "id", "range"]
        )
        k = rng.choice(KEYS)
        if kind == "eq":
            return of._TagEq(k, rng.choice(VALUES))
        if kind == "ne":
            return of._TagNe(k, rng.choice(VALUES))
        if kind == "ex":
            return of._TagExists(k)
        if kind == "nex":
            return of._TagNotExists(k)
        if kind == "in":
            return of._TagIn(
                k, tuple(rng.sample(VALUES, rng.randint(1, 3)))
            )
        if kind == "type":
            return of._TypeIs(rng.choice(["node", "way", "relation"]))
        if kind == "geom":
            return of._GeomIs(
                rng.choice(["point", "line", "polygon", "other"])
            )
        if kind == "id":
            items = tuple(
                (
                    rng.choice([None, "node", "way", "relation"]),
                    rng.randint(1, 20),
                )
                for _ in range(rng.randint(1, 3))
            )
            return of._IdIn(items)
        lo = rng.choice([None, 0.0, 10.0, 99.5, 250.0])
        hi = rng.choice([None, 50.0, 250.0, 1e4])
        if lo is None and hi is None:
            hi = 250.0
        return of._Range(rng.choice(["area", "length"]), lo, hi)
    op = rng.choice(["not", "and", "or"])
    if op == "not":
        return of._Not(_random_ast(rng, depth - 1))
    items = tuple(
        _random_ast(rng, depth - 1) for _ in range(rng.randint(2, 3))
    )
    return of._And(items) if op == "and" else of._Or(items)
