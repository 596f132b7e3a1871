"""Public ohsome filter DSL compiled to a native Spark Column predicate.

The ohsome ecosystem's query language (docs.ohsome.org: the ``filter``
parameter of the ohsome API, implemented by HeiGIT's public ``ohsome-filter``
grammar) is what users of the reference's output actually write:

    type:way and (building=* or "addr:housenumber"=*)
    highway in (residential, primary) and not oneway=yes
    geometry:polygon and area:(1E2..1E6)

The reference repo produces the contribution tables this language is run
against but ships no evaluator (filtering happens downstream in the ohsome
API); here the DSL compiles straight to a Catalyst predicate over the
contribution schema, so filters push down into parquet scans like any
hand-written ``F.col`` expression.

Grammar (subset of the public spec, covering its documented operators)::

    expr     := term (OR term)*
    term     := factor (AND factor)*
    factor   := NOT factor | '(' expr ')' | primitive
    primitive:= tag-filter | meta-filter
    tag      := key '=' value | key '!=' value
              | key '=' '*'   | key '!=' '*'
              | key IN '(' value (',' value)* ')'
    meta     := 'type' ':' (node|way|relation)
              | 'geometry' ':' (point|line|polygon|other)
              | 'id' ':' int | 'id' ':' type '/' int
              | 'id' ':' '(' id (',' id)* ')'
              | ('area'|'length') ':' '(' num? '..' num? ')'

Keys/values with whitespace or reserved characters use double quotes.
Semantics follow the published docs: ``k!=v`` matches entities WITHOUT the
key as well as those with a different value; ``k!=*`` matches entities
without the key; ``geometry:polygon`` covers Polygon and MultiPolygon;
range bounds are inclusive and either end may be omitted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterSyntaxError(ValueError):
    """Raised when a filter string does not conform to the grammar."""


@dataclass(frozen=True)
class FilterSchema:
    """Column names the compiled predicate reads.

    Defaults match the contribution tables written by this engine
    (``operators/contributions.py``). Geometry/area/length columns are
    only required if the filter uses the corresponding meta-filters.
    """

    tags_col: str = "tags"
    type_col: str = "osm_type"
    id_col: str = "osm_id"
    geometry_col: str = "geometry_type"
    area_col: str = "area"
    length_col: str = "length"
    changeset_col: str = "changeset"
    # the contribution schema carries no perimeter column; a schema that
    # does can set this — otherwise perimeter:(..) fails at compile time
    # with a clear error instead of a downstream AnalysisException
    perimeter_col: str | None = None


_OSM_TYPES = ("node", "way", "relation")
_GEOM_CLASSES = {
    "point": ("Point", "MultiPoint"),
    "line": ("LineString", "MultiLineString"),
    "polygon": ("Polygon", "MultiPolygon"),
}
_RANGE_FIELDS = ("area", "length", "perimeter", "changeset")
_META_KEYWORDS = ("type", "geometry", "id") + _RANGE_FIELDS

# --- tokenizer ---------------------------------------------------------------

_PUNCT = {"(": "LPAR", ")": "RPAR", ",": "COMMA", "*": "STAR", "/": "SLASH"}
_WORD_EXTRA = set("_-:.")  # chars allowed inside a bare (unquoted) word


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c in _PUNCT:
            toks.append((_PUNCT[c], c))
            i += 1
            continue
        if c == "=":
            toks.append(("EQ", "="))
            i += 1
            continue
        if c == "!":
            if i + 1 < n and src[i + 1] == "=":
                toks.append(("NE", "!="))
                i += 2
                continue
            raise FilterSyntaxError(f"stray '!' at offset {i}")
        if c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    j += 1
                buf.append(src[j])
                j += 1
            if j >= n:
                raise FilterSyntaxError("unterminated quoted string")
            toks.append(("QUOTED", "".join(buf)))
            i = j + 1
            continue
        if c.isalnum() or c in _WORD_EXTRA:
            j = i
            while j < n and (src[j].isalnum() or src[j] in _WORD_EXTRA):
                j += 1
            word = src[i:j]
            # '..' belongs to range syntax, not to a word like '1E2..1E6';
            # a bare word never legitimately contains '..'
            if ".." in word:
                head, _, _tail = word.partition("..")
                if head:
                    toks.append(("WORD", head))
                toks.append(("DOTDOT", ".."))
                rest = word[word.index("..") + 2 :]
                if rest:
                    toks.append(("WORD", rest))
                i = j
                continue
            # meta-filter keyword followed by ':' — split 'type:way' into
            # WORD(type) COLON WORD(way); other colons stay inside the key
            # ('addr:street' is one token, per the published grammar)
            low = word.lower()
            split = None
            for kw in _META_KEYWORDS:
                if low.startswith(kw + ":"):
                    split = kw
                    break
            if split is not None:
                toks.append(("WORD", word[: len(split)]))
                toks.append(("COLON", ":"))
                rest = word[len(split) + 1 :]
                if rest:
                    toks.append(("WORD", rest))
                i = j
                continue
            toks.append(("WORD", word))
            i = j
            continue
        raise FilterSyntaxError(f"unexpected character {c!r} at offset {i}")
    toks.append(("EOF", ""))
    return toks


# --- AST ---------------------------------------------------------------------


@dataclass(frozen=True)
class _Node:
    pass


@dataclass(frozen=True)
class _Or(_Node):
    items: tuple
# ("a" OR "b" OR ...) flattened


@dataclass(frozen=True)
class _And(_Node):
    items: tuple


@dataclass(frozen=True)
class _Not(_Node):
    item: _Node


@dataclass(frozen=True)
class _TagEq(_Node):
    key: str
    value: str


@dataclass(frozen=True)
class _TagNe(_Node):
    key: str
    value: str


@dataclass(frozen=True)
class _TagExists(_Node):
    key: str


@dataclass(frozen=True)
class _TagNotExists(_Node):
    key: str


@dataclass(frozen=True)
class _TagIn(_Node):
    key: str
    values: tuple


@dataclass(frozen=True)
class _TypeIs(_Node):
    osm_type: str


@dataclass(frozen=True)
class _GeomIs(_Node):
    geom_class: str


@dataclass(frozen=True)
class _IdIn(_Node):
    # items: tuple of (osm_type | None, id)
    items: tuple


@dataclass(frozen=True)
class _Range(_Node):
    field: str
    lo: float | None
    hi: float | None


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise FilterSyntaxError(f"expected {kind}, got {k} {v!r}")
        return v

    # expr := term (OR term)*
    def expr(self) -> _Node:
        items = [self.term()]
        while self._keyword("or"):
            items.append(self.term())
        return items[0] if len(items) == 1 else _Or(tuple(items))

    def term(self) -> _Node:
        items = [self.factor()]
        while self._keyword("and"):
            items.append(self.factor())
        return items[0] if len(items) == 1 else _And(tuple(items))

    def factor(self) -> _Node:
        if self._keyword("not"):
            return _Not(self.factor())
        k, _ = self.peek()
        if k == "LPAR":
            self.next()
            node = self.expr()
            self.expect("RPAR")
            return node
        return self.primitive()

    def _keyword(self, word: str) -> bool:
        k, v = self.peek()
        if k == "WORD" and v.lower() == word:
            self.next()
            return True
        return False

    def primitive(self) -> _Node:
        k, key = self.next()
        if k not in ("WORD", "QUOTED"):
            raise FilterSyntaxError(f"expected a key, got {k} {key!r}")
        nk, _nv = self.peek()
        if k == "WORD" and nk == "COLON":
            return self._meta(key.lower())
        if nk == "EQ":
            self.next()
            vk, vv = self.next()
            if vk == "STAR":
                return _TagExists(key)
            if vk in ("WORD", "QUOTED"):
                return _TagEq(key, vv)
            raise FilterSyntaxError(f"expected value after '=', got {vk}")
        if nk == "NE":
            self.next()
            vk, vv = self.next()
            if vk == "STAR":
                return _TagNotExists(key)
            if vk in ("WORD", "QUOTED"):
                return _TagNe(key, vv)
            raise FilterSyntaxError(f"expected value after '!=', got {vk}")
        if nk == "WORD" and _nv.lower() == "in":
            self.next()
            self.expect("LPAR")
            vals = [self._value()]
            while self.peek()[0] == "COMMA":
                self.next()
                vals.append(self._value())
            self.expect("RPAR")
            return _TagIn(key, tuple(vals))
        raise FilterSyntaxError(
            f"expected '=', '!=', 'in' or ':' after {key!r}, got {nk}"
        )

    def _value(self) -> str:
        vk, vv = self.next()
        if vk not in ("WORD", "QUOTED"):
            raise FilterSyntaxError(f"expected a value, got {vk} {vv!r}")
        return vv

    def _meta(self, kw: str) -> _Node:
        self.expect("COLON")
        if kw == "type":
            v = self.expect("WORD").lower()
            if v not in _OSM_TYPES:
                raise FilterSyntaxError(f"unknown osm type {v!r}")
            return _TypeIs(v)
        if kw == "geometry":
            v = self.expect("WORD").lower()
            if v not in ("point", "line", "polygon", "other"):
                raise FilterSyntaxError(f"unknown geometry class {v!r}")
            return _GeomIs(v)
        if kw == "id":
            return self._id_filter()
        if kw in _RANGE_FIELDS:
            return self._range_filter(kw)
        raise FilterSyntaxError(f"unknown meta filter {kw!r}")

    def _id_item(self) -> tuple:
        k, v = self.next()
        if k != "WORD":
            raise FilterSyntaxError(f"expected an id, got {k} {v!r}")
        if v.lower() in _OSM_TYPES:
            self.expect("SLASH")
            num = self.expect("WORD")
            return (v.lower(), self._int(num))
        return (None, self._int(v))

    def _id_filter(self) -> _Node:
        if self.peek()[0] == "LPAR":
            self.next()
            items = [self._id_item()]
            while self.peek()[0] == "COMMA":
                self.next()
                items.append(self._id_item())
            self.expect("RPAR")
            return _IdIn(tuple(items))
        return _IdIn((self._id_item(),))

    @staticmethod
    def _int(s: str) -> int:
        try:
            return int(s)
        except ValueError:
            raise FilterSyntaxError(f"expected an integer id, got {s!r}")

    @staticmethod
    def _num(s: str) -> float:
        try:
            return float(s)
        except ValueError:
            raise FilterSyntaxError(f"expected a number, got {s!r}")

    def _range_filter(self, field: str) -> _Node:
        self.expect("LPAR")
        lo = hi = None
        if self.peek()[0] == "WORD":
            lo = self._num(self.next()[1])
        self.expect("DOTDOT")
        if self.peek()[0] == "WORD":
            hi = self._num(self.next()[1])
        self.expect("RPAR")
        if lo is None and hi is None:
            raise FilterSyntaxError(f"{field}:(..) needs at least one bound")
        return _Range(field, lo, hi)


def parse_filter(src: str) -> _Node:
    """Parse an ohsome filter string into its AST (raises
    FilterSyntaxError on malformed input)."""
    p = _Parser(_tokenize(src))
    node = p.expr()
    if p.peek()[0] != "EOF":
        k, v = p.peek()
        raise FilterSyntaxError(f"trailing input at {k} {v!r}")
    return node


# --- compiler ----------------------------------------------------------------


def _compile(node: _Node, s: FilterSchema) -> Column:
    tags = F.col(s.tags_col)
    if isinstance(node, _Or):
        out = _compile(node.items[0], s)
        for it in node.items[1:]:
            out = out | _compile(it, s)
        return out
    if isinstance(node, _And):
        out = _compile(node.items[0], s)
        for it in node.items[1:]:
            out = out & _compile(it, s)
        return out
    if isinstance(node, _Not):
        # three-valued logic guard: inner NULL (e.g. null tags map) must
        # read as 'does not match', so NOT(match) stays true
        return ~F.coalesce(_compile(node.item, s), F.lit(False))
    if isinstance(node, _TagEq):
        return tags.getItem(node.key) == node.value
    if isinstance(node, _TagNe):
        # matches entities WITHOUT the key too (published semantics)
        return (
            tags.getItem(node.key).isNull()
            | (tags.getItem(node.key) != node.value)
        )
    if isinstance(node, _TagExists):
        return tags.getItem(node.key).isNotNull()
    if isinstance(node, _TagNotExists):
        return tags.getItem(node.key).isNull()
    if isinstance(node, _TagIn):
        return tags.getItem(node.key).isin(*node.values)
    if isinstance(node, _TypeIs):
        return F.col(s.type_col) == node.osm_type
    if isinstance(node, _GeomIs):
        g = F.col(s.geometry_col)
        if node.geom_class == "other":
            excluded = [t for c in _GEOM_CLASSES.values() for t in c]
            return g.isNotNull() & ~g.isin(*excluded)
        return g.isin(*_GEOM_CLASSES[node.geom_class])
    if isinstance(node, _IdIn):
        plain = [i for t, i in node.items if t is None]
        out = None
        if plain:
            out = F.col(s.id_col).isin(*plain)
        for t, i in node.items:
            if t is None:
                continue
            c = (F.col(s.type_col) == t) & (F.col(s.id_col) == i)
            out = c if out is None else (out | c)
        return out
    if isinstance(node, _Range):
        col = {
            "area": s.area_col,
            "length": s.length_col,
            "changeset": s.changeset_col,
            "perimeter": s.perimeter_col,
        }.get(node.field, node.field)
        if col is None:
            raise FilterSyntaxError(
                f"{node.field}:(..) range filter: the target schema has no"
                f" column configured for '{node.field}' (set"
                f" FilterSchema.{node.field}_col)"
            )
        c = F.col(col)
        if node.lo is not None and node.hi is not None:
            return (c >= node.lo) & (c <= node.hi)
        if node.lo is not None:
            return c >= node.lo
        return c <= node.hi
    raise AssertionError(f"unhandled node {node!r}")


def _quote(word: str) -> str:
    """Quote a key/value unless it can stand as a bare word."""
    bare = (
        word != ""
        and all(c.isalnum() or c in _WORD_EXTRA for c in word)
        and ".." not in word
        and word.lower() not in ("and", "or", "not", "in")
        and not any(word.lower().startswith(kw + ":") for kw in _META_KEYWORDS)
    )
    if bare:
        return word
    return '"' + word.replace("\\", "\\\\").replace('"', '\\"') + '"'


def unparse_filter(node: _Node) -> str:
    """Render an AST back to filter syntax; ``parse_filter`` of the
    result yields an equal AST (property-tested)."""
    if isinstance(node, _Or):
        return " or ".join(
            f"({unparse_filter(i)})" if isinstance(i, _Or) else unparse_filter(i)
            for i in node.items
        )
    if isinstance(node, _And):
        out = []
        for i in node.items:
            s = unparse_filter(i)
            if isinstance(i, (_Or, _And)):
                s = f"({s})"
            out.append(s)
        return " and ".join(out)
    if isinstance(node, _Not):
        s = unparse_filter(node.item)
        if isinstance(node.item, (_Or, _And)):
            s = f"({s})"
        return f"not {s}"
    if isinstance(node, _TagEq):
        return f"{_quote(node.key)}={_quote(node.value)}"
    if isinstance(node, _TagNe):
        return f"{_quote(node.key)}!={_quote(node.value)}"
    if isinstance(node, _TagExists):
        return f"{_quote(node.key)}=*"
    if isinstance(node, _TagNotExists):
        return f"{_quote(node.key)}!=*"
    if isinstance(node, _TagIn):
        vals = ", ".join(_quote(v) for v in node.values)
        return f"{_quote(node.key)} in ({vals})"
    if isinstance(node, _TypeIs):
        return f"type:{node.osm_type}"
    if isinstance(node, _GeomIs):
        return f"geometry:{node.geom_class}"
    if isinstance(node, _IdIn):
        items = [
            str(i) if t is None else f"{t}/{i}" for t, i in node.items
        ]
        if len(items) == 1:
            return f"id:{items[0]}"
        return "id:(" + ", ".join(items) + ")"
    if isinstance(node, _Range):
        lo = "" if node.lo is None else repr(node.lo)
        hi = "" if node.hi is None else repr(node.hi)
        return f"{node.field}:({lo}..{hi})"
    raise AssertionError(f"unhandled node {node!r}")


def compile_filter(src: str, schema: FilterSchema | None = None) -> Column:
    """Compile an ohsome filter string to a Spark Column predicate.

    The result is a plain Catalyst boolean expression — it composes with
    ``DataFrame.filter`` and pushes down (map-key extraction prunes to the
    tags column; type/id/range comparisons reach the parquet scan as
    ordinary predicates).
    """
    return _compile(parse_filter(src), schema or FilterSchema())
