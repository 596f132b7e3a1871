"""PDF text extraction (ISO 32000-1): the document-ingestion pass a
training-data pipeline runs on crawled PDFs before any text ever
reaches dedup/quality stages.

What is REAL here: body object scan (``N G obj``), the COS value
grammar (dictionaries, arrays, names, literal strings with all §7.3.4.2
escapes incl. octal and line continuations, hex strings, indirect
references), stream extraction with direct AND indirect ``/Length``,
``/FlateDecode`` via zlib, document-order page walk over the ``/Pages``
tree (nested intermediate nodes, ``/Kids`` order), multi-stream
``/Contents`` concatenation, and the §9.4 text-showing machine:
BT/ET, Tf, Td/TD/Tm/T*/TL line motion, Tj, the kerning TJ array and
the ' / " show-with-newline operators. Fonts are treated as Latin-1
byte maps (no CMap/ToUnicode — embedded-font glyph remapping is the
documented fence, raised as :class:`PdfFormatError` when a /ToUnicode
or composite font is present).

The fixture encoder writes spec-conformant files (xref table with real
byte offsets, trailer, Pages tree, optional Flate compression,
rotating line encodings) so gate rows can assert the round-trip
identity ``extract(encode(text)) == text`` byte-for-byte.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PdfFormatError", "extract_pdf_pages", "encode_pdf"]


class PdfFormatError(ValueError):
    pass


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# Pre-compiled, position-anchored token patterns. Matching with
# ``pattern.match(data, pos)`` lexes in place; the previous
# ``re.match(pat, data[pos:])`` form copied the remaining buffer on every
# token, making tokenization O(n^2) in document size — measurable on
# real-world crawled PDFs (ADVICE r12; optimization guide §4.2: make the
# per-record Python work linear before distributing it).
_NUM_RE = re.compile(rb"[+-]?(\d+\.\d*|\.\d+|\d+)")
_REF_TAIL_RE = re.compile(rb"\s+(\d+)\s+R(?![\w])")
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_XREF_SECTION_RE = re.compile(rb"\s*(\d+)\s+(\d+)\s*\r?\n")
_TRAILER_RE = re.compile(rb"\s*trailer")
_CONTENT_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"


class _Name(str):
    pass


class _Lexer:
    """COS object grammar over raw bytes (§7.3)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_value(self):
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfFormatError("unexpected end of object data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        raise PdfFormatError(f"unexpected byte 0x{c:02x} in object")

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self.parse_value()
            if not isinstance(key, _Name):
                raise PdfFormatError("dictionary key is not a name")
            out[str(key)] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_name(self) -> _Name:
        self.pos += 1
        start = self.pos
        d = self.data
        buf = bytearray()
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            c = d[self.pos]
            if c == 0x23 and self.pos + 2 < len(d):  # '#xx' escape (§7.3.5)
                buf += bytes([int(d[self.pos + 1 : self.pos + 3], 16)])
                self.pos += 3
            else:
                buf.append(c)
                self.pos += 1
        if self.pos == start and not buf:
            raise PdfFormatError("empty name")
        return _Name(buf.decode("latin-1"))

    def _parse_number_or_ref(self):
        m = _NUM_RE.match(self.data, self.pos)
        if not m:
            raise PdfFormatError("malformed number")
        tok = m.group(0)
        self.pos = m.end()
        if b"." in tok:
            return float(tok)
        num = int(tok)
        # 'N G R' indirect reference lookahead
        m2 = _REF_TAIL_RE.match(self.data, self.pos)
        if num >= 0 and m2:
            self.pos = m2.end()
            return _Ref(num, int(m2.group(1)))
        return num

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise PdfFormatError("unterminated hex string")
        hexpart = bytes(
            c for c in self.data[self.pos : end] if c not in _WS
        ).decode("latin-1")
        self.pos = end + 1
        if len(hexpart) % 2:  # odd count: final digit padded with 0 (§7.3.4.3)
            hexpart += "0"
        return bytes.fromhex(hexpart)

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f",
                    }[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < len(d) and d[self.pos] in b"01234567":
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # unknown escape: backslash dropped (§7.3.4.2)
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfFormatError("unterminated literal string")


# ---------------------------------------------------------------------------
# document structure


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _parse_obj_at(data: bytes, pos: int) -> tuple[object, tuple | None]:
    m = _OBJ_RE.match(data, pos) or _OBJ_RE.search(data, pos, pos + 32)
    if not m:
        raise PdfFormatError("no object at xref offset")
    lex = _Lexer(data, m.end())
    val = lex.parse_value()
    lex._skip_ws()
    stream = None
    if data.startswith(b"stream", lex.pos):
        p = lex.pos + 6
        if data.startswith(b"\r\n", p):
            p += 2
        elif data.startswith(b"\n", p):
            p += 1
        if not isinstance(val, dict):
            raise PdfFormatError("stream without dictionary")
        stream = (p, val.get("Length"))
    return val, stream


def _xref_objects(data: bytes) -> dict[int, tuple[object, tuple | None]] | None:
    """The spec-prescribed path (§7.5.4): follow startxref to the
    cross-reference table (chasing /Prev for incremental updates,
    newest section wins) and parse each in-use object at its recorded
    byte offset. Returns None for anything this reader doesn't speak
    (xref streams, damage) — the caller falls back to the repair scan."""
    tail = data.rfind(b"startxref")
    if tail < 0:
        return None
    m = _STARTXREF_RE.match(data, tail)
    if not m:
        return None
    offsets: dict[int, int] = {}
    xref_pos = int(m.group(1))
    for _ in range(32):  # /Prev chain bound
        lex = _Lexer(data, xref_pos)
        lex._skip_ws()
        if not data.startswith(b"xref", lex.pos):
            return None  # xref stream or garbage
        pos = lex.pos + 4
        while True:
            mh = _XREF_SECTION_RE.match(data, pos)
            if not mh:
                break
            start, count = int(mh.group(1)), int(mh.group(2))
            pos = mh.end()
            for i in range(count):
                entry = data[pos : pos + 20]
                if len(entry) < 18:
                    return None
                if entry[17:18] == b"n" and start + i not in offsets:
                    offsets[start + i] = int(entry[:10])
                pos += 20
        mt = _TRAILER_RE.match(data, pos)
        if not mt:
            return None
        lex = _Lexer(data, mt.end())
        trailer = lex.parse_value()
        if not isinstance(trailer, dict):
            return None
        if "Prev" in trailer and isinstance(trailer["Prev"], int):
            xref_pos = trailer["Prev"]
            continue
        break
    objects: dict[int, tuple[object, tuple | None]] = {}
    try:
        for num, off in offsets.items():
            objects[num] = _parse_obj_at(data, off)
    except PdfFormatError:
        return None
    return objects or None


def _scan_objects(data: bytes) -> dict[int, tuple[object, tuple | None]]:
    """Repair-mode body scan for ``N G obj`` → {num: (value, stream)}.
    Used when the xref table is missing or unreadable; later
    definitions of the same object number win (incremental updates)."""
    objects: dict[int, tuple[object, tuple | None]] = {}
    for m in _OBJ_RE.finditer(data):
        try:
            objects[int(m.group(1))] = _parse_obj_at(data, m.start())
        except PdfFormatError:
            continue
    return objects


def _resolve(objects: dict, v):
    seen = 0
    while isinstance(v, _Ref):
        if v.num not in objects:
            raise PdfFormatError(f"dangling reference {v!r}")
        v = objects[v.num][0]
        seen += 1
        if seen > 32:
            raise PdfFormatError("reference cycle")
    return v


def _stream_bytes(data: bytes, objects: dict, num: int) -> bytes:
    val, stream = objects[num]
    if stream is None:
        raise PdfFormatError(f"object {num} is not a stream")
    start, length = stream
    length = _resolve(objects, length)
    if not isinstance(length, int):
        raise PdfFormatError("stream /Length is not an integer")
    raw = data[start : start + length]
    filt = _resolve(objects, val.get("Filter"))
    if filt is None:
        return raw
    filters = [filt] if isinstance(filt, _Name) else list(filt)
    for f in filters:
        f = str(_resolve(objects, f))
        if f == "FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise PdfFormatError(f"bad Flate stream: {exc}") from exc
        else:
            raise PdfFormatError(f"unsupported stream filter /{f}")
    return raw


def _walk_pages(objects: dict, node, acc: list, depth: int = 0) -> None:
    if depth > 64:
        raise PdfFormatError("pages tree too deep")
    node_d = _resolve(objects, node)
    if not isinstance(node_d, dict):
        raise PdfFormatError("pages tree node is not a dictionary")
    ntype = str(_resolve(objects, node_d.get("Type", "")))
    if ntype == "Page":
        acc.append(node_d)
        return
    for kid in _resolve(objects, node_d.get("Kids", [])):
        _walk_pages(objects, kid, acc, depth + 1)


# ---------------------------------------------------------------------------
# content-stream text machine (§9.4)


def _tokenize_content(data: bytes):
    """Yield ('str', bytes) / ('num', float) / ('name', str) /
    ('op', str) / ('[', None) / (']', None) tokens."""
    lex = _Lexer(data)
    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            return
        c = data[lex.pos]
        if c == 0x28:
            yield ("str", lex._parse_literal_string())
        elif data.startswith(b"<<", lex.pos):
            yield ("dict", lex._parse_dict())
        elif c == 0x3C:
            yield ("str", lex._parse_hex_string())
        elif c == 0x5B:
            lex.pos += 1
            yield ("[", None)
        elif c == 0x5D:
            lex.pos += 1
            yield ("]", None)
        elif c == 0x2F:
            yield ("name", str(lex._parse_name()))
        elif c in b"+-.0123456789":
            v = lex._parse_number_or_ref()
            yield ("num", float(v) if not isinstance(v, _Ref) else 0.0)
        else:
            m = _CONTENT_OP_RE.match(data, lex.pos)
            if not m:
                raise PdfFormatError(f"bad content byte 0x{c:02x}")
            lex.pos = m.end()
            yield ("op", m.group(0).decode("latin-1"))


def _extract_page_text(content: bytes) -> str:
    """Run the text-showing operators; every explicit line motion
    (Td/TD/T*/Tm/'/\") starts a new output line. Graphics operators are
    consumed and ignored."""
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    in_array: list | None = None

    def newline():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for kind, val in _tokenize_content(content):
        if kind == "[":
            in_array = []
            continue
        if kind == "]":
            stack.append(in_array)
            in_array = None
            continue
        if in_array is not None:
            if kind in ("str", "num"):
                in_array.append(val)
            continue
        if kind in ("str", "num", "name", "dict"):
            stack.append(val)
            continue
        op = val
        if op in ("Td", "TD", "T*", "Tm"):
            newline()
        elif op == "Tj":
            if not stack or not isinstance(stack[-1], bytes):
                raise PdfFormatError("Tj without a string operand")
            cur.append(stack[-1].decode("latin-1"))
        elif op == "TJ":
            if not stack or not isinstance(stack[-1], list):
                raise PdfFormatError("TJ without an array operand")
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(el.decode("latin-1"))
        elif op in ("'", '"'):
            newline()
            if not stack or not isinstance(stack[-1], bytes):
                raise PdfFormatError(f"{op} without a string operand")
            cur.append(stack[-1].decode("latin-1"))
        stack.clear()
    newline()
    return "\n".join(lines)


def extract_pdf_pages(data: bytes) -> list[str]:
    """Full-document text extraction → one string per page, in
    document (/Pages tree) order."""
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        raise PdfFormatError("missing %PDF header")
    objects = _xref_objects(data) or _scan_objects(data)
    catalog = None
    for num, (val, _s) in objects.items():
        if isinstance(val, dict) and str(_resolve(objects, val.get("Type", ""))) == "Catalog":
            catalog = val
    if catalog is None:
        raise PdfFormatError("no document catalog")
    pages: list[dict] = []
    _walk_pages(objects, catalog.get("Pages"), pages)
    if not pages:
        raise PdfFormatError("document has no pages")
    out = []
    for page in pages:
        res = _resolve(objects, page.get("Resources", {}))
        fonts = _resolve(objects, res.get("Font", {})) if isinstance(res, dict) else {}
        if isinstance(fonts, dict):
            for f in fonts.values():
                fd = _resolve(objects, f)
                if isinstance(fd, dict) and (
                    "ToUnicode" in fd
                    or str(_resolve(objects, fd.get("Subtype", ""))) == "Type0"
                ):
                    raise PdfFormatError(
                        "composite/ToUnicode font: glyph remapping is the "
                        "documented extraction fence"
                    )
        contents = _resolve(objects, page.get("Contents"))
        refs = contents if isinstance(contents, list) else [page.get("Contents")]
        chunks = []
        for ref in refs:
            if not isinstance(ref, _Ref):
                raise PdfFormatError("/Contents is not a stream reference")
            chunks.append(_stream_bytes(data, objects, ref.num))
        # §7.8.2: multiple content streams are one logical stream with
        # whitespace at the joins
        out.append(_extract_page_text(b"\n".join(chunks)))
    return out


# ---------------------------------------------------------------------------
# fixture encoder


def _escape_literal(s: bytes) -> bytes:
    out = bytearray()
    for c in s:
        if c in b"()\\":
            out += b"\\" + bytes([c])
        elif 32 <= c <= 126:
            out.append(c)
        else:
            out += b"\\%03o" % c
    return bytes(out)


def _line_ops(i: int, line: str) -> bytes:
    """Rotate the §9.4 show forms so one fixture exercises them all."""
    raw = line.encode("latin-1")
    k = i % 4
    if k == 0:
        show = b"(" + _escape_literal(raw) + b") Tj"
    elif k == 1:
        mid = max(1, len(raw) // 2)
        show = (
            b"[(" + _escape_literal(raw[:mid]) + b") -28 ("
            + _escape_literal(raw[mid:]) + b")] TJ"
        )
    elif k == 2:
        show = b"<" + raw.hex().encode() + b"> Tj"
    else:
        # the ' operator embeds the T* newline itself
        return b"(" + _escape_literal(raw) + b") '"
    motion = b"0 -14 Td" if i % 2 else b"T*"
    return motion + b"\n" + show


def _page_content(lines: list[str]) -> bytes:
    parts = [b"BT\n/F1 12 Tf\n14 TL\n1 0 0 1 72 720 Tm"]
    for i, line in enumerate(lines):
        parts.append(_line_ops(i, line))
    parts.append(b"ET")
    return b"\n".join(parts)


def encode_pdf(
    pages: list[list[str]],
    compress: bool = False,
    indirect_length: bool = False,
    split_contents: bool = False,
    nested_tree: bool = False,
) -> bytes:
    """Spec-conformant single-update PDF: header, body objects, xref
    table with true byte offsets, trailer. ``pages`` is a list of pages,
    each a list of text lines. Options: Flate-compress content streams,
    express /Length as an indirect reference, split each page's content
    into a two-stream /Contents array, interpose a nested /Pages node."""
    if not pages:
        raise ValueError("at least one page required")
    objects: list[bytes] = []  # bodies, object number = index + 1

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    def add_stream(payload: bytes) -> int:
        data = zlib.compress(payload) if compress else payload
        filt = b" /Filter /FlateDecode" if compress else b""
        if indirect_length:
            num = add(b"")  # placeholder; length object appended after
            len_num = add(b"%d" % len(data))
            objects[num - 1] = (
                b"<< /Length %d 0 R%s >>\nstream\n" % (len_num, filt)
                + data
                + b"\nendstream"
            )
            return num
        return add(
            b"<< /Length %d%s >>\nstream\n" % (len(data), filt)
            + data
            + b"\nendstream"
        )

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_nums = []
    pages_node_num = len(pages) + 100  # patched below via placeholder map
    # build pages first with a forward parent reference patched at the end
    parent_token = b"@PARENT@"
    for lines in pages:
        content = _page_content(lines)
        if split_contents and len(content) > 40:
            half = content[: len(content) // 2].rfind(b"\n")
            half = half if half > 0 else len(content) // 2
            c1 = add_stream(content[:half])
            c2 = add_stream(content[half + 1 :])
            contents = b"[%d 0 R %d 0 R]" % (c1, c2)
        else:
            contents = b"%d 0 R" % add_stream(content)
        page_nums.append(
            add(
                b"<< /Type /Page /Parent " + parent_token
                + b" /MediaBox [0 0 612 792]"
                + b" /Resources << /Font << /F1 %d 0 R >> >>" % font_num
                + b" /Contents " + contents + b" >>"
            )
        )
    kid_refs = b" ".join(b"%d 0 R" % n for n in page_nums)
    if nested_tree and len(page_nums) > 1:
        inner = add(
            b"<< /Type /Pages /Parent " + parent_token
            + b" /Kids [" + kid_refs + b"] /Count %d >>" % len(page_nums)
        )
        kid_refs = b"%d 0 R" % inner
        count = len(page_nums)
    else:
        count = len(page_nums)
    pages_node_num = add(
        b"<< /Type /Pages /Kids [" + kid_refs + b"] /Count %d >>" % count
    )
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node_num)
    objects = [o.replace(parent_token, b"%d 0 R" % pages_node_num) for o in objects]

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, xref_pos)
    )
    return bytes(buf)
