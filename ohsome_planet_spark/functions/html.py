"""HTML main-text extraction in pure stdlib Python — the step between a
crawled WARC response and the document table of a training-data pipeline
(the trafilatura/jusText niche, scoped to deterministic rules).

Extraction contract (documented, oracle-replayable):

- content inside ``script/style/noscript/template/head`` is dropped
  (raw-text elements consume until their true close tag, so a ``</div>``
  inside a script never terminates early);
- comments, processing instructions and declarations are dropped;
- block-level boundaries (``p div br li ul ol h1..h6 table tr td th
  section article header footer nav blockquote pre form``) split text
  into blocks; inline tags (``a b i em strong span code small u``)
  contribute their text to the enclosing block;
- character references — named and numeric — decode (``convert_charrefs``);
- within a block, whitespace runs collapse to single spaces and the
  block is trimmed; empty blocks vanish; blocks join with ``\\n``.
"""

from __future__ import annotations

from html.parser import HTMLParser

_DROP_TAGS = {"script", "style", "noscript", "template", "head"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "section", "article", "header", "footer", "nav", "blockquote",
    "pre", "form", "h1", "h2", "h3", "h4", "h5", "h6", "body", "html",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop = 0
        self._blocks: list[list[str]] = [[]]

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop += 1
        elif tag in _BLOCK_TAGS:
            self._blocks.append([])

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._blocks.append([])

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop = max(0, self._drop - 1)
        elif tag in _BLOCK_TAGS:
            self._blocks.append([])

    def handle_data(self, data):
        if not self._drop and data:
            self._blocks[-1].append(data)

    def text(self) -> str:
        lines = []
        for chunks in self._blocks:
            line = " ".join("".join(chunks).split())
            if line:
                lines.append(line)
        return "\n".join(lines)


def html_to_text(html: str) -> str:
    """Extract main text from HTML under the module contract."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()
