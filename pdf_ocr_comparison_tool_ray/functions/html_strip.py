"""HTML boilerplate stripping with text-density DOM heuristics.

The main-content extraction route for ``kind="html"`` spans (a north-star
addition on top of the reference's PDF-only routes).  Algorithm (in the
spirit of published text-density / link-density boilerplate removal
heuristics, e.g. Boilerpipe/jusText):

1. parse with the stdlib ``html.parser`` (no external deps, deterministic);
2. drop subtrees of pure-chrome containers (script/style/nav/footer/
   header/aside/template/noscript);
3. segment remaining text into blocks at block-level tags;
4. per block compute link density (chars inside <a> / total chars) and
   text length; drop blocks that are link-dominated (>0.5) or too short
   (< min_len chars) — classic boilerplate signals;
5. join surviving blocks with "\\n".
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

_DROP_TAGS = {"script", "style", "nav", "footer", "header", "aside", "template", "noscript"}
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "ul", "ol", "table",
    "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "br",
}


class _Block:
    __slots__ = ("parts", "link_chars")

    def __init__(self) -> None:
        self.parts: List[str] = []
        self.link_chars = 0

    @property
    def text(self) -> str:
        return "".join(self.parts)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: List[_Block] = [_Block()]

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self.drop_depth += 1
        elif tag == "a":
            self.link_depth += 1
        elif tag in _BLOCK_TAGS and self.drop_depth == 0:
            self._new_block()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
        elif tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        elif tag in _BLOCK_TAGS and self.drop_depth == 0:
            self._new_block()

    def _new_block(self):
        if self.blocks[-1].parts:
            self.blocks.append(_Block())

    def handle_data(self, data):
        if self.drop_depth:
            return
        blk = self.blocks[-1]
        blk.parts.append(data)
        if self.link_depth:
            blk.link_chars += len(data)


def strip_html(html: str, min_len: int = 3, max_link_density: float = 0.5) -> str:
    """Extract main content text from an HTML fragment/page."""
    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        pass
    kept: List[str] = []
    for blk in ex.blocks:
        text = blk.text.strip()
        if len(text) < min_len:
            continue
        total = len(blk.text)
        if total and blk.link_chars / total > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept)
