"""Boilerplate classification / main-content extraction over kind='html'
spans — the net-new capability required by the north rule (the reference
indexes raw OCR without boilerplate stripping; SURVEY.md §2.9
`classify_boilerplate`).

Deterministic text-density heuristic in the spirit of the public Arc90
Readability and jusText algorithms (Pomikálek 2011): score block elements by
text length and link density; keep content blocks; join with a single space.
Implemented on stdlib html.parser (no lxml in this container). One canonical
Python function, used both by the Spark pandas UDF (Arrow-batched) and by the
per-document test oracle, so span-sequence equality is exact by construction.

Spec (the function IS the spec — deterministic by construction):
 - block elements: p, h1..h6, li, td, th, blockquote, pre, article, section,
   div
 - character data accumulates into the INNERMOST open block; text inside an
   <a> additionally accumulates into that block's link-text
 - script/style contents are dropped
 - on block close: normalize whitespace; keep iff
     * the block saw no nested block element (leaf blocks only — a wrapper
       div's own stray text is boilerplate), and
     * normalized length >= MIN_BLOCK_CHARS, and
     * link_density = len(link_text)/len(text) <= MAX_LINK_DENSITY
 - kept blocks are emitted in close order (== document order for leaf
   blocks); joined with a single space
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

BLOCK_TAGS = frozenset(
    ["p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
     "blockquote", "pre", "article", "section", "div"]
)
_SKIP_TAGS = frozenset(["script", "style"])
_VOID_TAGS = frozenset(
    ["br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33


def _norm(text: str) -> str:
    return _WS.sub(" ", text).strip()


class _Block:
    __slots__ = ("text", "link_text", "has_nested_block")

    def __init__(self) -> None:
        self.text: list[str] = []
        self.link_text: list[str] = []
        self.has_nested_block = False


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self.kept: list[str] = []
        self.a_depth = 0
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if tag == "a":
            self.a_depth += 1
        if tag in BLOCK_TAGS:
            for b in self.blocks:
                b.has_nested_block = True
            self.blocks.append(_Block())

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if tag == "a":
            self.a_depth = max(0, self.a_depth - 1)
        if tag in BLOCK_TAGS and self.blocks:
            b = self.blocks.pop()
            text = _norm("".join(b.text))
            if b.has_nested_block or len(text) < MIN_BLOCK_CHARS:
                return
            link_text = _norm("".join(b.link_text))
            if len(link_text) / len(text) > MAX_LINK_DENSITY:
                return
            self.kept.append(text)

    def handle_data(self, data):
        if self.skip_depth or not self.blocks:
            return
        self.blocks[-1].text.append(data)
        if self.a_depth:
            self.blocks[-1].link_text.append(data)


def extract_main_content(html: str) -> str:
    """Classify each leaf block as content vs boilerplate and return the
    concatenated content text. Deterministic; returns '' on unparseable or
    empty input (never raises — bad HTML is boilerplate, not an error)."""
    if not html:
        return ""
    try:
        parser = _ContentParser()
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    return " ".join(parser.kept)


def extract_main_content_batch(texts) -> list[str]:
    """Vectorized form over a sequence (used inside pandas UDFs)."""
    return [extract_main_content(t) for t in texts]
