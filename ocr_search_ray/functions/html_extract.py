"""Main-content extraction from HTML bytes (boilerplate strip).

The engine's stand-in for the reference's per-page text extraction
(``src/PdfUtil/PdfUtil.class.js:140-164`` runs ``pdftotext`` per page; the
web-page data model routes HTML rows through a DOM walk instead —
SURVEY.md O4). The algorithm is a deterministic, dependency-free variant of
the published boilerplate-removal heuristics (Readability / jusText family:
strip chrome containers, then keep text blocks with low link density):

1. Parse with the stdlib ``html.parser`` (tolerant, streaming).
2. Drop entire subtrees of chrome/non-content tags:
   head, script, style, nav, header, footer, aside, noscript, template, form,
   iframe, svg, button.
3. Treat each <p>, <h1>-<h6>, <li>, <td>, <pre> as a candidate text block;
   compute its link density (chars inside <a> / total chars).
4. Keep blocks with link density <= MAX_LINK_DENSITY (boilerplate link lists
   are dropped regardless of where they appear).
5. Join kept block texts with "\n\n", preserving inner text byte-for-byte
   (entities unescaped by the parser; no whitespace normalization) — the
   byte-identity surface required by BASELINE.json.

Failure tolerance mirrors the reference's skip-don't-fail semantics
(``getPageContent`` errors → '' — PdfUtil.class.js:150-163): any parse error
returns ``("", "error")``.
"""

from __future__ import annotations

from html.parser import HTMLParser

SKIP_TAGS = frozenset(
    "head script style nav header footer aside noscript template form iframe svg button".split()
)
BLOCK_TAGS = frozenset("p h1 h2 h3 h4 h5 h6 li td pre".split())
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
MAX_LINK_DENSITY = 0.5


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.block_stack: list[list] = []  # per open block: [chars, link_chars]
        self.anchor_depth = 0
        self.blocks: list[str] = []  # kept block texts in document order
        self._texts: list[list[str]] = []  # text fragments per open block

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS or self.skip_depth > 0:
            self.skip_depth += 1
            return
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS:
            self.block_stack.append([0, 0])
            self._texts.append([])

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        if self.skip_depth > 0:
            self.skip_depth -= 1
            return
        if tag == "a" and self.anchor_depth > 0:
            self.anchor_depth -= 1
            return
        if tag in BLOCK_TAGS and self.block_stack:
            chars, link_chars = self.block_stack.pop()
            text = "".join(self._texts.pop())
            density = (link_chars / chars) if chars else 0.0
            if density <= MAX_LINK_DENSITY:
                self.blocks.append(text)

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not self.block_stack:
            return
        # text accrues to the innermost open block only (no double counting)
        self.block_stack[-1][0] += len(data)
        if self.anchor_depth > 0:
            self.block_stack[-1][1] += len(data)
        self._texts[-1].append(data)


def extract_main_text(html_bytes: bytes) -> tuple[str, str]:
    """Return ``(text, status)`` with status in {'ok', 'empty', 'error'}."""
    try:
        html = html_bytes.decode("utf-8")
        parser = _MainContentParser()
        parser.feed(html)
        parser.close()
        text = "\n\n".join(parser.blocks)
        return (text, "ok" if text else "empty")
    except Exception:
        return ("", "error")
