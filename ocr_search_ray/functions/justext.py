"""jusText-style main-content block classification (boilerplate removal).

The second extraction surface next to ``html_extract`` (which implements the
Readability-style link-density STRIP — SURVEY.md O4): this module keeps the
whole block structure and labels every block, the shape a curation pipeline
wants (audit why a block was dropped, tune thresholds per corpus).

Deterministic, dependency-free variant of the published jusText algorithm
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora"):

1. segment the DOM into text blocks (<p>, <h1>-<h6>, <li>, <td>, <pre> —
   same block set as html_extract; chrome subtrees head/script/style/...
   are skipped entirely);
2. context-free classification per block, on exact integer features (no
   float thresholds, so an oracle can replay them bit-for-bit):
   - ``link_chars * 2 > total_chars``                    → ``bad``
   - ``n_words < min_words``                             → ``short``
   - ``n_stop * stop_den >= n_words * stop_num``         → ``good``
   - otherwise                                           → ``near_good``
3. context-sensitive pass (the jusText idea: doubtful blocks inherit from
   their decided neighbours; document edges count as ``bad``):
   - ``near_good`` → ``good`` iff the nearest decided block before OR
     after is ``good``;
   - ``short``     → ``good`` iff the nearest decided blocks before AND
     after are both ``good``;
   - ``good`` / ``bad`` stay.

Failure tolerance mirrors html_extract: a parse error yields zero blocks.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .html_extract import BLOCK_TAGS, SKIP_TAGS, VOID_TAGS

# function words for the stop-density feature; callers pass their own list
# per corpus/language (the jusText stoplists are per-language text files)
DEFAULT_STOPWORDS = frozenset(
    "a an and are as at be for in is it of on the to was with".split()
)


class _BlockEmitParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.anchor_depth = 0
        self.block_stack: list[list] = []  # [tag, link_chars]
        self._texts: list[list[str]] = []
        self.blocks: list[tuple[str, str, int]] = []  # (tag, text, link_chars)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS or self.skip_depth > 0:
            self.skip_depth += 1
            return
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS:
            self.block_stack.append([tag, 0])
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
            btag, link_chars = self.block_stack.pop()
            text = "".join(self._texts.pop())
            self.blocks.append((btag, text, link_chars))

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not self.block_stack:
            return
        if self.anchor_depth > 0:
            self.block_stack[-1][1] += len(data)
        self._texts[-1].append(data)


def page_blocks(html_bytes: bytes) -> list[tuple[str, str, int]]:
    """→ [(tag, text, link_chars), ...] in document order; [] on error."""
    try:
        parser = _BlockEmitParser()
        parser.feed(html_bytes.decode("utf-8"))
        parser.close()
        return parser.blocks
    except Exception:
        return []


def classify_blocks(
    blocks: list[tuple[str, str, int]],
    stopwords=DEFAULT_STOPWORDS,
    *,
    min_words: int = 10,
    stop_num: int = 1,
    stop_den: int = 20,
) -> list[dict]:
    """Run both classification passes; → one dict per block (document
    order) with the exact integer features and both labels."""
    rows = []
    for idx, (tag, text, link_chars) in enumerate(blocks):
        words = [w for w in text.split(" ") if w]
        n_words = len(words)
        n_stop = sum(1 for w in words if w in stopwords)
        total_chars = len(text)
        if link_chars * 2 > total_chars:
            ctx = "bad"
        elif n_words < min_words:
            ctx = "short"
        elif n_stop * stop_den >= n_words * stop_num:
            ctx = "good"
        else:
            ctx = "near_good"
        rows.append(
            {
                "block_idx": idx,
                "tag": tag,
                "block_text": text,
                "total_chars": total_chars,
                "link_chars": link_chars,
                "n_words": n_words,
                "n_stop": n_stop,
                "ctx_label": ctx,
            }
        )

    n = len(rows)
    prev_d = ["bad"] * n
    last = "bad"
    for i in range(n):
        prev_d[i] = last
        if rows[i]["ctx_label"] in ("good", "bad"):
            last = rows[i]["ctx_label"]
    next_d = ["bad"] * n
    nxt = "bad"
    for i in range(n - 1, -1, -1):
        next_d[i] = nxt
        if rows[i]["ctx_label"] in ("good", "bad"):
            nxt = rows[i]["ctx_label"]
    for i, r in enumerate(rows):
        c = r["ctx_label"]
        if c == "near_good":
            r["label"] = (
                "good" if prev_d[i] == "good" or next_d[i] == "good"
                else "bad"
            )
        elif c == "short":
            r["label"] = (
                "good" if prev_d[i] == "good" and next_d[i] == "good"
                else "bad"
            )
        else:
            r["label"] = c
    return rows
