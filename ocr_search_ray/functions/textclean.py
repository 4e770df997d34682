"""Pre-tokenization text cleaning.

Reproduces the reference's pre-clean semantics (ocr_search
``src/Tokenizer/Tokenizer.class.js:36-38``): strip the three "strange"
characters U+F0D8 (private-use bullet), U+2022 (BULLET), U+3001 (IDEOGRAPHIC
COMMA); trim *leading/trailing ASCII spaces only* (the reference regex is
``/^ +| +$/g`` — tabs/newlines are NOT trimmed); then lowercase.

Order matters and is locked by unit tests: strip-chars → trim-spaces →
lowercase.
"""

from __future__ import annotations

_STRIP_CHARS = "\uf0d8\u2022\u3001"  # U+F0D8, U+2022 (•), U+3001 (、)
_STRIP_TABLE = {ord(c): None for c in _STRIP_CHARS}


def preclean(raw_text: str) -> str:
    """Clean a raw page text for tokenization. Pure + deterministic."""
    text = raw_text.translate(_STRIP_TABLE)
    text = text.strip(" ")  # ASCII space only, both ends — not \t \n \r
    return text.lower()
