"""Identity hashing: file_id / doc_id derivation.

Reproduces the reference's id scheme (ocr_search
``src/PdfUtil/PdfUtil.class.js:55,66-70``):

- ``file_id = sha256(url)`` hex — url plays the role of ``oriFilePath`` in the
  web-page data model (SURVEY.md §1.4).
- ``doc_id = sha256(f"{url}-{page_idx padded}")`` hex, where the zero-pad width
  is ``len(str(page_count))`` — a 9-page file pads to 1 digit, a 10-page file
  to 2. Load-bearing for byte-identical reproduction (SURVEY.md §1.2).
- ``img_path = f"{doc_id}.png"`` — the post-rearrangement flat name
  (``src/ProcessDirector/ProcessDirector.class.js:140``).
"""

from __future__ import annotations

import hashlib


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def file_id(url: str) -> str:
    return sha256_hex(url)


def padded_page(page_idx: int, page_count: int) -> str:
    """Zero-pad ``page_idx`` to the width of ``str(page_count)``."""
    return str(page_idx).zfill(len(str(page_count)))


def doc_id(url: str, page_idx: int, page_count: int) -> str:
    return sha256_hex(f"{url}-{padded_page(page_idx, page_count)}")


def img_path(url: str, page_idx: int, page_count: int) -> str:
    return f"{doc_id(url, page_idx, page_count)}.png"


def escape_regexp(s: str) -> str:
    """Regex-metacharacter escaping (SURVEY.md O16; reference
    ``src/util/escapeRegExp.func.js:1`` — unused in its main flow, kept for
    API completeness). Escapes exactly the reference's character class
    ``.*+?^${}()|[]\\`` — unlike ``re.escape``, which also escapes other
    punctuation and would diverge byte-wise."""
    out = []
    for ch in s:
        if ch in ".*+?^${}()|[]\\":
            out.append("\\")
        out.append(ch)
    return "".join(out)
