"""PII redaction over a text column (training-data scrubbing).

The standard web-corpus scrub pass: replace e-mail addresses, IPv4
addresses and phone-like digit runs with typed placeholder tokens and count
what was removed (the counts feed curation thresholds — a page that is
mostly PII is dropped, not redacted).

Scale shape: pure per-batch Arrow compute — ``count_substring_regex`` +
``replace_substring_regex`` (RE2, vectorized, no per-row Python); no
shuffle, no state. Patterns are applied IN ORDER on the progressively
redacted text (an IP inside an already-redacted e-mail is not double
counted) — the oracle reproduces the same chain with DuckDB's RE2
``regexp_replace(..., 'g')``.

Reference scope: beyond-reference training-data operator (brief); the
pattern list is the user-extension surface (SURVEY.md §2.10) — callers pass
their own ``(name, regex, token)`` triples.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (count column, RE2 pattern, replacement token) — applied in order
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_phones", r"\+\d[\d-]{7,}\d", "<PHONE>"),
]


def redact_pii(documents, *, id_col: str = "doc_id",
               text_col: str = "text",
               patterns: list[tuple[str, str, str]] | None = None):
    """→ (id_col, redacted, <one count column per pattern>)."""
    pats = patterns if patterns is not None else DEFAULT_PATTERNS

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        out = {id_col: batch.column(id_col)}
        counts = {}
        for name, pat, token in pats:
            counts[name] = pc.count_substring_regex(text, pat).cast(pa.int64())
            text = pc.replace_substring_regex(text, pat, token)
        out["redacted"] = text
        out.update(counts)
        return pa.table(out)

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
