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


def clean_text(documents, *, id_col: str = "doc_id",
               text_col: str = "text"):
    """→ (id_col, text_clean, n_chars_raw, n_chars_clean).

    Canonical text normalization for a web corpus, applied in order:

    1. Unicode NFC (stdlib ``unicodedata`` — pyarrow 16.1's
       ``utf8_normalize`` decomposes regardless of the requested form, so
       it cannot be used; an ``isascii`` fast path skips the call for the
       dominant ASCII case);
    2. strip control characters (C0 minus tab, plus DEL) — vectorized RE2;
    3. squeeze runs of spaces/tabs to one space — vectorized RE2;
    4. trim leading/trailing spaces.

    Char counts are Unicode codepoints (SQL ``length`` parity).
    """
    import unicodedata

    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        raw = batch.column(text_col)
        n_raw = pc.utf8_length(raw).cast(pa.int64())
        texts = raw.to_pylist()
        nfc = [
            t if t is None or t.isascii() else unicodedata.normalize("NFC", t)
            for t in texts
        ]
        arr = pa.array(nfc, pa.string())
        arr = pc.replace_substring_regex(
            arr, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
        )
        arr = pc.replace_substring_regex(arr, r"[ \t]+", " ")
        arr = pc.utf8_trim(arr, " ")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_clean": arr,
                "n_chars_raw": n_raw,
                "n_chars_clean": pc.utf8_length(arr).cast(pa.int64()),
            }
        )

    return documents.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow"
    )
