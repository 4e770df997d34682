"""Declared Arrow schemas for every logical table (SURVEY.md §1.4).

The reference is schema-on-write / implicit (MongoDB); this engine declares
fixed ``pyarrow.Schema``s and asserts them at stage boundaries.
"""

from __future__ import annotations

import pyarrow as pa

# Input: Common-Crawl-style web pages (BASELINE.json input_hint).
WEBPAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),  # raw payload: HTML bytes or a paged binary (FPDF)
        ("text", pa.string()),  # pre-extracted text channel (null when html is source)
        ("lang", pa.string()),
    ]
)

# One row per extracted page (the reference's Doc record, PdfUtil.class.js:26-39).
PAGES = pa.schema(
    [
        ("file_id", pa.string()),
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("page_idx", pa.int32()),  # 1-based
        ("page_count", pa.int32()),
        ("img_path", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("status", pa.string()),  # ok | empty | error
    ]
)

# Exploded postings (the reference's term_freqs collection, one row per (doc, term)).
POSTINGS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("term", pa.string()),
        ("tf", pa.int64()),
    ]
)

# Per-term statistics (document frequency + collection frequency).
TERM_STATS = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
    ]
)

# Term-term cosine correlation, symmetric pair rows (term_correlations).
TERM_CORRELATIONS = pa.schema(
    [
        ("term1", pa.string()),
        ("term2", pa.string()),
        ("tcr", pa.float64()),
    ]
)

# Append-only query log (search_history, DbInterface.class.js:477-496).
SEARCH_HISTORY = pa.schema(
    [
        ("time", pa.timestamp("us")),
        ("search_terms", pa.string()),  # JSON TermFreqDict, as the reference stores it
        ("search_query", pa.string()),
    ]
)

# Checkpoint manifest: one row per completed output partition (SURVEY.md §4).
MANIFEST = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("stage", pa.string()),
        ("input_hash", pa.string()),  # lineage: hash over input fragment identity
        ("row_count", pa.int64()),
        ("byte_count", pa.int64()),
        ("n_errors", pa.int64()),
        ("n_timeouts", pa.int64()),  # watchdog-expired rows (skip-don't-fail)
        ("status", pa.string()),
        ("wall_time_s", pa.float64()),
    ]
)


def assert_schema(table: pa.Table, expected: pa.Schema, stage: str) -> pa.Table:
    """Stage-boundary schema assertion (names+types, order-sensitive)."""
    got = pa.schema([(f.name, f.type) for f in table.schema])
    want = pa.schema([(f.name, f.type) for f in expected])
    if got != want:
        raise AssertionError(
            f"[{stage}] schema mismatch:\n  got:  {got}\n  want: {want}"
        )
    return table
