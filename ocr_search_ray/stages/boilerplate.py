"""Block-level boilerplate classification stage (jusText family).

Wraps ``functions.justext`` as a per-batch Ray Data stage: every page row
fans out to its classified DOM blocks. Pure map — no shuffle, no state
beyond the compiled stopword set (a plain frozenset, shipped once inside
the task closure). The heavy inputs (html payloads) are consumed here and
never travel further down the pipeline — only block text and integer
features leave the stage (same payload-drop discipline as
``stages.extract``).

Reference scope: the north-star extraction surface (BASELINE.json:
"text-density boilerplate heuristics a la Readability/jusText");
``html_extract`` is the strip variant used by ingest, this stage is the
labeled-blocks variant used by curation/audit.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.justext import (
    DEFAULT_STOPWORDS,
    classify_blocks,
    page_blocks,
)


def justext_blocks(pages, *, id_col: str = "doc_id",
                   html_col: str = "html", stopwords=DEFAULT_STOPWORDS,
                   min_words: int = 10, stop_num: int = 1,
                   stop_den: int = 20):
    """→ (id_col, block_idx, tag, block_text, total_chars, link_chars,
    n_words, n_stop, ctx_label, label) — one row per DOM text block."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        out: dict[str, list] = {
            id_col: [], "block_idx": [], "tag": [], "block_text": [],
            "total_chars": [], "link_chars": [], "n_words": [],
            "n_stop": [], "ctx_label": [], "label": [],
        }
        for i, html in zip(ids, htmls):
            raw = html if isinstance(html, bytes) else (html or "").encode()
            rows = classify_blocks(
                page_blocks(raw), stopwords,
                min_words=min_words, stop_num=stop_num, stop_den=stop_den,
            )
            for r in rows:
                out[id_col].append(i)
                for k in ("block_idx", "tag", "block_text", "total_chars",
                          "link_chars", "n_words", "n_stop", "ctx_label",
                          "label"):
                    out[k].append(r[k])
        return pa.table(
            {
                id_col: pa.array(out[id_col], batch.column(id_col).type),
                "block_idx": pa.array(out["block_idx"], pa.int64()),
                "tag": pa.array(out["tag"], pa.string()),
                "block_text": pa.array(out["block_text"], pa.string()),
                "total_chars": pa.array(out["total_chars"], pa.int64()),
                "link_chars": pa.array(out["link_chars"], pa.int64()),
                "n_words": pa.array(out["n_words"], pa.int64()),
                "n_stop": pa.array(out["n_stop"], pa.int64()),
                "ctx_label": pa.array(out["ctx_label"], pa.string()),
                "label": pa.array(out["label"], pa.string()),
            }
        )

    return pages.select_columns([id_col, html_col]).map_batches(
        f, batch_format="pyarrow"
    )


def extract_main_content(pages, *, id_col: str = "doc_id",
                         html_col: str = "html",
                         stopwords=DEFAULT_STOPWORDS,
                         min_words: int = 10, stop_num: int = 1,
                         stop_den: int = 20):
    """→ (id_col, content, n_blocks, n_good): the page's main content =
    '\\n\\n'-joined ``good`` blocks (both jusText passes applied) — the
    end-to-end boilerplate-removal surface a curation pipeline consumes.
    Same per-batch shape as ``justext_blocks``; one output row per page."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        contents, n_blocks, n_good = [], [], []
        for html in htmls:
            raw = html if isinstance(html, bytes) else (html or "").encode()
            rows = classify_blocks(
                page_blocks(raw), stopwords,
                min_words=min_words, stop_num=stop_num, stop_den=stop_den,
            )
            good = [r["block_text"] for r in rows if r["label"] == "good"]
            contents.append("\n\n".join(good))
            n_blocks.append(len(rows))
            n_good.append(len(good))
        return pa.table(
            {
                id_col: pa.array(ids, batch.column(id_col).type),
                "content": pa.array(contents, pa.string()),
                "n_blocks": pa.array(n_blocks, pa.int64()),
                "n_good": pa.array(n_good, pa.int64()),
            }
        )

    return pages.select_columns([id_col, html_col]).map_batches(
        f, batch_format="pyarrow"
    )


def extract_html_meta(pages, *, id_col: str = "doc_id",
                      html_col: str = "html"):
    """→ (id_col, title, meta_description, canonical_url, charset): head
    metadata extraction — the document-level companion to the body-side
    jusText pass (crawl curation reads title/description for snippets and
    canonical for URL dedup; the reference extracts body text only, this
    is a beyond-reference extraction operator).

    Fully VECTORIZED: four compiled RE2 kernels (`pc.extract_regex`) per
    batch — leftmost non-greedy first match, the convention both RE2 and
    DuckDB's regexp_extract share, so the oracle is exact; absent fields
    normalize to '' (DuckDB's no-match value — pyarrow's null is
    fill_null'd to keep the two sides bitwise-identical). The html
    payload is consumed here and never leaves the stage (the
    ``stages.extract`` payload-drop discipline).
    """
    import pyarrow.compute as pc

    patterns = {
        "title": r"<title>(?P<v>.*?)</title>",
        "meta_description":
            r'<meta name="description" content="(?P<v>[^"]*)"',
        "canonical_url": r'<link rel="canonical" href="(?P<v>[^"]*)"',
        "charset": r'<meta charset="(?P<v>[^"]*)"',
    }

    def f(batch: pa.Table) -> pa.Table:
        html = batch.column(html_col)
        cols = {id_col: batch.column(id_col)}
        for name, pat in patterns.items():
            ex = pc.extract_regex(html, pat)
            cols[name] = pc.fill_null(pc.struct_field(ex, "v"), "")
        return pa.table(cols)

    return pages.map_batches(f, batch_format="pyarrow")
