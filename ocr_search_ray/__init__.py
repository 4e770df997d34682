"""ocr_search_ray — a from-scratch Ray-Data-native document extraction + indexing engine.

Re-expresses the query and data-processing capabilities of the reference
``tom6311tom6311/ocr_search`` (a single-process Node.js OCR/search pipeline; see
SURVEY.md) as an idiomatic Ray Data engine over Common-Crawl-style web-page
Parquet tables ``(url, warc_ts, html, text, lang)``.

Layout:
    functions/  pure, deterministic per-value functions (tokenize, hash, extract)
    sources/    input synthesis + readers
    stages/     Ray Data batch transforms (map_batches fns + actor-pool classes)
    pipelines/  end-to-end compositions (ingest/index, search, compaction)
    state/      checkpoint manifest (per-partition lineage + metrics, resume)

Everything here derives from public knowledge only: the Ray Data / pyarrow
public APIs and the observable behavior of the reference repo.
"""

__version__ = "0.1.0"
