"""Deletion cascade as compaction (SURVEY.md §3.3, J5, D3).

The reference deletes a file by reading its pages and removing each from the
``docs`` AND ``term_freqs`` collections (``src/DbInterface/DbInterface.class.
js:109-118,335-356``), then unlinking images. With immutable Parquet runs the
engine's equivalent is a **compaction**: anti-join both output tables against
the deleted-url set and rewrite the affected partitions (deterministic names
→ idempotent).

The deleted-url set is small relative to the corpus → broadcast via
``ray.put``; the doc_id membership set for the postings side is derived from
the pages table (postings carry no url), mirroring the reference's
read-pages-then-cascade order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _filter_not_in(ds, column: str, values_ref):
    """Anti-filter against a broadcast Arrow value set. The Arrow array is
    built ONCE on the driver and shipped via ``ray.put`` — workers ray.get
    it zero-copy per batch; no per-batch set→array conversion."""
    import ray

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.invert(
            pc.is_in(batch.column(column), value_set=ray.get(values_ref))
        )
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def delete_urls(pages, postings, deleted_urls: set[str]):
    """→ (pages', postings') with every page/posting of the urls removed."""
    import ray

    urls_arr = pa.array(sorted(deleted_urls), pa.string())
    urls_ref = ray.put(urls_arr)

    # doc_ids to cascade: read from the pages table (small projection,
    # filtered BEFORE the collect — only doomed rows reach the driver)
    def doomed_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("url"), value_set=ray.get(urls_ref)))

    doomed = (
        pages.select_columns(["url", "doc_id"])
        .map_batches(doomed_rows, batch_format="pyarrow")
        .take_all()
    )
    ids_ref = ray.put(pa.array(sorted({r["doc_id"] for r in doomed}),
                               pa.string()))

    return (
        _filter_not_in(pages, "url", urls_ref),
        _filter_not_in(postings, "doc_id", ids_ref),
    )
