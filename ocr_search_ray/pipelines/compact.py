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

import os

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


def delete_from_index(index_dir: str, doomed_postings: pa.Table,
                      n_buckets: int | None = None) -> dict:
    """Cascade a deletion into the bucketed posting index WITHOUT a
    rebuild: the doomed postings (known from the partition compaction)
    name exactly the term buckets that can hold them; each affected bucket
    is read, anti-filtered on the doomed doc_ids and atomically rewritten
    in a parallel Ray task. Untouched buckets are never opened."""
    import glob as _glob

    import ray

    from ..stages.index import N_BUCKETS_DEFAULT, term_bucket

    from ..state.atomic import recover_all

    recover_all(index_dir, "term_bucket=*")
    n_buckets = n_buckets or N_BUCKETS_DEFAULT
    if doomed_postings.num_rows == 0:
        return {"buckets_affected": 0, "postings_removed": 0}
    terms = set(doomed_postings.column("term").to_pylist())
    doomed_ids = pa.array(
        sorted(set(doomed_postings.column("doc_id").to_pylist())),
        pa.string(),
    )
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    ids_ref = ray.put(doomed_ids)

    @ray.remote
    def rewrite_bucket(bucket_dir: str, ids) -> int:
        import os
        import shutil

        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import recover_aside, swap_dir_in

        recover_aside(bucket_dir)
        if not os.path.isdir(bucket_dir):
            return 0
        table = pq2.read_table(bucket_dir)
        keep = pc.invert(pc.is_in(table.column("doc_id"), value_set=ids))
        kept = table.filter(keep)
        removed = table.num_rows - kept.num_rows
        if removed == 0:
            return 0
        tmp = bucket_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq2.write_table(kept, os.path.join(tmp, "part-0.parquet"),
                        compression="zstd")
        swap_dir_in(tmp, bucket_dir)  # crash-safe: bucket never missing
        return removed

    futures = [
        rewrite_bucket.remote(
            os.path.join(index_dir, f"term_bucket={b}"), ids_ref)
        for b in buckets
    ]
    removed = sum(ray.get(futures))
    return {"buckets_affected": len(buckets), "postings_removed": removed}


def _part_may_contain(part_dir: str, deleted: list[str]) -> bool:
    """Row-group-statistics pruning: can this pages partition hold any of
    the (sorted) deleted urls? False → the partition is never read."""
    import glob as _glob

    import pyarrow.parquet as _pq

    for f in sorted(_glob.glob(os.path.join(part_dir, "*.parquet"))):
        md = _pq.ParquetFile(f).metadata
        url_idx = md.schema.to_arrow_schema().get_field_index("url")
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(url_idx).statistics
            if stats is None or not stats.has_min_max:
                return True  # no stats → cannot prune
            lo, hi = stats.min, stats.max
            if any(lo <= u <= hi for u in deleted):
                return True
    return False


def may_contain_parts(out_dir: str, deleted_urls: set[str]) -> list[str]:
    """Partition basenames (``part=N``) whose pages MAY contain a deleted
    url, by the same stats pruning ``compact_delete_on_disk`` uses. For
    callers that must invalidate derived per-partition state (e.g. quality
    verdicts) BEFORE the compaction publishes — a crash between publish
    and invalidation would otherwise leave stale derivations forever
    (ADVICE r5: the rerun's compaction rewrites nothing, and
    presence-based resume skips the existing output)."""
    import glob as _glob

    from ..state.atomic import recover_all

    recover_all(os.path.join(out_dir, "pages"), "part=*")
    deleted = sorted(deleted_urls)
    return [
        os.path.basename(d)
        for d in sorted(_glob.glob(os.path.join(out_dir, "pages", "part=*")))
        if not (d.endswith(".old") or d.endswith(".tmp"))
        and _part_may_contain(d, deleted)
    ]


def compact_delete_on_disk(out_dir: str, deleted_urls: set[str],
                           index_dir: str | None = None) -> dict:
    """Partition-pruned deletion compaction over an ingest output tree
    (``pages/part=*/``, ``postings/part=*/`` as written by
    ``ingest_resumable``).

    Pruning levels:
    1. **Row-group statistics**: a pages partition whose parquet url
       min/max ranges cannot contain any deleted url is never read.
    2. **Lineage alignment**: ``pages/part=N`` and ``postings/part=N``
       come from the same input fragment, so a postings partition needs a
       rewrite iff its pages partition actually held a deleted url —
       postings' hash ids carry no range information, the lineage does.

    Affected partitions are filtered and rewritten atomically (tmp dir +
    rename, same protocol as ingest) in PARALLEL Ray tasks (one per
    partition — file maintenance the Dataset API has no primitive for),
    and each rewrite appends a ``stage='compact'`` manifest row. A failed
    run reruns idempotently: untouched partitions are still pruned, and a
    partition rewritten twice converges to the same bytes.

    With ``index_dir``, the deletion also cascades into the bucketed
    posting index WITHOUT a rebuild: the rewrites return the doomed
    posting rows (deleted-cohort-sized tombstones) which name exactly the
    term buckets to anti-filter (``delete_from_index``).

    Returns counters: partitions, pruned_by_stats, rewritten,
    pages_removed, postings_removed (+ index bucket counters).
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray

    from ..state import manifest as manifest_mod

    from ..state.atomic import recover_all

    # heal any partition left aside by a crashed previous compaction —
    # including partitions today's delete set would never touch
    recover_all(os.path.join(out_dir, "pages"), "part=*")
    recover_all(os.path.join(out_dir, "postings"), "part=*")

    deleted = sorted(deleted_urls)
    deleted_arr = pa.array(deleted, pa.string())
    manifest_dir = os.path.join(out_dir, "_manifest")

    def may_contain(part_dir: str) -> bool:
        return _part_may_contain(part_dir, deleted)

    @ray.remote
    def rewrite_partition(pid: int, pages_dir: str, postings_dir: str,
                          manifest_dir: str, deleted_ref):
        import shutil
        import time as _time

        import pyarrow.parquet as pq2

        from ocr_search_ray.state.atomic import recover_aside, swap_dir_in

        t0 = _time.monotonic()
        del_arr = deleted_ref  # ObjectRef args arrive dereferenced
        recover_aside(pages_dir)
        recover_aside(postings_dir)
        pages = pq2.read_table(pages_dir)
        doomed_mask = pc.is_in(pages.column("url"), value_set=del_arr)
        n_doomed = pc.sum(doomed_mask).as_py() or 0
        if n_doomed == 0:
            return 0, 0, None  # stats overlap was a false positive
        doomed_ids = pages.filter(doomed_mask).column("doc_id")
        kept_pages = pages.filter(pc.invert(doomed_mask))
        postings = pq2.read_table(postings_dir)
        doomed_postings_mask = pc.is_in(
            postings.column("doc_id"), value_set=doomed_ids.combine_chunks()
        )
        # tombstones: the doomed posting rows name exactly the index
        # buckets the deletion must cascade into (deleted-cohort-sized)
        doomed_postings = postings.filter(doomed_postings_mask)
        kept_postings = postings.filter(pc.invert(doomed_postings_mask))
        n_postings_removed = postings.num_rows - kept_postings.num_rows

        for src_dir, table in ((pages_dir, kept_pages),
                               (postings_dir, kept_postings)):
            tmp = src_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq2.write_table(table, os.path.join(tmp, "part-0.parquet"),
                            compression="zstd")
            # crash-safe: a crash can no longer leave the partition
            # missing — may_contain() on a vanished dir returns False and
            # would silently skip the partition forever
            swap_dir_in(tmp, src_dir)
        manifest_mod.append_row(
            manifest_dir,
            partition_id=pid,
            stage="compact",
            input_hash="delete:%d" % len(del_arr),
            row_count=kept_pages.num_rows,
            byte_count=0,
            n_errors=0,
            status="done",
            wall_time_s=_time.monotonic() - t0,
        )
        return int(n_doomed), int(n_postings_removed), doomed_postings

    pages_parts = sorted(
        _glob.glob(os.path.join(out_dir, "pages", "part=*"))
    )
    stats = {"partitions": len(pages_parts), "pruned_by_stats": 0,
             "rewritten": 0, "pages_removed": 0, "postings_removed": 0}
    deleted_ref = ray.put(deleted_arr)
    futures = []
    futures_parts = []
    for pages_dir in pages_parts:
        part = os.path.basename(pages_dir)
        if not may_contain(pages_dir):
            stats["pruned_by_stats"] += 1
            continue
        pid = int(part.split("=")[1])
        postings_dir = os.path.join(out_dir, "postings", part)
        futures.append(rewrite_partition.remote(
            pid, pages_dir, postings_dir, manifest_dir, deleted_ref))
        futures_parts.append(part)
    tombstones = []
    stats["rewritten_parts"] = []
    for part, (n_pages, n_postings, doomed) in zip(
            futures_parts, ray.get(futures)):
        if n_pages:
            stats["rewritten"] += 1
            stats["rewritten_parts"].append(part)
            stats["pages_removed"] += n_pages
            stats["postings_removed"] += n_postings
            tombstones.append(doomed)
    if index_dir is not None and tombstones:
        stats["index"] = delete_from_index(
            index_dir, pa.concat_tables(tombstones))
    return stats


def delete_urls(pages, postings, deleted_urls: set[str]):
    """→ (pages', postings') with every page/posting of the urls removed.

    Collect-free cascade: the deleted-url set is the caller's input (driver
    state by definition) and broadcasts via ``ray.put``, but the doomed
    ``doc_id`` set it expands into is crawl-scaled at a tombstone wave — it
    STAYS a dataset and the postings side drops via an anti
    ``cluster_join`` on ``doc_id``, the same plan ``compact_delete_on_disk``
    uses partition-locally (VERDICT r3 #3)."""
    import ray

    from ..stages.relational import cluster_join

    urls_arr = pa.array(sorted(deleted_urls), pa.string())
    urls_ref = ray.put(urls_arr)

    def doomed_rows(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("url"), value_set=ray.get(urls_ref))
        return pa.table({"doc_id": b.filter(keep).column("doc_id")})

    doomed_ids = pages.select_columns(["url", "doc_id"]).map_batches(
        doomed_rows, batch_format="pyarrow"
    )
    postings_types = dict(
        zip(postings.schema().names, postings.schema().types)
    )
    return (
        _filter_not_in(pages, "url", urls_ref),
        cluster_join(
            postings, doomed_ids, ["doc_id"],
            left_types=postings_types, right_types={}, how="anti",
        ),
    )
