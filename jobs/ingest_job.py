#!/usr/bin/env python
"""Production ingest job — the ``ray job submit`` entry point (north_rule).

    ray job submit --working-dir . -- \
        python jobs/ingest_job.py --input /data/webpages --out /data/out

Runs the checkpointed ingest (extract → pages + postings per input
fragment, one manifest row per partition) and then builds the bucketed
posting index from the persisted postings. Safe to resubmit after any
failure: finished fragments are skipped via the manifest
(state/manifest.py), and partition outputs are deterministically named so
rewrites are idempotent.

On a cluster the same script runs unmodified — parallelism comes from the
Dataset partitioning, not from this driver.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _quality_pass(quality_dir: str, out_dir: str) -> int:
    """Write one Gopher-verdict partition per CANONICAL pages partition
    that lacks one (resume by output presence). Heals crash-leftover
    aside dirs first and skips ``.old``/``.tmp`` names so a crashed
    compaction can never feed stale pages into verdicts. → written."""
    import glob
    import shutil

    import ray.data as rd

    from ocr_search_ray.stages.textstats import quality_filter
    from ocr_search_ray.state.atomic import recover_all

    os.makedirs(quality_dir, exist_ok=True)
    # heal any pages partition a crashed compaction left aside (the
    # CLAUDE.md rule: writers heal before reading a dir as input)
    recover_all(os.path.join(out_dir, "pages"), "part=*")
    written = 0
    for d in sorted(glob.glob(f"{out_dir}/pages/part=*")):
        part = os.path.basename(d)
        if part.endswith(".old") or part.endswith(".tmp"):
            continue  # non-canonical leftovers are never verdict input
        out_part = os.path.join(quality_dir, part)
        if os.path.isdir(out_part):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            continue
        tmp = out_part + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        quality_filter(
            rd.read_parquet(files, columns=["doc_id", "text"])
        ).write_parquet(tmp, compression="zstd")
        os.rename(tmp, out_part)  # atomic publish per partition
        written += 1
    return written


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory of webpages parquet fragments")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--skip-index", action="store_true",
                    help="only ingest; do not (re)build the posting index")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a cluster)")
    ap.add_argument("--deletions", default=None,
                    help="newline-delimited url list; each cycle applies it "
                         "as a delete-cascade compaction (pages/postings "
                         "partitions + posting index, no rebuild) and then "
                         "renames the file aside — the sync loop's deletion "
                         "half (DropboxSynchronizer fullDeletion parity)")
    ap.add_argument("--quality-dir", default=None,
                    help="also write per-page Gopher quality verdicts "
                         "(doc_id, keep, reasons) to this directory, one "
                         "partition per pages partition; resume is by "
                         "output presence (a crashed cycle's missing "
                         "partitions are picked up on any later cycle)")
    ap.add_argument("--raster-dir", default=None,
                    help="also write one <doc_id>.png page-image artifact "
                         "per NEW page to this directory (S8 sink; atomic, "
                         "idempotent — reruns converge to identical bytes)")
    ap.add_argument("--cycles", type=int, default=1,
                    help="micro-batch sync cycles (reference: the 15-min "
                         "poll loop); each cycle ingests NEW fragments and "
                         "merges their postings into the index incrementally")
    ap.add_argument("--interval", type=float, default=0.0,
                    help="seconds to sleep between cycles")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus is not None:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    import glob

    import ray.data as rd

    from ocr_search_ray.pipelines.ingest import ingest_resumable
    from ocr_search_ray.stages.index import build_index, merge_into_index

    index_dir = f"{args.out}/postings_index"
    t0 = time.monotonic()
    summaries = []
    for cycle in range(args.cycles):
        if cycle > 0 and args.interval:
            time.sleep(args.interval)
        before = set(glob.glob(f"{args.out}/postings/part=*"))
        before_pages = set(glob.glob(f"{args.out}/pages/part=*"))
        summary = ingest_resumable(args.input, args.out)
        if args.raster_dir:
            from ocr_search_ray.stages.raster import rasterize_pages

            # only the NEW page partitions rasterize this cycle (the sink
            # is idempotent, but skipping finished partitions is free)
            new_pages = sorted(
                set(glob.glob(f"{args.out}/pages/part=*")) - before_pages
            )
            # a LIST of paths is read verbatim (no directory expansion) —
            # enumerate the partition dirs' files explicitly
            page_files = [
                f for d in new_pages
                for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            ]
            if page_files:
                written = rasterize_pages(
                    rd.read_parquet(
                        page_files, columns=["doc_id", "text", "status"]),
                    args.raster_dir,
                )
                partials = written.map_batches(
                    lambda b: b.group_by("status").aggregate(
                        [("doc_id", "count")]),
                    batch_format="pyarrow",
                ).take_all()  # ≤ statuses × blocks rows
                counts: dict[str, int] = {}
                for r in partials:
                    counts[r["status"]] = (
                        counts.get(r["status"], 0) + r["doc_id_count"]
                    )
                summary["raster"] = counts
            else:
                summary["raster"] = "unchanged"
        if args.quality_dir:
            written = _quality_pass(args.quality_dir, args.out)
            summary["quality"] = (
                {"partitions_written": written} if written else "unchanged"
            )
        if not args.skip_index:
            new_parts = sorted(
                set(glob.glob(f"{args.out}/postings/part=*")) - before
            )
            if not os.path.isdir(f"{args.out}/postings"):
                # nothing ingested (e.g. every fragment quarantined as
                # status='error') — surface it instead of crashing on a
                # missing dir; the manifest rows carry the diagnosis
                summary["index"] = "no_postings"
            elif not os.path.isdir(index_dir):
                # first cycle: full build from everything ingested so far
                build_index(rd.read_parquet(f"{args.out}/postings"),
                            out_dir=index_dir)
                summary["index"] = "full_build"
            elif new_parts:
                # later cycles: only the NEW fragments' postings merge in,
                # touching only their term buckets (reference parity: the
                # sync loop upserts increments, never rebuilds)
                stats = merge_into_index(rd.read_parquet(new_parts),
                                         index_dir)
                summary["index"] = stats
            else:
                summary["index"] = "unchanged"
        if args.deletions and os.path.exists(args.deletions):
            from ocr_search_ray.pipelines.compact import (
                compact_delete_on_disk,
            )

            with open(args.deletions) as fh:
                doomed = {ln.strip() for ln in fh if ln.strip()}
            if doomed:
                if args.quality_dir:
                    # verdicts of a to-be-rewritten pages partition are
                    # stale (they still carry the deleted docs). Drop
                    # them BEFORE the compaction publishes: a crash after
                    # publish would leave the rerun's compaction with
                    # nothing to rewrite while presence-based resume
                    # keeps the stale verdicts forever (ADVICE r5).
                    # Dropped-then-crashed is safe the other way — the
                    # next cycle's _quality_pass re-derives the missing
                    # partitions from whatever pages state it finds.
                    import shutil

                    from ocr_search_ray.pipelines.compact import (
                        may_contain_parts,
                    )

                    for part in may_contain_parts(args.out, doomed):
                        shutil.rmtree(
                            os.path.join(args.quality_dir, part),
                            ignore_errors=True,
                        )
                summary["delete"] = compact_delete_on_disk(
                    args.out, doomed,
                    index_dir=(index_dir
                               if os.path.isdir(index_dir) else None),
                )
                if args.quality_dir:
                    requality = _quality_pass(args.quality_dir, args.out)
                    summary["quality_recomputed"] = requality
            # consume the file so a rerun of the cycle is a no-op (the
            # compaction itself is idempotent either way)
            os.replace(args.deletions,
                       f"{args.deletions}.done-{cycle}")
        summary["cycle"] = cycle
        summaries.append(summary)
    out = summaries[-1] if args.cycles == 1 else {"cycles": summaries}
    out["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
