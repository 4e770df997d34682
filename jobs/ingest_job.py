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
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory of webpages parquet fragments")
    ap.add_argument("--out", required=True, help="output root directory")
    ap.add_argument("--skip-index", action="store_true",
                    help="only ingest; do not (re)build the posting index")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a cluster)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus is not None:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    import ray.data as rd

    from ocr_search_ray.pipelines.ingest import ingest_resumable
    from ocr_search_ray.stages.index import build_index

    t0 = time.monotonic()
    summary = ingest_resumable(args.input, args.out)
    if not args.skip_index:
        postings = rd.read_parquet(f"{args.out}/postings")
        build_index(postings, out_dir=f"{args.out}/postings_index")
    summary["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
