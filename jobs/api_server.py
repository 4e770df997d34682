#!/usr/bin/env python
"""API-server job — serve a built index over HTTP (reference ApiServer).

    python jobs/api_server.py --index /data/out/postings_index \\
        --pages /data/out/pages --png /data/out/png --port 3000

Endpoints (reference parity, ``src/ApiServer/ApiHandler.const.js``):
``GET /pages?searchTerm=...&maxReturn=N`` and ``GET /pageImg/<imgPath>``.
This entry point owns the Ray session (the library never calls
``ray.init``); the query path is the bucket-pruned on-disk point lookup,
so serving does not re-run ingest.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True,
                    help="postings_index directory (term_bucket=* layout)")
    ap.add_argument("--pages", required=True,
                    help="pages parquet directory (part=* layout)")
    ap.add_argument("--png", required=True,
                    help="page-image artifact directory (S8 sink output)")
    ap.add_argument("--port", type=int, default=3000)
    ap.add_argument("--history-dir", default=None,
                    help="append-only search-history sink (S7)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a cluster)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus is not None:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    from ocr_search_ray.server import make_server

    server = make_server(args.index, args.pages, args.png,
                         port=args.port, history_dir=args.history_dir)
    print(f"INFO [api_server]: start listening on port "
          f"{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
