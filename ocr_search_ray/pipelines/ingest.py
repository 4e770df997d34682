"""Flagship ingest/index pipeline (SURVEY.md §3.1, engine shape).

    read webpages → extract_pages (1→N fan-out, payload dropped)
                  → tokenize (actor pool) → postings
                  → index build (two-phase stats + sorted posting table)
    forks: pages.write_parquet / postings bucketed write / manifest rows

Two entry points:

- ``ingest(webpages)``: lazy composition returning the stage datasets; used
  by ``entry()``/``queries()`` and tests. Nothing is materialized — the
  streaming executor pipelines extract → tokenize with backpressure.

- ``ingest_resumable(input_dir, out_dir)``: the production shape. The unit of
  checkpointing is the input Parquet fragment (at 100 TB: a shard of files);
  each fragment's outputs land in deterministic ``part={id}`` directories and
  a manifest row records lineage + row/byte/error counts. A re-run anti-joins
  fragments against the manifest and skips finished ones — mid-run failure
  costs one partition, not the job (north_rule resumability).
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow.compute as pc

from ..stages.extract import extract_pages
from ..stages.index import term_stats
from ..stages.tokenize import tokenize_pages
from ..state import manifest as manifest_mod

# heavy-payload stage: small batches (payload rows can be MBs); tokenize
# batches larger (text-only rows)
EXTRACT_BATCH_SIZE = 128
TOKENIZE_BATCH_SIZE = 512


def ingest(webpages, *, tokenize_concurrency: int | None = None,
           extract_concurrency: int | None = None,
           extract_backend_factory=None,
           extract_timeout_s: float | None = None):
    """Lazy pipeline: returns dict of stage datasets.

    The ``html`` payload column is consumed inside ``extract_pages`` and never
    crosses a shuffle boundary (SURVEY.md §4 memory pressure).

    Extraction runs as an elastic task pool with per-worker backend state by
    default; ``extract_concurrency=N`` pins a fixed actor pool (heavyweight
    OCR backends), ``extract_backend_factory`` swaps the backend (see
    stages/extract.py), ``extract_timeout_s`` overrides the per-row watchdog
    (default 600 s).
    """
    from ..stages.extract import DEFAULT_EXTRACT_TIMEOUT_S, PageExtractor

    extract_kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=EXTRACT_BATCH_SIZE,
    )
    if (extract_concurrency is None and extract_backend_factory is None
            and extract_timeout_s is None):
        pages = webpages.map_batches(extract_pages, **extract_kwargs)
    elif extract_concurrency is None:
        pages = webpages.map_batches(
            PageExtractor(
                extract_backend_factory,
                timeout_s=(DEFAULT_EXTRACT_TIMEOUT_S
                           if extract_timeout_s is None else extract_timeout_s),
            ),
            **extract_kwargs,
        )
    else:
        pages = webpages.map_batches(
            PageExtractor,
            fn_constructor_args=(extract_backend_factory,),
            fn_constructor_kwargs={
                "timeout_s": (DEFAULT_EXTRACT_TIMEOUT_S
                              if extract_timeout_s is None else extract_timeout_s),
            },
            concurrency=extract_concurrency,
            **extract_kwargs,
        )
    postings = tokenize_pages(
        pages, concurrency=tokenize_concurrency, batch_size=TOKENIZE_BATCH_SIZE
    )
    return {
        "pages": pages,
        "postings": postings,
        "term_stats": term_stats(postings),
    }


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _stabilize_fs_probe() -> None:
    """Make Ray's filesystem probe race-free under driver threads.

    Ray's read/write path resolution tries ``from
    fsspec.implementations.http import HTTPFileSystem`` and catches
    ModuleNotFoundError (aiohttp absent here). A FAILED module import is not
    cached, so two threads resolving paths concurrently can race: one sees
    the other's partially-initialized module and raises a bare ImportError
    ("cannot import name ...") that Ray does not catch. Pre-caching either
    the real module or an isinstance-only stub makes every subsequent import
    hit sys.modules — deterministic and equivalent to the not-installed
    branch (the stub class matches no real filesystem object)."""
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
    except Exception:
        stub = types.ModuleType(name)

        class HTTPFileSystem:  # isinstance sentinel only; never constructed
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules[name] = stub


def _process_fragment(pid: int, webpages, frag_hash: str, out_dir: str,
                      manifest_dir: str,
                      tokenize_concurrency: int | None,
                      ingest_kwargs: dict | None = None) -> None:
    """Run one fragment's (already-constructed) pipeline and append its
    manifest row. Dataset CONSTRUCTION stays on the main thread — Ray's
    read-path filesystem resolution has an import race under concurrent
    first-use from multiple threads; execution itself is thread-safe."""
    import shutil

    t0 = time.monotonic()
    stages = ingest(webpages, tokenize_concurrency=tokenize_concurrency,
                    **(ingest_kwargs or {}))

    pages_dir = os.path.join(out_dir, "pages", f"part={pid:05d}")
    postings_dir = os.path.join(out_dir, "postings", f"part={pid:05d}")
    # Idempotent rerun: Ray's write_parquet APPENDS uniquely-named files, so
    # a crash between write and manifest-append would duplicate rows on
    # reprocessing. Write into a deterministic .tmp dir, then swap it into
    # the final part= dir after clearing any stale partial state (single
    # writer per partition — the manifest gate dedups pending fragments).
    pages_tmp, postings_tmp = pages_dir + ".tmp", postings_dir + ".tmp"
    for d in (pages_tmp, postings_tmp, pages_dir, postings_dir):
        shutil.rmtree(d, ignore_errors=True)
    pages = stages["pages"].materialize()
    pages.write_parquet(pages_tmp, compression="zstd")
    stages["postings"].write_parquet(postings_tmp, compression="zstd")
    os.rename(pages_tmp, pages_dir)
    os.rename(postings_tmp, postings_dir)

    n_rows = pages.count()

    def count_status(kind):
        return pages.map_batches(
            lambda b: b.filter(pc.equal(b.column("status"), kind)),
            batch_format="pyarrow",
        ).count()

    manifest_mod.append_row(
        manifest_dir,
        partition_id=pid,
        stage="ingest",
        input_hash=frag_hash,
        row_count=n_rows,
        byte_count=_dir_bytes(pages_dir) + _dir_bytes(postings_dir),
        n_errors=count_status("error"),
        n_timeouts=count_status("timeout"),
        status="done",
        wall_time_s=time.monotonic() - t0,
    )


def ingest_resumable(
    input_dir: str,
    out_dir: str,
    *,
    tokenize_concurrency: int | None = None,
    fail_after_partitions: int | None = None,
    max_in_flight: int | None = None,
    extract_backend_factory=None,
    extract_timeout_s: float | None = None,
    continue_on_error: bool = True,
) -> dict:
    """Checkpointed ingest over a directory of webpages Parquet fragments.

    Up to ``max_in_flight`` fragment pipelines run concurrently (driver
    threads; Ray executes the datasets side by side) so the driver loop is
    not the throughput ceiling when fragments are numerous — checkpoint
    granularity stays one manifest row per fragment. Default: 4 with the
    elastic tokenizer (task pool), 1 when ``tokenize_concurrency`` pins a
    fixed actor pool — N concurrent pipelines would reserve N pools and
    starve each other on a small CPU budget. ``fail_after_partitions``
    injects a crash after N completed partitions to exercise the resume path
    (forces sequential execution so the crash point is deterministic).
    Returns summary counters.
    """
    if max_in_flight is None:
        max_in_flight = 1 if tokenize_concurrency is not None else 4
    _stabilize_fs_probe()
    from concurrent.futures import ThreadPoolExecutor

    manifest_dir = os.path.join(out_dir, "_manifest")
    done = manifest_mod.done_hashes(manifest_dir, stage="ingest")
    fragments = sorted(
        glob.glob(os.path.join(input_dir, "*.parquet"))
        + glob.glob(os.path.join(input_dir, "*.warc"))
        + glob.glob(os.path.join(input_dir, "*.warc.gz"))
    )

    def _frag_dataset(frag: str):
        # WARC containers (the Common Crawl wire format) are first-class
        # fragments: same manifest row, resume and quarantine semantics
        if frag.endswith((".warc", ".warc.gz")):
            from ..sources.warc import read_warc

            return read_warc([frag])
        return rd.read_parquet(frag)

    pending: list[tuple[int, str, str]] = []
    n_done_before = 0
    for pid, frag in enumerate(fragments):
        frag_hash = manifest_mod.fragment_hash(frag)
        if frag_hash in done:
            n_done_before += 1
        else:
            pending.append((pid, frag, frag_hash))

    import ray.data as rd

    ingest_kwargs = {}
    if extract_backend_factory is not None:
        ingest_kwargs["extract_backend_factory"] = extract_backend_factory
    if extract_timeout_s is not None:
        ingest_kwargs["extract_timeout_s"] = extract_timeout_s

    n_processed = 0
    if fail_after_partitions is not None:
        for pid, frag, frag_hash in pending:
            _process_fragment(pid, _frag_dataset(frag), frag_hash, out_dir,
                              manifest_dir, tokenize_concurrency,
                              ingest_kwargs)
            n_processed += 1
            if n_processed >= fail_after_partitions:
                raise RuntimeError(
                    f"injected failure after {n_processed} partitions"
                )
    n_failed = 0

    def record_failure(pid: int, frag_hash: str) -> None:
        # fragment-level skip-don't-fail (reference posture: one poisoned
        # input never kills the run): record a status='error' manifest row
        # — NOT 'done', so the next run retries it — and keep going
        manifest_mod.append_row(
            manifest_dir,
            partition_id=pid,
            stage="ingest",
            input_hash=frag_hash,
            row_count=0,
            byte_count=0,
            n_errors=0,
            status="error",
        )

    if fail_after_partitions is None and pending:
        with ThreadPoolExecutor(max_workers=max_in_flight) as ex:
            futures = []
            for pid, frag, frag_hash in pending:
                try:
                    # dataset CONSTRUCTION on the main thread (fs-probe
                    # race, see _stabilize_fs_probe); corrupt parquet
                    # metadata raises here
                    ds = _frag_dataset(frag)
                except Exception:
                    if not continue_on_error:
                        raise
                    n_failed += 1
                    record_failure(pid, frag_hash)
                    continue
                futures.append(
                    (pid, frag_hash,
                     ex.submit(_process_fragment, pid, ds, frag_hash,
                               out_dir, manifest_dir, tokenize_concurrency,
                               ingest_kwargs))
                )
            for pid, frag_hash, f in futures:
                try:
                    f.result()
                    n_processed += 1
                except Exception:
                    if not continue_on_error:
                        raise
                    n_failed += 1
                    record_failure(pid, frag_hash)

    return {
        "fragments": len(fragments),
        "skipped_done": n_done_before,
        "processed": n_processed,
        "failed": n_failed,
    }
