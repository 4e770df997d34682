"""The ray-job entry's micro-batch sync loop: resume + incremental merge."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def _run_job(input_dir, out_dir, *extra):
    proc = subprocess.run(
        [sys.executable, "/root/repo/jobs/ingest_job.py",
         "--input", str(input_dir), "--out", str(out_dir),
         "--num-cpus", "4", *extra],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "PYTHONPATH": "/root/repo",
             "RAY_ADDRESS": "local"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_sync_cycle_ingests_new_fragments_and_merges_index(tmp_path):
    """Cycle 1 builds the index from the initial fragments; a new fragment
    appears; cycle 2 (a fresh job submit, the reference's poll loop) skips
    finished fragments, ingests only the new one, and merges its postings
    into the EXISTING index bucket-locally — after which the on-disk query
    path finds the new document."""
    import ray.data as rd

    from ocr_search_ray.sources.webpages import read_webpages

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages("/root/testdata/sf0.001").materialize()
    frags = list(web.split(3))
    for i, sub in enumerate(frags[:2]):
        pq.write_table(pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
                       input_dir / f"frag-{i}.parquet")

    raster_dir = str(tmp_path / "png")
    s1 = _run_job(input_dir, out_dir, "--raster-dir", raster_dir)
    assert s1["processed"] == 2 and s1["index"] == "full_build"
    import glob as _glob

    n_png_1 = len(_glob.glob(f"{raster_dir}/*.png"))
    assert s1["raster"].get("ok", 0) == n_png_1 > 0

    # the poll interval elapses; a new fragment lands
    pq.write_table(pa.Table.from_pandas(frags[2].to_pandas(), preserve_index=False),
                   input_dir / "frag-2.parquet")
    s2 = _run_job(input_dir, out_dir, "--raster-dir", raster_dir)
    assert s2["skipped_done"] == 2 and s2["processed"] == 1
    assert isinstance(s2["index"], dict) and s2["index"]["buckets_affected"] > 0
    # only the NEW fragment's pages rasterized this cycle, additively
    assert s2["raster"].get("ok", 0) > 0
    assert len(_glob.glob(f"{raster_dir}/*.png")) == (
        n_png_1 + s2["raster"]["ok"]
    )

    # merged index == full postings relation
    idx_rows = rd.read_parquet(str(out_dir / "postings_index")).count()
    post_rows = rd.read_parquet(str(out_dir / "postings")).count()
    assert idx_rows == post_rows

    # and the query path serves content from the NEW fragment
    from ocr_search_ray.functions.tokenizer import Tokenizer
    from ocr_search_ray.pipelines.query import search_index

    new_pages = pq.read_table(str(out_dir / "pages" / "part=00002"))
    text = next(t for t in new_pages.column("text").to_pylist() if t)
    term = next(iter(Tokenizer().term_freqs(text)))
    res = search_index(str(out_dir / "postings_index"),
                       str(out_dir / "pages"), term, max_return=5)
    assert res.num_rows > 0

    # cycle 3: a deletions file lands (the sync loop's deletion half) —
    # the doomed url leaves pages/postings AND the index, no rebuild
    doomed_url = new_pages.column("url")[0].as_py()
    dels = tmp_path / "deletions.txt"
    dels.write_text(doomed_url + "\n")
    s3 = _run_job(input_dir, out_dir, "--deletions", str(dels))
    assert s3["delete"]["pages_removed"] >= 1
    assert s3["delete"].get("index", {}).get("buckets_affected", 0) >= 1
    assert not os.path.exists(dels)  # consumed (renamed aside)
    assert os.path.exists(str(dels) + ".done-0")
    survivors = search_index(str(out_dir / "postings_index"),
                             str(out_dir / "pages"), term, max_return=20)
    assert doomed_url not in survivors.column("url").to_pylist()


def test_quality_dir_writes_verdicts_and_resumes_by_output_presence(tmp_path):
    """--quality-dir writes one verdict partition per pages partition
    (atomic publish); a later cycle picks up partitions an earlier run
    missed and reruns are no-ops."""
    import glob as _glob

    from ocr_search_ray.sources.webpages import read_webpages

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages("/root/testdata/sf0.001").materialize()
    frags = list(web.split(3))
    for i, sub in enumerate(frags[:2]):
        pq.write_table(
            pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
            input_dir / f"frag-{i}.parquet")

    qdir = str(tmp_path / "quality")
    s1 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index")
    assert s1["quality"]["partitions_written"] == 2
    parts = sorted(_glob.glob(f"{qdir}/part=*"))
    assert len(parts) == 2 and not _glob.glob(f"{qdir}/*.tmp")
    t = pa.concat_tables(
        pq.read_table(f) for p in parts
        for f in _glob.glob(os.path.join(p, "*.parquet")))
    assert set(t.column_names) == {"doc_id", "keep", "reasons"}
    assert t.num_rows > 0 and t.column("keep").null_count == 0

    # a partition's verdicts vanish (simulated crash before publish) +
    # a new fragment lands: the next cycle writes BOTH
    import shutil
    shutil.rmtree(parts[0])
    pq.write_table(
        pa.Table.from_pandas(frags[2].to_pandas(), preserve_index=False),
        input_dir / "frag-2.parquet")
    s2 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index")
    assert s2["quality"]["partitions_written"] == 2
    assert len(_glob.glob(f"{qdir}/part=*")) == 3
    s3 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index")
    assert s3["quality"] == "unchanged"


def test_deletions_invalidate_and_recompute_quality_verdicts(tmp_path):
    """A deletion-compacted pages partition's verdicts are stale (they
    still carry the deleted docs): the job drops and recomputes them in
    the same cycle, so quality always joins 1:1 to pages."""
    import glob as _glob

    from ocr_search_ray.sources.webpages import read_webpages

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages("/root/testdata/sf0.001").materialize()
    frag = list(web.split(5))[0].materialize()
    pq.write_table(pa.Table.from_pandas(frag.to_pandas(),
                                        preserve_index=False),
                   input_dir / "frag-0.parquet")

    qdir = str(tmp_path / "quality")
    s1 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index")
    assert s1["quality"]["partitions_written"] == 1

    doomed_urls = [r["url"] for r in frag.take(3)]
    delf = tmp_path / "deletions.txt"
    delf.write_text("\n".join(doomed_urls) + "\n")
    s2 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index",
                  "--deletions", str(delf))
    assert s2["delete"]["rewritten"] == 1
    assert s2["delete"]["rewritten_parts"] == ["part=00000"]
    assert s2["quality_recomputed"] == 1

    verdicts = pa.concat_tables(
        pq.read_table(f)
        for f in _glob.glob(f"{qdir}/part=*/*.parquet"))
    pages = pa.concat_tables(
        pq.read_table(f, columns=["doc_id", "url"])
        for f in _glob.glob(f"{out_dir}/pages/part=*/*.parquet"))
    assert set(verdicts.column("doc_id").to_pylist()) == \
        set(pages.column("doc_id").to_pylist())
    assert not set(doomed_urls) & set(pages.column("url").to_pylist())


def test_warc_fragments_are_first_class_job_inputs(tmp_path):
    """A directory of .warc.gz containers runs through the SAME job entry:
    manifest resume, index build, identical page rows to the parquet path."""
    import glob as _glob

    from ocr_search_ray.sources.warc import write_warc_from_documents

    input_dir = str(tmp_path / "in")
    out_dir = tmp_path / "out"
    paths = write_warc_from_documents("/root/testdata/sf0.001", input_dir,
                                      compress=True)

    s1 = _run_job(input_dir, out_dir)
    assert s1["processed"] == len(paths) and s1["failed"] == 0
    assert s1["index"] == "full_build"
    pages = pa.concat_tables(
        pq.read_table(f, columns=["url", "doc_id"])
        for f in _glob.glob(f"{out_dir}/pages/part=*/*.parquet"))
    assert pages.num_rows == 571  # the sf0.001 page count, via WARC
    s2 = _run_job(input_dir, out_dir)
    assert s2["skipped_done"] == len(paths) and s2["processed"] == 0


def test_crash_after_compaction_publish_still_heals_verdicts(tmp_path):
    """ADVICE r5 crash window: the job drops stale verdicts BEFORE the
    compaction publishes, so a crash between publish and recompute leaves
    verdict partitions MISSING (re-derived next cycle), never STALE
    (skipped-forever by presence-based resume). Simulate the worst-case
    crash point — compaction applied, verdicts dropped, deletions file
    unconsumed — and assert the rerun converges to 1:1 quality↔pages."""
    import glob as _glob
    import shutil

    from ocr_search_ray.pipelines.compact import (
        compact_delete_on_disk,
        may_contain_parts,
    )
    from ocr_search_ray.sources.webpages import read_webpages

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages("/root/testdata/sf0.001").materialize()
    frag = list(web.split(5))[0].materialize()
    pq.write_table(pa.Table.from_pandas(frag.to_pandas(),
                                        preserve_index=False),
                   input_dir / "frag-0.parquet")
    qdir = str(tmp_path / "quality")
    s1 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index")
    assert s1["quality"]["partitions_written"] == 1

    # --- crashed cycle, replayed in the job's (fixed) order ---
    doomed_urls = [r["url"] for r in frag.take(3)]
    pages0 = pa.concat_tables(
        pq.read_table(f, columns=["doc_id", "url"])
        for f in _glob.glob(f"{out_dir}/pages/part=*/*.parquet"))
    doomed_ids = {
        r["doc_id"] for r in pages0.to_pylist() if r["url"] in doomed_urls
    }
    affected = may_contain_parts(str(out_dir), set(doomed_urls))
    assert affected == ["part=00000"]
    for part in affected:
        shutil.rmtree(os.path.join(qdir, part), ignore_errors=True)
    stats = compact_delete_on_disk(str(out_dir), set(doomed_urls))
    assert stats["rewritten"] == 1
    # CRASH here: no quality recompute, deletions file never consumed
    assert not _glob.glob(f"{qdir}/part=*")  # missing, not stale

    delf = tmp_path / "deletions.txt"
    delf.write_text("\n".join(doomed_urls) + "\n")
    s2 = _run_job(input_dir, out_dir, "--quality-dir", qdir, "--skip-index",
                  "--deletions", str(delf))
    # rerun's compaction rewrites nothing (urls already gone) — the old
    # post-hoc drop keyed on rewritten_parts would have left verdicts stale
    assert s2["delete"]["rewritten"] == 0
    assert not os.path.exists(delf)

    verdicts = pa.concat_tables(
        pq.read_table(f) for f in _glob.glob(f"{qdir}/part=*/*.parquet"))
    pages = pa.concat_tables(
        pq.read_table(f, columns=["doc_id"])
        for f in _glob.glob(f"{out_dir}/pages/part=*/*.parquet"))
    assert set(verdicts.column("doc_id").to_pylist()) == \
        set(pages.column("doc_id").to_pylist())
    assert not doomed_ids & set(verdicts.column("doc_id").to_pylist())
