"""End-to-end ingest over Ray Data: byte identity + determinism + resume."""

import collections
import os

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_search_ray.pipelines.ingest import ingest, ingest_resumable
from ocr_search_ray.sources.webpages import doc_url, read_webpages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stage_outputs():
    webpages = read_webpages(SF_DIR)
    stages = ingest(webpages, tokenize_concurrency=2)
    return {
        "pages": stages["pages"].materialize(),
        "postings": stages["postings"].materialize(),
        "term_stats": stages["term_stats"].materialize(),
    }


def test_pages_byte_identical_per_url(stage_outputs):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    orig = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))

    by_url = collections.defaultdict(dict)
    for row in stage_outputs["pages"].take_all():
        by_url[row["url"]][row["page_idx"]] = row["text"]

    assert len(by_url) == docs.num_rows
    for d, text in orig.items():
        parts = by_url[doc_url(d)]
        joined = "".join(parts[i] for i in sorted(parts))
        assert joined == text  # byte-identical extracted text per url


def test_no_error_rows_on_clean_corpus(stage_outputs):
    statuses = {r["status"] for r in stage_outputs["pages"].take_all()}
    assert "error" not in statuses


def test_postings_match_inprocess_tokenizer(stage_outputs):
    from ocr_search_ray.functions.tokenizer import tokenize

    pages = {r["doc_id"]: r["text"] for r in stage_outputs["pages"].take_all()}
    got = collections.defaultdict(dict)
    for r in stage_outputs["postings"].take_all():
        got[r["doc_id"]][r["term"]] = r["tf"]
    for did, text in pages.items():
        expected = tokenize(text)
        assert got.get(did, {}) == expected


def test_term_stats_consistent(stage_outputs):
    postings = stage_outputs["postings"].take_all()
    df = collections.Counter()
    cf = collections.Counter()
    for r in postings:
        df[r["term"]] += 1
        cf[r["term"]] += r["tf"]
    stats = {r["term"]: (r["df"], r["cf"]) for r in stage_outputs["term_stats"].take_all()}
    assert stats == {t: (df[t], cf[t]) for t in df}


def test_ingest_deterministic_across_runs(stage_outputs):
    rerun = ingest(read_webpages(SF_DIR), tokenize_concurrency=2)
    a = sorted(
        (r["doc_id"], r["term"], r["tf"]) for r in rerun["postings"].take_all()
    )
    b = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in stage_outputs["postings"].take_all()
    )
    assert a == b


def test_resumable_ingest_skips_done_partitions(tmp_path):
    # shard the input into 4 fragments
    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    webpages = read_webpages(SF_DIR).materialize()
    for i, sub in enumerate(webpages.split(4)):
        tbl = sub.to_pandas()
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                       input_dir / f"frag-{i}.parquet")

    # crash after 2 partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2,
                         fail_after_partitions=2)

    # resume: must skip the 2 finished ones, finish the rest
    summary = ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2)
    assert summary["skipped_done"] == 2
    assert summary["processed"] == 2

    # full output present exactly once (no dup partitions)
    pages = rd.read_parquet(str(out_dir / "pages")).take_all()
    n_input = read_webpages(SF_DIR).count()
    urls = {r["url"] for r in pages}
    assert len(urls) == n_input

    # rerun again: everything skipped
    summary2 = ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2)
    assert summary2["skipped_done"] == 4 and summary2["processed"] == 0


def test_resumable_ingest_idempotent_after_partial_write(tmp_path):
    """Crash AFTER write_parquet but BEFORE the manifest append (the dominant
    failure window) must not duplicate rows on rerun: the rerun clears the
    partition's partial state before rewriting. Asserts ROW COUNTS, not url
    sets — appends would pass a set compare."""
    import pyarrow as pa

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    webpages = read_webpages(SF_DIR).materialize()
    for i, sub in enumerate(webpages.split(2)):
        pq.write_table(pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
                       input_dir / f"frag-{i}.parquet")

    # clean reference run
    ref_dir = tmp_path / "ref"
    ingest_resumable(str(input_dir), str(ref_dir), tokenize_concurrency=2)
    ref_pages = rd.read_parquet(str(ref_dir / "pages")).count()
    ref_postings = rd.read_parquet(str(ref_dir / "postings")).count()

    # simulate crash-after-write-before-manifest: partition dirs hold rows
    # (full AND partial/tmp) but no manifest row exists
    import shutil

    shutil.copytree(ref_dir / "pages", out_dir / "pages")
    shutil.copytree(ref_dir / "postings", out_dir / "postings")
    # plus a leftover tmp dir from a mid-write crash
    shutil.copytree(ref_dir / "pages" / "part=00000",
                    out_dir / "pages" / "part=00000.tmp")

    summary = ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2)
    assert summary["processed"] == 2  # nothing in manifest => reprocess all

    assert rd.read_parquet(str(out_dir / "pages")).count() == ref_pages
    assert rd.read_parquet(str(out_dir / "postings")).count() == ref_postings
    assert not (out_dir / "pages" / "part=00000.tmp").exists()


def test_resumable_ingest_concurrent_fragments(tmp_path):
    """max_in_flight > 1 (elastic tokenizer): all fragments complete, one
    manifest row each, outputs identical to sequential processing."""
    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    webpages = read_webpages(SF_DIR).materialize()
    for i, sub in enumerate(webpages.split(3)):
        import pyarrow as pa

        pq.write_table(
            pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
            input_dir / f"frag-{i}.parquet",
        )
    summary = ingest_resumable(str(input_dir), str(out_dir), max_in_flight=3)
    assert summary["processed"] == 3 and summary["skipped_done"] == 0
    pages = rd.read_parquet(str(out_dir / "pages")).take_all()
    assert {r["url"] for r in pages} == {
        r["url"] for r in webpages.take_all()
    }
    from ocr_search_ray.state import manifest as m

    rows = m.read(str(out_dir / "_manifest"))
    assert rows.num_rows == 3
    assert set(rows.column("status").to_pylist()) == {"done"}


def test_ingest_watchdog_timeout_recorded_in_manifest(tmp_path):
    """A pathological page inside a Ray worker expires the per-row watchdog;
    the fragment completes, the quarantine row is written, and the manifest
    counts it in n_timeouts (reference parity: resolve-empty-and-continue,
    never a stalled block)."""
    import time

    import pyarrow as pa

    from ocr_search_ray.stages.extract import DefaultBackend

    class SlowOnMarker(DefaultBackend):
        def extract(self, payload, text):
            if payload is not None and payload.startswith(b"SLOW"):
                t0 = time.monotonic()
                while time.monotonic() - t0 < 10:
                    pass
            return super().extract(payload, text)

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages(SF_DIR).limit(40).to_pandas()
    web.loc[0, "html"] = b"SLOW payload"
    pq.write_table(
        pa.Table.from_pandas(web, preserve_index=False).cast(
            pa.schema([(f.name, f.type) for f in
                       pa.Table.from_pandas(web, preserve_index=False).schema])
        ),
        input_dir / "frag-0.parquet",
    )

    summary = ingest_resumable(
        str(input_dir), str(out_dir), tokenize_concurrency=2,
        extract_backend_factory=SlowOnMarker, extract_timeout_s=0.3,
    )
    assert summary["processed"] == 1

    from ocr_search_ray.state import manifest as m

    rows = m.read(str(out_dir / "_manifest"))
    assert rows.column("n_timeouts").to_pylist() == [1]
    pages = rd.read_parquet(str(out_dir / "pages"))
    statuses = [r["status"] for r in pages.take_all()]
    assert statuses.count("timeout") == 1
    assert len(statuses) >= 40  # everything else extracted


def test_poisoned_fragment_skipped_and_retried(tmp_path):
    """One corrupt input fragment must not kill the job (reference
    skip-don't-fail at the task level, here at fragment granularity): the
    run completes the healthy fragments, records a status='error' manifest
    row for the poisoned one, and a rerun AFTER the fragment is fixed
    processes it (error rows don't count as done)."""
    import pyarrow as pa

    from ocr_search_ray.state import manifest as m

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    webpages = read_webpages(SF_DIR).materialize()
    frags = list(webpages.split(3))
    for i, sub in enumerate(frags):
        pq.write_table(pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
                       input_dir / f"frag-{i}.parquet")
    # poison fragment 1
    good_bytes = (input_dir / "frag-1.parquet").read_bytes()
    (input_dir / "frag-1.parquet").write_bytes(b"not a parquet file at all")

    summary = ingest_resumable(str(input_dir), str(out_dir),
                               tokenize_concurrency=2)
    assert summary["processed"] == 2 and summary["failed"] == 1
    rows = m.read(str(out_dir / "_manifest"))
    assert rows.column("status").to_pylist().count("error") == 1

    # fail-fast mode propagates instead
    import pytest as _pytest

    with _pytest.raises(Exception):
        ingest_resumable(str(input_dir), str(tmp_path / "out2"),
                         tokenize_concurrency=2, continue_on_error=False)

    # fix the fragment; rerun picks it up (new hash, error row not 'done')
    (input_dir / "frag-1.parquet").write_bytes(good_bytes)
    summary2 = ingest_resumable(str(input_dir), str(out_dir),
                                tokenize_concurrency=2)
    assert summary2["processed"] == 1 and summary2["skipped_done"] == 2
    pages = rd.read_parquet(str(out_dir / "pages"))
    assert {r["url"] for r in pages.take_all()} == {
        r["url"] for r in webpages.take_all()
    }


def test_modified_document_flow_delete_compact_reingest_merge(tmp_path):
    """The reference's modified-file path (diff 'modified' → delete + re-add,
    DropboxSynchronizer) composed from the engine's incremental pieces:
    on-disk delete compaction removes the old version's pages+postings,
    re-ingest writes the new fragment, bucket-local merge folds its
    postings into the index — and the query path then serves the NEW text
    and not the old."""
    import pyarrow as pa

    from ocr_search_ray.pipelines.compact import compact_delete_on_disk
    from ocr_search_ray.pipelines.query import search_index
    from ocr_search_ray.stages.index import build_index, merge_into_index

    input_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(input_dir)
    web = read_webpages(SF_DIR).materialize()
    frags = list(web.split(2))
    for i, sub in enumerate(frags):
        pq.write_table(pa.Table.from_pandas(sub.to_pandas(), preserve_index=False),
                       input_dir / f"frag-{i}.parquet")
    ingest_resumable(str(input_dir), str(out_dir), tokenize_concurrency=2)
    index_dir = str(out_dir / "postings_index")
    build_index(rd.read_parquet(str(out_dir / "postings")), index_dir)

    # v2 of one document arrives (same url, new text with a fresh term)
    f0 = pq.read_table(str(input_dir / "frag-0.parquet"))
    victim_url = f0.column("url")[0].as_py()
    marker = "zzmodifiedmarker"
    v2 = pa.table(
        {
            "url": pa.array([victim_url], pa.string()),
            "warc_ts": f0.column("warc_ts").slice(0, 1),
            "html": pa.array([None], pa.binary()),
            "text": pa.array([f"fresh {marker} content body"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )

    # 1. delete the old version everywhere — pages+postings partitions AND
    #    the index (tombstone-driven bucket anti-filter, no rebuild)
    stats = compact_delete_on_disk(str(out_dir), {victim_url},
                                   index_dir=index_dir)
    assert stats["pages_removed"] >= 1
    assert stats["index"]["postings_removed"] == stats["postings_removed"]
    assert 0 < stats["index"]["buckets_affected"] < 64

    # 2. the new fragment lands and re-ingests (new hash -> processed)
    pq.write_table(v2, input_dir / "frag-v2.parquet")
    summary = ingest_resumable(str(input_dir), str(out_dir),
                               tokenize_concurrency=2)
    assert summary["processed"] == 1 and summary["skipped_done"] == 2

    # 3. merge ONLY the new partition's postings into the index
    new_post_dir = sorted(
        (out_dir / "postings").glob("part=*"))[-1]
    merge_stats = merge_into_index(rd.read_parquet(str(new_post_dir)),
                                   index_dir)
    assert 0 < merge_stats["buckets_affected"]

    # 4. the query path serves the new version
    res = search_index(index_dir, str(out_dir / "pages"), marker,
                       max_return=5)
    assert res.num_rows == 1
    assert res.column("url").to_pylist() == [victim_url]
