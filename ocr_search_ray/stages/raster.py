"""Page-image artifact sink (SURVEY.md S8/O9) — real PNG bytes per page.

The reference writes one PNG per pdf page (``pdf2png``,
``src/TypeConverter/TypeConverter.class.js:124-191``), flattens them to
``data/png/<docId>.png`` (``src/ProcessDirector/ProcessDirector.class.js:
119-156``) and serves them statically (``src/ApiServer/ApiHandler.const.
js:49-58``) — a search hit's ``imgPath`` resolves to an actual image.

Engine shape: a ``map_batches`` stage over the PAGES dataset. The raster
backend is pinned once per worker (ST3 pattern); each page row renders to
a spec-valid PNG written atomically to ``<artifact_dir>/<doc_id>.png``
(unique tmp + ``os.replace`` — idempotent: the bytes are a deterministic
function of the page text, so a rerun converges to identical files).
Error/timeout quarantine rows are skipped, not failed — the reference's
tolerate-and-continue semantics.

Scale: two layouts.

- **flat** (:func:`rasterize_pages`): one ``<doc_id>.png`` file per page —
  the reference's own layout, right for serving small corpora directly.
- **packed** (:func:`rasterize_pages_packed`): at 10^12 pages one file per
  page is a small-files catastrophe on any filesystem/object store, so the
  scale layout packs the PNG bytes as a binary column in bucketed parquet
  (``png_bucket=crc32(doc_id)%N`` dirs — the same point-lookup layout as
  ``index.write_pages_indexed``); :func:`read_page_image_packed` resolves
  one doc_id by opening only its bucket. Renderers fetch via the resolver
  instead of a static path; everything else (naming key, idempotency,
  determinism) is identical.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..functions.raster import TextRasterBackend, encode_png


class PageRasterizer:
    """map_batches callable: PAGES → page-image artifact rows.

    Emits ``(doc_id, img_path, width, height, bytes_written, status)``;
    ``img_path`` is the flat ``<doc_id>.png`` name (relative to
    ``artifact_dir``), matching the ``pages.img_path`` column written by
    the extract stage — the join key a result renderer uses.
    """

    def __init__(self, artifact_dir: str, backend_factory=None) -> None:
        self.artifact_dir = artifact_dir
        self.backend = (backend_factory or TextRasterBackend)()
        os.makedirs(artifact_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # workers may land on nodes where the driver's makedirs never ran
        os.makedirs(self.artifact_dir, exist_ok=True)
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        statuses = batch.column("status").to_pylist()
        out_w, out_h, out_b, out_s = [], [], [], []
        pid = os.getpid()
        for did, text, status in zip(doc_ids, texts, statuses):
            if status in ("error", "timeout"):
                out_w.append(0)
                out_h.append(0)
                out_b.append(0)
                out_s.append("skipped")
                continue
            img = self.backend.rasterize(text or "")
            png = encode_png(img)
            final = os.path.join(self.artifact_dir, f"{did}.png")
            tmp = f"{final}.{pid}.tmp"
            with open(tmp, "wb") as f:
                f.write(png)
            os.replace(tmp, final)
            out_w.append(img.shape[1])
            out_h.append(img.shape[0])
            out_b.append(len(png))
            out_s.append("ok")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "img_path": pa.array(
                    [f"{d}.png" for d in doc_ids], pa.string()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "bytes_written": pa.array(out_b, pa.int64()),
                "status": pa.array(out_s, pa.string()),
            }
        )


def read_page_image(artifact_dir: str, img_path: str) -> bytes:
    """Resolve a search hit's ``img_path`` to its PNG bytes — the engine's
    equivalent of the reference's static file serving
    (``src/ApiServer/ApiHandler.const.js:49-58``: ``GET /pageImg/<imgPath>``
    over ``express.static('data/png')``). Raises ``FileNotFoundError`` when
    the page was quarantined (never rasterized)."""
    if os.path.basename(img_path) != img_path:
        raise ValueError("img_path is a flat <doc_id>.png name")
    with open(os.path.join(artifact_dir, img_path), "rb") as f:
        return f.read()


def rasterize_pages(pages, artifact_dir: str, *, backend_factory=None,
                    batch_size: int = 256):
    """PAGES dataset → artifact-row dataset; one ``<doc_id>.png`` written
    per non-quarantined page row (see :class:`PageRasterizer`)."""
    return pages.select_columns(["doc_id", "text", "status"]).map_batches(
        PageRasterizer(artifact_dir, backend_factory),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


N_PNG_BUCKETS_DEFAULT = 64


class PackedPageRasterizer:
    """map_batches callable: PAGES → (doc_id, img_path, png, width,
    height, status, png_bucket) rows — the parquet-packed artifact layout
    (no filesystem writes here; the caller's ``write_parquet`` is the
    sink, so Ray's write path owns atomicity/idempotency)."""

    def __init__(self, backend_factory=None,
                 n_buckets: int = N_PNG_BUCKETS_DEFAULT) -> None:
        self.backend = (backend_factory or TextRasterBackend)()
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        statuses = batch.column("status").to_pylist()
        pngs, out_w, out_h, out_s = [], [], [], []
        for text, status in zip(texts, statuses):
            if status in ("error", "timeout"):
                pngs.append(None)
                out_w.append(0)
                out_h.append(0)
                out_s.append("skipped")
                continue
            img = self.backend.rasterize(text or "")
            pngs.append(encode_png(img))
            out_w.append(img.shape[1])
            out_h.append(img.shape[0])
            out_s.append("ok")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "img_path": pa.array(
                    [f"{d}.png" for d in doc_ids], pa.string()),
                "png": pa.array(pngs, pa.binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "status": pa.array(out_s, pa.string()),
                "png_bucket": pa.array(
                    [zlib.crc32(str(d).encode()) % self.n_buckets
                     for d in doc_ids],
                    pa.int32(),
                ),
            }
        )


def rasterize_pages_packed(pages, artifact_dir: str, *,
                           backend_factory=None,
                           n_buckets: int = N_PNG_BUCKETS_DEFAULT,
                           batch_size: int = 256) -> None:
    """The SCALE artifact sink: PNG bytes packed as a binary parquet
    column, bucketed ``png_bucket=crc32(doc_id)%n_buckets`` dirs — few
    large files per bucket instead of one file per page. One point lookup
    opens one bucket dir (:func:`read_page_image_packed`).

    Write ONCE per corpus snapshot into a fresh ``artifact_dir``: a rerun
    into a populated dir appends part files (duplicate doc_id rows —
    reads stay deterministic since every copy carries identical bytes,
    but storage grows). Incremental per-cycle artifact writes should use
    the flat layout (:func:`rasterize_pages`, per-file ``os.replace``
    idempotency) or write each micro-batch to its own subdir."""
    pages.select_columns(["doc_id", "text", "status"]).map_batches(
        PackedPageRasterizer(backend_factory, n_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).write_parquet(
        artifact_dir, partition_cols=["png_bucket"], compression="zstd"
    )


def read_page_image_packed(artifact_dir: str, doc_id: str,
                           n_buckets: int = N_PNG_BUCKETS_DEFAULT) -> bytes:
    """Point lookup in the packed layout: open ONLY the doc's bucket dir,
    filter for its row, return the PNG bytes."""
    import glob as _glob
    import zlib

    import pyarrow.parquet as pq

    bucket = zlib.crc32(str(doc_id).encode()) % n_buckets
    files = sorted(_glob.glob(
        os.path.join(artifact_dir, f"png_bucket={bucket}", "*.parquet")))
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "png"],
                          filters=[("doc_id", "=", doc_id)])
        if t.num_rows:
            png = t.column("png")[0].as_py()
            if png is None:
                break  # quarantined page — recorded but never rendered
            return png
    raise FileNotFoundError(f"no packed page image for doc_id={doc_id}")
