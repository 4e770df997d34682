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

Scale: one small PNG per page, written by whatever worker holds the block
— no shuffle, no driver state; at cluster scale ``artifact_dir`` is a
shared/object store path and the write fans out with the map stage.
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
