"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages. The decode kernels themselves
are STUBBED (no image/audio libraries exist in this container — clearly
marked below); everything Ray-side is real and tested: schema, batch sizing,
actor signature, deterministic fake features, output layout.

Swapping in a real backend = replacing ``_decode_stub`` with e.g. a pinned
PIL/ffmpeg handle created in ``__init__`` — the stage contract is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode/feature-extract: a real deployment raises
    NotImplementedError here or calls a pinned decoder. The deterministic
    fake derives a FEATURE_DIM float vector from the payload digest so
    output layout, dtypes and tests are real."""
    if payload is None:
        raise ValueError("null payload")
    digest = hashlib.sha256(kind.encode() + b"\x00" + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool callable: MEDIA batches → (media_id, kind, status, feature).

    Real backends load their model/codec once here in ``__init__``; batches
    must stay small (payloads are large — callers pass batch_size ≤ 64).
    """

    def __init__(self, feature_dim: int = FEATURE_DIM) -> None:
        self.feature_dim = feature_dim  # model handle would be pinned here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_status: list[str] = []
        out_feat: list[list[float] | None] = []
        for kind, payload in zip(kinds, payloads):
            try:
                vec = _decode_stub(payload, kind)
                out_status.append("ok")
                out_feat.append([float(x) for x in vec])
            except Exception:
                out_status.append("error")  # quarantine, don't fail the block
                out_feat.append(None)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "status": pa.array(out_status, pa.string()),
                "feature": pa.array(out_feat, pa.list_(pa.float32())),
            }
        )


def extract_media_features(media, *, concurrency: int = 2, batch_size: int = 32):
    """Attach the (stubbed) decode/feature stage to a MEDIA dataset."""
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
