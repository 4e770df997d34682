"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages. Decode is routed per row on
MAGIC BYTES:

- **real kernels** for BMP24 images and WAV-PCM16 audio (pure numpy,
  ``functions/media_codecs.py``), GIF87a/89a incl. animation
  (from-scratch LZW, ``functions/gif_codec.py``), baseline JPEG
  (from-scratch DCT+Huffman, ``functions/jpeg_codec.py``), IMA-ADPCM WAV
  (``functions/adpcm.py``) and grayscale PNG (the raster sink's codec,
  ``functions/raster.py``) — complete spec implementations, no external
  libraries needed;
- **real framing probes** for MPEG audio and H.264 Annex-B streams
  (frame-chain walk in ``functions/mp3_probe.py``, NAL/SPS parse in
  ``functions/h264_probe.py``): sample counts / rates / picture
  dimensions / slice counts are REAL parsed evidence (exact-oracled);
  only the inner waveform/pixel reconstruction remains a
- **documented stub** (no full audio/video decoder in this container):
  deterministic digest features so layout, dtypes and quarantine
  plumbing stay real and tested.

Swapping in a full backend = replacing ``_decode_stub`` with e.g. a pinned
PIL/ffmpeg handle created in ``__init__`` — the stage contract is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import media_codecs

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
    """STUB decode/feature-extract for COMPRESSED formats: a real deployment
    calls a pinned decoder here. The deterministic fake derives a
    FEATURE_DIM float vector from the payload digest so output layout,
    dtypes and tests are real."""
    digest = hashlib.sha256(kind.encode() + b"\x00" + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


def _features(payload: bytes, kind: str) -> np.ndarray:
    """Magic-byte routing: REAL kernels for BMP/GIF/PNG/WAV, stub otherwise."""
    return _decode_stats(payload, kind)[0]


def _decode_stats(
    payload: bytes, kind: str
) -> "tuple[np.ndarray, int, int, int, int]":
    """Magic-byte routing with decode evidence: → (feature vector,
    width, height, n_samples, sample_rate); -1 for fields the format does
    not carry. Dims/counts come from the DECODED array shapes — the
    SQL-replayable proof the real codec ran (stub rows report all -1)."""
    if payload is None:
        raise ValueError("null payload")
    if payload[:2] == b"BM":
        img = media_codecs.decode_bmp24(payload)
        return (media_codecs.image_features(img),
                img.shape[1], img.shape[0], -1, -1)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..functions.gif_codec import decode_gif

        img = decode_gif(payload)
        return (media_codecs.image_features(img),
                img.shape[1], img.shape[0], -1, -1)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # the spec-valid grayscale PNG codec the raster sink writes
        from ..functions.raster import decode_png

        gray = decode_png(payload)
        img = np.repeat(gray[:, :, None], 3, axis=2)
        return (media_codecs.image_features(img),
                img.shape[1], img.shape[0], -1, -1)
    if payload[:2] == b"\xff\xd8":
        # baseline JPEG: from-scratch DCT+Huffman codec
        from ..functions.jpeg_codec import decode_jpeg

        img = decode_jpeg(payload)
        return (media_codecs.image_features(img),
                img.shape[1], img.shape[0], -1, -1)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # Motion-JPEG AVI: decode evidence = first frame's DECODED dims
        # plus (n_samples, sample_rate) carrying (frame count, fps) — the
        # video analogue of the audio fields, same -1-elsewhere contract
        from ..functions.avi_mjpeg import _parse_avi
        from ..functions.jpeg_codec import decode_jpeg

        _fps, _jpegs = _parse_avi(payload)
        img = decode_jpeg(_jpegs[0])
        return (media_codecs.image_features(img),
                img.shape[1], img.shape[0], len(_jpegs), _fps)
    if payload[:4] == b"fLaC":
        # FLAC: from-scratch fixed-predictor/Rice codec (CRC + MD5 verified)
        from ..functions.flac_codec import decode_flac

        rate, samples = decode_flac(payload)
        return (media_codecs.audio_features(rate, samples),
                -1, -1, len(samples), rate)
    if payload[:3] == b"\x00\x00\x01" or payload[:4] == b"\x00\x00\x00\x01":
        # H.264 Annex-B: REAL NAL walk + full SPS parse (functions/
        # h264_probe) — width/height from the SPS cropping arithmetic,
        # n_samples carries the coded-slice count (video analogue, same
        # contract as the AVI branch). Pixel reconstruction stays stubbed.
        from ..functions.h264_probe import probe_h264

        info = probe_h264(payload)
        return (_decode_stub(payload, kind),
                info["width"], info["height"], info["n_slices"], -1)
    if payload[:3] == b"ID3" or (
        len(payload) >= 4 and payload[0] == 0xFF and payload[1] >= 0xE0
    ):
        # MPEG audio (MP3): REAL frame-chain walk (functions/mp3_probe) —
        # total PCM samples + sample rate from the parsed headers;
        # waveform decode stays stubbed.
        from ..functions.mp3_probe import probe_mp3

        info = probe_mp3(payload)
        return (_decode_stub(payload, kind),
                -1, -1, info["n_samples"], info["sample_rate"])
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from ..functions import adpcm

        tag = adpcm.wav_format_tag(payload)
        if tag == 0x11:
            rate, mono = adpcm.decode_wav_adpcm(payload)
            return (media_codecs.audio_features(rate, mono[:, None]),
                    -1, -1, len(mono), rate)
        if tag in (0x0006, 0x0007):
            # G.711 A-law / µ-law companded telephony audio
            from ..functions.g711 import decode_wav_g711

            rate, mono = decode_wav_g711(payload)
            return (media_codecs.audio_features(rate, mono[:, None]),
                    -1, -1, len(mono), rate)
        rate, samples = media_codecs.decode_wav_pcm16(payload)
        return (media_codecs.audio_features(rate, samples),
                -1, -1, len(samples), rate)
    return _decode_stub(payload, kind), -1, -1, -1, -1


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
        out_w: list[int] = []
        out_h: list[int] = []
        out_ns: list[int] = []
        out_sr: list[int] = []
        for kind, payload in zip(kinds, payloads):
            try:
                vec, w, h, ns, sr = _decode_stats(payload, kind)
                out_status.append("ok")
                out_feat.append([float(x) for x in vec])
            except Exception:
                out_status.append("error")  # quarantine, don't fail the block
                out_feat.append(None)
                w = h = ns = sr = -1
            out_w.append(w)
            out_h.append(h)
            out_ns.append(ns)
            out_sr.append(sr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "status": pa.array(out_status, pa.string()),
                "feature": pa.array(out_feat, pa.list_(pa.float32())),
                # decoded-shape evidence (−1 = unknown / stub / not carried)
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "n_samples": pa.array(out_ns, pa.int64()),
                "sample_rate": pa.array(out_sr, pa.int32()),
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


class ImageResizer:
    """Actor-pool callable: MEDIA image rows → resized MEDIA rows.

    The pixel transform is STUBBED (no image codec in this container): the
    fake "resize" deterministically re-digests the payload with the target
    box so plumbing (schema preservation, dimension metadata, quarantine,
    batch sizing) is real. A deployment replaces ``_resize_stub`` with a
    pinned PIL/libvips handle created in ``__init__``.
    """

    def __init__(self, max_w: int = 256, max_h: int = 256) -> None:
        self.max_w = max_w
        self.max_h = max_h  # codec handle would be pinned here

    def _box_fit(self, w: int, h: int) -> tuple[int, int]:
        # aspect-preserving box fit
        if w <= 0 or h <= 0:
            return self.max_w, self.max_h
        scale = min(self.max_w / w, self.max_h / h, 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resize_one(self, payload: bytes, w: int, h: int) -> tuple[bytes, int, int]:
        if payload is None:
            raise ValueError("null payload")
        if payload[:2] == b"BM":
            # REAL pixel transform: decode → nearest-neighbor → re-encode
            img = media_codecs.decode_bmp24(payload)
            out_w, out_h = self._box_fit(img.shape[1], img.shape[0])
            resized = media_codecs.resize_nearest(img, out_w, out_h)
            return media_codecs.encode_bmp24(resized), out_w, out_h
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            # REAL compressed-format transform (from-scratch LZW codec)
            from ..functions.gif_codec import decode_gif, encode_gif

            img = decode_gif(payload)
            out_w, out_h = self._box_fit(img.shape[1], img.shape[0])
            resized = media_codecs.resize_nearest(img, out_w, out_h)
            return encode_gif(resized), out_w, out_h
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # REAL transform for the raster sink's grayscale PNGs
            from ..functions.raster import decode_png, encode_png

            gray = decode_png(payload)
            out_w, out_h = self._box_fit(gray.shape[1], gray.shape[0])
            resized = media_codecs.resize_nearest(gray, out_w, out_h)
            return encode_png(resized), out_w, out_h
        if payload[:2] == b"\xff\xd8":
            # REAL baseline-JPEG transform: decode → nearest → re-encode
            from ..functions.jpeg_codec import decode_jpeg, encode_jpeg

            img = decode_jpeg(payload)
            out_w, out_h = self._box_fit(img.shape[1], img.shape[0])
            resized = media_codecs.resize_nearest(img, out_w, out_h)
            return encode_jpeg(resized, quality=90), out_w, out_h
        # STUB for compressed formats: box math real, pixels digest-faked
        out_w, out_h = self._box_fit(w, h)
        fake = hashlib.sha256(
            b"resize\x00" + payload + f"\x00{out_w}x{out_h}".encode()
        ).digest()
        return fake, out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n).to_pylist() for n in batch.column_names}
        out = {n: [] for n in MEDIA.names}
        out_status: list[str] = []
        for i in range(batch.num_rows):
            kind = cols["kind"][i]
            try:
                if kind != "image":
                    raise ValueError(f"not an image: {kind}")
                payload, w, h = self._resize_one(
                    cols["payload"][i], cols["width"][i], cols["height"][i]
                )
                status = "ok"
            except Exception:
                payload, w, h = None, -1, -1
                status = "error"
            out["media_id"].append(cols["media_id"][i])
            out["kind"].append(kind)
            out["payload"].append(payload)
            out["width"].append(w)
            out["height"].append(h)
            out["duration_ms"].append(cols["duration_ms"][i])
            out_status.append(status)
        table = pa.table(
            {n: pa.array(out[n], MEDIA.field(n).type) for n in MEDIA.names}
        ).append_column("status", pa.array(out_status, pa.string()))
        return table


def resize_images(media, *, max_w: int = 256, max_h: int = 256,
                  concurrency: int = 2, batch_size: int = 32):
    """Attach the (stubbed) image-resize actor stage to a MEDIA dataset."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _sample_gif_frames(payload: bytes, every_ms: int, max_frames: int):
    """REAL frame sampling for animated-GIF payloads: decode all frames +
    Graphic Control delays, pick the frame on screen at each every_ms
    tick, re-encode each pick as a single-frame GIF. → (frame_idx list,
    ts_ms list, payload list)."""
    from ..functions.gif_codec import decode_gif_frames, encode_gif

    delays, frames = decode_gif_frames(payload)
    # A GCE delay is the display DURATION of the frame it precedes, so
    # frame i is on screen starting at sum(delays[:i]); total runtime is
    # sum(delays) (zero delays fall back to every_ms).
    starts = [0]
    for d in delays[:-1]:
        starts.append(starts[-1] + (d if d > 0 else every_ms))
    total = starts[-1] + (delays[-1] if delays[-1] > 0 else every_ms)
    out_idx, out_ts, out_payload = [], [], []
    t = 0
    while t < total and len(out_idx) < max_frames:
        # the frame on screen at time t = last frame with start <= t
        fi = max(i for i, s in enumerate(starts) if s <= t)
        out_idx.append(len(out_idx))
        out_ts.append(t)
        out_payload.append(encode_gif(frames[fi]))
        t += every_ms
    return out_idx, out_ts, out_payload


def _sample_avi_frames(payload: bytes, every_ms: int, max_frames: int):
    """REAL frame sampling for MJPEG-AVI payloads: parse the RIFF movi
    chunks + fps, pick the frame on screen at each every_ms tick, emit
    the frame's RAW JPEG bytes (byte-faithful, no re-encode).
    → (frame_idx list, ts_ms list, payload list)."""
    from ..functions.avi_mjpeg import _parse_avi

    fps, jpegs = _parse_avi(payload)
    period = 1000.0 / fps  # frame i on screen [i*period, (i+1)*period)
    total = period * len(jpegs)
    out_idx, out_ts, out_payload = [], [], []
    t = 0
    while t < total and len(out_idx) < max_frames:
        fi = min(int(t // period), len(jpegs) - 1)
        out_idx.append(len(out_idx))
        out_ts.append(t)
        out_payload.append(jpegs[fi])
        t += every_ms
    return out_idx, out_ts, out_payload


def sample_frames(media, *, every_ms: int = 1000, max_frames: int = 8):
    """Video rows → frame rows (1 → N fan-out, the multimodal analogue of
    page fan-out). ANIMATED-GIF payloads decode for REAL (frames +
    Graphic Control delays via the from-scratch LZW codec; each sampled
    frame re-encodes as a single-frame GIF); MJPEG-AVI payloads sample
    for real too (RIFF demux + fps timing, raw JPEG frame bytes out).
    Other containers emit a deterministic fake frame digest — a pinned
    ffmpeg/pyav handle in an actor class replaces that branch with this
    exact contract. Non-video rows are dropped; null/corrupt payloads
    quarantine as one ``status='error'`` row.
    """

    def fan_out(batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n).to_pylist() for n in batch.column_names}
        out_id, out_frame, out_ts, out_payload, out_status = [], [], [], [], []

        def quarantine(i: int) -> None:
            out_id.append(cols["media_id"][i])
            out_frame.append(-1)
            out_ts.append(-1)
            out_payload.append(None)
            out_status.append("error")

        for i in range(batch.num_rows):
            if cols["kind"][i] != "video":
                continue
            payload = cols["payload"][i]
            if payload is None:
                quarantine(i)
                continue
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                try:
                    idxs, tss, payloads = _sample_gif_frames(
                        payload, every_ms, max_frames)
                except ValueError:
                    quarantine(i)
                    continue
                out_id.extend([cols["media_id"][i]] * len(idxs))
                out_frame.extend(idxs)
                out_ts.extend(tss)
                out_payload.extend(payloads)
                out_status.extend(["ok"] * len(idxs))
                continue
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                try:
                    idxs, tss, payloads = _sample_avi_frames(
                        payload, every_ms, max_frames)
                except ValueError:
                    quarantine(i)
                    continue
                out_id.extend([cols["media_id"][i]] * len(idxs))
                out_frame.extend(idxs)
                out_ts.extend(tss)
                out_payload.extend(payloads)
                out_status.extend(["ok"] * len(idxs))
                continue
            duration = max(cols["duration_ms"][i], 0)
            n = min(max_frames, max(1, duration // every_ms + 1))
            for f in range(int(n)):
                ts = f * every_ms
                out_id.append(cols["media_id"][i])
                out_frame.append(f)
                out_ts.append(ts)
                out_payload.append(
                    hashlib.sha256(b"frame\x00" + payload + f"\x00{ts}".encode()).digest()
                )
                out_status.append("ok")
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_frame, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int32()),
                "payload": pa.array(out_payload, pa.binary()),
                "status": pa.array(out_status, pa.string()),
            }
        )

    return media.map_batches(fan_out, batch_format="pyarrow", batch_size=32)
