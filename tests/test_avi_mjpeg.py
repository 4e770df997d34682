"""RIFF-AVI / Motion-JPEG container codec + its media-router wiring."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_search_ray.functions.avi_mjpeg import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    is_avi,
    probe_avi_mjpeg,
)


def _frames(n, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for f in range(n):
        img = np.stack(
            [(xx * 3 + f * 20) % 256, (yy * 5) % 256, np.full_like(xx, 128)],
            axis=2,
        ).astype(np.uint8)
        out.append(img)
    return out


def test_roundtrip_dims_count_fps_and_pixels():
    for n, fps, h, w in [(1, 10, 8, 8), (4, 5, 24, 32), (3, 30, 17, 23)]:
        frames = _frames(n, h, w)
        avi = encode_avi_mjpeg(frames, fps=fps, quality=90)
        assert is_avi(avi)
        out_fps, out = decode_avi_mjpeg(avi)
        assert out_fps == fps and len(out) == n
        assert out[0].shape == (h, w, 3)
        for a, b in zip(frames, out):
            # baseline JPEG at q=90 on smooth gradients: ~1 LSB mean error
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0
    assert probe_avi_mjpeg(avi) == (23, 17, 3, 30)


def test_decode_rejects_garbage():
    for bad in [b"", b"RIFF", b"RIFF\x00\x00\x00\x04WAVE",
                b"RIFF\x10\x00\x00\x00AVI \x00" * 3]:
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], fps=10)
    with pytest.raises(ValueError):
        encode_avi_mjpeg(
            [np.zeros((8, 8, 3), np.uint8), np.zeros((4, 8, 3), np.uint8)])


def test_decoder_tolerates_unknown_chunks():
    # real-world AVIs carry JUNK padding and INFO lists; splice both in
    import struct

    frames = _frames(2, 16, 16)
    avi = bytearray(encode_avi_mjpeg(frames, fps=10))
    junk = b"JUNK" + struct.pack("<I", 6) + b"pad!!\x00"
    info = (b"LIST" + struct.pack("<I", 16) + b"INFO"
            + b"ISFT" + struct.pack("<I", 4) + b"test")
    # insert after the 12-byte RIFF header, before hdrl
    spliced = bytes(avi[:12]) + junk + info + bytes(avi[12:])
    spliced = (spliced[:4] + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    fps, out = decode_avi_mjpeg(spliced)
    assert fps == 10 and len(out) == 2 and out[0].shape == (16, 16, 3)


def test_feature_stage_reports_decode_evidence(ray_session):
    from ocr_search_ray.stages.multimodal import extract_media_features

    avi = encode_avi_mjpeg(_frames(5, 16, 24), fps=8)
    media = pa.table(
        {
            "media_id": pa.array(["v1"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([avi], pa.binary()),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([-1], pa.int32()),
        }
    )
    rows = extract_media_features(
        rd.from_arrow(media), concurrency=1, batch_size=8).take_all()
    (r,) = rows
    assert r["status"] == "ok"
    # width/height from the DECODED first frame; n_samples/sample_rate
    # carry (frame count, fps)
    assert (r["width"], r["height"]) == (24, 16)
    assert (r["n_samples"], r["sample_rate"]) == (5, 8)


def test_sample_frames_demuxes_raw_jpeg_bytes(ray_session):
    from ocr_search_ray.functions.avi_mjpeg import _parse_avi
    from ocr_search_ray.functions.jpeg_codec import decode_jpeg
    from ocr_search_ray.stages.multimodal import sample_frames

    frames = _frames(3, 16, 16)
    avi = encode_avi_mjpeg(frames, fps=1)  # 1 fps → one tick per frame
    _, jpegs = _parse_avi(avi)
    media = pa.table(
        {
            "media_id": pa.array(["v1", "bad"], pa.string()),
            "kind": pa.array(["video", "video"], pa.string()),
            "payload": pa.array([avi, b"RIFF\x08\x00\x00\x00AVI "],
                                pa.binary()),
            "width": pa.array([-1, -1], pa.int32()),
            "height": pa.array([-1, -1], pa.int32()),
            "duration_ms": pa.array([-1, -1], pa.int32()),
        }
    )
    rows = sample_frames(rd.from_arrow(media), every_ms=1000).take_all()
    good = [r for r in rows if r["media_id"] == "v1"]
    assert [(r["frame_idx"], r["ts_ms"]) for r in good] == [
        (0, 0), (1, 1000), (2, 2000)]
    # byte-faithful demux: the sampled payload IS the container's JPEG
    for r, j in zip(good, jpegs):
        assert bytes(r["payload"]) == j
        assert decode_jpeg(bytes(r["payload"])).shape == (16, 16, 3)
    (bad,) = [r for r in rows if r["media_id"] == "bad"]
    assert bad["status"] == "error"


def test_variable_rate_sampling_picks_frame_on_screen(ray_session):
    from ocr_search_ray.stages.multimodal import sample_frames

    # 4 frames at 2 fps → 500 ms per frame, total 2000 ms; ticks every
    # 800 ms → t=0 (frame 0), t=800 (frame 1), t=1600 (frame 3)
    avi = encode_avi_mjpeg(_frames(4, 8, 8), fps=2)
    media = pa.table(
        {
            "media_id": pa.array(["v"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([avi], pa.binary()),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([-1], pa.int32()),
        }
    )
    rows = sample_frames(rd.from_arrow(media), every_ms=800).take_all()
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (0, 0), (1, 800), (2, 1600)]
