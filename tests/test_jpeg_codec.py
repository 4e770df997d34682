"""From-scratch baseline JPEG codec (T.81): round-trips within lossy
bounds, spec-valid headers, 4:2:0 + restart markers, router integration."""

import struct

import numpy as np
import pytest

from ocr_search_ray.functions.jpeg_codec import (
    _build_huffman,
    AC_CHROMA_BITS, AC_CHROMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS,
    DC_CHROMA_BITS, DC_CHROMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
    decode_jpeg, encode_jpeg,
)

RNG = np.random.default_rng(23)


def _rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 2) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)


# ------------------------------------------------------------- round trips


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (13, 17), (16, 24), (40, 56)])
def test_444_round_trip_within_lossy_bounds(shape):
    img = _gradient(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert _rmse(out, img) < 4.0


def test_420_round_trip_smooth_image():
    img = _gradient(33, 47)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert _rmse(out, img) < 6.0


def test_constant_image_is_near_exact():
    img = np.full((12, 20, 3), (200, 64, 130), np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, 95, subsample=sub))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_grayscale_round_trip():
    g = ((np.mgrid[0:20, 0:30][0] * 13 + np.mgrid[0:20, 0:30][1] * 7) % 256
         ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (20, 30, 3)  # 1-component decodes replicate to RGB
    assert (out[:, :, 0] == out[:, :, 1]).all()
    assert _rmse(out[:, :, 0], g) < 4.0


def test_noise_image_survives_q95():
    """High-entropy input: exercises long AC runs, ZRL and every size
    category up to the table ceilings."""
    img = RNG.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert _rmse(out, img) < 16.0  # quantization-bounded, not structural


def test_quality_trades_bytes_for_error():
    img = _gradient(32, 32)
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    assert _rmse(decode_jpeg(lo), img) > _rmse(decode_jpeg(hi), img)


# ------------------------------------------------------ markers / structure


def test_header_is_spec_valid_jfif_baseline():
    img = _gradient(10, 14)
    payload = encode_jpeg(img, quality=80)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    assert payload[2:4] == b"\xff\xe0" and payload[6:11] == b"JFIF\x00"
    # SOF0 present with our dims
    i = payload.find(b"\xff\xc0")
    assert i > 0
    h, w = struct.unpack_from(">HH", payload, i + 5)
    assert (h, w) == (10, 14)


def test_restart_markers_decode_bit_identically():
    img = _gradient(40, 56)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(img, 90, subsample=sub))
        for ri in (1, 2, 5):
            rst = encode_jpeg(img, 90, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in rst  # DRI segment present
            assert np.array_equal(decode_jpeg(rst), base)


def test_entropy_data_never_forms_a_marker():
    """0xFF byte stuffing: between SOS and EOI every 0xFF is followed by
    0x00 or an RSTn marker."""
    img = RNG.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=95, restart_interval=2)
    sos = payload.find(b"\xff\xda")
    scan = payload[sos + 2 + struct.unpack_from(">H", payload, sos + 2)[0]: -2]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00 or 0xD0 <= scan[i + 1] <= 0xD7
            i += 2
        else:
            i += 1


def test_annex_k_tables_are_valid_prefix_codes():
    for bits, vals in [
        (DC_LUMA_BITS, DC_LUMA_VALS), (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        table = _build_huffman(bits, vals)
        assert len(table) == len(vals)
        codes = sorted((length, code) for code, length in table.values())
        # canonical codes are prefix-free: no code is a prefix of another
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1:]:
                assert not (c2 >> (l2 - l1)) == c1 or l1 == l2
    # the AC tables cover every symbol the encoder can emit
    ac = set(AC_LUMA_VALS)
    assert 0x00 in ac and 0xF0 in ac
    assert all(((r << 4) | s) in ac for r in range(16) for s in range(1, 11))


# ------------------------------------------------------------- error paths


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\x00\x01")
    payload = encode_jpeg(_gradient(16, 16), 90)
    with pytest.raises(Exception):
        decode_jpeg(payload[:40])


def test_rejects_progressive_sof():
    payload = bytearray(encode_jpeg(_gradient(8, 8), 90))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_rejects_bad_encoder_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 3), np.uint8))


# --------------------------------------------------------- router wiring


def test_media_router_decodes_jpeg_for_real():
    import pyarrow as pa

    from ocr_search_ray.stages.multimodal import MediaFeatureExtractor

    img = _gradient(11, 19)
    batch = pa.table({
        "media_id": pa.array(["j1"], pa.string()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_jpeg(img, 85)], pa.binary()),
        "width": pa.array([-1], pa.int32()),
        "height": pa.array([-1], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    })
    out = MediaFeatureExtractor()(batch)
    row = out.to_pylist()[0]
    assert row["status"] == "ok"
    # decode evidence: dims recovered from the decoded array, not metadata
    assert (row["width"], row["height"]) == (19, 11)
    # features are real pixel stats (mean channel ≈ image mean), not digest
    assert abs(row["feature"][0] - img[:, :, 0].mean() / 255.0) < 0.05


def test_resizer_reencodes_jpeg_for_real():
    import pyarrow as pa

    from ocr_search_ray.stages.multimodal import ImageResizer

    img = _gradient(64, 48)
    batch = pa.table({
        "media_id": pa.array(["j1"], pa.string()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_jpeg(img, 90)], pa.binary()),
        "width": pa.array([-1], pa.int32()),
        "height": pa.array([-1], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    })
    out = ImageResizer(max_w=16, max_h=16)(batch).to_pylist()[0]
    assert out["status"] == "ok"
    assert (out["width"], out["height"]) == (12, 16)  # aspect-preserving
    resized = decode_jpeg(out["payload"])  # output is itself a valid JPEG
    assert resized.shape == (16, 12, 3)
