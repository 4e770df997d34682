"""Pure-numpy BMP24/WAV-PCM16 codecs + the real multimodal kernels."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocr_search_ray.functions.media_codecs import (
    audio_features,
    decode_bmp24,
    decode_wav_pcm16,
    encode_bmp24,
    encode_wav_pcm16,
    image_features,
    resize_nearest,
)


def _gradient(h, w):
    y = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    x = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = y
    img[:, :, 1] = x
    img[:, :, 2] = 128
    return img


def test_bmp_roundtrip_including_row_padding():
    for h, w in [(5, 7), (8, 8), (3, 1), (1, 3), (6, 5)]:  # odd widths pad
        img = _gradient(h, w)
        assert np.array_equal(decode_bmp24(encode_bmp24(img)), img)


def test_bmp_decode_rejects_garbage():
    import pytest

    for bad in [b"", b"BMshort", b"notbmp" * 20]:
        with pytest.raises(ValueError):
            decode_bmp24(bad)


def test_wav_roundtrip_mono_and_stereo():
    sr = 8000
    mono = (np.sin(np.linspace(0, 40, 400)) * 20000).astype(np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(mono, sr))
    assert rate == sr and np.array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(stereo, sr))
    assert np.array_equal(out, stereo)


def test_resize_nearest_shapes_and_identity():
    img = _gradient(10, 20)
    assert resize_nearest(img, 20, 10) is not None
    assert np.array_equal(resize_nearest(img, 20, 10), img)
    small = resize_nearest(img, 5, 5)
    assert small.shape == (5, 5, 3)
    # corners preserved by nearest-neighbor with floor mapping
    assert np.array_equal(small[0, 0], img[0, 0])


def test_feature_kernels_are_real_math():
    img = _gradient(16, 16)
    f = image_features(img)
    assert f.shape == (16,)
    assert abs(f[2] - 128 / 255) < 1e-6  # blue channel constant mean
    assert abs(f[5]) < 1e-6  # blue channel std 0
    assert abs(float(f[6:].sum()) - 1.0) < 1e-6  # histogram normalized

    sr = 8000
    tone = (np.sin(2 * np.pi * 440 * np.arange(4000) / sr) * 16000).astype(np.int16)
    af = audio_features(sr, tone[:, None])
    assert af.shape == (16,)
    assert 0.3 < af[0] < 0.4  # sine rms = A/sqrt(2), A = 16000/32768 ≈ 0.49
    # a 440 Hz tone concentrates energy in one low FFT band
    assert float(af[4:].max()) > 0.9


def test_stage_routes_real_and_stub_payloads():
    from ocr_search_ray.stages.multimodal import (
        extract_media_features,
        resize_images,
    )

    bmp = encode_bmp24(_gradient(64, 48))
    wav = encode_wav_pcm16(
        (np.sin(np.linspace(0, 60, 800)) * 12000).astype(np.int16), 8000)
    # blob: no known magic → digest stub (ok). badjpg: \xff\xd8 now routes
    # to the REAL baseline JPEG decoder, so a corrupt payload is quarantined
    # as an error row — not silently stubbed.
    media = pa.table(
        {
            "media_id": pa.array(["img", "aud", "blob", "badjpg"], pa.string()),
            "kind": pa.array(["image", "audio", "image", "image"], pa.string()),
            "payload": pa.array(
                [bmp, wav, b"\x00h264ish-no-magic", b"\xff\xd8jpegish"],
                pa.binary()),
            "width": pa.array([48, -1, -1, -1], pa.int32()),
            "height": pa.array([64, -1, -1, -1], pa.int32()),
            "duration_ms": pa.array([-1, 100, -1, -1], pa.int32()),
        }
    )
    ds = rd.from_arrow(media)
    feats = {r["media_id"]: r for r in
             extract_media_features(ds, concurrency=1, batch_size=8).take_all()}
    assert all(feats[k]["status"] == "ok" for k in ("img", "aud", "blob"))
    assert feats["badjpg"]["status"] == "error"
    expected_img = image_features(_gradient(64, 48))
    assert np.allclose(feats["img"]["feature"], expected_img)

    resized = {r["media_id"]: r for r in
               resize_images(ds, max_w=16, max_h=16, concurrency=1).take_all()}
    assert resized["img"]["status"] == "ok"
    # 48x64 box-fit into 16x16 -> 12x16, REALLY decodable output
    out = decode_bmp24(resized["img"]["payload"])
    assert out.shape == (16, 12, 3)
    assert (resized["img"]["width"], resized["img"]["height"]) == (12, 16)
    assert resized["aud"]["status"] == "error"  # not an image
