"""Multimodal plumbing: schema, actor stage, quarantine (decode is stubbed)."""

import pyarrow as pa
import ray.data as rd

from ocr_search_ray.stages.multimodal import (
    FEATURE_DIM,
    MEDIA,
    extract_media_features,
)


def _media():
    return rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["m1", "m2", "m3"], pa.string()),
                "kind": pa.array(["image", "audio", "image"], pa.string()),
                "payload": pa.array([b"\x89PNG fake", b"RIFF fake", None], pa.binary()),
                "width": pa.array([100, -1, 10], pa.int32()),
                "height": pa.array([80, -1, 10], pa.int32()),
                "duration_ms": pa.array([-1, 1200, -1], pa.int32()),
            },
            schema=MEDIA,
        )
    )


def test_feature_stage_schema_and_quarantine():
    out = extract_media_features(_media(), concurrency=2, batch_size=2).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m1"]["status"] == "ok"
    assert len(by_id["m1"]["feature"]) == FEATURE_DIM
    assert by_id["m3"]["status"] == "error"  # null payload quarantined
    assert by_id["m3"]["feature"] is None


def test_features_deterministic_and_kind_sensitive():
    out1 = {r["media_id"]: r["feature"] for r in extract_media_features(_media(), concurrency=2).take_all()}
    out2 = {r["media_id"]: r["feature"] for r in extract_media_features(_media(), concurrency=2).take_all()}
    assert out1["m1"] == out2["m1"]
    # same payload bytes under a different kind would hash differently —
    # feature depends on (kind, payload)
    assert out1["m1"] != out1["m2"]


def test_resize_stage_dims_and_quarantine():
    from ocr_search_ray.stages.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(_media(), concurrency=2).take_all()}
    # m1 is a 100x80 image → fits in 256 box untouched dims
    assert out["m1"]["status"] == "ok"
    assert (out["m1"]["width"], out["m1"]["height"]) == (100, 80)
    assert out["m1"]["payload"] is not None
    # m2 is audio → not an image, quarantined
    assert out["m2"]["status"] == "error" and out["m2"]["payload"] is None
    # m3 has a null payload → quarantined
    assert out["m3"]["status"] == "error"


def test_resize_downscales_preserving_aspect():
    from ocr_search_ray.stages.multimodal import resize_images

    big = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["big"], pa.string()),
                "kind": pa.array(["image"], pa.string()),
                "payload": pa.array([b"\x89PNG big"], pa.binary()),
                "width": pa.array([1024], pa.int32()),
                "height": pa.array([512], pa.int32()),
                "duration_ms": pa.array([-1], pa.int32()),
            },
            schema=MEDIA,
        )
    )
    r = resize_images(big, max_w=256, max_h=256, concurrency=2).take_all()[0]
    assert (r["width"], r["height"]) == (256, 128)  # aspect preserved


def test_sample_frames_fan_out():
    from ocr_search_ray.stages.multimodal import sample_frames

    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(["v1", "i1", "v2"], pa.string()),
                "kind": pa.array(["video", "image", "video"], pa.string()),
                "payload": pa.array([b"VID1", b"PNG", None], pa.binary()),
                "width": pa.array([-1, 10, -1], pa.int32()),
                "height": pa.array([-1, 10, -1], pa.int32()),
                "duration_ms": pa.array([3500, -1, 2000], pa.int32()),
            },
            schema=MEDIA,
        )
    )
    rows = sample_frames(media, every_ms=1000, max_frames=8).take_all()
    v1 = [r for r in rows if r["media_id"] == "v1"]
    assert [r["frame_idx"] for r in sorted(v1, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(r["status"] == "ok" and r["payload"] is not None for r in v1)
    assert not [r for r in rows if r["media_id"] == "i1"]  # images dropped
    v2 = [r for r in rows if r["media_id"] == "v2"]
    assert len(v2) == 1 and v2[0]["status"] == "error"  # null payload quarantined
    # deterministic frame payloads
    rows2 = sample_frames(media, every_ms=1000, max_frames=8).take_all()
    assert {(r["media_id"], r["frame_idx"]): r["payload"] for r in rows} == \
           {(r["media_id"], r["frame_idx"]): r["payload"] for r in rows2}


def test_gif_rows_route_through_the_real_codec():
    """A GIF payload gets REAL features (pixel stats, not the digest
    stub) and a GIF through ImageResizer comes back as a smaller,
    decodable GIF with real resampled pixels."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.functions.gif_codec import decode_gif, encode_gif
    from ocr_search_ray.functions.media_codecs import (
        image_features,
        resize_nearest,
    )
    from ocr_search_ray.stages.multimodal import (
        ImageResizer,
        extract_media_features,
    )

    img = np.zeros((300, 400, 3), np.uint8)
    img[:150] = (200, 10, 10)
    payload = encode_gif(img)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["g-1"]), "kind": pa.array(["image"]),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([400], pa.int32()),
        "height": pa.array([300], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    }))
    row = extract_media_features(media).take_all()[0]
    assert row["status"] == "ok"
    expect = image_features(img)
    assert np.allclose(row["feature"], expect, atol=1e-6)

    out = media.map_batches(
        ImageResizer, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"max_w": 100, "max_h": 100},
    ).take_all()[0]
    assert (out["width"], out["height"]) == (100, 75)
    back = decode_gif(out["payload"])
    assert (back == resize_nearest(img, 100, 75)).all()


def test_png_payloads_route_to_real_codec_not_stub():
    """VERDICT r5 #5: \\x89PNG payloads decode through the raster codec —
    real pixel features + decoded dims, and a real resize round trip."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.functions.media_codecs import image_features
    from ocr_search_ray.functions.raster import decode_png, encode_png
    from ocr_search_ray.stages.multimodal import (
        extract_media_features,
        resize_images,
    )

    yy, xx = np.mgrid[0:40, 0:600]
    gray = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["p1"]), "kind": pa.array(["image"]),
        "payload": pa.array([encode_png(gray)], pa.binary()),
        "width": pa.array([-1], pa.int32()),
        "height": pa.array([-1], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    }))
    row = extract_media_features(media).take_all()[0]
    assert row["status"] == "ok"
    assert (row["width"], row["height"]) == (600, 40)
    expect = image_features(np.repeat(gray[:, :, None], 3, axis=2))
    assert np.allclose(row["feature"], expect, atol=1e-6)

    out = resize_images(media, max_w=256, max_h=256).take_all()[0]
    assert (out["width"], out["height"]) == (256, 17)  # aspect preserved
    resized = decode_png(out["payload"])
    assert resized.shape == (17, 256)
    # nearest-neighbor: every output pixel exists in the source row it maps to
    ys = (np.arange(17) * 40 // 17).clip(0, 39)
    xs = (np.arange(256) * 600 // 256).clip(0, 599)
    assert (resized == gray[ys][:, xs]).all()
