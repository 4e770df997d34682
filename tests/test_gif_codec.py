"""From-scratch GIF89a LZW codec: round-trips, growth/reset, spec guards."""

import numpy as np
import pytest

from ocr_search_ray.functions.gif_codec import decode_gif, encode_gif

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("shape,ncolors", [
    ((1, 1), 1), ((3, 5), 2), ((16, 16), 7), ((40, 60), 250),
])
def test_round_trip_exact(shape, ncolors):
    h, w = shape
    palette = RNG.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = palette[RNG.integers(0, ncolors, size=(h, w))]
    out = decode_gif(encode_gif(img))
    assert out.dtype == np.uint8 and out.shape == (h, w, 3)
    assert (out == img).all()


def test_round_trip_forces_dict_growth_and_reset():
    """High-entropy 256-color image: the LZW dictionary walks every code
    width up to 12 bits and resets mid-stream (>4096 entries)."""
    palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    img = palette[RNG.integers(0, 256, size=(120, 120))]
    payload = encode_gif(img)
    assert (decode_gif(payload) == img).all()
    assert len(payload) < img.size  # actually compressed vs raw RGB


def test_flat_image_compresses_hard():
    img = np.full((64, 64, 3), 7, np.uint8)
    payload = encode_gif(img)
    assert (decode_gif(payload) == img).all()
    assert len(payload) < 200  # runs collapse into LZW chains


def test_header_fields_are_spec_valid():
    import struct

    img = np.zeros((5, 9, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    p = encode_gif(img)
    assert p[:6] == b"GIF89a"
    assert struct.unpack_from("<HH", p, 6) == (9, 5)
    assert p[10] & 0x80  # global color table present
    assert p.endswith(b"\x00\x3B")


def test_decoder_rejects_out_of_scope_features():
    img = np.zeros((2, 2, 3), np.uint8)
    p = bytearray(encode_gif(img))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG" + bytes(p)[3:])
    # flip the interlace bit in the image descriptor
    idesc = bytes(p).index(0x2C, 13)
    p2 = bytearray(p)
    p2[idesc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlacing"):
        decode_gif(bytes(p2))


def test_truncated_stream_fails_loudly():
    img = np.zeros((8, 8, 3), np.uint8)
    p = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(p[: len(p) // 2] + b"\x00\x3B")


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    ncolors=st.integers(1, 256), seed=st.integers(0, 2**31),
)
def test_round_trip_property(h, w, ncolors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, ncolors, size=(h, w))]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_animated_round_trip_with_delays():
    from ocr_search_ray.functions.gif_codec import (
        decode_gif_frames,
        encode_gif_frames,
    )

    palette = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = [palette[RNG.integers(0, 16, size=(10, 14))] for _ in range(5)]
    payload = encode_gif_frames(frames, delay_ms=120)
    delays, out = decode_gif_frames(payload)
    assert delays == [120] * 5
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()
    # the single-frame decoder still reads frame 0 of an animation
    from ocr_search_ray.functions.gif_codec import decode_gif
    assert (decode_gif(payload) == frames[0]).all()


def test_real_frame_sampling_from_animated_gif():
    """sample_frames decodes animated GIFs for real: ticks map to the
    frame on screen, each sampled payload round-trips to exact pixels."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.functions.gif_codec import (
        decode_gif,
        encode_gif_frames,
    )
    from ocr_search_ray.stages.multimodal import sample_frames

    palette = np.stack([np.arange(8)] * 3, axis=1).astype(np.uint8) * 30
    frames = [palette[np.full((6, 6), i % 8, np.int64)] for i in range(4)]
    payload = encode_gif_frames(frames, delay_ms=1000)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["v-1"]), "kind": pa.array(["video"]),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([6], pa.int32()),
        "height": pa.array([6], pa.int32()),
        "duration_ms": pa.array([4000], pa.int32()),
    }))
    rows = sorted(sample_frames(media, every_ms=1000).take_all(),
                  key=lambda r: r["frame_idx"])
    assert [r["ts_ms"] for r in rows] == [0, 1000, 2000, 3000]
    assert all(r["status"] == "ok" for r in rows)
    for i, r in enumerate(rows):
        assert (decode_gif(r["payload"]) == frames[i]).all()


def _splice_netscape(payload: bytes) -> bytes:
    """Insert a NETSCAPE2.0 looping application extension right after the
    global color table — the extension virtually every real-world animated
    GIF carries."""
    import struct

    table_len = 2 << (payload[10] & 0x07)
    cut = 13 + table_len * 3
    ext = (b"\x21\xFF\x0BNETSCAPE2.0"
           + b"\x03\x01" + struct.pack("<H", 0) + b"\x00")
    return payload[:cut] + ext + payload[cut:]


def test_decode_frames_skips_netscape_extension():
    """ADVICE r5: the non-GCE extension branch must consume the 0x00 block
    terminator, or every looping GIF fails with 'unexpected block 0x00'."""
    from ocr_search_ray.functions.gif_codec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_frames,
    )

    palette = RNG.integers(0, 256, size=(4, 3), dtype=np.uint8)
    frames = [palette[RNG.integers(0, 4, size=(5, 7))] for _ in range(3)]
    payload = _splice_netscape(encode_gif_frames(frames, delay_ms=90))
    delays, out = decode_gif_frames(payload)
    assert delays == [90] * 3 and len(out) == 3
    for a, b in zip(frames, out):
        assert (a == b).all()
    # the single-frame decoder already handled this; keep it locked
    assert (decode_gif(payload) == frames[0]).all()


def test_comment_extension_is_skipped_too():
    from ocr_search_ray.functions.gif_codec import (
        decode_gif_frames,
        encode_gif_frames,
    )

    img = np.zeros((3, 3, 3), np.uint8)
    payload = encode_gif_frames([img, img], delay_ms=50)
    table_len = 2 << (payload[10] & 0x07)
    cut = 13 + table_len * 3
    comment = b"\x21\xFE\x05hello\x00"
    delays, out = decode_gif_frames(payload[:cut] + comment + payload[cut:])
    assert delays == [50, 50] and len(out) == 2


def test_variable_delay_frame_sampling():
    """ADVICE r5: a GCE delay is the duration of the frame it PRECEDES.
    delays [300,100,500] sampled every 100ms: frame 0 is on screen for
    ticks 0-200, frame 1 at 300, frame 2 for 400-800; total runtime 900ms."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.functions.gif_codec import (
        decode_gif,
        encode_gif_frames,
    )
    from ocr_search_ray.stages.multimodal import sample_frames

    palette = np.stack([np.arange(3)] * 3, axis=1).astype(np.uint8) * 80
    frames = [palette[np.full((4, 4), i, np.int64)] for i in range(3)]
    # encode_gif_frames writes one shared delay; patch each GCE by hand
    payload = bytearray(encode_gif_frames(frames, delay_ms=100))
    import struct

    wanted_cs = [30, 10, 50]  # centiseconds: 300/100/500 ms
    pos, k = 0, 0
    while k < 3:
        pos = payload.index(0xF9, pos)
        if payload[pos - 1] == 0x21 and payload[pos + 1] == 0x04:
            struct.pack_into("<H", payload, pos + 3, wanted_cs[k])
            k += 1
        pos += 1
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["v-var"]), "kind": pa.array(["video"]),
        "payload": pa.array([bytes(payload)], pa.binary()),
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "duration_ms": pa.array([900], pa.int32()),
    }))
    rows = sorted(
        sample_frames(media, every_ms=100, max_frames=16).take_all(),
        key=lambda r: r["ts_ms"])
    assert [r["ts_ms"] for r in rows] == [i * 100 for i in range(9)]
    expect_frame = [0, 0, 0, 1, 2, 2, 2, 2, 2]
    for r, want in zip(rows, expect_frame):
        assert (decode_gif(r["payload"]) == frames[want]).all(), r["ts_ms"]


def test_round_trip_final_code_on_width_boundary():
    """Regression: when the final data code's decoder-side table append
    lands exactly on 2^width, the decoder widens BEFORE reading EOI —
    the encoder must write EOI at the widened width (hypothesis example
    h=3, w=4, ncolors=3, seed=245)."""
    rng = np.random.default_rng(245)
    palette = rng.integers(0, 256, size=(3, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 3, size=(3, 4))]
    assert (decode_gif(encode_gif(img)) == img).all()
