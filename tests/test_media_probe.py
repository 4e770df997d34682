"""MP3 frame-chain and H.264 NAL/SPS probe locks (functions/mp3_probe,
functions/h264_probe) — synth→probe round-trips across the parameter
space, spec edge cases (ID3v2 skip, padding-free frame lengths,
emulation-prevention bytes, frame cropping), and router quarantine."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_search_ray.functions.h264_probe import (
    _add_emulation,
    _strip_emulation,
    build_sps,
    encode_h264_stream,
    iter_nals,
    looks_like_h264,
    parse_sps,
    probe_h264,
)
from ocr_search_ray.functions.mp3_probe import (
    encode_mp3_frames,
    looks_like_mp3,
    make_id3v2_tag,
    probe_mp3,
)

# ---------------------------------------------------------------- MP3 ----

_RATES = [44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000]


@settings(max_examples=60, deadline=None)
@given(
    n_frames=st.integers(1, 40),
    sr=st.sampled_from(_RATES),
    br=st.sampled_from([32, 64, 128]),
    channels=st.sampled_from([1, 2]),
    tag_pad=st.one_of(st.none(), st.integers(0, 200)),
)
def test_mp3_roundtrip(n_frames, sr, br, channels, tag_pad):
    tag = make_id3v2_tag(tag_pad) if tag_pad is not None else None
    payload = encode_mp3_frames(
        n_frames, sample_rate=sr, bitrate_kbps=br, channels=channels,
        id3_tag=tag)
    assert looks_like_mp3(payload)
    info = probe_mp3(payload)
    spf = 1152 if sr >= 32000 else 576  # MPEG-1 vs MPEG-2/2.5 Layer III
    assert info["n_frames"] == n_frames
    assert info["n_samples"] == n_frames * spf
    assert info["sample_rate"] == sr
    assert info["bitrate_kbps"] == br
    assert info["channels"] == channels
    assert info["vbr"] is False


def test_mp3_layers_1_and_2():
    for layer, spf in ((1, 384), (2, 1152)):
        p = encode_mp3_frames(3, sample_rate=44100, bitrate_kbps=128,
                              layer=layer)
        info = probe_mp3(p)
        assert (info["layer"], info["n_frames"]) == (layer, 3)
        assert info["n_samples"] == 3 * spf


def test_mp3_frame_length_is_spec_exact():
    # MPEG-1 L3 @ 128kbps/44100: 144*128000//44100 = 417 bytes unpadded
    p = encode_mp3_frames(2, sample_rate=44100, bitrate_kbps=128)
    assert len(p) == 2 * 417
    # MPEG-2 L3 @ 64kbps/22050: 72*64000//22050 = 208 bytes
    p = encode_mp3_frames(5, sample_rate=22050, bitrate_kbps=64)
    assert len(p) == 5 * 208


def test_mp3_rejects_non_streams():
    with pytest.raises(ValueError):
        probe_mp3(b"\x00" * 64)
    # one valid header followed by garbage >10% of payload: chain too short
    one = encode_mp3_frames(1, sample_rate=44100, bitrate_kbps=128)
    with pytest.raises(ValueError):
        probe_mp3(one + b"Z" * len(one))
    # JPEG SOI must not route as MP3 (0xFFD8: sync bits absent)
    assert not looks_like_mp3(b"\xff\xd8\xff\xe0JFIF")


def test_mp3_truncated_tail_stops_chain():
    p = encode_mp3_frames(20, sample_rate=8000, bitrate_kbps=32)
    info = probe_mp3(p[:-30])  # last frame truncated → 19 whole frames
    assert info["n_frames"] == 19


# --------------------------------------------------------------- H.264 ----


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 960).map(lambda v: v * 2),
    h=st.integers(1, 540).map(lambda v: v * 2),
    n=st.integers(1, 12),
)
def test_h264_roundtrip(w, h, n):
    stream = encode_h264_stream(w, h, n)
    assert looks_like_h264(stream)
    info = probe_h264(stream)
    assert (info["width"], info["height"], info["n_slices"]) == (w, h, n)
    assert info["profile_idc"] == 66 and info["frame_mbs_only"] == 1


def test_h264_cropping_required_for_non_mb_multiples():
    # 322x242: coded size 336x256, crop_right=7, crop_bottom=7 (2px units)
    info = parse_sps(build_sps(322, 242))
    assert (info["width"], info["height"]) == (322, 242)
    with pytest.raises(ValueError):
        build_sps(321, 242)  # odd width unrepresentable in 4:2:0 crop units


def test_h264_emulation_prevention_roundtrip():
    for rbsp in (b"\x00\x00\x00\x00", b"\x00\x00\x01\x02\x00\x00\x03",
                 b"\x00\x00\x02\x00\x00", b"ab\x00\x00\x00cd"):
        nal = _add_emulation(rbsp)
        assert b"\x00\x00\x00" not in nal and b"\x00\x00\x01" not in nal
        assert _strip_emulation(nal) == rbsp


def test_h264_nal_walk_3byte_start_codes():
    sps = build_sps(64, 48)
    stream = (b"\x00\x00\x01" + sps + b"\x00\x00\x01\x68\xce\x38\x80"
              + b"\x00\x00\x01\x65\x88\x84\x21")
    kinds = [t for t, _ in iter_nals(stream)]
    assert kinds == [7, 8, 5]
    info = probe_h264(stream)
    assert (info["width"], info["height"], info["n_slices"]) == (64, 48, 1)


def test_h264_rejects_sliceless_and_spsless():
    sps_only = b"\x00\x00\x00\x01" + build_sps(32, 32)
    with pytest.raises(ValueError):
        probe_h264(sps_only)
    slice_only = b"\x00\x00\x00\x01\x65\x88\x84"
    with pytest.raises(ValueError):
        probe_h264(slice_only)


# -------------------------------------------------------------- router ----


def test_router_evidence_and_quarantine(ray_session):
    import pyarrow as pa

    from ocr_search_ray.stages.multimodal import MediaFeatureExtractor

    good_mp3 = encode_mp3_frames(6, sample_rate=22050, bitrate_kbps=48)
    good_h264 = encode_h264_stream(322, 242, 4)
    bad_h264 = b"\x00\x00\x00\x01\x67" + b"\xff" * 3  # unparseable SPS
    batch = pa.table(
        {
            "media_id": pa.array(["a", "v", "x"]),
            "kind": pa.array(["audio", "video", "video"]),
            "payload": pa.array([good_mp3, good_h264, bad_h264],
                                pa.binary()),
            "width": pa.array([-1, -1, -1], pa.int32()),
            "height": pa.array([-1, -1, -1], pa.int32()),
            "duration_ms": pa.array([-1, -1, -1], pa.int32()),
        }
    )
    out = MediaFeatureExtractor()(batch)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert rows["a"]["status"] == "ok"
    assert rows["a"]["n_samples"] == 6 * 576
    assert rows["a"]["sample_rate"] == 22050
    assert rows["v"]["status"] == "ok"
    assert (rows["v"]["width"], rows["v"]["height"]) == (322, 242)
    assert rows["v"]["n_samples"] == 4  # slice count in the video contract
    assert rows["x"]["status"] == "error"  # quarantined, block survives
