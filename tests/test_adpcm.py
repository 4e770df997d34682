"""IMA ADPCM codec: state-machine exactness, SNR floor, WAV routing."""

import numpy as np
import pytest

from ocr_search_ray.functions.adpcm import (
    adpcm_decode,
    adpcm_encode,
    decode_wav_adpcm,
    encode_wav_adpcm,
    wav_format_tag,
)

RNG = np.random.default_rng(31)


def test_decoder_equals_encoder_reconstruction_bit_exactly():
    """The lossy codec's EXACT invariant: decode(encode(x)) equals the
    encoder's internal predictor sequence bit-for-bit."""
    for n in (1, 2, 3, 257, 4096):
        x = (RNG.standard_normal(n) * 9000).astype(np.int16)
        packed, pred, recon = adpcm_encode(x)
        out = adpcm_decode(packed, pred, n)
        assert (out == recon).all()


def test_snr_floor_on_tone():
    t = np.arange(8000, dtype=np.float64)
    x = (np.sin(t * 2 * np.pi * 440 / 8000) * 20000).astype(np.int16)
    rate, y = decode_wav_adpcm(encode_wav_adpcm(x, 8000))
    assert rate == 8000 and len(y) == len(x)
    err = x.astype(np.float64) - y.astype(np.float64)
    snr = 10 * np.log10((x.astype(np.float64) ** 2).sum() / (err ** 2).sum())
    assert snr > 25, snr
    # 4 bits/sample + header: ~4x smaller than PCM16
    assert len(encode_wav_adpcm(x, 8000)) < len(x) * 2 / 3.5


def test_wav_routing_and_guards():
    x = (RNG.standard_normal(100) * 500).astype(np.int16)
    payload = encode_wav_adpcm(x, 16000)
    assert wav_format_tag(payload) == 0x11
    from ocr_search_ray.functions.media_codecs import encode_wav_pcm16
    assert wav_format_tag(encode_wav_pcm16(x, 16000)) == 1
    assert wav_format_tag(b"RIFFxxxxWAVE") is None
    with pytest.raises(ValueError):
        decode_wav_adpcm(encode_wav_pcm16(x, 16000))


def test_feature_stage_routes_adpcm_to_real_decoder():
    import pyarrow as pa
    import ray.data as rd

    from ocr_search_ray.functions.media_codecs import audio_features
    from ocr_search_ray.stages.multimodal import extract_media_features

    t = np.arange(2048, dtype=np.float64)
    x = (np.sin(t / 5.0) * 15000).astype(np.int16)
    payload = encode_wav_adpcm(x, 8000)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array(["a-1"]), "kind": pa.array(["audio"]),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([-1], pa.int32()),
        "height": pa.array([-1], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    }))
    row = extract_media_features(media).take_all()[0]
    assert row["status"] == "ok"
    _, decoded = decode_wav_adpcm(payload)
    expect = audio_features(8000, decoded[:, None])
    assert np.allclose(row["feature"], expect, atol=1e-6)


def test_long_clips_and_fact_free_files_decode_fully():
    """Review regressions: (1) clips past 65535 samples encode (the fmt
    samplesPerBlock uint16 is clamped; fact carries the real count);
    (2) a spec-valid file WITHOUT a fact chunk still decodes every sample
    (samplesPerBlock lives at fmt offset 18 — offset 16 is cbSize)."""
    import struct

    x = (RNG.standard_normal(70_000) * 8000).astype(np.int16)
    rate, y = decode_wav_adpcm(encode_wav_adpcm(x, 8000))
    assert len(y) == 70_000

    short = (RNG.standard_normal(100) * 8000).astype(np.int16)
    payload = encode_wav_adpcm(short, 8000)
    # strip the fact chunk (8-byte header + 4-byte body)
    i = payload.index(b"fact")
    stripped = payload[:i] + payload[i + 12:]
    stripped = stripped[:4] + struct.pack(
        "<I", struct.unpack_from("<I", stripped, 4)[0] - 12) + stripped[8:]
    rate, y2 = decode_wav_adpcm(stripped)
    assert len(y2) == 100 and (y2 == decode_wav_adpcm(payload)[1]).all()


def test_nonzero_block_header_index_seeds_the_decoder():
    """A file whose block header carries a non-zero step index decodes
    through that state, not a hardcoded zero."""
    import struct

    from ocr_search_ray.functions.adpcm import adpcm_decode

    nibbles = bytes([0x21])  # two nibbles: 1, 2
    a = adpcm_decode(nibbles, 0, 3, index=0)
    b = adpcm_decode(nibbles, 0, 3, index=40)
    assert (a != b).any()  # larger step table entry → larger deltas
