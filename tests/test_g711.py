"""G.711 µ-law/A-law codec: companding identities, SNR floor, WAV routing."""

import numpy as np
import pytest

from ocr_search_ray.functions.g711 import (
    alaw_decode, alaw_encode, decode_wav_g711, encode_wav_g711,
    mulaw_decode, mulaw_encode,
)


def test_alaw_companding_identity_all_256_codes():
    codes = np.arange(256, dtype=np.uint8)
    assert (alaw_encode(alaw_decode(codes)) == codes).all()


def test_mulaw_companding_identity_modulo_negative_zero():
    """encode(decode(code)) == code for 255 codes; 0x7F is µ-law's
    negative zero — it decodes to 0, which canonically re-encodes as
    0xFF (the spec's two representations of silence)."""
    codes = np.arange(256, dtype=np.uint8)
    rt = mulaw_encode(mulaw_decode(codes))
    mismatch = np.nonzero(rt != codes)[0]
    assert list(mismatch) == [0x7F]
    assert int(rt[0x7F]) == 0xFF
    assert int(mulaw_decode(np.array([0x7F], np.uint8))[0]) == 0


def test_spec_known_values():
    assert int(mulaw_encode(np.array([0], np.int16))[0]) == 0xFF
    # A-law sign convention: positive values carry the 0x80 bit (0xD5 mask)
    assert int(alaw_encode(np.array([1000], np.int16))[0]) & 0x80
    assert not int(alaw_encode(np.array([-1000], np.int16))[0]) & 0x80


def test_decode_is_monotone_in_magnitude():
    """Larger linear inputs never decode from smaller code magnitudes —
    the log segments are ordered."""
    x = np.arange(0, 32000, 7, dtype=np.int16)
    for enc, dec in [(mulaw_encode, mulaw_decode), (alaw_encode, alaw_decode)]:
        y = dec(enc(x)).astype(np.int32)
        assert (np.diff(y) >= 0).all()


@pytest.mark.parametrize("law", ["mu", "a"])
def test_tone_snr_floor(law):
    x = (np.sin(np.arange(4000) / 9.0) * 24000).astype(np.int16)
    rate, y = decode_wav_g711(encode_wav_g711(x, 8000, law))
    assert rate == 8000 and len(y) == len(x)
    snr = 10 * np.log10(
        np.sum(x.astype(np.float64) ** 2)
        / np.sum((x - y).astype(np.float64) ** 2))
    assert snr > 30.0  # G.711 delivers ~35-38 dB on full-scale tones


def test_wav_container_variants_rejected():
    x = np.zeros(16, np.int16)
    with pytest.raises(ValueError):
        encode_wav_g711(x.astype(np.int32), 8000, "mu")
    with pytest.raises(ValueError):
        encode_wav_g711(x, 8000, "ulaw")
    with pytest.raises(ValueError):
        decode_wav_g711(b"RIFF\x00\x00\x00\x00WAVE")


def test_odd_length_pads_and_fact_trims():
    x = (np.arange(333) % 251).astype(np.int16) * 97
    payload = encode_wav_g711(x, 16000, "a")
    rate, y = decode_wav_g711(payload)
    assert rate == 16000 and len(y) == 333  # pad byte trimmed via fact


def test_media_router_decodes_g711_for_real():
    import pyarrow as pa

    from ocr_search_ray.stages.multimodal import MediaFeatureExtractor

    x = (np.sin(np.arange(500) / 5.0) * 15000).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array(["u1", "a1"], pa.string()),
        "kind": pa.array(["audio", "audio"], pa.string()),
        "payload": pa.array(
            [encode_wav_g711(x, 8000, "mu"), encode_wav_g711(x, 16000, "a")],
            pa.binary()),
        "width": pa.array([-1, -1], pa.int32()),
        "height": pa.array([-1, -1], pa.int32()),
        "duration_ms": pa.array([-1, -1], pa.int32()),
    })
    rows = MediaFeatureExtractor()(batch).to_pylist()
    assert [r["status"] for r in rows] == ["ok", "ok"]
    # decode evidence comes from the decoded stream, not metadata
    assert [(r["n_samples"], r["sample_rate"]) for r in rows] == [
        (500, 8000), (500, 16000)]
    # features are real signal stats: rms of a 15000-amp tone ≈ 0.32
    assert abs(rows[0]["feature"][0] - 0.324) < 0.05
