"""G.711 µ-law / A-law codec — real compressed telephony audio (ITU-T G.711).

From the public ITU-T G.711 specification (the logarithmic PCM companding
used by WAV format tags 0x0007 (µ-law) and 0x0006 (A-law), RTP PCMU/PCMA,
and virtually every telephony capture). Both directions are fully
vectorized numpy: encode computes the segment/exponent with searchsorted
over the spec's segment boundaries, decode is a 256-entry lookup table
built once from the scalar inverse formulas.

Invariants the tests pin:
- ``encode(decode(code)) == code`` for every one of the 256 code points
  (both laws) — the companding round-trip identity the spec guarantees;
- ``decode(encode(x))`` tracks x within the segment's quantization step
  (coarse at high amplitude, fine near zero — that is the point of the
  log companding);
- µ-law of silence is 0xFF, A-law alternates the 0x55 mask — spec-known
  byte values.

``gif_codec``/``jpeg_codec`` are the compressed-image twins and ``adpcm``
the 4-bit-differential twin; together every media kind has real
entropy/companded payloads with no codec library in the container.
"""

from __future__ import annotations

import struct

import numpy as np

_MU_BIAS = 0x84
_MU_CLIP = 32635
# segment upper edges for A-law 13-bit magnitudes (G.711 Table 1)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """(n,) int16 linear → (n,) uint8 µ-law code points (vectorized)."""
    x = samples.astype(np.int32)
    sign = (x < 0).astype(np.uint8)
    mag = np.minimum(np.abs(x), _MU_CLIP) + _MU_BIAS
    # exponent = MSB position above bit 7 (mag ∈ [0x84, 0x7FFF+0x84])
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    return (~((sign << 7) | (exp.astype(np.uint8) << 4) | mantissa)).astype(
        np.uint8)


def _mulaw_decode_one(code: int) -> int:
    u = (~code) & 0xFF
    t = (((u & 0x0F) << 3) + _MU_BIAS) << ((u >> 4) & 0x07)
    return _MU_BIAS - t if (u & 0x80) else t - _MU_BIAS


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """(n,) int16 linear → (n,) uint8 A-law code points (vectorized)."""
    x = (samples.astype(np.int32)) >> 3  # A-law operates on 13-bit PCM
    mask = np.where(x >= 0, 0xD5, 0x55).astype(np.uint8)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag)  # 0..8
    over = seg >= 8
    seg = np.minimum(seg, 7)
    low = (mag >> 1) & 0x0F          # segments 0-1: linear step
    high = (mag >> seg) & 0x0F       # segments 2-7: log step
    aval = (seg.astype(np.uint8) << 4) | np.where(seg < 2, low, high).astype(
        np.uint8)
    aval = np.where(over, np.uint8(0x7F), aval)
    return (aval ^ mask).astype(np.uint8)


def _alaw_decode_one(code: int) -> int:
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


# 256-entry inverse LUTs built once from the scalar formulas
MULAW_LUT = np.array([_mulaw_decode_one(c) for c in range(256)],
                     dtype=np.int16)
ALAW_LUT = np.array([_alaw_decode_one(c) for c in range(256)],
                    dtype=np.int16)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """(n,) uint8 µ-law → (n,) int16 linear (table take, zero-copy in)."""
    return MULAW_LUT[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """(n,) uint8 A-law → (n,) int16 linear (table take)."""
    return ALAW_LUT[np.asarray(codes, dtype=np.uint8)]


# ------------------------------------------------------------ WAV container


def encode_wav_g711(samples: np.ndarray, sample_rate: int,
                    law: str = "mu") -> bytes:
    """(n,) int16 mono → WAV bytes with format tag 0x0007 (µ-law) or
    0x0006 (A-law): 8 bits/sample + the fact chunk compressed formats
    carry (same container conventions as ``encode_wav_adpcm``)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("expected (n,) int16 mono")
    if law == "mu":
        tag, data = 0x0007, mulaw_encode(samples).tobytes()
    elif law == "a":
        tag, data = 0x0006, alaw_encode(samples).tobytes()
    else:
        raise ValueError("law must be 'mu' or 'a'")
    fmt = struct.pack("<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0)
    fact = struct.pack("<I", len(samples))
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV (format 0x0006/0x0007, mono) → (sample_rate, (n,) int16)."""
    from .media_codecs import iter_riff_chunks

    sample_rate = None
    tag = None
    fact_samples = None
    data = None
    for cid, body in iter_riff_chunks(payload):
        if cid == b"fmt ":
            tag, ch, sample_rate = struct.unpack_from("<HHI", body, 0)
            if tag not in (0x0006, 0x0007) or ch != 1:
                raise ValueError("unsupported WAV variant (need G.711 mono)")
        elif cid == b"fact":
            fact_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
    if sample_rate is None or data is None or tag is None:
        raise ValueError("missing fmt/data chunk")
    codes = np.frombuffer(data, dtype=np.uint8)
    if fact_samples is not None:
        codes = codes[:fact_samples]  # trim the RIFF pad byte if present
    pcm = mulaw_decode(codes) if tag == 0x0007 else alaw_decode(codes)
    return sample_rate, pcm
