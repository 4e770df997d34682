"""IMA ADPCM (DVI4) codec — the engine's real COMPRESSED audio format.

From the public IMA "Recommended Practices for Enhancing Digital Audio
Compatibility" specification: 4 bits per sample, the standard 89-entry
step table and 8-entry index table, wrapped in a WAV container with
format tag 0x0011 (one mono block: 4-byte block header — predictor
int16, step index uint8, reserved — then packed nibbles, low nibble
first). ``gif_codec`` is the compressed-image twin; together they make
both media kinds exercise real entropy-coded payloads with no codec
library.

The codec is lossy, but encoder and decoder share one predictor state
machine — the decoder's output must equal the encoder's internal
reconstruction BIT-EXACTLY, which is what the tests pin (plus an SNR
floor on tones).
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """One shared state transition: (nibble, state) → next state. Both
    encoder and decoder reconstruct through exactly this function, which
    is why decode == the encoder's internal reconstruction bit-exactly."""
    step = STEP_TABLE[index]
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    if nibble & 8:
        delta = -delta
    predictor = _clamp16(predictor + delta)
    index = min(88, max(0, index + INDEX_TABLE[nibble & 7]))
    return predictor, index


def adpcm_encode(samples: np.ndarray) -> tuple[bytes, int, np.ndarray]:
    """(n,) int16 → (nibble bytes — low nibble first, initial predictor,
    the encoder's bit-exact int16 reconstruction)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("adpcm_encode expects (n,) int16")
    if len(samples) == 0:
        return b"", 0, samples.copy()
    predictor = int(samples[0])
    index = 0
    nibbles: list[int] = []
    recon = np.empty(len(samples), dtype=np.int16)
    recon[0] = predictor
    for i in range(1, len(samples)):
        step = STEP_TABLE[index]
        diff = int(samples[i]) - predictor
        nibble = 0
        if diff < 0:
            nibble = 8
            diff = -diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= (step >> 1):
            nibble |= 2
            diff -= step >> 1
        if diff >= (step >> 2):
            nibble |= 1
        nibbles.append(nibble)
        predictor, index = _step(nibble, predictor, index)
        recon[i] = predictor
    packed = bytearray()
    for j in range(0, len(nibbles), 2):
        lo = nibbles[j]
        hi = nibbles[j + 1] if j + 1 < len(nibbles) else 0
        packed.append(lo | (hi << 4))
    return bytes(packed), int(recon[0]), recon


def adpcm_decode(data: bytes, predictor: int, n_samples: int,
                 index: int = 0) -> np.ndarray:
    """(nibble bytes, initial predictor, sample count, initial step
    index) → (n,) int16."""
    out = np.empty(n_samples, dtype=np.int16)
    if n_samples == 0:
        return out
    out[0] = predictor
    index = min(88, max(0, index))
    pos = 0
    for i in range(1, n_samples):
        byte = data[pos // 2]
        nibble = (byte >> 4) if pos % 2 else (byte & 0x0F)
        pos += 1
        predictor, index = _step(nibble, predictor, index)
        out[i] = predictor
    return out


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) int16 mono → WAV bytes with format tag 0x0011 (IMA ADPCM),
    one block: 4-byte header (predictor int16, index u8, reserved) +
    packed nibbles."""
    packed, predictor, _ = adpcm_encode(samples)
    n = len(samples)
    block = struct.pack("<hBB", predictor, 0, 0) + packed
    block_align = len(block)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        (sample_rate + 1) // 2, max(1, block_align), 4, 2, min(n, 0xFFFF),
    )
    fact = struct.pack("<I", n)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(block)) + block
            + (b"\x00" if len(block) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV (format 0x0011, mono, single block) → (sample_rate, (n,) int16).

    The fmt chunk's samplesPerBlock lives at offset 18 (offset 16 is
    cbSize — misreading it as the count truncates every clip to 2
    samples); the fact chunk's uint32 count, when present, is the
    authority (the fmt field is uint16-clamped for long clips). The block
    header's step-index byte seeds the decoder state.
    """
    from .media_codecs import iter_riff_chunks

    sample_rate = None
    fmt_samples = None
    fact_samples = None
    data = None
    for cid, body in iter_riff_chunks(payload):
        if cid == b"fmt ":
            tag, ch, sample_rate = struct.unpack_from("<HHI", body, 0)
            if tag != 0x11 or ch != 1:
                raise ValueError("unsupported WAV variant (need IMA mono)")
            if len(body) >= 20:
                fmt_samples = struct.unpack_from("<H", body, 18)[0]
        elif cid == b"fact":
            fact_samples = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
    n_samples = fact_samples if fact_samples is not None else fmt_samples
    if sample_rate is None or data is None or n_samples is None:
        raise ValueError("missing fmt/fact/data chunk")
    predictor, index = struct.unpack_from("<hB", data, 0)
    return sample_rate, adpcm_decode(data[4:], predictor, n_samples, index)


def wav_format_tag(payload: bytes) -> int | None:
    """Peek the fmt chunk's format tag of a RIFF/WAVE payload (None when
    absent or not a WAV) — the media-routing dispatcher."""
    from .media_codecs import iter_riff_chunks

    try:
        for cid, body in iter_riff_chunks(payload):
            if cid == b"fmt ":
                return struct.unpack_from("<H", body, 0)[0]
    except ValueError:
        return None
    return None
