"""Pure-numpy media codecs for UNCOMPRESSED formats (BMP24, WAV PCM16).

The container has no image/audio libraries, but uncompressed formats need
none — these codecs are complete, real implementations from the public
format specifications (BITMAPINFOHEADER, RIFF/WAVE PCM), so the multimodal
stages can run REAL decode → feature/resize kernels end-to-end for them.
Compressed formats with in-repo codecs route to those (GIF → gif_codec,
baseline JPEG → jpeg_codec, IMA-ADPCM → adpcm, grayscale PNG → raster);
MP3 and H.264 get REAL container/framing probes (frame-chain walk in
``mp3_probe``, NAL/SPS parse in ``h264_probe``) with only the inner
waveform/pixel reconstruction left behind the documented digest stub
until a deployment pins a real decoder backend.

Layout facts used:
- BMP: 14-byte file header (``BM`` magic, pixel-data offset at byte 10) +
  40-byte BITMAPINFOHEADER (width/height int32 LE at 18/22, bpp=24 at 28,
  compression=0 at 30); rows bottom-up, BGR, padded to 4 bytes.
- WAV: ``RIFF``+size+``WAVE``, then chunks; ``fmt `` holds
  (audio_format=1, n_channels, sample_rate, ...), ``data`` holds int16 LE
  interleaved samples.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp24(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    pixel_size = (row_bytes + pad) * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + pixel_size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_size,
                      2835, 2835, 0, 0)
    # bottom-up rows, BGR order, padded
    bgr = img[::-1, :, ::-1]
    rows = bgr.reshape(h, row_bytes)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    return header + dib + rows.tobytes()


def decode_bmp24(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Raises on non-BMP / unsupported."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1 or h <= 0 or w <= 0:
        raise ValueError("unsupported BMP variant")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)[::-1]
    return bgr[:, :, ::-1].copy()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index take."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_riff_chunks(payload: bytes):
    """RIFF/WAVE bytes → yields (chunk_id, body) — THE chunk walk, shared
    by the PCM16 and ADPCM decoders and the format-tag dispatcher (one
    copy of the offset arithmetic to get right)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, (n, channels) int16). Raises on non-PCM16."""
    sample_rate = None
    ch = None
    data = None
    for cid, body in iter_riff_chunks(payload):
        if cid == b"fmt ":
            audio_format, ch, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM16)")
        elif cid == b"data":
            data = body
    if sample_rate is None or data is None or not ch:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch)
    return sample_rate, samples


# ---------------------------------------------------------------- features

FEATURE_DIM = 16


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim real image features: per-channel mean/std (6) + 10-bin
    normalized luminance histogram."""
    f = img.astype(np.float32) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    lum = f.mean(axis=2)
    hist, _ = np.histogram(lum, bins=10, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / max(1, lum.size)
    return np.concatenate([means, stds, hist]).astype(np.float32)


def audio_features(sample_rate: int, samples: np.ndarray) -> np.ndarray:
    """16-dim real audio features: rms, zero-crossing rate, mean |x|, peak
    + 12 normalized FFT band energies of the first channel."""
    x = samples[:, 0].astype(np.float32) / 32768.0
    if len(x) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    mabs = float(np.mean(np.abs(x)))
    peak = float(np.max(np.abs(x)))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 12)
    energy = np.array([float(b.sum()) for b in bands], dtype=np.float32)
    total = float(energy.sum()) or 1.0
    return np.concatenate(
        [np.array([rms, zcr, mabs, peak], dtype=np.float32), energy / total]
    ).astype(np.float32)
