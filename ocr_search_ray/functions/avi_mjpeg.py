"""Minimal RIFF-AVI / Motion-JPEG container codec, pure stdlib + numpy.

The third REAL video path (after animated GIF): an AVI file whose ``movi``
chunks are baseline JPEG frames decodes end-to-end through the engine's
from-scratch T.81 codec (``functions/jpeg_codec.py``) — no ffmpeg, no
binary deps. The writer emits a spec-correct single-stream 'vids'/'MJPG'
file (MainAVIHeader + AVIStreamHeader + BITMAPINFOHEADER + idx1), the
reader walks the RIFF chunk tree and tolerates unknown chunks, so real
MJPEG files from webcams / capture cards parse too.

Reference parity note: the reference engine has no video handling at all
(its media surface is page PNGs, SURVEY.md S8/S9); this module is part of
the beyond-reference multimodal surface the training-data tier needs.
Container layout follows the public Microsoft AVI RIFF spec (msdn
"AVI RIFF File Reference") — structures are re-derived from the published
field tables, not from any implementation.
"""
from __future__ import annotations

import struct

import numpy as np

from .jpeg_codec import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + u32le size + data, padded to even size."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: "list[np.ndarray]", fps: int = 10, quality: int = 85
) -> bytes:
    """Frames ((h, w, 3) uint8, equal dims) → single-stream MJPEG AVI.

    ``dwRate/dwScale`` = fps/1 so frame i is on screen at i*1000/fps ms.
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_jpeg = max(len(j) for j in jpegs)

    # MainAVIHeader (56 bytes): the 0x10 flag is AVIF_HASINDEX
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_jpeg * fps,    # dwMaxBytesPerSec (upper bound)
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: has idx1
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_jpeg,          # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, dwReserved[4]
    )
    # AVIStreamHeader (56 bytes)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,        # dwFlags, wPriority, wLanguage
            0,              # dwInitialFrames
            1, fps,         # dwScale, dwRate → fps frames/sec
            0,              # dwStart
            len(frames),    # dwLength (in frames)
            max_jpeg,       # dwSuggestedBufferSize
            0xFFFFFFFF,     # dwQuality (default)
            0,              # dwSampleSize (0 = variable, one frame/chunk)
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    # BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: chunk offsets are relative to the start of the 'movi' list type
    idx_entries = []
    off = 4  # past the b"movi" list-type fourcc
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in data[pos:end]."""
    while pos + 8 <= end:
        fourcc = data[pos: pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def _parse_avi(payload: bytes) -> "tuple[int, list[bytes]]":
    """AVI bytes → (fps, raw JPEG chunk payloads), no pixel decode yet."""
    if not is_avi(payload):
        raise ValueError("not a RIFF AVI")
    scale, rate = 0, 0
    micro_per_frame = 0
    jpegs: list[bytes] = []
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    for fourcc, body, size in _walk_chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[body: body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                if f2 == b"avih" and s2 >= 4:
                    (micro_per_frame,) = struct.unpack_from("<I", payload, b2)
                elif f2 == b"LIST" and payload[b2: b2 + 4] == b"strl":
                    for f3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and s3 >= 32:
                            if payload[b3: b3 + 4] != b"vids":
                                break  # not the video stream
                            scale, rate = struct.unpack_from(
                                "<II", payload, b3 + 20)
        elif list_type == b"movi":
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                # 00dc = compressed video, 00db = uncompressed; MJPEG files
                # carry JPEG in either — verify the SOI marker
                if f2[2:4] in (b"dc", b"db"):
                    jpegs.append(payload[b2: b2 + s2])
    if not jpegs:
        raise ValueError("no video frames in AVI")
    if rate and scale:
        fps = max(1, round(rate / scale))
    elif micro_per_frame:
        fps = max(1, round(1_000_000 / micro_per_frame))
    else:
        fps = 10
    return fps, jpegs


def decode_avi_mjpeg(payload: bytes) -> "tuple[int, list[np.ndarray]]":
    """AVI bytes → (fps, decoded frames).  Frame i displays at
    i*1000/fps ms.  Raises ``ValueError`` on non-AVI / non-MJPEG input."""
    fps, jpegs = _parse_avi(payload)
    return fps, [decode_jpeg(j) for j in jpegs]


def probe_avi_mjpeg(payload: bytes) -> "tuple[int, int, int, int]":
    """Cheap decode evidence: (width, height, n_frames, fps) with the
    dims taken from DECODING the first frame only (not from the header),
    so the values prove the JPEG codec ran; n_frames counts movi chunks
    without decoding the remaining frames."""
    fps, jpegs = _parse_avi(payload)
    first = decode_jpeg(jpegs[0])
    return first.shape[1], first.shape[0], len(jpegs), fps
