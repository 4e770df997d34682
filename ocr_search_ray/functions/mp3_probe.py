"""MPEG audio (MP3) frame-header probe — a REAL parser for the framing
layer of MPEG-1/2/2.5 Layer I/II/III streams, from the public ISO/IEC
11172-3 / 13818-3 header layout.

Scope (documented honestly): this is a PROBE, not a waveform decoder —
it walks the frame chain (11-bit sync, version/layer/bitrate/samplerate
fields, padding-aware frame lengths, optional leading ID3v2 tag) and
returns stream evidence (frame count, total PCM samples, sample rate,
bitrate, channel count, CBR/VBR flag). The Huffman/MDCT waveform decode
stays behind the digest stub in stages/multimodal.py until a deployment
pins a real audio backend; the framing evidence here is what the exact
``media_mp3`` oracle checks.

Reference parity: the reference repo has no audio path at all — this is
part of the beyond-reference multimodal surface (SURVEY.md §6).

Header layout (4 bytes, big-endian bit order):
  AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
  A=sync(11×1)  B=version(00=2.5,10=2,11=1)  C=layer(01=III,10=II,11=I)
  D=!crc  E=bitrate idx  F=samplerate idx  G=padding  H=private
  I=channel mode (11=mono)
Frame sizes: LayerI = (12·br/sr + pad)·4; LayerII = 144·br/sr + pad;
LayerIII = 144·br/sr + pad (MPEG-1) / 72·br/sr + pad (MPEG-2/2.5).
Samples/frame: LI=384, LII=1152, LIII=1152 (MPEG-1) / 576 (MPEG-2/2.5).
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, indexed [version_group][layer][idx]; 0 = "free"
# (unsupported here), None = invalid
_BR_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BR_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SR = {
    1: [44100, 48000, 32000],      # MPEG-1
    2: [22050, 24000, 16000],      # MPEG-2
    25: [11025, 12000, 8000],      # MPEG-2.5
}


def _parse_header(hdr: int):
    """32-bit big-endian header word → (version, layer, bitrate_kbps,
    sample_rate, padding, channels, frame_len, samples_per_frame) or None
    if the word is not a valid frame header."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (hdr >> 19) & 0x3
    if vbits == 1:
        return None
    version = {0: 25, 2: 2, 3: 1}[vbits]
    lbits = (hdr >> 17) & 0x3
    if lbits == 0:
        return None
    layer = {1: 3, 2: 2, 3: 1}[lbits]
    br_idx = (hdr >> 12) & 0xF
    if br_idx in (0, 15):
        return None  # "free" and invalid bitrates unsupported
    sr_idx = (hdr >> 10) & 0x3
    if sr_idx == 3:
        return None
    table = _BR_V1 if version == 1 else _BR_V2
    bitrate = table[layer][br_idx] * 1000
    sample_rate = _SR[version][sr_idx]
    padding = (hdr >> 9) & 0x1
    mode = (hdr >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
        spf = 384
    elif layer == 2:
        frame_len = 144 * bitrate // sample_rate + padding
        spf = 1152
    else:
        per = 144 if version == 1 else 72
        frame_len = per * bitrate // sample_rate + padding
        spf = 1152 if version == 1 else 576
    return version, layer, bitrate, sample_rate, padding, channels, frame_len, spf


def _skip_id3v2(payload: bytes) -> int:
    """Return the offset past a leading ID3v2 tag (0 if none). Size bytes
    are syncsafe (7 bits each), per the public id3v2 spec."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # malformed syncsafe size — treat as no tag
        size = (size << 7) | b
    return 10 + size


def probe_mp3(payload: bytes) -> dict:
    """Walk the MPEG audio frame chain → stream evidence dict.

    Returns {n_frames, n_samples, sample_rate, bitrate_kbps (first frame),
    channels, vbr (any frame's bitrate differs), layer, version}.
    Raises ValueError if no valid frame chain is found (≥ 1 frame, and the
    chain must cover ≥ 90% of the post-tag payload so random binaries that
    happen to contain one sync word don't probe as audio).
    """
    pos = _skip_id3v2(payload)
    start = pos
    n_frames = 0
    n_samples = 0
    first = None
    bitrates: set[int] = set()
    while pos + 4 <= len(payload):
        hdr = struct.unpack_from(">I", payload, pos)[0]
        parsed = _parse_header(hdr)
        if parsed is None:
            break
        version, layer, bitrate, sr, _pad, ch, frame_len, spf = parsed
        if first is None:
            first = (version, layer, bitrate, sr, ch)
        elif (version, layer, sr) != (first[0], first[1], first[3]):
            break  # stream parameters must be constant within a chain
        if frame_len < 4 or pos + frame_len > len(payload):
            break
        bitrates.add(bitrate)
        n_frames += 1
        n_samples += spf
        pos += frame_len
    if n_frames == 0 or first is None:
        raise ValueError("no MPEG audio frame chain")
    if (pos - start) * 10 < (len(payload) - start) * 9:
        raise ValueError("frame chain covers <90% of payload")
    version, layer, bitrate, sr, ch = first
    return {
        "n_frames": n_frames,
        "n_samples": n_samples,
        "sample_rate": sr,
        "bitrate_kbps": bitrate // 1000,
        "channels": ch,
        "vbr": len(bitrates) > 1,
        "layer": layer,
        "version": version,
    }


def looks_like_mp3(payload: bytes) -> bool:
    """Cheap router predicate: leading ID3v2 tag, or a valid frame header
    at offset 0 (sync bits + non-reserved fields)."""
    if payload[:3] == b"ID3":
        return True
    if len(payload) >= 4:
        return _parse_header(struct.unpack_from(">I", payload, 0)[0]) is not None
    return False


def encode_mp3_frames(
    n_frames: int,
    *,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 2,
    layer: int = 3,
    id3_tag: bytes | None = None,
) -> bytes:
    """Synthesize a spec-valid MPEG audio frame chain (headers + zeroed
    side-info/main-data payloads — a silent, probe-parseable stream).

    Used by tests and the deterministic ``media_mp3`` entry; a zeroed
    Layer III payload is not meaningful audio, but every header field,
    frame length and the chain walk are exactly per spec.
    """
    for version, rates in _SR.items():
        if sample_rate in rates:
            sr_idx = rates.index(sample_rate)
            break
    else:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    table = _BR_V1 if version == 1 else _BR_V2
    if bitrate_kbps not in table[layer][1:]:
        raise ValueError(f"unsupported bitrate {bitrate_kbps} for layer {layer}")
    br_idx = table[layer].index(bitrate_kbps)
    vbits = {1: 3, 2: 2, 25: 0}[version]
    lbits = {3: 1, 2: 2, 1: 3}[layer]
    mode = 3 if channels == 1 else 0
    hdr = (
        (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (mode << 6)
    )
    bitrate = bitrate_kbps * 1000
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate) * 4
    elif layer == 2:
        frame_len = 144 * bitrate // sample_rate
    else:
        per = 144 if version == 1 else 72
        frame_len = per * bitrate // sample_rate
    frame = struct.pack(">I", hdr) + b"\x00" * (frame_len - 4)
    out = (id3_tag or b"") + frame * n_frames
    return out


def make_id3v2_tag(n_pad: int = 32) -> bytes:
    """A minimal valid ID3v2.3 tag of ``10 + n_pad`` bytes (all-padding
    body), for exercising the tag-skip path."""
    if not 0 <= n_pad < (1 << 28):
        raise ValueError("bad pad size")
    size = bytes(((n_pad >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3\x03\x00\x00" + size + b"\x00" * n_pad
