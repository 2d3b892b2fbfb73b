"""Real baseline JPEG codec — pure python + numpy, no imaging libs.

Implements ITU-T T.81 baseline sequential DCT (the public JPEG spec):
JFIF container, 8-bit, 3 components, 4:4:4 (no chroma subsampling),
standard Annex K quantization and Huffman tables.  Replaces the round-1
``FJPG`` stub (functions/imaging.py) so the BASELINE.json lossy
invariant (PSNR >= 40 dB) gates a real DCT codec, and files produced by
mainstream encoders at 4:4:4 decode here.

Vectorization: the 2-D DCT/IDCT is two 8x8 matrix multiplies applied to
ALL blocks of a component at once (numpy einsum); only the entropy
coding is per-symbol python, which is fine for the Arrow-batched
thumbnail workloads this engine processes (decode happens inside
``mapInPandas`` batches, operators/imaging_ops.py).

Decoder scope (guarded): baseline DCT, Huffman, 8-bit, 1 or 3
components, ARBITRARY integer sampling factors (4:4:4, 4:2:0, 4:2:2,
4:1:1 — round 4; chroma upsampled nearest-neighbor per A.1.1), optional
restart markers.  The encoder emits 4:4:4 (byte-identical to earlier
rounds) or 4:2:0 (``subsampling='420'``, 2x2 box-decimated chroma).
Progressive streams raise ``ValueError`` — a documented boundary, not a
silent wrong answer.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables (ITU-T T.81, public spec) --------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# standard Huffman tables (Annex K.3): (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix (orthonormal)
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code generation: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (n_blocks, 8, 8)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """Value -> (size category, raw bits per F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_component(
    blocks_zz: np.ndarray, dc_tbl: dict, ac_tbl: dict, writer: _BitWriter, prev_dc: int
) -> int:
    for blk in blocks_zz:
        dc = int(blk[0])
        size, bits = _magnitude(dc - prev_dc)
        code, ln = dc_tbl[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        prev_dc = dc
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tbl[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tbl[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_tbl[0x00]  # EOB
            writer.write(code, ln)
    return prev_dc


def _plane_to_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H8, W8) plane -> (nby, nbx, 64) quantized zigzag blocks."""
    h8, w8 = plane.shape
    blocks = _to_blocks(plane) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG].reshape(h8 // 8, w8 // 8, 64)


def encode_jpeg(arr: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """RGB8 (h, w, 3) -> baseline JFIF bytes.

    ``subsampling``: '444' (default, one block of each component per MCU
    — byte-identical to the pre-round-4 encoder) or '420' (2x2 luma
    blocks + one box-averaged block of each chroma per MCU, the layout
    virtually every camera/web encoder emits)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    ql, qc = _quality_tables(quality)
    sub = subsampling == "420"
    mcu_px = 16 if sub else 8
    # pad to MCU multiple (edge-replicate)
    hp = (h + mcu_px - 1) // mcu_px * mcu_px
    wp = (w + mcu_px - 1) // mcu_px * mcu_px
    padded = np.pad(arr, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)

    qlm, qcm = ql.reshape(8, 8), qc.reshape(8, 8)
    comps_zz = [_plane_to_zz(ycc[..., 0], qlm)]
    for ci in (1, 2):
        plane = ycc[..., ci]
        if sub:
            # 2x2 box average (the standard decimation filter)
            plane = plane.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        comps_zz.append(_plane_to_zz(plane, qcm))

    y_samp = 0x22 if sub else 0x11
    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF: len 16 = 2 + "JFIF\0"(5) + version(2) + units(1) +
    # density(2+2) + thumbnail w/h(1+1)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    for tid, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in q.reshape(64)[ZIGZAG]
        )
    # SOF0: 3 components
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, samp, tq in ((1, y_samp, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += struct.pack("BBB", cid, samp, tq)
    # DHT x4
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tdta)
    out += b"\x00\x3f\x00"

    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    prev = [0, 0, 0]
    nby, nbx = comps_zz[1].shape[:2]  # chroma block grid == MCU grid
    for my in range(nby):
        for mx in range(nbx):
            if sub:
                for by in range(2):
                    for bx in range(2):
                        prev[0] = _encode_component(
                            comps_zz[0][2 * my + by, 2 * mx + bx][None, :],
                            tables[0][0], tables[0][1], writer, prev[0],
                        )
            else:
                prev[0] = _encode_component(
                    comps_zz[0][my, mx][None, :], tables[0][0], tables[0][1],
                    writer, prev[0],
                )
            for ci in (1, 2):
                prev[ci] = _encode_component(
                    comps_zz[ci][my, mx][None, :], tables[ci][0], tables[ci][1],
                    writer, prev[ci],
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


_LUT_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], tuple[list[int], list[int]]] = {}


def _huff_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """(bits, huffval) -> 16-bit-prefix lookup: (symbols, code lengths).

    Every 16-bit window whose prefix is a valid code maps to that code's
    symbol and length; length 0 marks an invalid prefix.  Built with
    numpy slice fills, returned as plain python lists (scalar indexing
    is the hot path) and cached — real corpora reuse the Annex K tables
    across every image."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    syms = np.zeros(65536, dtype=np.int32)
    lens = np.zeros(65536, dtype=np.int32)
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            syms[lo:hi] = vals[vi]
            lens[lo:hi] = ln
            code += 1
            vi += 1
        code <<= 1
    out = (syms.tolist(), lens.tolist())
    if len(_LUT_CACHE) < 64:  # bound the cache; custom tables are rare
        _LUT_CACHE[key] = out
    return out


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB8 array (any integer sampling factors)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[int, tuple[list[int], list[int]]] = {}  # (syms, lens) LUTs
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (id, td, ta)
    restart_interval = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            p = 6
            for _ in range(nc):
                cid, samp, tq = seg[p], seg[p + 1], seg[p + 2]
                comps.append((cid, samp, tq))
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF{marker & 0xF}) unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                huff[tc_th] = _huff_lut(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            for _ in range(ns):
                scan_comps.append((seg[p], seg[p + 1] >> 4, seg[p + 1] & 0xF))
                p += 2
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or h is None:
        raise ValueError("no scan found")

    scan = data[scan_start:]
    ncomp = len(comps)
    # general sampling factors (A.1.1 / A.2.3): an MCU carries hi x vi
    # blocks of each component; chroma planes are stored subsampled and
    # upsampled after the IDCT.  Covers 4:4:4, 4:2:0, 4:2:2, 4:1:1 and
    # grayscale with one code path.
    his = [(s >> 4) & 0xF for _, s, _ in comps]
    vis = [s & 0xF for _, s, _ in comps]
    hmax, vmax = max(his), max(vis)
    for hi, vi in zip(his, vis):
        if hi == 0 or vi == 0 or hmax % hi or vmax % vi:
            raise ValueError(f"unsupported sampling factors {his}x{vis}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    planes = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        for hi, vi in zip(his, vis)
    ]
    prev = [0] * ncomp
    comp_index = {cid: i for i, (cid, _, _) in enumerate(comps)}
    # per-scan decode plan: (component index, blocks-per-MCU grid, LUTs)
    plan = [
        (comp_index[cid], his[comp_index[cid]], vis[comp_index[cid]],
         huff[td][0], huff[td][1], huff[0x10 | ta][0], huff[0x10 | ta][1])
        for cid, td, ta in scan_comps
    ]
    # --- entropy decode, fully inlined hot loop --------------------------
    # The bit accumulator lives in LOCAL ints (pos/acc/nbits/marker):
    # refills pull whole bytes (unstuffing ff00), STOP before any real
    # marker, and a Huffman symbol from the 16-bit LUT is committed only
    # when its full code length of real bits is present — so restart
    # markers surface exactly where a bit-by-bit reader would raise, and
    # the <=7 pre-restart padding bits can never complete a phantom
    # symbol the retried MCU wouldn't discard anyway.  Versus the
    # round-3 per-bit method-call reader this is ~3x per-symbol.
    scan_len = len(scan)
    pos = acc = nbits = 0
    marker: int | None = None
    mcu = 0
    while mcu < n_mcu:
        my, mx = divmod(mcu, mcux)
        try:
            for ci, hi, vi, dsyms, dlens, asyms, alens in plan:
                pv = prev[ci]
                rows = planes[ci]
                for by in range(vi):
                    row = rows[my * vi + by]
                    for bx in range(hi):
                        blk = [0] * 64
                        k = 0
                        syms, lens = dsyms, dlens
                        while k < 64:
                            if nbits < 16 and marker is None:
                                while nbits <= 48:
                                    if pos >= scan_len:
                                        break
                                    b = scan[pos]
                                    if b == 0xFF:
                                        nxt = scan[pos + 1] if pos + 1 < scan_len else 0xD9
                                        if nxt == 0x00:
                                            pos += 2
                                            acc = (acc << 8) | 0xFF
                                            nbits += 8
                                        else:
                                            marker = nxt
                                            break
                                    else:
                                        pos += 1
                                        acc = (acc << 8) | b
                                        nbits += 8
                            idx = (
                                (acc >> (nbits - 16)) & 0xFFFF
                                if nbits >= 16
                                else (acc << (16 - nbits)) & 0xFFFF
                            )
                            ln = lens[idx]
                            if ln == 0 or ln > nbits:
                                if nbits < 16 and marker is not None and 0xD0 <= marker <= 0xD7:
                                    raise _RestartMarker(marker)
                                if ln == 0 and nbits >= 16:
                                    raise ValueError("invalid Huffman code")
                                if marker is not None and marker != 0xD9:
                                    raise ValueError(
                                        f"unexpected marker in scan: ff{marker:02x}"
                                    )
                                raise ValueError("truncated JPEG entropy stream")
                            nbits -= ln
                            acc &= (1 << nbits) - 1
                            sym = syms[idx]
                            if k == 0:  # DC
                                size = sym
                            else:
                                if sym == 0x00:  # EOB
                                    break
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += sym >> 4
                                size = sym & 0xF
                                if k > 63:
                                    raise ValueError("AC run past block end")
                            if size:
                                if nbits < size:
                                    while nbits <= 48:
                                        if pos >= scan_len:
                                            break
                                        b = scan[pos]
                                        if b == 0xFF:
                                            nxt = (
                                                scan[pos + 1] if pos + 1 < scan_len else 0xD9
                                            )
                                            if nxt == 0x00:
                                                pos += 2
                                                acc = (acc << 8) | 0xFF
                                                nbits += 8
                                            else:
                                                marker = nxt
                                                break
                                        else:
                                            pos += 1
                                            acc = (acc << 8) | b
                                            nbits += 8
                                    if nbits < size:
                                        if marker is not None and 0xD0 <= marker <= 0xD7:
                                            raise _RestartMarker(marker)
                                        raise ValueError("truncated JPEG entropy stream")
                                nbits -= size
                                bits = (acc >> nbits) & ((1 << size) - 1)
                                acc &= (1 << nbits) - 1
                                if bits < 1 << (size - 1):  # F.2.2.1 EXTEND
                                    bits += 1 - (1 << size)
                                if k == 0:
                                    pv += bits
                                else:
                                    blk[k] = bits
                            if k == 0:
                                blk[0] = pv
                            k += 1
                            syms, lens = asyms, alens
                        prev[ci] = pv
                        row[mx * hi + bx] = blk  # one bulk numpy assign
            mcu += 1
        except _RestartMarker:
            pos += 2  # consume the ff D0-D7 pair the refill stopped at
            marker = None
            acc = nbits = 0
            prev = [0] * ncomp
    out_planes = []
    for ci, (cid, _, tq) in enumerate(comps):
        hi, vi = his[ci], vis[ci]
        q = qt[tq]
        nby, nbx = planes[ci].shape[:2]
        coef = planes[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8).astype(
            np.float64
        ) * q
        blocks = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
        plane = _from_blocks(blocks, nby * 8, nbx * 8)
        # crop to the component's true extent, then replicate up to full
        # resolution (nearest-neighbor upsampling, A.1.1)
        comp_h = (h * vi + vmax - 1) // vmax
        comp_w = (w * hi + hmax - 1) // hmax
        plane = plane[:comp_h, :comp_w]
        if vi != vmax or hi != hmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(plane[:h, :w])
    if ncomp == 1:
        y = np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(out_planes[0], out_planes[1], out_planes[2])
