"""Arithmetic-coded JPEG (SOF9) entropy codec — ITU-T T.81 Annex D/F.

Closes the last guarded gap in the pure-python codec
(``functions/jpeg.py`` raised ``ValueError`` for SOF9+): sequential DCT
frames whose entropy coding is the adaptive QM binary arithmetic coder
instead of Huffman.  The DCT/quantization/frame plumbing is shared with
``jpeg.py`` — this module implements only the entropy layer:

* the QM-coder probability estimation state machine (Table D.3), with
  the standard 0x5A1D fixed-probability bin for AC signs;
* decoder and encoder register disciplines (Annex D.2 / D.1): 16-bit
  interval register ``A``, code window ``C``, byte-aligned output with
  carry resolution via a cache byte + stacked-0xFF counter, and the
  Huffman-style ``FF 00`` byte stuffing JPEG arithmetic streams use;
* the sequential DC/AC conditioning contexts of Annex F.1.4 (five-way
  DC diff classification with the (L, U) conditioning bounds, per-k AC
  EOB/run/magnitude contexts split at Kx) as implemented by the public
  IJG jdarith/jcarith reference;
* interleaved and non-interleaved scan walks plus positional restart
  handling (statistics + predictors reset every Ri MCUs).

Validation scope (honest): encoder/decoder are roundtrip-exact against
each other and against the Huffman baseline's coefficients (same image,
same quant tables -> bit-identical pixels), and compression-ratio sanity
is asserted; no third-party arithmetic-JPEG producer exists in this
offline sandbox, so cross-codec interop of the state table rests on the
spec text rather than a fixture.  Progressive-arithmetic (SOF10) is
covered too: the Annex G successive-approximation decision procedures
(DC first/refine, AC band first via the generalized sequential tree, AC
refine per Figure G.10) over the same per-scan statistics discipline —
see :func:`decode_arith_progressive_scan` /
:func:`encode_jpeg_arith_progressive`.  Hierarchical modes remain
unsupported.

Reference parity note: the reference repo (PyQt desktop converter) has
no image codec at all; this exists for the BASELINE.json image-table
invariants (decode/validate/feature paths over the ``bytes`` column).
"""

from __future__ import annotations

import struct

import numpy as np

# no cycle: jpeg.py only imports this module lazily inside decode_jpeg
from .jpeg import _scan_groups, _true_block_grid

# --- Table D.3: Qe value and probability estimation state machine -----------
# (qe, next_mps, next_lps, switch); index 113 is the fixed ~0.5 bin used
# for AC sign decisions (never adapts).
_QE_TAB = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # index of the non-adapting ~0.5 bin (AC sign decisions)

# Statistics areas (one byte per context bin: bit 7 = MPS, bits 0-6 =
# state index; all-zero initial state per F.1.4.4.1.4).
_DC_STATS_SIZE = 64
_AC_STATS_SIZE = 256
_DC_TREE = 20  # X1 context offset in the DC area (Table F.4)
_AC_TREE_LO = 189  # magnitude-category tree base for k <= Kx
_AC_TREE_HI = 217  # and for k > Kx
_MAG_OFFSET = 14  # magnitude-bit contexts sit 14 after the tree position


class _ArithBitSrc:
    """Destuffed bit feed for the decoder: ``FF 00`` -> data byte 0xFF,
    runs of 0xFF fill bytes are swallowed, any real marker ends the data
    (further reads supply zero bits, matching the encoder flush which
    always terminates in trailing zeros)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def next_byte(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            return 0
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        q = p + 1
        while q < len(d) and d[q] == 0xFF:
            q += 1
        if q < len(d) and d[q] == 0x00:
            self.pos = q + 1
            return 0xFF
        self.pos = len(d)  # marker: zero data from here on
        return 0

    def next_bit(self) -> int:
        if self.nbits == 0:
            self.buf = self.next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1


class _ArithDecoder:
    """QM decoder (Annex D.2): 16-bit interval ``a``, 16-bit code window
    ``c`` (interval layout: MPS-nominal sub-interval at the bottom, the
    Qe-sized LPS-nominal one on top, conditional exchange near renorm)."""

    __slots__ = ("a", "c", "src")

    def __init__(self, src: _ArithBitSrc):
        self.src = src
        self.c = (src.next_byte() << 8) | src.next_byte()
        self.a = 0x8000

    def decode(self, st: bytearray, i: int) -> int:
        s = st[i]
        mps = s >> 7
        qe, nmps, nlps, sw = _QE_TAB[s & 0x7F]
        a = self.a - qe
        if self.c < a:
            if a & 0x8000:  # fast path: no renorm, no adaptation
                self.a = a
                return mps
            if a < qe:  # conditional exchange: bottom region is the LPS
                d = mps ^ 1
                st[i] = nlps | ((mps ^ sw) << 7)
            else:
                d = mps
                st[i] = nmps | (mps << 7)
        else:
            self.c -= a
            if a < qe:  # conditional exchange: top region is the MPS
                d = mps
                st[i] = nmps | (mps << 7)
            else:
                d = mps ^ 1
                st[i] = nlps | ((mps ^ sw) << 7)
            a = qe
        c, src = self.c, self.src
        while True:  # RENORMD
            a <<= 1
            c = (c << 1) | src.next_bit()
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        return d


class _ArithEncoder:
    """QM encoder (Annex D.1): mirrors :class:`_ArithDecoder` exactly;
    byte output via a cache byte + stacked-0xFF counter so carries
    propagate into already-finalized bytes, with ``FF 00`` stuffing."""

    __slots__ = ("a", "c", "phase", "cache", "n_ff", "out")

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.phase = 0  # renorm shifts since the last byte boundary
        self.cache = -1  # last unemitted byte (-1: none yet)
        self.n_ff = 0  # 0xFF bytes stacked behind the cache
        self.out = bytearray()

    def _byteout(self) -> None:
        t = self.c >> 16
        self.c &= 0xFFFF
        out = self.out
        if t > 0xFF:  # carry ripples: cache+1, stacked FFs become 00
            if self.cache >= 0:
                b = self.cache + 1
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
            out.extend(b"\x00" * self.n_ff)
            self.n_ff = 0
            self.cache = t & 0xFF
        elif t == 0xFF:
            self.n_ff += 1  # may still receive a carry; hold it
        else:
            if self.cache >= 0:
                out.append(self.cache)
                if self.cache == 0xFF:
                    out.append(0x00)
            out.extend(b"\xff\x00" * self.n_ff)
            self.n_ff = 0
            self.cache = t

    def _renorm(self) -> None:
        a, c, phase = self.a, self.c, self.phase
        while True:
            a <<= 1
            c <<= 1
            phase += 1
            if phase == 8:
                phase = 0
                self.c = c
                self._byteout()
                c = self.c
            if a & 0x8000:
                break
        self.a = a & 0xFFFF
        self.c = c
        self.phase = phase

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        s = st[i]
        mps = s >> 7
        qe, nmps, nlps, sw = _QE_TAB[s & 0x7F]
        a = self.a - qe
        if bit == mps:
            if a & 0x8000:  # fast path
                self.a = a
                return
            if a < qe:  # exchange: MPS takes the (larger) top region
                self.c += a
                a = qe
            st[i] = nmps | (mps << 7)
        else:
            if a < qe:  # exchange: LPS takes the (larger) bottom region
                pass
            else:
                self.c += a
                a = qe
            st[i] = nlps | ((mps ^ sw) << 7)
        self.a = a
        self._renorm()

    def flush(self) -> bytes:
        # pick the value in [c, c+a) whose low 16 bits have the most
        # trailing zeros (D.1.8), then push the remaining bits out
        top = self.c + self.a - 1
        v = top & ~0xFFFF
        if v < self.c:
            v += 0x8000
        self.c = v
        for _ in range(16):
            self.c <<= 1
            self.phase += 1
            if self.phase == 8:
                self.phase = 0
                self._byteout()
        if self.phase:
            self.c <<= 8 - self.phase
            self.phase = 0
            self._byteout()
        if self.cache >= 0:
            self.out.append(self.cache)
            if self.cache == 0xFF:
                self.out.append(0x00)
        self.out.extend(b"\xff\x00" * self.n_ff)
        self.cache, self.n_ff = -1, 0
        return bytes(self.out)


# --- Annex F.1.4 conditioning: DC / AC block coding --------------------------


class _ScanStats:
    """Per-scan statistics areas + DC predictors, reset at restarts."""

    def __init__(self, n_comps: int, dc_tbls: list[int], ac_tbls: list[int]):
        self.dc = {t: bytearray(_DC_STATS_SIZE) for t in set(dc_tbls)}
        self.ac = {t: bytearray(_AC_STATS_SIZE) for t in set(ac_tbls)}
        self.fixed = bytearray([_FIXED])
        self.last_dc = [0] * n_comps
        self.dc_context = [0] * n_comps

    def reset(self) -> None:
        for b in self.dc.values():
            b[:] = bytes(_DC_STATS_SIZE)
        for b in self.ac.values():
            b[:] = bytes(_AC_STATS_SIZE)
        self.last_dc = [0] * len(self.last_dc)
        self.dc_context = [0] * len(self.dc_context)


def _decode_dc(dec, st, stats, ci, dc_l, dc_u) -> int:
    ctx = stats.dc_context[ci]
    if dec.decode(st, ctx) == 0:
        stats.dc_context[ci] = 0
    else:
        sign = dec.decode(st, ctx + 1)
        p = ctx + 2 + sign
        m = dec.decode(st, p)
        if m:
            p = _DC_TREE
            while dec.decode(st, p):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("corrupt arithmetic DC magnitude")
                p += 1
        if m < (1 << dc_l) >> 1:
            stats.dc_context[ci] = 0
        elif m > (1 << dc_u) >> 1:
            stats.dc_context[ci] = 12 + sign * 4
        else:
            stats.dc_context[ci] = 4 + sign * 4
        v = m
        p += _MAG_OFFSET
        mm = m >> 1
        while mm:
            if dec.decode(st, p):
                v |= mm
            mm >>= 1
        v += 1
        stats.last_dc[ci] += -v if sign else v
    return stats.last_dc[ci]


def _encode_dc(enc, st, stats, ci, diff, dc_l, dc_u) -> None:
    ctx = stats.dc_context[ci]
    if diff == 0:
        enc.encode(st, ctx, 0)
        stats.dc_context[ci] = 0
        return
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    p = ctx + 2 + sign
    if sz == 0:
        enc.encode(st, p, 0)
        m = 0
    else:
        enc.encode(st, p, 1)
        m = 1
        p = _DC_TREE
        while (m << 1) <= sz:
            enc.encode(st, p, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC diff out of range")
            p += 1
        enc.encode(st, p, 0)
    if m < (1 << dc_l) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << dc_u) >> 1:
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    p += _MAG_OFFSET
    mm = m >> 1
    while mm:
        enc.encode(st, p, 1 if sz & mm else 0)
        mm >>= 1


def _decode_ac_block(dec, st, stats, blk, kx, ss=1, se=63, al=0) -> None:
    """AC coefficients of one block into ``blk`` (zigzag order, 64).

    Defaults cover the sequential whole-band case; progressive
    spectral-selection first scans (T.81 G.2, same decision tree
    restricted to [ss, se] with the decoded value scaled by 2^al) pass
    the band bounds and the successive-approximation low bit."""
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past block end")
            base = 3 * (k - 1)
        sign = dec.decode(stats.fixed, 0)
        p = base + 2
        m = dec.decode(st, p)
        if m:
            if dec.decode(st, p):
                m = 2
                p = _AC_TREE_LO if k <= kx else _AC_TREE_HI
                while dec.decode(st, p):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("corrupt arithmetic AC magnitude")
                    p += 1
        v = m
        p += _MAG_OFFSET
        mm = m >> 1
        while mm:
            if dec.decode(st, p):
                v |= mm
            mm >>= 1
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine_block(dec, st, stats, blk, ss, se, al) -> None:
    """AC successive-approximation refinement of one block (T.81 G.3,
    the Figure G.10 decision walk): per coefficient in [ss, se] —
    history-nonzero coefficients take one adaptive correction bit
    (context base+2), history-zero ones a significance decision
    (base+1) with a fixed-estimate sign; the EOB decision (base) is
    tested only past the previous stage's end-of-block index."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= ss and int(blk[kex]) == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            return  # EOB
        while True:
            c = int(blk[k])
            if c:
                if dec.decode(st, base + 2):
                    blk[k] = c + (m1 if c < 0 else p1)
                break
            if dec.decode(st, base + 1):
                blk[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement run past band end")
            base = 3 * (k - 1)
        k += 1


def _encode_ac_block(enc, st, stats, zz, kx, ss=1, se=63, al=0) -> None:
    """``zz``: the block's 64 quantized coefficients in zigzag order.
    Defaults = sequential whole band; progressive first scans pass the
    band bounds and point-transform (magnitude shift by ``al``)."""
    nonzero = [k for k in range(ss, se + 1) if abs(int(zz[k])) >> al]
    k = ss
    for nz in nonzero:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB at k
        while k < nz:  # zero run
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        sz = (abs(v) >> al) - 1
        p = base + 2
        if sz == 0:
            enc.encode(st, p, 0)
            m = 0
        else:
            enc.encode(st, p, 1)
            if sz == 1:
                enc.encode(st, p, 0)
                m = 1
            else:
                enc.encode(st, p, 1)
                m = 2
                p = _AC_TREE_LO if k <= kx else _AC_TREE_HI
                while (m << 1) <= sz:
                    enc.encode(st, p, 1)
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC coefficient out of range")
                    p += 1
                enc.encode(st, p, 0)
        p += _MAG_OFFSET
        mm = m >> 1
        while mm:
            enc.encode(st, p, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine_block(enc, st, stats, zz, ss, se, ah, al) -> None:
    """Encoder twin of :func:`_decode_ac_refine_block`: ``ke`` is the
    current stage's last significant index (|v| >> al), ``kex`` the
    previous stage's (|v| >> ah); decisions mirror Figure G.10."""
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zz[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)  # not EOB yet
        while True:
            v = int(zz[k])
            m = abs(v) >> al
            if m:
                if m >> 1:  # history-nonzero: one correction bit
                    enc.encode(st, base + 2, m & 1)
                else:  # newly significant: decision + fixed-estimate sign
                    enc.encode(st, base + 1, 1)
                    enc.encode(stats.fixed, 0, 1 if v < 0 else 0)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# --- scan walks --------------------------------------------------------------


def _split_restarts(scan: bytes) -> list[bytes]:
    """Split an entropy segment on RSTn markers (positional restarts)."""
    segs, pos = [], 0
    i = 0
    n = len(scan)
    while i + 1 < n:
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            segs.append(scan[pos:i])
            pos = i + 2
            i = pos
        else:
            i += 1
    segs.append(scan[pos:])
    return segs


def decode_arith_scan(
    scan: bytes,
    scan_comps: list[tuple[int, int, int]],
    frame: dict,
    restart_interval: int = 0,
    dc_cond: dict[int, tuple[int, int]] | None = None,
    ac_cond: dict[int, int] | None = None,
) -> None:
    """One sequential arithmetic (SOF9) scan into the frame's coefficient
    planes — the arithmetic twin of ``jpeg._baseline_scan``: same group
    walk (ns>1: frame MCU grid with hi x vi blocks per component; ns==1:
    the component's own block grid), restarts reset statistics AND DC
    predictors every ``restart_interval`` groups.

    ``scan_comps``: (component id, DC table, AC table) from SOS.
    ``dc_cond``/``ac_cond``: DAC conditioning per table — DC (L, U)
    bounds, AC Kx split; T.81 defaults (0, 1) and 5."""
    dc_cond = dc_cond or {}
    ac_cond = ac_cond or {}
    planes = frame["planes"]
    comp_index = frame["comp_index"]
    his, vis = frame["his"], frame["vis"]
    plan = []
    for cid, td, ta in scan_comps:
        ci = comp_index[cid]
        plan.append((ci, his[ci], vis[ci], td, ta))
    groups = _scan_groups(plan, frame)

    segs = _split_restarts(scan) if restart_interval else [scan]
    stats = _ScanStats(
        len(planes), [td for *_, td, _ in plan], [ta for *_, _, ta in plan]
    )
    seg_i = 0
    dec = _ArithDecoder(_ArithBitSrc(segs[0]))
    for gi, group in enumerate(groups):
        if restart_interval and gi and gi % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart marker in arithmetic scan")
            stats.reset()
            dec = _ArithDecoder(_ArithBitSrc(segs[seg_i]))
        for ci, by, bx, td, ta in group:
            blk = [0] * 64
            dc_l, dc_u = dc_cond.get(td, (0, 1))
            blk[0] = _decode_dc(dec, stats.dc[td], stats, ci, dc_l, dc_u)
            _decode_ac_block(dec, stats.ac[ta], stats, blk, ac_cond.get(ta, 5))
            planes[ci][by, bx] = blk


def decode_arith_progressive_scan(
    scan: bytes,
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    frame: dict,
    restart_interval: int = 0,
    dc_cond: dict[int, tuple[int, int]] | None = None,
    ac_cond: dict[int, int] | None = None,
) -> None:
    """One progressive-arithmetic (SOF10) scan into the frame's
    coefficient planes — T.81 Annex G with QM entropy decisions:

    * DC first (Ah=0): the sequential DC decision tree over the
      point-transformed value, stored ``<< Al`` (may interleave
      components; the only scan type that does);
    * DC refinement (Ah>0): one fixed-estimate bit per block ORed in at
      ``1 << Al`` (two's-complement, so negative DCs refine correctly);
    * AC first: the sequential AC tree restricted to [Ss, Se], values
      scaled by ``2^Al`` (always single-component, own block grid);
    * AC refinement: the Figure G.10 walk in
      :func:`_decode_ac_refine_block`.

    Statistics are per-scan and reset at restart markers, exactly as in
    the sequential walk."""
    dc_cond = dc_cond or {}
    ac_cond = ac_cond or {}
    planes = frame["planes"]
    comp_index = frame["comp_index"]
    his, vis = frame["his"], frame["vis"]
    p1 = 1 << al
    segs = _split_restarts(scan) if restart_interval else [scan]

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        plan = [
            (comp_index[cid], his[comp_index[cid]], vis[comp_index[cid]], td)
            for cid, td, _ in scan_comps
        ]
        groups = _scan_groups(plan, frame)
        stats = _ScanStats(len(planes), [td for *_, td in plan], [])
        seg_i = 0
        dec = _ArithDecoder(_ArithBitSrc(segs[0]))
        for gi, group in enumerate(groups):
            if restart_interval and gi and gi % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart marker in arithmetic scan")
                stats.reset()
                dec = _ArithDecoder(_ArithBitSrc(segs[seg_i]))
            for ci, by, bx, td in group:
                blk = planes[ci][by, bx]
                if ah == 0:
                    dc_l, dc_u = dc_cond.get(td, (0, 1))
                    blk[0] = _decode_dc(dec, stats.dc[td], stats, ci, dc_l, dc_u) << al
                elif dec.decode(stats.fixed, 0):
                    blk[0] = int(blk[0]) | p1
        return

    # AC scan — always a single component (G.1.1.1.1)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    cid, _, ta = scan_comps[0]
    ci = comp_index[cid]
    hi, vi = his[ci], vis[ci]
    nbx, nby = _true_block_grid(
        frame["w"], frame["h"], hi, vi, frame["hmax"], frame["vmax"]
    )
    rows = planes[ci]
    kx = ac_cond.get(ta, 5)
    stats = _ScanStats(1, [], [ta])
    st = stats.ac[ta]
    seg_i = 0
    dec = _ArithDecoder(_ArithBitSrc(segs[0]))
    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and unit and unit % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart marker in arithmetic scan")
                stats.reset()
                dec = _ArithDecoder(_ArithBitSrc(segs[seg_i]))
            unit += 1
            blk = rows[by, bx]
            if ah == 0:
                _decode_ac_block(dec, st, stats, blk, kx, ss, se, al)
            else:
                _decode_ac_refine_block(dec, st, stats, blk, ss, se, al)


def encode_jpeg_arith(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB8 (h, w, 3) -> SOF9 (sequential arithmetic) JFIF bytes.

    Same frame layout and quantized coefficients as ``jpeg.encode_jpeg``
    at the same settings (so a decode of both is pixel-identical); only
    the entropy layer differs: no DHT segments, QM-coded scan, optional
    DRI/RSTn with per-restart statistics reset.  Default T.81
    conditioning (DC (0,1), AC Kx=5), so no DAC segment is emitted."""
    from .jpeg import _frame_headers, _prepare_planes

    h, w, sub, ql, qc, comps_zz = _prepare_planes(
        arr, quality, subsampling, "encode_jpeg_arith"
    )
    out = _frame_headers(h, w, sub, ql, qc, 0xC9, restart_interval)  # SOF9
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack("BB", cid, tdta)
    out += b"\x00\x3f\x00"

    tbls = [(0, 0), (1, 1), (1, 1)]  # (dc table, ac table) per component
    stats = _ScanStats(3, [t for t, _ in tbls], [t for _, t in tbls])
    enc = _ArithEncoder()
    nby, nbx = comps_zz[1].shape[:2]  # chroma grid == MCU grid
    mcu_i = 0
    rst = 0

    def encode_block(ci: int, zz) -> None:
        td, ta = tbls[ci]
        diff = int(zz[0]) - stats.last_dc[ci]
        _encode_dc(enc, stats.dc[td], stats, ci, diff, 0, 1)
        stats.last_dc[ci] = int(zz[0])
        _encode_ac_block(enc, stats.ac[ta], stats, zz, 5)

    for my in range(nby):
        for mx in range(nbx):
            if restart_interval > 0 and mcu_i > 0 and mcu_i % restart_interval == 0:
                out += enc.flush()
                out += bytes((0xFF, 0xD0 | rst))
                rst = (rst + 1) & 7
                enc = _ArithEncoder()
                stats.reset()
            mcu_i += 1
            if sub:
                for by in range(2):
                    for bx in range(2):
                        encode_block(0, comps_zz[0][2 * my + by, 2 * mx + bx])
            else:
                encode_block(0, comps_zz[0][my, mx])
            encode_block(1, comps_zz[1][my, mx])
            encode_block(2, comps_zz[2][my, mx])
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_multiscan(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB8 -> SOF9 bytes with one NON-INTERLEAVED scan per component
    (T.81 A.2): the arithmetic twin of ``jpeg.encode_jpeg_multiscan``,
    exercising ``decode_arith_scan``'s ns==1 unit walk (the component's
    own block grid, no MCU padding blocks; restarts count units within
    the scan, statistics reset per scan).  Coefficients match
    ``jpeg.encode_jpeg`` at the same settings, so decodes are
    pixel-identical."""
    from .jpeg import _frame_headers, _prepare_planes

    h, w, sub, ql, qc, comps_zz = _prepare_planes(
        arr, quality, subsampling, "encode_jpeg_arith_multiscan"
    )
    out = _frame_headers(h, w, sub, ql, qc, 0xC9, restart_interval)  # SOF9

    hmax, vmax = (2, 2) if sub else (1, 1)
    samps = [(hmax, vmax), (1, 1), (1, 1)]
    for comp_i, (cid, tbl) in enumerate(((1, 0), (2, 1), (3, 1))):
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack("BB", cid, (tbl << 4) | tbl)
        out += b"\x00\x3f\x00"
        zz = comps_zz[comp_i]
        hi, vi = samps[comp_i]
        nbx, nby = _true_block_grid(w, h, hi, vi, hmax, vmax)
        stats = _ScanStats(1, [tbl], [tbl])
        enc = _ArithEncoder()
        rst = 0
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval > 0 and unit > 0 and unit % restart_interval == 0:
                    out += enc.flush()
                    out += bytes((0xFF, 0xD0 | rst))
                    rst = (rst + 1) & 7
                    enc = _ArithEncoder()
                    stats.reset()
                unit += 1
                blk = zz[by, bx]
                diff = int(blk[0]) - stats.last_dc[0]
                _encode_dc(enc, stats.dc[tbl], stats, 0, diff, 0, 1)
                stats.last_dc[0] = int(blk[0])
                _encode_ac_block(enc, stats.ac[tbl], stats, blk, 5)
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB8 (h, w, 3) -> PROGRESSIVE-ARITHMETIC (SOF10) JFIF bytes.

    Same quantized coefficients as ``jpeg.encode_jpeg`` at the same
    settings (decodes are pixel-identical) and the same 6-scan script as
    ``jpeg.encode_jpeg_progressive`` — interleaved DC with successive
    approximation, per-component spectral-selection AC bands, two AC
    refinement levels — so every Annex G decision procedure is
    exercised.  ``restart_interval`` > 0 emits DRI/RSTn with per-restart
    statistics reset (MCUs in the DC scans, blocks in the AC scans)."""
    from .jpeg import _frame_headers, _prepare_planes

    h, w, sub, ql, qc, comps_zz = _prepare_planes(
        arr, quality, subsampling, "encode_jpeg_arith_progressive"
    )
    out = _frame_headers(h, w, sub, ql, qc, 0xCA, restart_interval)  # SOF10

    def sos(scomps: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomps), len(scomps))
        for cid, tdta in scomps:
            hdr += struct.pack("BB", cid, tdta)
        return hdr + struct.pack("BBB", ss, se, (ah << 4) | al)

    dc_tbls = [0, 1, 1]
    ac_tbls = [0, 1, 1]
    sampling = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    nby, nbx = comps_zz[1].shape[:2]  # chroma grid == MCU grid

    def mcu_units():
        """(mcu index, component, dc value) in interleaved order."""
        for my in range(nby):
            for mx in range(nbx):
                for ci, (shi, svi) in enumerate(sampling):
                    for by in range(svi):
                        for bx in range(shi):
                            yield (
                                my * nbx + mx,
                                ci,
                                int(comps_zz[ci][svi * my + by, shi * mx + bx, 0]),
                            )

    # scan 1: DC first, Al=1 (arithmetic shift of the SIGNED value)
    out += sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    stats = _ScanStats(3, dc_tbls, [])
    enc = _ArithEncoder()
    rst = 0
    cur_mcu = 0
    for mcu_i, ci, dc in mcu_units():
        if restart_interval > 0 and mcu_i > cur_mcu:
            cur_mcu = mcu_i
            if mcu_i % restart_interval == 0:
                out += enc.flush()
                out += bytes((0xFF, 0xD0 | rst))
                rst = (rst + 1) & 7
                enc = _ArithEncoder()
                stats.reset()
        v = dc >> 1
        _encode_dc(enc, stats.dc[dc_tbls[ci]], stats, ci, v - stats.last_dc[ci], 0, 1)
        stats.last_dc[ci] = v
    out += enc.flush()
    # scan 2: DC refinement, Al=0 — one fixed-estimate bit per block
    out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    stats = _ScanStats(3, dc_tbls, [])
    enc = _ArithEncoder()
    rst = 0
    cur_mcu = 0
    for mcu_i, _ci, dc in mcu_units():
        if restart_interval > 0 and mcu_i > cur_mcu:
            cur_mcu = mcu_i
            if mcu_i % restart_interval == 0:
                out += enc.flush()
                out += bytes((0xFF, 0xD0 | rst))
                rst = (rst + 1) & 7
                enc = _ArithEncoder()
                stats.reset()
        enc.encode(stats.fixed, 0, dc & 1)
    out += enc.flush()
    # scans 3-6: AC bands per component over the component's TRUE block
    # grid (A.2.2 — MCU padding blocks are not coded)
    hvmax = 2 if sub else 1
    samp_grid = []
    for ci, (shi, svi) in enumerate(sampling):
        gx, gy = _true_block_grid(w, h, shi, svi, hvmax, hvmax)
        samp_grid.append((gy, gx))
    for ss, se, ah, al in ((1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)):
        for ci in range(3):
            ta = ac_tbls[ci]
            out += sos([(ci + 1, ta)], ss, se, ah, al)
            stats = _ScanStats(1, [], [ta])
            st = stats.ac[ta]
            enc = _ArithEncoder()
            rst = 0
            unit = 0
            cby, cbx = samp_grid[ci]
            for by in range(cby):
                for bx in range(cbx):
                    if restart_interval > 0 and unit > 0 and unit % restart_interval == 0:
                        out += enc.flush()
                        out += bytes((0xFF, 0xD0 | rst))
                        rst = (rst + 1) & 7
                        enc = _ArithEncoder()
                        stats.reset()
                    unit += 1
                    blk = comps_zz[ci][by, bx]
                    if ah == 0:
                        _encode_ac_block(enc, st, stats, blk, 5, ss, se, al)
                    else:
                        _encode_ac_refine_block(enc, st, stats, blk, ss, se, ah, al)
            out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
