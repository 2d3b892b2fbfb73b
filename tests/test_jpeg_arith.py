"""Arithmetic-coded JPEG (SOF9, functions/jpeg_arith.py): the QM entropy
layer must reconstruct the exact quantized coefficients of the Huffman
baseline at identical settings, so decoded pixels are bit-identical --
the same coefficient-exactness gate the progressive tests use.

In-sandbox validation scope (documented in the module docstring): both
halves of the codec are this repo's, so these tests prove mutual
consistency + structure, not cross-codec interop (no arithmetic-JPEG
producer exists offline)."""

from __future__ import annotations

import numpy as np
import pytest

from rosreestr_xml_to_gis_converter_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from rosreestr_xml_to_gis_converter_spark.functions.jpeg_arith import (
    _ArithBitSrc,
    _ArithDecoder,
    _ArithEncoder,
    _QE_TAB,
    encode_jpeg_arith,
)


def photo(rng, h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 75 * np.sin(x / 13.0) + 35 * np.cos(y / 7.0),
            128 + 55 * np.cos((x + 2 * y) / 11.0),
            128 + 60 * np.sin((x - y) / 17.0),
        ],
        axis=-1,
    )
    return np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)


def test_qe_table_invariants():
    assert len(_QE_TAB) == 114
    for i, (qe, nmps, nlps, sw) in enumerate(_QE_TAB):
        assert 0 < qe < 0x8000
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
    assert _QE_TAB[113] == (0x5A1D, 113, 113, 0)  # fixed ~0.5 bin


def test_qm_coder_roundtrip_random_bits():
    """The raw QM coder must roundtrip arbitrary bit sequences through a
    shared adaptive context set and the fixed bin."""
    rng = np.random.default_rng(23)
    for trial in range(5):
        # biased + unbiased segments stress both fast paths and renorms
        bits = np.concatenate(
            [
                (rng.random(400) < 0.95).astype(int),
                rng.integers(0, 2, 200),
                (rng.random(300) < 0.02).astype(int),
            ]
        )
        ctxs = rng.integers(0, 4, bits.size)
        enc = _ArithEncoder()
        st = bytearray(4)
        for b, cx in zip(bits, ctxs):
            enc.encode(st, int(cx), int(b))
        data = enc.flush()
        dec = _ArithDecoder(_ArithBitSrc(data))
        st2 = bytearray(4)
        got = [dec.decode(st2, int(cx)) for cx in ctxs]
        assert got == [int(b) for b in bits], f"trial {trial}"


def test_arith_jpeg_bit_identical_to_huffman_baseline():
    rng = np.random.default_rng(7)
    img = photo(rng, 64, 96)
    for q in (50, 85, 95):
        hu = encode_jpeg(img, quality=q)
        ar = encode_jpeg_arith(img, quality=q)
        assert np.array_equal(decode_jpeg(hu), decode_jpeg(ar)), q
        # compression sanity: the adaptive coder should not lose to
        # fixed Huffman tables on photo-like content
        assert len(ar) < len(hu)


def test_arith_jpeg_subsampled_and_restarts():
    rng = np.random.default_rng(11)
    img = photo(rng, 80, 72)
    for sub in ("444", "420"):
        for ri in (0, 3, 7):
            hu = encode_jpeg(img, quality=80, subsampling=sub, restart_interval=ri)
            ar = encode_jpeg_arith(
                img, quality=80, subsampling=sub, restart_interval=ri
            )
            assert np.array_equal(decode_jpeg(hu), decode_jpeg(ar)), (sub, ri)


def test_arith_jpeg_stream_structure():
    rng = np.random.default_rng(3)
    img = photo(rng, 24, 24)
    data = encode_jpeg_arith(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc9" in data  # SOF9
    assert b"\xff\xc4" not in data  # no Huffman tables
    # every 0xFF inside the entropy segment is stuffed or a marker
    sos = data.index(b"\xff\xda")
    seg = data[sos + 2 + 12 : -2]
    i = 0
    while i < len(seg) - 1:
        if seg[i] == 0xFF:
            assert seg[i + 1] == 0x00, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_arith_jpeg_odd_dimensions():
    rng = np.random.default_rng(31)
    for h, w in ((17, 23), (8, 40), (33, 9)):
        img = photo(rng, h, w)
        hu = encode_jpeg(img, quality=88)
        ar = encode_jpeg_arith(img, quality=88)
        out = decode_jpeg(ar)
        assert out.shape == (h, w, 3)
        assert np.array_equal(decode_jpeg(hu), out)


def test_arith_jpeg_flat_image_compresses_hard():
    img = np.full((32, 32, 3), 77, dtype=np.uint8)
    ar = encode_jpeg_arith(img, quality=90)
    assert np.array_equal(decode_jpeg(ar), decode_jpeg(encode_jpeg(img, 90)))
    # all-MPS fast path: a flat image's entropy segment is tiny
    assert len(ar) < 700


def test_arith_multiscan_non_interleaved_bit_identical():
    """ns==1 arithmetic scans (component's own block grid, per-scan
    statistics + restarts) must reconstruct the same pixels as the
    interleaved Huffman baseline."""
    from rosreestr_xml_to_gis_converter_spark.functions.jpeg_arith import (
        encode_jpeg_arith_multiscan,
    )

    rng = np.random.default_rng(41)
    img = photo(rng, 44, 52)  # non-multiple of 16: padding-block handling
    for sub in ("444", "420"):
        for ri in (0, 5):
            hu = encode_jpeg(img, quality=82, subsampling=sub)
            ar = encode_jpeg_arith_multiscan(
                img, quality=82, subsampling=sub, restart_interval=ri
            )
            assert ar.count(b"\xff\xda") == 3
            assert np.array_equal(decode_jpeg(hu), decode_jpeg(ar)), (sub, ri)


def test_arith_progressive_bit_identical():
    """SOF10 (progressive arithmetic): the 6-scan successive-
    approximation script must reconstruct coefficients bit-identical to
    the sequential Huffman baseline at the same settings — covers DC
    first/refine, AC band-first and both AC refinement levels of the
    Annex G decision procedures."""
    from rosreestr_xml_to_gis_converter_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(43)
    img = photo(rng, 44, 52)  # non-multiple of 16: padding-block handling
    for sub in ("444", "420"):
        for ri in (0, 5):
            hu = encode_jpeg(img, quality=82, subsampling=sub)
            ar = encode_jpeg_arith_progressive(
                img, quality=82, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xca" in ar and b"\xff\xc4" not in ar
            assert ar.count(b"\xff\xda") == 14  # 2 DC + 4 bands x 3 comps
            assert np.array_equal(decode_jpeg(hu), decode_jpeg(ar)), (sub, ri)


def test_arith_progressive_flat_exact_and_odd_dims():
    from rosreestr_xml_to_gis_converter_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = np.full((16, 16, 3), 137, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_arith_progressive(img)), img)
    rng = np.random.default_rng(44)
    odd = photo(rng, 33, 17)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arith_progressive(odd, 85, "420")),
        decode_jpeg(encode_jpeg(odd, 85, subsampling="420")),
    )


def test_hierarchical_still_rejected():
    rng = np.random.default_rng(5)
    data = bytearray(encode_jpeg_arith(photo(rng, 16, 16), 90))
    sof = data.index(b"\xff\xc9")
    data[sof + 1] = 0xC5  # differential sequential (hierarchical)
    with pytest.raises(ValueError, match="unsupported JPEG mode"):
        decode_jpeg(bytes(data))
