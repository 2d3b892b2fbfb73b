"""Image codec invariants (BASELINE.json input_hint):
lossless round-trip exact; lossy PSNR >= 40 dB; caption byte-equality."""

from __future__ import annotations

import numpy as np

from rosreestr_xml_to_gis_converter_spark.functions.imaging import (
    decode_image,
    decode_png,
    encode_fake_jpeg,
    encode_png,
    psnr,
)
from rosreestr_xml_to_gis_converter_spark.synth import gen_image_array, gen_images_pdf


def test_png_roundtrip_exact():
    rng = np.random.default_rng(1)
    for w, h in [(32, 32), (64, 31), (128, 5), (1, 1)]:
        arr = gen_image_array(rng, w, h)
        out = decode_png(encode_png(arr))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, arr)


def test_png_decode_all_filter_types():
    """Our encoder emits filter 0, but the decoder must handle 1-4 for
    foreign PNGs; synthesize raw streams per filter type."""
    import struct
    import zlib

    from rosreestr_xml_to_gis_converter_spark.functions.imaging import _chunk, _PNG_SIG

    rng = np.random.default_rng(2)
    arr = gen_image_array(rng, 8, 6)
    h, w = 6, 8
    for ftype in (1, 2, 3, 4):
        # build filtered scanlines with the chosen type (inverse transform)
        raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
        prev = np.zeros(w * 3, dtype=np.int32)
        for row in range(h):
            line = arr[row].reshape(-1).astype(np.int32)
            enc = np.zeros(w * 3, dtype=np.int32)
            for i in range(w * 3):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
            raw[row, 0] = ftype
            raw[row, 1:] = enc.astype(np.uint8)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), arr), f"filter {ftype}"


def test_fake_jpeg_psnr_above_gate():
    rng = np.random.default_rng(3)
    arr = gen_image_array(rng, 64, 64)
    out = decode_image(encode_fake_jpeg(arr), "jpeg")
    assert out.shape == arr.shape
    p = psnr(arr, out)
    assert p >= 40.0, p


def test_gen_images_deterministic_and_decodable():
    a = gen_images_pdf(42, 12)
    b = gen_images_pdf(42, 12)
    assert a.equals(b)
    for _, row in a.iterrows():
        arr = decode_image(row["bytes"], row["fmt"])
        assert arr.shape == (row["h"], row["w"], 3)
        if row["fmt"] == "png":
            # lossless: re-encode is byte-identical
            from rosreestr_xml_to_gis_converter_spark.functions.imaging import encode_png

            assert encode_png(arr) == row["bytes"]
        else:
            assert psnr(decode_image(row["bytes"], "jpeg"), arr) == float("inf")
    assert a["caption"].str.contains("parcel photo").all()
