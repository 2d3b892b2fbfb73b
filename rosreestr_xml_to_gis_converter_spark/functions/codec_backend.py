"""Optional SYSTEM image-codec backend behind ``decode_image``'s exact
interface (round-4 VERDICT next-round #4).

BASELINE.md claims the pure-python JPEG/PNG codecs are substitutable for
a system codec (libjpeg-turbo via Pillow) with a ONE-FUNCTION swap and no
plan/schema/oracle change: every imaging operator calls
``decode_image(data: bytes, fmt: str) -> uint8 (h, w, 3)`` /
``encode_image(arr, fmt) -> bytes`` and nothing else.  This module makes
that claim executable:

* ``BACKENDS`` maps a backend name to ``(decode_fn, encode_fn)`` pairs
  sharing that exact signature.
* ``pure`` — the in-repo codecs (always present).
* ``system`` — Pillow/libjpeg, registered ONLY when ``PIL`` imports
  (absent in this sandbox; tests skip, production containers activate).
* ``mirror`` — the pure codecs routed through the backend seam; exists
  so the dispatch path itself is testable WITHOUT Pillow: a gate query
  run under ``SPARK_GRAFT_IMAGE_BACKEND=mirror`` must hash-equal the
  default run (same plan, same schema, same oracle).

Selection: the ``SPARK_GRAFT_IMAGE_BACKEND`` env var, read at import in
every process — the local-mode Python workers inherit the driver's
environment, so one export swaps the codec fleet-wide with zero plan or
schema change.  ``decode_image``/``encode_image`` in
:mod:`functions.imaging` consult this module; the FJPG stub container is
always routed to its own decoder first (it is a repo-internal format no
system codec knows).
"""

from __future__ import annotations

import io
import os

import numpy as np

try:  # guarded: Pillow is absent in this sandbox, present in prod images
    from PIL import Image as _PILImage

    HAVE_SYSTEM_CODEC = True
except ImportError:  # pragma: no cover - exercised via the skip branch
    _PILImage = None
    HAVE_SYSTEM_CODEC = False


def jpeg_uses_arithmetic(data: bytes) -> bool:
    """True when a JFIF stream's frame marker is an arithmetic-coded SOF
    (SOF9/10/11).  libjpeg is routinely built without
    D_ARITH_CODING_SUPPORT, and the planted arithmetic fixtures gate
    exact-value oracles — so the system backend hands these streams to
    the pure decoder instead of crashing (or drifting) in Pillow."""
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m in (0xC9, 0xCA, 0xCB)
        if m in (0xD9, 0xDA):
            return False
        pos += 2 + ((data[pos + 2] << 8) | data[pos + 3])
    return False


def _decode_system(data: bytes, fmt: str) -> np.ndarray:
    if _PILImage is None:
        raise RuntimeError(
            "system image backend requested but Pillow is not importable"
        )
    if fmt == "jpeg" and jpeg_uses_arithmetic(data):
        return _pure_pair()[0](data, fmt)
    img = _PILImage.open(io.BytesIO(data))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def _encode_system(arr: np.ndarray, fmt: str) -> bytes:
    if _PILImage is None:
        raise RuntimeError(
            "system image backend requested but Pillow is not importable"
        )
    buf = io.BytesIO()
    pil_fmt = {"png": "PNG", "jpeg": "JPEG"}[fmt]
    kwargs = {"quality": 90} if fmt == "jpeg" else {}
    _PILImage.fromarray(np.ascontiguousarray(arr, dtype=np.uint8)).save(
        buf, format=pil_fmt, **kwargs
    )
    return buf.getvalue()


def _pure_pair():
    # late imports: imaging.py imports this module back for dispatch
    from rosreestr_xml_to_gis_converter_spark.functions.imaging import (
        _decode_image_pure,
        _encode_image_pure,
    )

    return _decode_image_pure, _encode_image_pure


def _decode_mirror(data: bytes, fmt: str) -> np.ndarray:
    return _pure_pair()[0](data, fmt)


def _encode_mirror(arr: np.ndarray, fmt: str) -> bytes:
    return _pure_pair()[1](arr, fmt)


BACKENDS: dict[str, tuple] = {"mirror": (_decode_mirror, _encode_mirror)}
if HAVE_SYSTEM_CODEC:
    BACKENDS["system"] = (_decode_system, _encode_system)


def active_backend() -> str:
    """Backend name for this process: env var, defaulting to 'pure'.
    Unknown or unavailable names fail fast rather than silently falling
    back — a cluster misconfigured to 'system' without Pillow must not
    quietly run the slow pure codec."""
    name = os.environ.get("SPARK_GRAFT_IMAGE_BACKEND", "pure")
    if name != "pure" and name not in BACKENDS:
        raise RuntimeError(
            f"image backend {name!r} unavailable (have: pure"
            + "".join(f", {b}" for b in BACKENDS)
            + ")"
        )
    return name
