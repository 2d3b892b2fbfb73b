"""Vectorized planar geometry kernels (numpy; Arrow-batch friendly).

Reproduces the reference's geometry semantics exactly, but batched:

* ``gauss_area``        — shoelace signed area, /root/reference/logic.py:71-80
  (note the reference returns ``(two - one) / 2``: positive == clockwise in
  stored axis order, because contours are stored axis-swapped ``[y, x]`` —
  /root/reference/real_estate.py:746-748,758-763).
* ``normalize_rings``   — first ring forced positive sign (outer), holes
  negative, conditional reverse — /root/reference/real_estate.py:764-780.
* ``segment_rings``     — flat vertex stream -> rings, boundary where the
  vertex label repeats (ring closure) — /root/reference/real_estate.py:735-757.
* ``points_in_rings``   — even-odd ray-cast point-in-polygon over a ring
  set (holes handled by parity), the exact-refine kernel of the spatial
  join.  Boundary convention: half-open ``[min, max)`` in both axes for
  axis-aligned edges, which is what the SQL oracles mirror.

All functions are pure, vectorized over numpy arrays, and called only from
``pandas_udf`` / ``mapInPandas`` stages — never from row-at-a-time Python
(BASELINE.json:input_hint requires vectorized UDFs throughout).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def pack_rings(rings: Sequence[np.ndarray]) -> bytes:
    """Multi-ring polygon -> compact binary (WKB-analog for Arrow transit).

    Layout: int32 nrings, then per ring int32 npoints + float64 (x, y)
    pairs.  Triple-nested Arrow list columns segfault pyarrow's
    arrow_to_pandas when they carry nulls, and a flat binary column is
    cheaper to shuffle anyway — so packed bytes are the engine's canonical
    geometry transit representation (like WKB in GeoParquet).
    """
    import struct

    parts = [struct.pack("<i", len(rings))]
    for r in rings:
        arr = np.ascontiguousarray(np.asarray(r, dtype="<f8"))
        parts.append(struct.pack("<i", len(arr)))
        parts.append(arr.tobytes())
    return b"".join(parts)


def unpack_rings(data: bytes | bytearray) -> list[np.ndarray]:
    import struct

    buf = memoryview(bytes(data))
    (nrings,) = struct.unpack_from("<i", buf, 0)
    pos = 4
    rings: list[np.ndarray] = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        arr = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=pos).reshape(npts, 2)
        pos += npts * 16
        rings.append(arr)
    return rings


def gauss_area(points: np.ndarray) -> float:
    """Shoelace signed area with the reference's sign convention.

    Mirrors /root/reference/logic.py:71-80: for vertex list ``p[i] =
    (a, b)``, returns ``(sum(b_i * a_{i+1}) - sum(a_i * b_{i+1})) / 2``.
    The reference feeds ``[y, x]`` pairs, so a *positive* result means the
    ring is clockwise in the original (x, y) axes.
    """
    p = np.asarray(points, dtype=np.float64)
    if len(p) < 2:
        return 0.0
    one = np.sum(p[:-1, 0] * p[1:, 1])
    two = np.sum(p[:-1, 1] * p[1:, 0])
    return float((two - one) / 2.0)


def normalize_rings(rings: Sequence[np.ndarray]) -> list[np.ndarray]:
    """Force first ring positive-signed, subsequent rings negative.

    Exact semantics of /root/reference/real_estate.py:764-780: the first
    ring (outer) is reversed when its gauss sign is negative; each later
    ring (hole) is reversed when its sign is positive.  Zero-area rings
    are left untouched (the reference's ``> 0`` / ``< 0`` tests skip 0).
    """
    out: list[np.ndarray] = []
    for i, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64)
        sign = gauss_area(r)
        if i == 0:
            out.append(r[::-1].copy() if sign < 0 else r)
        else:
            out.append(r[::-1].copy() if sign > 0 else r)
    return out


def segment_rings(
    labels: np.ndarray, xy: np.ndarray, keep_open_tail: bool = True
) -> list[np.ndarray]:
    """Split an ordered vertex stream into closed rings.

    Reference semantics (/root/reference/real_estate.py:735-757): scan the
    stream; a ring closes at the first re-occurrence of an already-seen
    vertex label; the closing vertex is included (every emitted ring
    repeats its first vertex last) and the next ring starts at the
    following vertex.  Two reference quirks reproduced deliberately:

    * the seen-label set is NOT reset between rings (``num_point``
      accumulates for the whole entity at real_estate.py:750-756), so a
      label reused across rings closes the later ring early;
    * vertices after the last closure never form a ring (the reference
      iterates only over recorded closures, real_estate.py:764-780) —
      pass ``keep_open_tail=False`` for that exact behavior; the default
      ``True`` keeps the tail, which is what the engine's general
      segmentation operator wants.
    """
    labels = np.asarray(labels)
    xy = np.asarray(xy, dtype=np.float64)
    rings: list[np.ndarray] = []
    start = 0
    seen: set[object] = set()
    n = len(labels)
    for i in range(n):
        lab = labels[i]
        if lab in seen:
            rings.append(xy[start : i + 1].copy())
            start = i + 1
        else:
            seen.add(lab)
    if keep_open_tail and start < n:
        rings.append(xy[start:n].copy())
    return rings


def points_in_rings(
    px: np.ndarray, py: np.ndarray, rings: Sequence[np.ndarray]
) -> np.ndarray:
    """Even-odd (ray-cast) containment of points in a multi-ring polygon.

    Vectorized over points x edges.  Parity across *all* rings means holes
    (later rings) subtract naturally.  Edge rule: an edge is counted when
    ``(y1 > py) != (y2 > py)`` and the horizontal ray to +inf crosses it
    strictly right of the point — for an axis-aligned rectangle this makes
    containment exactly ``xmin <= px < xmax AND ymin <= py < ymax``, the
    convention the DuckDB oracles mirror.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        # ensure closure: if the ring does not repeat its first vertex,
        # add the closing edge
        if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
            x1 = np.append(x1, r[-1, 0])
            y1 = np.append(y1, r[-1, 1])
            x2 = np.append(x2, r[0, 0])
            y2 = np.append(y2, r[0, 1])
        # (points, edges) broadcast
        pyc = py[:, None]
        pxc = px[:, None]
        cond = (y1[None, :] > pyc) != (y2[None, :] > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[None, :] * (pyc - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
        crossed = cond & (pxc < xint)
        inside ^= (crossed.sum(axis=1) % 2).astype(bool)
    return inside


def segments_intersect_rect(
    rings: Sequence[np.ndarray],
    rx0: np.ndarray,
    ry0: np.ndarray,
    rx1: np.ndarray,
    ry1: np.ndarray,
) -> np.ndarray:
    """For each rectangle i, does ANY polygon edge intersect it?

    Conservative separating-axis test per (rect, edge) pair: an edge whose
    bbox overlaps the rect and which is not fully on one side of the rect
    is counted as intersecting.  Used only to classify cover cells as
    boundary (never to reject), so over-approximation is safe.
    """
    rx0 = np.asarray(rx0, dtype=np.float64)
    ry0 = np.asarray(ry0, dtype=np.float64)
    rx1 = np.asarray(rx1, dtype=np.float64)
    ry1 = np.asarray(ry1, dtype=np.float64)
    hit = np.zeros(rx0.shape, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 2:
            continue
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        ex0 = np.minimum(x1, x2)[None, :]
        ex1 = np.maximum(x1, x2)[None, :]
        ey0 = np.minimum(y1, y2)[None, :]
        ey1 = np.maximum(y1, y2)[None, :]
        bbox_overlap = (
            (ex0 <= rx1[:, None])
            & (ex1 >= rx0[:, None])
            & (ey0 <= ry1[:, None])
            & (ey1 >= ry0[:, None])
        )
        hit |= bbox_overlap.any(axis=1)
    return hit


def rings_bbox(rings: Sequence[np.ndarray]) -> tuple[float, float, float, float]:
    allpts = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings], axis=0)
    return (
        float(allpts[:, 0].min()),
        float(allpts[:, 1].min()),
        float(allpts[:, 0].max()),
        float(allpts[:, 1].max()),
    )


def polygon_centroid(rings: Sequence[np.ndarray]) -> tuple[float, float]:
    """Area-weighted centroid of a multi-ring polygon (holes subtract via
    signed areas; falls back to vertex mean for zero-area rings)."""
    ax = ay = aa = 0.0
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
            r = np.vstack([r, r[:1]])
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        cross = x1 * y2 - x2 * y1
        aa += float(cross.sum()) / 2.0
        ax += float(((x1 + x2) * cross).sum()) / 6.0
        ay += float(((y1 + y2) * cross).sum()) / 6.0
    if aa == 0.0:
        allpts = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings], axis=0)
        return float(allpts[:, 0].mean()), float(allpts[:, 1].mean())
    return ax / aa, ay / aa
