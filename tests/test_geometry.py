"""Geometry kernel unit tests — golden fixtures reproducing the reference
semantics (SURVEY.md section 5 item 1)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rosreestr_xml_to_gis_converter_spark.functions.geometry import (
    gauss_area,
    normalize_rings,
    points_in_rings,
    polygon_centroid,
    segment_rings,
)

SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)  # CCW
SQUARE_CW = SQUARE[::-1].copy()
HOLE = np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], dtype=float)  # CW


def test_gauss_area_matches_reference_sign_convention():
    # reference formula (two - one) / 2: CCW ring in (a, b) order -> negative
    # (/root/reference/logic.py:71-80 with [y, x] storage makes positive=CW)
    assert gauss_area(SQUARE) == -16.0
    assert gauss_area(SQUARE_CW) == 16.0
    assert gauss_area(np.array([[0, 0], [1, 1]], dtype=float)) == pytest.approx(0.0)
    assert gauss_area(np.array([[5, 5]], dtype=float)) == 0.0


def test_normalize_rings_first_positive_holes_negative():
    out = normalize_rings([SQUARE, HOLE])
    assert gauss_area(out[0]) > 0  # outer forced positive (reversed from CCW)
    assert gauss_area(out[1]) < 0  # hole forced negative (reversed from CW)
    # idempotent
    out2 = normalize_rings(out)
    assert all(np.array_equal(a, b) for a, b in zip(out, out2))


def test_segment_rings_on_label_repeat():
    labels = np.array(["1", "2", "3", "1", "7", "8", "9", "7"])
    xy = np.arange(16, dtype=float).reshape(8, 2)
    rings = segment_rings(labels, xy)
    assert len(rings) == 2
    assert len(rings[0]) == 4  # closing vertex included
    assert np.array_equal(rings[0][0], xy[0])
    assert np.array_equal(rings[0][-1], xy[3])
    assert len(rings[1]) == 4


def test_segment_rings_trailing_open_ring_kept():
    labels = np.array(["1", "2", "1", "5", "6"])
    xy = np.arange(10, dtype=float).reshape(5, 2)
    rings = segment_rings(labels, xy)
    assert len(rings) == 2
    assert len(rings[1]) == 2  # unterminated tail emitted as-is


def test_pip_square_half_open_convention():
    rings = [SQUARE]
    px = np.array([2.0, 0.0, 4.0, 2.0, 2.0, -1.0])
    py = np.array([2.0, 2.0, 2.0, 0.0, 4.0, 2.0])
    got = points_in_rings(px, py, rings)
    # [xmin, xmax) x [ymin, ymax): left/bottom edges in, right/top out
    assert got.tolist() == [True, True, False, True, False, False]


def test_pip_hole_subtracts():
    rings = [SQUARE, HOLE]
    px = np.array([2.0, 0.5, 3.5])
    py = np.array([2.0, 0.5, 3.5])
    assert points_in_rings(px, py, rings).tolist() == [False, True, True]


def test_pip_orientation_invariant():
    px = np.array([2.0, 5.0])
    py = np.array([2.0, 5.0])
    a = points_in_rings(px, py, [SQUARE])
    b = points_in_rings(px, py, [SQUARE_CW])
    assert a.tolist() == b.tolist() == [True, False]


def test_centroid_rect_with_hole():
    cx, cy = polygon_centroid([SQUARE, HOLE])
    assert (cx, cy) == pytest.approx((2.0, 2.0))


@st.composite
def simple_polygon(draw):
    """Random star-shaped polygon (guaranteed simple)."""
    n = draw(st.integers(min_value=3, max_value=12))
    radii = [draw(st.floats(0.5, 5.0, allow_nan=False)) for _ in range(n)]
    angles = np.sort(np.linspace(0, 2 * np.pi, n, endpoint=False))
    pts = np.stack(
        [np.array(radii) * np.cos(angles), np.array(radii) * np.sin(angles)], axis=1
    )
    return np.vstack([pts, pts[:1]])


@settings(max_examples=50, deadline=None)
@given(simple_polygon())
def test_property_normalization_idempotent_and_area_invariant(poly):
    out1 = normalize_rings([poly])
    out2 = normalize_rings(out1)
    assert np.array_equal(out1[0], out2[0])
    assert abs(gauss_area(out1[0])) == pytest.approx(abs(gauss_area(poly)))
    assert gauss_area(out1[0]) >= 0


@settings(max_examples=30, deadline=None)
@given(simple_polygon(), st.integers(0, 2**32 - 1))
def test_property_pip_matches_matplotlib_free_winding(poly, seed):
    """Cross-check even-odd PIP against an independent crossing-number
    implementation on random points."""
    rng = np.random.default_rng(seed)
    px = rng.uniform(-6, 6, 64)
    py = rng.uniform(-6, 6, 64)
    got = points_in_rings(px, py, [poly])
    ref = np.array([_slow_pip(x, y, poly) for x, y in zip(px, py)])
    assert np.array_equal(got, ref)


def _slow_pip(x: float, y: float, ring: np.ndarray) -> bool:
    inside = False
    n = len(ring) - 1
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xint:
                inside = not inside
    return inside
