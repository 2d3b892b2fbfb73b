"""Property-based trust for the grid cover and the packed-geometry codec."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rosreestr_xml_to_gis_converter_spark.functions.geometry import (
    pack_rings,
    points_in_rings,
    unpack_rings,
)
from rosreestr_xml_to_gis_converter_spark.index.grid import (
    cell_to_bounds,
    latlng_to_cell,
    polygon_to_cells,
)


@st.composite
def star_polygon(draw):
    n = draw(st.integers(3, 10))
    cx = draw(st.floats(-170, 170))
    cy = draw(st.floats(-80, 80))
    radii = [draw(st.floats(0.01, 3.0)) for _ in range(n)]
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([cx + np.array(radii) * np.cos(ang), cy + np.array(radii) * np.sin(ang)], 1)
    return np.vstack([pts, pts[:1]])


@settings(max_examples=40, deadline=None)
@given(star_polygon(), st.integers(6, 14), st.integers(0, 2**31 - 1))
def test_cover_is_superset_of_contained_points(poly, res, seed):
    """Every point inside the polygon must land in a cover cell, and
    full-cell points must all be inside (the join-exactness invariant)."""
    cells, full = polygon_to_cells([poly], res)
    rng = np.random.default_rng(seed)
    lo = poly.min(axis=0)
    hi = poly.max(axis=0)
    px = rng.uniform(lo[0], hi[0], 200)
    py = rng.uniform(lo[1], hi[1], 200)
    inside = points_in_rings(px, py, [poly])
    pc = latlng_to_cell(py, px, res)
    assert np.isin(pc[inside], cells).all()
    full_set = set(cells[full].tolist())
    in_full = np.isin(pc, list(full_set)) if full_set else np.zeros(len(px), bool)
    assert inside[in_full].all()


@settings(max_examples=40, deadline=None)
@given(star_polygon(), st.integers(6, 12))
def test_full_cells_lie_within_bbox_and_inside(poly, res):
    cells, full = polygon_to_cells([poly], res)
    if not full.any():
        return
    x0, y0, x1, y1 = cell_to_bounds(cells[full])
    cx = (x0 + x1) / 2
    cy = (y0 + y1) / 2
    assert points_in_rings(cx, cy, [poly]).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(3, 40), min_size=1, max_size=5), st.integers(0, 2**31 - 1))
def test_pack_unpack_roundtrip(sizes, seed):
    rng = np.random.default_rng(seed)
    rings = [rng.standard_normal((s, 2)) * 100 for s in sizes]
    out = unpack_rings(pack_rings(rings))
    assert len(out) == len(rings)
    for a, b in zip(rings, out):
        assert np.array_equal(a, b)  # bit-exact
