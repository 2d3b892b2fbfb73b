"""Grid index unit tests: numpy/Column/SQL encodes must agree bitwise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rosreestr_xml_to_gis_converter_spark.functions.geometry import points_in_rings
from rosreestr_xml_to_gis_converter_spark.index.grid import (
    cell_parent,
    cell_res,
    cell_sql,
    cell_to_bounds,
    cell_to_center,
    grid_disk,
    latlng_to_cell,
    polygon_to_cells,
)


def test_roundtrip_bounds_contain_point():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    for res in (0, 5, 12, 20, 28):
        cells = latlng_to_cell(lat, lon, res)
        lon0, lat0, lon1, lat1 = cell_to_bounds(cells)
        assert ((lon >= lon0) & (lon <= lon1)).all()
        assert ((lat >= lat0) & (lat <= lat1)).all()
        assert (cell_res(cells) == res).all()
        assert (cells >= 0).all()  # res 0 packs to id 0 (whole world)


def test_parent_contains_child_center():
    rng = np.random.default_rng(9)
    lat = rng.uniform(-89.9, 89.9, 100)
    lon = rng.uniform(-179.9, 179.9, 100)
    child = latlng_to_cell(lat, lon, 15)
    parent = cell_parent(child, 8)
    cx, cy = cell_to_center(child)
    again = latlng_to_cell(cy, cx, 8)
    assert np.array_equal(parent, again)


def test_grid_disk_counts_and_membership():
    c = latlng_to_cell(55.75, 37.61, 12)
    d0 = grid_disk(int(c), 0)
    d1 = grid_disk(int(c), 1)
    d2 = grid_disk(int(c), 2)
    assert d0.tolist() == [int(c)]
    assert len(d1) == 9 and int(c) in d1
    assert len(d2) == 25
    assert set(d1) <= set(d2)


def test_grid_disk_clips_at_world_edge():
    c = latlng_to_cell(-89.99, -179.99, 5)
    d = grid_disk(int(c), 1)
    assert len(d) == 4  # corner cell: 2x2 survive


def test_polygon_cover_exact_vs_brute(spark=None):
    ring = np.array(
        [[37.0, 55.0], [37.9, 55.0], [37.9, 55.7], [37.0, 55.7], [37.0, 55.0]]
    )
    res = 12
    cells, full = polygon_to_cells([ring], res)
    assert len(cells) > 4
    # every full cell: all 4 corners strictly inside
    for c, f in zip(cells, full):
        x0, y0, x1, y1 = cell_to_bounds(np.int64(c))
        corners = points_in_rings(
            np.array([x0, x1, x0, x1]), np.array([y0, y0, y1, y1]), [ring]
        )
        if f:
            assert corners.all()
    # cover is a superset: random inside points must land in cover cells
    rng = np.random.default_rng(3)
    px = rng.uniform(37.0, 37.9, 500)
    py = rng.uniform(55.0, 55.7, 500)
    pc = latlng_to_cell(py, px, res)
    assert np.isin(pc, cells).all()


def test_polygon_cover_with_hole_classifies_hole_cells_not_full():
    outer = np.array([[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]], dtype=float)
    hole = np.array([[14, 14], [16, 14], [16, 16], [14, 16], [14, 14]], dtype=float)
    res = 8
    cells, full = polygon_to_cells([outer, hole], res)
    hole_center_cell = latlng_to_cell(15.0, 15.0, res)
    m = cells == hole_center_cell
    if m.any():  # the hole cell may be in the cover but must not be full
        assert not full[m].any()


def test_column_encode_bitwise_equals_numpy(spark):
    from pyspark.sql import functions as F

    from rosreestr_xml_to_gis_converter_spark.index.grid import cell_col

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89.9, 89.9, 1000), "lon": rng.uniform(-179.9, 179.9, 1000)}
    )
    for res in (5, 12, 28):
        got = (
            spark.createDataFrame(pdf)
            .select(cell_col(F.col("lat"), F.col("lon"), res).alias("c"))
            .toPandas()["c"]
            .to_numpy()
        )
        want = latlng_to_cell(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), res)
        assert np.array_equal(got, want)


def test_sql_encode_bitwise_equals_numpy():
    import duckdb

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89.9, 89.9, 1000), "lon": rng.uniform(-179.9, 179.9, 1000)}
    )
    con = duckdb.connect()
    con.register("pts", pdf)
    for res in (5, 12, 28):
        got = (
            con.execute(f"SELECT {cell_sql('lat', 'lon', res)} AS c FROM pts")
            .fetchdf()["c"]
            .to_numpy()
        )
        want = latlng_to_cell(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), res)
        assert np.array_equal(got, want)


def test_res_bounds():
    with pytest.raises(ValueError):
        latlng_to_cell(0.0, 0.0, 29)
