"""Tiling golden tests + checkpoint/resume byte-parity tests."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from rosreestr_xml_to_gis_converter_spark.checkpoint import CheckpointedWriter
from rosreestr_xml_to_gis_converter_spark.functions.geometry import points_in_rings
from rosreestr_xml_to_gis_converter_spark.index.grid import cell_to_bounds
from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
    build_parcel_cover,
)
from rosreestr_xml_to_gis_converter_spark.operators.tiling import (
    rasterize_mask,
    tile_masks,
)
from rosreestr_xml_to_gis_converter_spark.synth import gen_parcels, testdata_parcels_rings as _parcels_rings

RES = 9
PX = 16


def test_tile_masks_match_numpy_oracle(spark):
    # big rectangles (full tiles guaranteed) + small general polygons
    parcels = _parcels_rings() + gen_parcels(21, 8)
    cover = build_parcel_cover(spark, parcels, RES)
    got = {
        (r.tile_cell, r.cad_number): (r.coverage_px, r.mask_md5)
        for r in tile_masks(cover, px=PX).collect()
    }
    # independent oracle: brute-force rasterize every cover cell
    by_cad = dict(parcels)
    want = {}
    for r in cover.collect():
        rings = by_cad[r.cad_number]
        if r.full:
            mask = np.ones((PX, PX), dtype=np.uint8)
        else:
            x0, y0, x1, y1 = (float(v) for v in cell_to_bounds(np.int64(r.cell)))
            xs = x0 + (np.arange(PX) + 0.5) * (x1 - x0) / PX
            ys = y0 + (np.arange(PX) + 0.5) * (y1 - y0) / PX
            gx, gy = np.meshgrid(xs, ys)
            mask = points_in_rings(gx.ravel(), gy.ravel(), rings).reshape(PX, PX).astype(np.uint8)
        want[(r.cell, r.cad_number)] = (int(mask.sum()), hashlib.md5(mask.tobytes()).hexdigest())
    assert got == want
    assert any(v[0] == PX * PX for v in got.values())  # some full tiles
    assert any(0 < v[0] < PX * PX for v in got.values())  # some boundary tiles


def test_rasterize_mask_full_shortcut_matches_exact():
    # a full cell's mask must equal the exact rasterization of that cell
    parcels = _parcels_rings()
    _, rings = parcels[0]
    from rosreestr_xml_to_gis_converter_spark.index.grid import polygon_to_cells

    cells, full = polygon_to_cells(rings, RES)
    fc = cells[full][0]
    assert np.array_equal(
        rasterize_mask(int(fc), rings, PX, True),
        rasterize_mask(int(fc), rings, PX, False),
    )


@pytest.fixture
def join_df(spark):
    from rosreestr_xml_to_gis_converter_spark.queries_engine import flagship_spatial_join

    return flagship_spatial_join(spark, "/root/testdata/sf0.001")


def test_checkpoint_resume_byte_identical(spark, tmp_path, join_df):
    n_buckets = 8
    # clean one-shot run
    w_full = CheckpointedWriter(spark, str(tmp_path / "full"), "run1")
    groups = w_full.write(join_df, "cad_number", n_buckets, group_size=3)
    assert groups == 3  # ceil(8 / 3)
    want = sorted(map(tuple, w_full.read().drop("_bucket").collect()))

    # crashed run: 1 group lands, then failure
    w_crash = CheckpointedWriter(spark, str(tmp_path / "crash"), "run1")
    with pytest.raises(RuntimeError, match="injected failure"):
        w_crash.write(join_df, "cad_number", n_buckets, group_size=3, fail_after_groups=1)
    done_after_crash = w_crash.completed_buckets()
    assert 0 < len(done_after_crash) < n_buckets

    # resume: only the remaining groups run, output identical to one-shot
    groups2 = w_crash.write(join_df, "cad_number", n_buckets, group_size=3)
    assert groups2 == 2
    got = sorted(map(tuple, w_crash.read().drop("_bucket").collect()))
    assert got == want

    # second resume is a no-op
    assert w_crash.write(join_df, "cad_number", n_buckets, group_size=3) == 0

    # lineage doubles as per-partition metrics: every bucket exactly once
    m = w_crash.metrics().filter("run_id = 'run1'").toPandas()
    assert sorted(m["bucket"]) == list(range(n_buckets))
    assert int(m["n_rows"].sum()) == len(want)


def test_checkpoint_stale_debris_not_counted(spark, tmp_path):
    """Regression (ADVICE r2): dynamic partition overwrite never touches a
    partition that produces no rows, so debris files from an aborted
    earlier run used to survive in empty buckets and be reported as
    freshly-written lineage.  write() must clear todo bucket dirs first."""
    base = str(tmp_path / "stale")
    # 100 rows over 3 distinct keys -> at most 3 of 8 buckets nonempty
    df = spark.range(100).selectExpr("id", "cast(id % 3 as string) AS key")
    # an aborted earlier run (no lineage recorded) left files in EVERY bucket
    debris = spark.range(7).selectExpr("id", "'zz' AS key")
    for b in range(8):
        debris.coalesce(1).write.mode("overwrite").parquet(f"{base}/data/_bucket={b}")

    w = CheckpointedWriter(spark, base, "run1")
    w.write(df, "key", n_buckets=8, group_size=3)
    m = w.metrics().filter("run_id = 'run1'").toPandas()
    assert sorted(m["bucket"]) == list(range(8))
    assert int(m["n_rows"].sum()) == 100  # debris rows not in lineage
    assert w.read().count() == 100  # ...and not in the output either


def test_checkpoint_write_computes_upstream_once(spark, tmp_path):
    """Regression (round-1 perf-weak #2): write() used to recompute the
    unpersisted upstream once per group for the write plus once more for
    counts (~2x groups full executions).  An accumulator inside the
    upstream proves each input row is now computed exactly once."""
    acc = spark.sparkContext.accumulator(0)

    def counting(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    n = 1000
    base = spark.range(n).selectExpr("id", "cast(id as string) AS key")
    upstream = base.mapInPandas(counting, schema="id long, key string")

    w = CheckpointedWriter(spark, str(tmp_path / "once"), "run1")
    groups = w.write(upstream, "key", n_buckets=8, group_size=2)
    assert groups == 4
    assert w.read().count() == n
    # 4 groups x (write + counts) would be >= 4000 without the persist
    assert acc.value == n

    # lineage counts come from the written files and still reconcile
    m = w.metrics().filter("run_id = 'run1'").toPandas()
    assert int(m["n_rows"].sum()) == n
    assert sorted(m["bucket"]) == list(range(8))
