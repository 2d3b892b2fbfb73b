"""Scale-story properties: partition-layout pruning, skewed data, and
error-path robustness."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.index.grid import cell_col, cell_parent_col
from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
    build_parcel_cover,
    spatial_join,
    with_geotag,
)
from rosreestr_xml_to_gis_converter_spark.schemas import IMAGES_SCHEMA
from rosreestr_xml_to_gis_converter_spark.synth import (
    TESTDATA_BOX,
    gen_images_pdf,
    testdata_parcels_rings as _parcels_rings,
)

RES = 12
PARENT_RES = 6


def test_parent_cell_layout_prunes_partitions(spark, tmp_path):
    """SURVEY §4: spatial partition pruning via data layout, not a custom
    planner rule — storing by a coarse parent cell makes a cell-range
    read prune file groups in the parquet scan."""
    pdf = gen_images_pdf(61, 2000)
    pdf["bytes"] = None
    images = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    enc = with_geotag(images, TESTDATA_BOX).withColumn(
        "cell", cell_col(F.col("lat"), F.col("lon"), RES)
    )
    laid = enc.withColumn("cell_p", cell_parent_col(F.col("cell"), RES, PARENT_RES))
    path = str(tmp_path / "laid")
    laid.write.partitionBy("cell_p").parquet(path)

    back = spark.read.parquet(path)
    parents = sorted(r.cell_p for r in back.select("cell_p").distinct().collect())
    assert len(parents) > 1
    one = back.filter(F.col("cell_p") == parents[0])
    got = one.count()
    assert 0 < got < len(pdf)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell_p" in plan
    # pruning is correct: parent recomputed from cell matches the key
    rows = one.select("cell", "cell_p").collect()
    from rosreestr_xml_to_gis_converter_spark.index.grid import cell_parent

    for r in rows:
        assert int(cell_parent(np.int64(r.cell), PARENT_RES)) == r.cell_p


def _skewed_images(n: int) -> pd.DataFrame:
    """90% of points inside one tiny hot patch of the hot parcel."""
    pdf = gen_images_pdf(71, n)
    pdf["bytes"] = None
    rng = np.random.default_rng(5)
    hot = rng.random(n) < 0.9
    # phash low 32 bits -> lon fraction; pin hot rows to a narrow band
    lo = (np.full(n, 0.21) + rng.random(n) * 0.001) * 2**32
    hi = (np.full(n, 0.35) + rng.random(n) * 0.001) * 2**32
    ph = pdf["phash"].to_numpy().copy()
    ph[hot] = (hi[hot].astype(np.int64) << 32) | lo[hot].astype(np.int64)
    pdf["phash"] = ph
    return pdf


def test_skewed_hot_cell_salted_and_plain_agree(spark):
    """One cell holds ~90% of candidates: the salted path, the AQE
    shuffled path, and the broadcast path must all agree with brute
    force."""
    from rosreestr_xml_to_gis_converter_spark.functions.geometry import points_in_rings

    pdf = _skewed_images(1500)
    images = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    parcels = _parcels_rings()
    cover = build_parcel_cover(spark, parcels, RES)

    lon = TESTDATA_BOX.lon_np(pdf["phash"].to_numpy())
    lat = TESTDATA_BOX.lat_np(pdf["phash"].to_numpy())
    want = set()
    for cad, rings in parcels:
        for i in np.flatnonzero(points_in_rings(lon, lat, rings)):
            want.add((pdf["image_id"].iloc[i], cad))
    assert len(want) > 1000  # the hot patch really is inside the hot parcel

    for kwargs in (
        {},
        {"broadcast_cover": False},
        {"broadcast_cover": False, "salt": 8},
    ):
        got = {
            (r.image_id, r.cad_number)
            for r in spatial_join(images, cover, TESTDATA_BOX, **kwargs).collect()
        }
        assert got == want, kwargs


def test_corrupt_image_bytes_quarantined_not_fatal(spark):
    """Broken payloads produce ok=False rows; the batch survives."""
    from rosreestr_xml_to_gis_converter_spark.operators.imaging_ops import (
        validate_images,
    )

    pdf = gen_images_pdf(81, 12)
    pdf.loc[3, "bytes"] = b"\x89PNG garbage"
    pdf.loc[7, "bytes"] = b"not an image at all"
    images = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    out = validate_images(images).toPandas().set_index("image_id")
    bad = {pdf["image_id"].iloc[3], pdf["image_id"].iloc[7]}
    assert not out.loc[list(bad), "ok"].any()
    assert out.loc[~out.index.isin(bad), "ok"].all()
