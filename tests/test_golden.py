"""Golden-output pin (FIXTURES.md section 7): the engine's join rows, kNN
rows, and tile-mask hashes for the seed-1 fixture family must match the
checked-in brute-force goldens byte-for-byte — protects determinism and
semantics across rounds."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.functions.geometry import polygon_centroid
from rosreestr_xml_to_gis_converter_spark.operators.knn import knn_bruteforce
from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
    build_parcel_cover,
    spatial_join,
)
from rosreestr_xml_to_gis_converter_spark.operators.tiling import tile_masks
from rosreestr_xml_to_gis_converter_spark.schemas import IMAGES_SCHEMA
from rosreestr_xml_to_gis_converter_spark.synth import (
    TESTDATA_BOX,
    gen_images_pdf,
    gen_parcels,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fixture_family_seed1.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fixture(spark, golden):
    p = golden["params"]
    parcels = gen_parcels(p["seed"], p["n_parcels"])
    pdf = gen_images_pdf(p["seed"], p["n_img"])
    pdf["bytes"] = None
    images = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    cover = build_parcel_cover(spark, parcels, p["res"]).cache()
    return parcels, images, cover, p


def test_join_rows_match_golden(golden, fixture):
    _, images, cover, _ = fixture
    got = sorted(
        [r.image_id, r.cad_number, r.cell]
        for r in spatial_join(images, cover, TESTDATA_BOX).collect()
    )
    assert got == golden["join_rows"]


def test_knn_matches_golden(spark, golden, fixture):
    parcels, images, _, _ = fixture
    cen = spark.createDataFrame(
        [(cad, *polygon_centroid(rings)) for cad, rings in parcels],
        schema="cad_number string, clon double, clat double",
    )
    out = knn_bruteforce(images, cen, TESTDATA_BOX, k=3)
    got = sorted(
        [r.image_id, r.cad_number, r["rank"], repr(r.dist)] for r in out.collect()
    )
    assert got == golden["knn_top3"]


def test_tile_masks_match_golden(golden, fixture):
    _, _, cover, p = fixture
    got = sorted(
        [r.tile_cell, r.cad_number, r.coverage_px, r.mask_md5]
        for r in tile_masks(cover, px=p["px"]).collect()
    )
    assert got == golden["tile_masks"]
