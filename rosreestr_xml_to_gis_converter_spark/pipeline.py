"""End-to-end pipelines — the engine's analog of the reference's entry
points (SURVEY.md section 3).

EP1 ``start_conv`` (/root/reference/main.py:227-483) becomes three
composable stages, each a DataFrame transform:

  build_parcel_layer : XML extracts -> parcels + contours + error bucket
  spatial_join       : images x indexed parcel layer -> containment rows
  write_outputs      : checkpointed, resumable table writes with
                       lineage/metrics (replaces XLSX/SHP sinks K1/K2)

The returned summary mirrors the reference's final report (ok /
unsupported counts + wall seconds, main.py:471-483) as data instead of a
message box.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.checkpoint import CheckpointedWriter
from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
    build_parcel_cover,
    spatial_join,
)
from rosreestr_xml_to_gis_converter_spark.operators.tiling import tile_masks
from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import parse_extracts
from rosreestr_xml_to_gis_converter_spark.synth import GeoBox


def build_parcel_layer(
    files: DataFrame,
    classifiers: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(path, content) XML rows -> (parcels, errors).

    ``classifiers``: optional {column -> dim(code,label)} broadcast joins
    replacing the reference's per-object CSV dict lookups
    (/root/reference/real_estate.py:32-37); missing codes get '-'
    (real_estate.py:899).
    """
    rows = parse_extracts(files)
    errors = rows.filter(F.col("error").isNotNull()).select("doc_id", "error")
    parcels = rows.filter(F.col("error").isNull())
    for col, dim in (classifiers or {}).items():
        parcels = parcels.join(
            F.broadcast(dim), parcels[f"{col}_code"] == dim["code"], "left"
        ).select(
            *[c for c in parcels.columns],
            F.coalesce(dim["label"], F.lit("-")).alias(col),
        )
    return parcels, errors


def explode_entry_parcels(parcels: DataFrame) -> DataFrame:
    """Composite parcels -> one attribute row per entry parcel, parent CN
    carried; simple parcels get a single row with '-'
    (/root/reference/main.py:416-454)."""
    exploded = F.explode_outer("entry_parcels").alias("entry_cad_number")
    return parcels.select(
        "doc_id",
        "cad_number",
        exploded,
    ).select(
        "doc_id",
        F.coalesce(F.col("entry_cad_number"), F.col("cad_number")).alias("cad_number"),
        F.when(
            F.col("entry_cad_number").isNotNull(), F.col("cad_number")
        ).otherwise(F.lit("-")).alias("parent_cad_number"),
    )


def contours_of(parcels: DataFrame) -> DataFrame:
    return parcels.filter(F.col("geom").isNotNull()).select(
        F.col("cad_number").alias("geom_key"),
        F.col("doc_id"),
        F.col("geom"),
    )


def convert_extracts(
    spark: SparkSession,
    files: DataFrame,
    images: DataFrame,
    box: GeoBox,
    out_dir: str,
    res: int = 12,
    tile_px: int = 32,
    run_id: str = "run1",
    n_buckets: int = 16,
    classifiers: dict[str, DataFrame] | None = None,
) -> dict:
    """Full EP1-analog run: parse -> index -> join -> tile -> checkpointed
    writes.  Resumable: rerunning with the same ``out_dir``/``run_id``
    skips completed buckets (checkpoint.py)."""
    t0 = time.time()
    parcels, errors = build_parcel_layer(files, classifiers)
    parcels = parcels.cache()
    cover = build_parcel_cover(spark, contours_of(parcels), res).cache()

    joined = spatial_join(images, cover, box)
    tiles = tile_masks(cover, px=tile_px)

    w_join = CheckpointedWriter(spark, f"{out_dir}/join", run_id)
    w_join.write(joined, "cad_number", n_buckets)
    w_tiles = CheckpointedWriter(spark, f"{out_dir}/tiles", run_id)
    w_tiles.write(tiles, "cad_number", n_buckets)
    parcels.drop("geom").write.mode("overwrite").parquet(f"{out_dir}/parcels_attrs")
    errors.write.mode("overwrite").parquet(f"{out_dir}/errors")

    summary = {
        "n_parcels": parcels.count(),
        "n_errors": errors.count(),
        "n_join_rows": w_join.read().count(),
        "n_tiles": w_tiles.read().count(),
        "secs": max(1, int(time.time() - t0)),  # 1-second floor like main.py:474-475
        "run_id": run_id,
    }
    parcels.unpersist()
    cover.unpersist()
    return summary
