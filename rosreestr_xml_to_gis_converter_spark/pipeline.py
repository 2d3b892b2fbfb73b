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


def rename_plan(parcels: DataFrame, order_col: str = "doc_id") -> DataFrame:
    """EP2 (``rename_xml``, /root/reference/main.py:177-225) as a
    declarative transform: derived file name
    ``{cad ':'->'-'}---{extract_date '.'->'-'}.xml`` with the reference's
    `` (2)``..`` (n)`` collision suffixes (the reference probes the
    filesystem serially; a window rank is the distributed equivalent).
    Unsupported documents (error rows) get no new name, mirroring the
    reference's skip counter."""
    key = F.concat(
        F.regexp_replace(F.coalesce("cad_number", F.lit("")), ":", "-"),
        F.lit("---"),
        F.regexp_replace(F.coalesce("extract_date", F.lit("")), r"\.", "-"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    rn = F.row_number().over(w)
    new_name = F.when(
        F.col("error").isNotNull(), F.lit(None).cast("string")
    ).otherwise(
        F.when(rn == 1, F.concat(key, F.lit(".xml"))).otherwise(
            F.concat(key, F.lit(" ("), rn.cast("string"), F.lit(")"), F.lit(".xml"))
        )
    )
    return parcels.select(
        F.col("doc_id").alias("path"), new_name.alias("new_name")
    )


def rights_table(parcels: DataFrame) -> DataFrame:
    """Parcel rows -> normalized per-right rows for the owner matrix
    (operators/attrs.py).  KVZU rights carry codes (resolved against the
    RIGHT classifier, real_estate.py:208), EGRN rights carry the label
    text already (real_estate.py:1094-1096).

    ``pos`` is the row's index in the parsed ``rights`` array, i.e. XML
    DOCUMENT ORDER — owner_summary's positional pairings and the
    last-right's-type gate depend on it; ``rec_first`` marks the first
    row of each right record (shares/types count per record);
    ``is_egrn`` routes the document to the reference's separate EGRN
    owner tree (real_estate.py:1076-1239)."""
    from rosreestr_xml_to_gis_converter_spark.classifiers import RIGHT, dim

    egrn = F.col("source_schema").isin("land_record", "build_record") \
        if "source_schema" in parcels.columns else F.lit(False)
    r = parcels.select(
        "doc_id", egrn.alias("is_egrn"), F.posexplode("rights").alias("pos", "r")
    ).select(
        "doc_id",
        "is_egrn",
        "pos",
        F.col("r.right_code").alias("right_code"),
        F.col("r.right_type").alias("right_type_raw"),
        F.col("r.owner").alias("owner"),
        F.col("r.share_num").alias("share_num"),
        F.col("r.share_den").cast("int").alias("share_den"),
        F.col("r.share_text").alias("share_text"),
        F.coalesce(F.col("r.rec_first"), F.lit(True)).alias("rec_first"),
    )
    d = dim(parcels.sparkSession, RIGHT)
    return (
        r.join(F.broadcast(d), r.right_code == d.code, "left")
        .select(
            "doc_id",
            F.coalesce("right_type_raw", "label").alias("right_type"),
            "owner",
            "share_num",
            "share_den",
            "share_text",
            "pos",
            "rec_first",
            "is_egrn",
        )
    )


_CLEANUP = r"^\s+|\n|\r|\s+$"  # main.py:356-367


def finalize_attributes(parcels: DataFrame) -> DataFrame:
    """Resolve classifier codes to the reference's output strings — the
    J1 broadcast joins plus the coalesce fallback chains:

    * status: EGRN text, else the STATUS classifier on the State code
      (real_estate.py:123-133, :1019-1026);
    * category: LAND_CATEGORY on the code, missing code -> the default
      code 003008000000's label (:875-886); OCC stub '-' passes through;
    * permitted_use: ByDoc text, else UTILIZATION code label, else '-'
      (:888-902);
    * address: Note, else region-classifier + district + locality
      fallback concatenation (:824-858).

    All pure Column expressions over one-time broadcast dims (the
    reference re-reads the CSVs per object, real_estate.py:32-37).
    """
    from rosreestr_xml_to_gis_converter_spark.classifiers import (
        LAND_CATEGORY,
        REGION,
        STATUS,
        UTILIZATION,
        dim,
    )

    spark = parcels.sparkSession
    p = parcels
    for col, mapping in (
        ("status", STATUS),
        ("category", LAND_CATEGORY),
        ("permitted_use", UTILIZATION),
        ("region", REGION),
    ):
        d = (
            dim(spark, mapping)
            .withColumnRenamed("code", f"_{col}_code")
            .withColumnRenamed("label", f"_{col}_label")
        )
        p = p.join(
            F.broadcast(d), p[f"{col}_code"] == d[f"_{col}_code"], "left"
        ).drop(f"_{col}_code")

    region_label = F.col("_region_label")
    district = F.concat_ws(" ", F.col("district_name"), F.col("district_type"))
    locality = F.concat_ws(" ", F.col("locality_type"), F.col("locality_name"))
    # OCC long-tail fallback (real_estate.py:1721-1753): region label (or
    # the reference's leading-'' quirk) + ', part' for each present part
    occ_tail = F.when(
        F.col("address_parts").isNotNull(),
        F.concat(
            F.coalesce(region_label, F.lit("")),
            F.aggregate(
                F.col("address_parts"),
                F.lit(""),
                lambda acc, p: F.concat(acc, F.lit(", "), p),
            ),
        ),
    )
    addr_fallback = F.coalesce(
        occ_tail,
        F.when(
            region_label.isNotNull()
            & F.col("district_name").isNotNull()
            & F.col("locality_name").isNotNull(),
            F.concat_ws(", ", region_label, district, locality),
        )
        .when(
            region_label.isNotNull() & F.col("district_name").isNotNull(),
            F.concat_ws(", ", region_label, district),
        )
        .when(region_label.isNotNull(), region_label)
        .otherwise(F.lit(""))
    )
    address = F.coalesce(
        F.when(F.col("address_note") != "", F.col("address_note")), addr_fallback
    )
    clean = lambda c: F.regexp_replace(c, _CLEANUP, "")  # noqa: E731
    return (
        p.withColumn("status", clean(F.coalesce("status", "_status_label", F.lit("-"))))
        .withColumn(
            "category",
            F.when(F.col("category_code") == "-", F.lit("-")).otherwise(
                F.coalesce(
                    "_category_label", F.lit(LAND_CATEGORY["003008000000"])
                )
            ),
        )
        .withColumn(
            "permitted_use",
            clean(
                F.coalesce(
                    "permitted_use_by_doc", "_permitted_use_label", F.lit("-")
                )
            ),
        )
        .withColumn("address", clean(address))
        .drop("_status_label", "_category_label", "_permitted_use_label", "_region_label")
    )


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
    """One row per contour — entry-parcel CN, 'parent(NumberRecord)', or
    cad_number/number_pp/parent keys (real_estate.py:939-951,
    :1612-1635); the reference writes one SHP record per contour
    (main.py:382-406)."""
    return parcels.select(
        "doc_id",
        F.col("cad_number").alias("parent_cad_number"),
        F.explode("contours").alias("c"),
    ).select(
        F.col("c.geom_key").alias("geom_key"),
        "doc_id",
        F.col("c.geom").alias("geom"),
        "parent_cad_number",
    )


def reference_output_rows(parcels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Parsed parcels -> (xlsx_rows, shp_rows): the reference's two
    denormalized outputs as DataFrames (main.py:379-454).

    * xlsx_rows: one row per object, or one per entry parcel for
      composite parcels with the parent CN in column B (main.py:416-454);
    * shp_rows: one row per contour, key split into (CadNumber,
      NumOfCont) by the '('/':'-branch logic (main.py:394-406), with the
      parent CN blanked when equal (main.py:400-404).

    All pure Column expressions; the sinks stream these with
    ``toLocalIterator`` — the export is final-mile, the engine sink
    stays parquet/Iceberg.
    """
    from rosreestr_xml_to_gis_converter_spark.operators.attrs import (
        owner_summary,
        with_rights_strings,
    )

    p = with_rights_strings(finalize_attributes(parcels))
    own = owner_summary(
        rights_table(p), p.select("doc_id", "category", "district_name")
    ).withColumnRenamed("owner", "owner_str")
    p = p.join(own, "doc_id", "left")
    estate = F.coalesce(F.array_join("estate_objects", ", "), F.lit(""))
    common = [
        F.col("area"),
        F.col("address"),
        F.col("status"),
        F.col("category"),
        F.col("permitted_use"),
        F.coalesce("owner_str", F.lit("")).alias("owner"),
        F.col("own_name_reg_numb_date"),
        F.col("encumbrances_str"),
        F.col("enc_name_reg_numb_date_duration"),
        F.coalesce(F.regexp_replace("special_notes", _CLEANUP, ""), F.lit("")).alias(
            "special"
        ),
        F.col("date_reg"),
        F.col("extract_date"),
        estate.alias("estate_objects_str"),
        F.coalesce("cadastral_cost", F.lit("")).alias("cadastral_cost"),
        F.col("obj_type"),
    ]
    entry = F.explode_outer("entry_parcels").alias("entry_cn")
    xlsx_rows = p.select(F.col("cad_number").alias("parent_cn"), entry, *common).select(
        F.coalesce(F.col("entry_cn"), F.col("parent_cn")).alias("cad_number"),
        F.when(F.col("entry_cn").isNotNull(), F.col("parent_cn"))
        .otherwise(F.lit("-"))
        .alias("parent_cad_number"),
        *[c if isinstance(c, str) else c for c in [
            "area", "address", "status", "category", "permitted_use", "owner",
            "own_name_reg_numb_date", "encumbrances_str",
            "enc_name_reg_numb_date_duration", "special", "date_reg",
            "extract_date", "estate_objects_str", "cadastral_cost", "obj_type",
        ]],
    )

    ct = p.select(
        F.col("cad_number").alias("parent_cn"), F.explode("contours").alias("c"), *common
    )
    key = F.col("c.geom_key")
    paren = F.instr(key, "(")
    # main.py:394-406 key-splitting branches
    shp_cad = (
        F.when(paren > 0, F.substring(key, F.lit(1), paren - 1))
        .when(~key.contains(":"), F.col("parent_cn"))
        .otherwise(key)
    )
    num_of_cont = (
        F.when(paren > 0, F.substr(key, paren))
        .when(~key.contains(":"), key)
        .otherwise(F.lit(""))
    )
    shp_rows = ct.select(
        shp_cad.alias("cad_number"),
        F.when(F.col("parent_cn") == shp_cad, F.lit(""))
        .otherwise(F.col("parent_cn"))
        .alias("parent_cad_number"),
        num_of_cont.alias("num_of_cont"),
        *[
            "area", "address", "status", "category", "permitted_use", "owner",
            "own_name_reg_numb_date", "encumbrances_str",
            "enc_name_reg_numb_date_duration", "special", "date_reg",
            "extract_date", "estate_objects_str", "cadastral_cost", "obj_type",
        ],
        F.col("c.geom").alias("geom"),
    )
    return xlsx_rows, shp_rows


def _ru_date(s: str | None):
    """dd.mm.yyyy -> datetime.date with the (1,1,1) default
    (main.py:384-393)."""
    import datetime

    if not s:
        return datetime.date(1, 1, 1)
    d, m, y = s.split(".")
    return datetime.date(int(y), int(m), int(d))


def export_outputs(parcels: DataFrame, out_dir: str, base_name: str = "real_estate_objects_EGRN") -> dict:
    """Final-mile export: SHP (K1) + XLSX (K2) from the parsed layer —
    the reference's two sinks (main.py:250-342), streamed driver-side."""
    import os

    from rosreestr_xml_to_gis_converter_spark.functions.geometry import unpack_rings
    from rosreestr_xml_to_gis_converter_spark.sinks import write_shapefile, write_xlsx

    os.makedirs(out_dir, exist_ok=True)
    xlsx_rows, shp_rows = reference_output_rows(parcels)

    def shp_records():
        for r in shp_rows.filter(F.col("geom").isNotNull()).toLocalIterator():
            rings = unpack_rings(r.geom)
            attrs = [
                r.cad_number, r.parent_cad_number, r.num_of_cont,
                float(r.area) if r.area else 0.0,
                r.address, r.status, r.category, r.permitted_use, r.owner,
                r.own_name_reg_numb_date, r.encumbrances_str,
                r.enc_name_reg_numb_date_duration, r.special,
                _ru_date(r.date_reg), _ru_date(r.extract_date),
                r.estate_objects_str, r.cadastral_cost, r.obj_type,
            ]
            yield rings, attrs

    n_shp = write_shapefile(os.path.join(out_dir, base_name), shp_records())

    def xlsx_data():
        for r in xlsx_rows.toLocalIterator():
            yield [
                r.cad_number, r.parent_cad_number, r.area, r.address, r.status,
                r.category, r.permitted_use, r.owner, r.own_name_reg_numb_date,
                r.encumbrances_str, r.enc_name_reg_numb_date_duration, r.special,
                r.date_reg, r.extract_date, r.estate_objects_str,
                r.cadastral_cost, r.obj_type,
            ]

    n_xlsx = write_xlsx(os.path.join(out_dir, base_name + ".xlsx"), xlsx_data())
    return {"n_shp_records": n_shp, "n_xlsx_rows": n_xlsx}


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
    # the attrs table carries the reference's FINAL strings (status/
    # category/permitted_use/address resolved via the shipped classifier
    # dims), not raw codes — a user of the reference reads this table
    # like the XLSX output
    finalize_attributes(parcels).drop("geom", "contours").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/parcels_attrs")
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
