#!/usr/bin/env python
"""spark-submit entry point for the flagship spatial-join pipeline.

    spark-submit --py-files dist/rosreestr_xml_to_gis_converter_spark.zip \
        jobs/run_spatial_join.py --images <parquet> --out <dir> \
        [--n-synth 100000] [--res 12] [--run-id run1]

On a cluster the session comes from spark-submit's conf (master, executor
sizing); this script only sets SQL-level knobs.  The parcel layer is
synthesized here for the demo; point --xml-dir at a directory of EGRN
extracts to build it from real documents.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet of input_hint-shaped images")
    ap.add_argument("--n-synth", type=int, default=100_000, help="synthesize N images instead")
    ap.add_argument("--xml-dir", help="directory of EGRN XML extracts for the parcel layer")
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=12)
    ap.add_argument("--run-id", default="run1")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("rosreestr_gis_spatial_join")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from rosreestr_xml_to_gis_converter_spark.pipeline import convert_extracts
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
        kvzu_xml,
        land_record_xml,
    )
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import read_extract_dir
    from rosreestr_xml_to_gis_converter_spark.synth import (
        TESTDATA_BOX,
        gen_parcels,
        scaling_images,
    )

    if args.xml_dir:
        files = read_extract_dir(spark, args.xml_dir)
    else:
        # deterministic synthetic extracts over the geotag box
        docs = []
        for i, (cad, rings) in enumerate(gen_parcels(17, 24)):
            xml = kvzu_xml(cad, rings) if i % 2 == 0 else land_record_xml(cad, rings)
            docs.append((f"synth-{i}.xml", bytearray(xml.encode())))
        files = spark.createDataFrame(docs, schema="path string, content binary")

    if args.images:
        images = spark.read.parquet(args.images)
    else:
        images = scaling_images(spark, args.n_synth)

    summary = convert_extracts(
        spark, files, images, TESTDATA_BOX, args.out, res=args.res, run_id=args.run_id
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
