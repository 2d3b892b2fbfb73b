#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query isolation.

NOT the driver bench — ``bench.py`` stays frozen.  This file times each
bench query separately with the same session conf and count() methodology
as bench.py, optionally captures ``.explain("formatted")`` to
``plans/r06/``, and can run a single query by name so a change can be
A/B'd without paying the full sweep.

Usage:
    python bench_extra.py [--sf SFDIR] [--reps N] [--only q1,q2] \
        [--plans before|after] [--noop]

``--noop`` times ``df.write.format("noop")`` instead of ``.count()``
(guide §1.4: count() lets the optimizer prune; noop computes every
column).  Both numbers are printed when it is set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rosreestr_xml_to_gis_converter_spark.session import get_spark  # noqa: E402


def build_queries(spark, sf_dir, cpus):
    from pyspark.sql import functions as F  # noqa: F401

    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        minhash_lsh_pairs,
    )
    from rosreestr_xml_to_gis_converter_spark.operators.imaging_ops import (
        image_features,
        validate_images,
    )
    from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
        build_parcel_cover,
        spatial_join,
    )
    from rosreestr_xml_to_gis_converter_spark.operators.tiling import tile_masks
    from rosreestr_xml_to_gis_converter_spark.queries_engine import (
        JOIN_RES,
        dedup_minhash_planted,
        flagship_spatial_join,
        knn_parcels,
        sim_ann_cosine,
    )
    from rosreestr_xml_to_gis_converter_spark.queries_ingest import ingest_kvzu_attrs
    from rosreestr_xml_to_gis_converter_spark.queries_ref import (
        a1_owner_agg,
        g4_lww_upsert,
        j2_denorm_join,
    )
    from rosreestr_xml_to_gis_converter_spark.synth import (
        TESTDATA_BOX,
        gen_images_df,
        images_from_lineitem,
        testdata_parcels_rings,
    )

    import bench as bench_mod

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    imgs = gen_images_df(spark, 42, 400).repartition(cpus).cache()
    imgs.count()

    skew_img = bench_mod._skewed_images(images_from_lineitem(spark, sf_dir))
    skew_cover = build_parcel_cover(spark, testdata_parcels_rings(), JOIN_RES)

    return {
        "flagship_spatial_join": lambda: flagship_spatial_join(spark, sf_dir),
        "knn_parcels": lambda: knn_parcels(spark, sf_dir),
        "tile_masks_res12": lambda: tile_masks(
            build_parcel_cover(spark, testdata_parcels_rings(), JOIN_RES), px=32
        ),
        "j2_denorm_join": lambda: j2_denorm_join(spark, sf_dir),
        "a1_owner_agg": lambda: a1_owner_agg(spark, sf_dir),
        "g4_lww_upsert": lambda: g4_lww_upsert(spark, sf_dir),
        "dedup_minhash_planted": lambda: dedup_minhash_planted(spark, sf_dir),
        "sim_ann_cosine": lambda: sim_ann_cosine(spark, sf_dir),
        "ingest_kvzu_attrs": lambda: ingest_kvzu_attrs(spark, sf_dir),
        "dedup_minhash_corpus": lambda: minhash_lsh_pairs(
            docs, threshold=0.5, n_hashes=16, bands=8
        ),
        "image_validate_400": lambda: validate_images(imgs),
        "image_features_400": lambda: image_features(imgs),
        # the harness holds autoBroadcastJoinThreshold=-1 across the whole
        # rep loop for skew_* names (matching bench.py's wrapping of the
        # timed count, not just the DataFrame build)
        "skew_join_unsalted": lambda: spatial_join(
            skew_img, skew_cover, TESTDATA_BOX, broadcast_cover=False
        ),
        "skew_join_salted": lambda: spatial_join(
            skew_img, skew_cover, TESTDATA_BOX, broadcast_cover=False, salt=cpus
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None)
    ap.add_argument("--plans", default=None, help="suffix for plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-quiet-gate", action="store_true")
    args = ap.parse_args()

    sf_dir = args.sf
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not args.no_quiet_gate:
        import bench as bench_mod

        bench_mod._wait_for_quiet()

    spark = get_spark(
        "bench_extra",
        cores=cpus,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "262144",
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )
    queries = build_queries(spark, sf_dir, cpus)
    if args.only:
        keep = args.only.split(",")
        queries = {k: v for k, v in queries.items() if k in keep}

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    out: dict[str, dict] = {}
    for name, fn in queries.items():
        if name.startswith("skew_join"):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        else:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as fh:
                fh.write(txt)
        counts, noops, n_rows = [], [], None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [count]")
            t0 = time.time()
            n_rows = fn().count()
            counts.append(round(time.time() - t0, 3))
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name} [noop]")
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                noops.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {"count": sorted(counts), "rows": n_rows}
        if noops:
            rec["noop"] = sorted(noops)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print(json.dumps({"sf": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
