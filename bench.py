#!/usr/bin/env python
"""Headline benchmark: one JSON line for the driver.

Usage: python bench.py            (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Runs the flagship spatial join plus the other headline operators at the
given scale factor, reports per-query seconds and the north-rule metric
(spatial-join throughput, matched pairs/sec).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rosreestr_xml_to_gis_converter_spark.session import get_spark  # noqa: E402


def _skewed_images(img):
    """Pack ~half of the image table into ONE res-12 boundary cell of the
    big test parcel (its west edge at lon=31): the join key (cell) gets a
    pathological hot value whose per-row cost is the Python PIP refine —
    time skew without byte skew."""
    from pyspark.sql import functions as F

    from rosreestr_xml_to_gis_converter_spark.index.grid import (
        WORLD_DLAT,
        WORLD_DLON,
        WORLD_LAT0,
        WORLD_LON0,
        cell_ij,
        latlng_to_cell,
    )
    from rosreestr_xml_to_gis_converter_spark.queries_engine import JOIN_RES
    from rosreestr_xml_to_gis_converter_spark.synth import TESTDATA_BOX

    n = 1 << JOIN_RES
    cell = latlng_to_cell(52.0, 31.0, JOIN_RES)  # cell crossing the parcel edge
    ix, iy = (int(v) for v in cell_ij(cell))
    lon_cell0 = WORLD_LON0 + ix * WORLD_DLON / n
    lat_cell0 = WORLD_LAT0 + iy * WORLD_DLAT / n
    box = TESTDATA_BOX

    def frac32(v, v0, dv):
        return int((v - v0) / dv * 4294967296.0)

    lon_lo = frac32(lon_cell0, box.lon0, box.dlon) + 2
    lon_span = frac32(lon_cell0 + WORLD_DLON / n, box.lon0, box.dlon) - lon_lo - 2
    lat_lo = frac32(lat_cell0, box.lat0, box.dlat) + 2
    lat_span = frac32(lat_cell0 + WORLD_DLAT / n, box.lat0, box.dlat) - lat_lo - 2
    hot = (
        (F.lit(lat_lo) + F.pmod(F.xxhash64("image_id", F.lit("lat")), F.lit(lat_span)))
        * F.lit(4294967296)
        + F.lit(lon_lo)
        + F.pmod(F.xxhash64("image_id", F.lit("lon")), F.lit(lon_span))
    )
    pick = F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0
    return img.withColumn("phash", F.when(pick, hot).otherwise(F.col("phash")))


def _wait_for_quiet(max_wait_s: int = 90) -> None:
    """Best-effort quiet gate: co-tenant steal on this VM comes in
    multi-minute bursts that inflate every query 1.5-2x (measured: the
    same tree benched 14.8-16.5 s under a burst vs 8.8 s quiet, with an
    isolated warm probe confirming the engine unchanged).  Poll
    /proc/stat for a 10 s window with <3%% non-idle before starting;
    give up after ``max_wait_s`` and run anyway so the driver never
    stalls.  Linux-only; silently skipped elsewhere."""
    deadline = time.time() + max_wait_s
    try:
        def snap():
            parts = open("/proc/stat").readline().split()[1:]
            vals = list(map(int, parts))
            return sum(vals), vals[3]  # total, idle

        while time.time() < deadline:
            t1, i1 = snap()
            time.sleep(10)
            t2, i2 = snap()
            busy = (t2 - t1) - (i2 - i1)
            if t2 > t1 and busy / (t2 - t1) < 0.03:
                return
    except OSError:
        return


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    _wait_for_quiet()

    spark = get_spark(
        "bench",
        cores=cpus,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "262144",
            # small-SF parquet would otherwise yield 1-3 scan splits and
            # starve the cores (a 100 TB table never has this problem)
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )

    from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
        build_parcel_cover,
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
    from rosreestr_xml_to_gis_converter_spark.synth import testdata_parcels_rings

    results: dict[str, float] = {}
    medians: dict[str, float] = {}
    counts: dict[str, int] = {}

    # best-of guards against host-contention spikes on shared VMs; 3 reps
    # because observed per-rep variance on this host reaches 1.4x even on
    # an idle machine (round-3 measurements), and rep 1 additionally pays
    # one-time costs (PreparedCover build, codegen) that best-of excludes.
    # Both best AND median are recorded (round-3 VERDICT bench-comparability
    # ask): `queries` stays best-of (comparable to BENCH_r03), and
    # `queries_median`/`reps` let future rounds quote medians.
    REPS = 3

    def run(name: str, fn) -> None:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            counts[name] = fn().count()
            times.append(time.time() - t0)
        times.sort()
        results[name] = round(times[0], 3)
        medians[name] = round(times[len(times) // 2], 3)

    # warm the JVM and the Python daemon's worker pool once so per-query
    # timings measure steady-state throughput, not one-time process spawn
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    run("flagship_spatial_join", lambda: flagship_spatial_join(spark, sf_dir))
    run("knn_parcels", lambda: knn_parcels(spark, sf_dir))
    run(
        "tile_masks_res12",
        lambda: tile_masks(
            build_parcel_cover(spark, testdata_parcels_rings(), JOIN_RES), px=32
        ),
    )
    run("j2_denorm_join", lambda: j2_denorm_join(spark, sf_dir))
    run("a1_owner_agg", lambda: a1_owner_agg(spark, sf_dir))
    run("g4_lww_upsert", lambda: g4_lww_upsert(spark, sf_dir))
    # planted-twin variant: nonzero row count by construction (recall
    # gate); the organic small-corpus run (0 rows at sf0.1 — the driver
    # corpus has no near-dups below the threshold) was dropped from the
    # bench in favor of dedup_minhash_corpus below, which IS organic LSH
    # at scale with a nonzero yield
    run("dedup_minhash_planted", lambda: dedup_minhash_planted(spark, sf_dir))
    run("sim_ann_cosine", lambda: sim_ann_cosine(spark, sf_dir))
    # XML ingest path: synth -> namespace-correct parse -> full projection
    run("ingest_kvzu_attrs", lambda: ingest_kvzu_attrs(spark, sf_dir))

    # corpus-scale LSH dedup over the whole documents table
    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    run(
        "dedup_minhash_corpus",
        lambda: minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=8),
    )

    # Arrow image-decode pipeline (generation/cache excluded from timing)
    from pyspark.sql import functions as F

    from rosreestr_xml_to_gis_converter_spark.operators.imaging_ops import (
        image_features,
        validate_images,
    )
    from rosreestr_xml_to_gis_converter_spark.synth import gen_images_df

    imgs = gen_images_df(spark, 42, 400).repartition(cpus).cache()
    imgs.count()
    run("image_validate_400", lambda: validate_images(imgs))
    # decode throughput: image_features decodes each payload exactly once
    # (validate decodes 2x + re-encodes), so input-bytes / features-time
    # is the honest decoded-MB/s of the pure-Python codec (VERDICT r2
    # ask #4 — the production substitution point is documented in
    # BASELINE.md: swap functions/jpeg.py for libjpeg-turbo behind the
    # same Arrow-batch interface)
    run("image_features_400", lambda: image_features(imgs))
    input_mb = (
        imgs.agg(F.sum(F.length("bytes")).alias("b")).first()["b"] / 1e6
    )
    image_decode_mb_s = round(input_mb / results["image_features_400"], 2)

    # codec-level comparison pair (round-4 VERDICT next-round #4): both
    # backends timed in the SAME shape — one single-threaded decode-only
    # loop over identical payloads — so the pure/system ratio is the
    # codec substitution factor itself.  (image_decode_mb_s above is a
    # different quantity: the parallel Spark decode+features PIPELINE,
    # tracked across rounds — do not compare the system line to it.)
    image_codec_mb_s_pure = image_decode_mb_s_system = None
    from rosreestr_xml_to_gis_converter_spark.functions.codec_backend import (
        BACKENDS,
        HAVE_SYSTEM_CODEC,
    )
    from rosreestr_xml_to_gis_converter_spark.functions.imaging import (
        _decode_image_pure,
    )

    payloads = [
        (bytes(r["bytes"]), r["fmt"])
        for r in imgs.select("bytes", "fmt").collect()
    ]
    t0 = time.time()
    for data, fmt in payloads:
        _decode_image_pure(data, fmt)
    image_codec_mb_s_pure = round(input_mb / (time.time() - t0), 2)
    if HAVE_SYSTEM_CODEC:
        sys_decode = BACKENDS["system"][0]
        t0 = time.time()
        for data, fmt in payloads:
            sys_decode(data, fmt)
        image_decode_mb_s_system = round(input_mb / (time.time() - t0), 2)

    # --- skew stress: hot boundary cell, salted vs unsalted ---------------
    # Half the image table is packed into ONE res-12 BOUNDARY cell of the
    # big parcel (PIP refine needed -> per-row cost is Python compute, so
    # the skew is in task TIME, not bytes — the case AQE's byte-based
    # skew split does not catch).  The cover is joined WITHOUT broadcast
    # (emulating a parcel layer too large to broadcast, exactly when the
    # shuffled path and salting matter).  `salt` replicates the cover
    # side so the hot cell spreads over `cpus` reducers.
    from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
        spatial_join,
    )
    from rosreestr_xml_to_gis_converter_spark.synth import (
        TESTDATA_BOX,
        images_from_lineitem,
    )

    skew_img = _skewed_images(images_from_lineitem(spark, sf_dir))
    skew_cover = build_parcel_cover(spark, testdata_parcels_rings(), JOIN_RES)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        run(
            "skew_join_unsalted",
            lambda: spatial_join(
                skew_img, skew_cover, TESTDATA_BOX, broadcast_cover=False
            ),
        )
        run(
            "skew_join_salted",
            lambda: spatial_join(
                skew_img, skew_cover, TESTDATA_BOX, broadcast_cover=False, salt=cpus
            ),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    assert counts["skew_join_salted"] == counts["skew_join_unsalted"]

    # the skew pair is a stress FIXTURE (deliberately pathological input),
    # not a headline query — keep `value` comparable with BENCH_r01-r03
    # by summing only the headline set
    total = round(
        sum(v for k, v in results.items() if not k.startswith("skew_join")), 3
    )
    join_pairs = counts["flagship_spatial_join"]
    throughput = round(join_pairs / results["flagship_spatial_join"], 1)

    print(
        json.dumps(
            {
                "metric": "headline_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": results,
                "queries_median": medians,
                "reps": REPS,
                # hot-boundary-cell stress (half the table in one res-12
                # cell, non-broadcast join): explicit salting vs the
                # unsalted shuffled join, AQE on in both
                "skew_salting_speedup": round(
                    results["skew_join_unsalted"] / results["skew_join_salted"], 2
                ),
                "skew_salting_speedup_median": round(
                    medians["skew_join_unsalted"] / medians["skew_join_salted"], 2
                ),
                "sf": sf,
                "cpus": cpus,
                "spatial_join_matched_pairs": join_pairs,
                "spatial_join_pairs_per_sec": throughput,
                "image_decode_mb_s": image_decode_mb_s,
                "image_codec_mb_s_pure": image_codec_mb_s_pure,
                **(
                    {"image_codec_mb_s_system": image_decode_mb_s_system}
                    if image_decode_mb_s_system is not None
                    else {}
                ),
                "row_counts": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
