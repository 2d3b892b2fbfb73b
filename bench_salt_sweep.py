#!/usr/bin/env python
"""Salt-factor sweep on the hot-boundary-cell skew fixture (round-4
VERDICT next-round #1, second half): the skew pair in bench.py runs only
``salt=cpus``; this sweeps salt over {unsalted, cpus/2, cpus, 2*cpus}
on the SAME fixture (half the image table in one res-12 boundary cell,
non-broadcast join, AQE on) and publishes the curve, so the chosen
default is a documented trade-off instead of a single point.

Prints one JSON line; use --out to also write under bench_results/.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import _skewed_images  # noqa: E402
from rosreestr_xml_to_gis_converter_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "salt-sweep",
        cores=cpus,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "262144",
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(128 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import (
        build_parcel_cover,
        spatial_join,
    )
    from rosreestr_xml_to_gis_converter_spark.queries_engine import JOIN_RES
    from rosreestr_xml_to_gis_converter_spark.synth import (
        TESTDATA_BOX,
        images_from_lineitem,
        testdata_parcels_rings,
    )

    skew_img = _skewed_images(images_from_lineitem(spark, sf_dir))
    skew_cover = build_parcel_cover(spark, testdata_parcels_rings(), JOIN_RES)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    salts = [0, cpus // 2, cpus, 2 * cpus]
    rows = []
    expected = None
    for salt in salts:
        def job():
            return spatial_join(
                skew_img, skew_cover, TESTDATA_BOX,
                broadcast_cover=False, salt=salt or None,
            ).count()

        job()  # warmup per configuration (codegen + page cache)
        times, n = [], 0
        for _ in range(args.reps):
            t0 = time.time()
            n = job()
            times.append(time.time() - t0)
        expected = expected if expected is not None else n
        assert n == expected, (salt, n, expected)
        rows.append(
            {
                "salt": salt,
                "secs_best": round(min(times), 3),
                "secs_median": round(statistics.median(times), 3),
                "secs_all": [round(t, 3) for t in times],
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]
    result = {
        "metric": "skew_salt_sweep",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "reps": args.reps,
        "matched_pairs": expected,
        "rows": rows,
        "speedup_best": {
            str(r["salt"]): round(base["secs_best"] / r["secs_best"], 2)
            for r in rows[1:]
        },
        "speedup_median": {
            str(r["salt"]): round(base["secs_median"] / r["secs_median"], 2)
            for r in rows[1:]
        },
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
