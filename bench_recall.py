#!/usr/bin/env python
"""ANN recall curves (round-4 VERDICT next-round #6): recall@k of
``lsh_topk`` / ``ivf_topk`` against the exact ``cosine_topk`` brute
force, across corpus sizes and the operators' knobs — the recall/cost
trade-offs as committed numbers instead of a single >=0.9 test assert.

Corpora are SEEDED synthetic clustered vectors (the driver testdata
embeddings tables stop at 2k rows): ``n_clusters`` Gaussian centers on
the unit sphere, per-vector noise, dim 64 — the shape ANN indexes are
built for (uniform random vectors have no neighbors to find).  Every
number is deterministic given the seed.  Prints one JSON line; use
``--out`` to also write it under bench_results/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def make_corpus(spark, n: int, dim: int = 64, n_clusters: int = 64, seed: int = 17):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + rng.normal(scale=0.25, size=(n, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    return spark.createDataFrame(pdf).repartition(8).cache()


def recall_at_k(ann_df, truth_df, n_queries: int, k: int) -> float:
    hit = ann_df.join(truth_df, ["query_id", "cand_id"]).count()
    return hit / (n_queries * k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,10000,40000")
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rosreestr_xml_to_gis_converter_spark.operators import similarity
    from rosreestr_xml_to_gis_converter_spark.session import get_spark

    spark = get_spark("recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    k, nq = args.k, args.queries
    rows = []
    for n in (int(x) for x in args.sizes.split(",")):
        emb = make_corpus(spark, n)
        emb.count()
        q = emb.filter("vec_id < %d" % nq)
        truth = (
            similarity.cosine_topk(emb, q, k=k)
            .select("query_id", "cand_id")
            .cache()
        )
        truth.count()
        for n_planes in (8, 12, 16):
            t0 = time.time()
            ann = similarity.lsh_topk(emb, q, k=k, n_planes=n_planes, dim=64)
            r = recall_at_k(ann.select("query_id", "cand_id"), truth, nq, k)
            rows.append(
                {
                    "algo": "lsh", "n": n, "n_planes": n_planes,
                    "recall_at_k": round(r, 4), "secs": round(time.time() - t0, 2),
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
        # OR-amplified multi-table curve (round-5: the ordinary-neighbor
        # configuration; n_tables=1 above is the near-exact-dup gate path)
        for n_planes, n_tables in ((8, 8), (8, 16), (6, 8), (6, 16)):
            t0 = time.time()
            ann = similarity.lsh_topk(
                emb, q, k=k, n_planes=n_planes, dim=64, n_tables=n_tables
            )
            r = recall_at_k(ann.select("query_id", "cand_id"), truth, nq, k)
            rows.append(
                {
                    "algo": "lsh", "n": n, "n_planes": n_planes,
                    "n_tables": n_tables,
                    "recall_at_k": round(r, 4), "secs": round(time.time() - t0, 2),
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
        for n_cells in (16, 64):
            cents = similarity.ivf_centroids(emb, n_cells=n_cells, seed=7, max_iter=5)
            for nprobe in (1, 2, 4, 8):
                t0 = time.time()
                ann = similarity.ivf_topk(emb, q, k=k, centroids=cents, nprobe=nprobe)
                r = recall_at_k(ann.select("query_id", "cand_id"), truth, nq, k)
                rows.append(
                    {
                        "algo": "ivf", "n": n, "n_cells": n_cells, "nprobe": nprobe,
                        "recall_at_k": round(r, 4),
                        "secs": round(time.time() - t0, 2),
                    }
                )
                print(json.dumps(rows[-1]), file=sys.stderr)
        truth.unpersist()
        emb.unpersist()
    result = {
        "metric": "ann_recall_curves", "k": k, "n_queries": nq,
        "unit": "recall", "rows": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
