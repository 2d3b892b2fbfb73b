"""Embedding similarity search (ANN) over an ``array<float>`` column.

Exactness discipline: embeddings are quantized to integer-valued doubles
(``round(x * 1000)``) before any reduction, so dot products and norms are
exact integers in IEEE doubles (< 2^53) — order-independent, engine-
independent, and oracle-comparable bitwise.  The final cosine is a single
division + sqrt with fixed operand order.

* ``cosine_topk``   — brute-force top-k: broadcast the query set, score
  with higher-order array functions (JVM, codegen), rank with a window.
  The correct baseline and the verifier for the bucketed path.
* ``lsh_topk``      — sign-LSH (random hyperplanes): deterministic planes
  from a seed, signature = packed sign bits, candidates restricted to
  signature-prefix buckets, exact re-rank inside the bucket.  Trades
  recall for a ~bucket-count fan-in reduction; recall is measured in
  tests against ``cosine_topk``.
* ``ivf_topk``      — IVF (inverted-file) ANN: a k-means coarse quantizer
  (pyspark.ml, JVM-distributed Lloyd iterations) partitions the corpus
  into cells; each query probes its ``nprobe`` nearest cells and exact
  re-ranks inside them.  Cell assignment and probe selection are pure
  Column arithmetic over the (small, quantized) centroid literal array —
  the index scan is an equi-join on ``cell``, the same
  shuffle-once-then-prune shape as the spatial join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1000.0


def _quantized(v: Column) -> Column:
    return F.transform(v, lambda x: F.round(x.cast("double") * F.lit(SCALE)))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
    )


def cosine_scores(
    emb: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All (query, candidate) cosine scores; queries broadcast.

    The candidate side is spread first (round-6, guide §2.5): a
    single-row-group embeddings parquet hands every vector to one scan
    task, serializing the |queries| x dim dot products per row; the
    size-gated repartition costs a tiny exchange and runs them on all
    cores."""
    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import spread_input

    emb = spread_input(emb)
    e = emb.select(
        F.col(id_col).alias("cand_id"), _quantized(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col)).alias("qqv")
    ).withColumn("qqn", _dot(F.col("qqv"), F.col("qqv")))
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("cand_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("qqv")) / F.sqrt(F.col("qn") * F.col("qqn"))
    return pairs.select("query_id", "cand_id", cos.alias("cosine"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        cosine_scores(emb, queries, id_col, vec_col)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def _planes(seed: int, n_planes: int, dim: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Packed sign bits of <vec, plane_i> — pure Column arithmetic."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 12,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: candidates share the full sign signature OR any of
    ``n_planes`` one-bit-flipped variants (multi-probe) in ANY of
    ``n_tables`` independent hash tables (classic E2LSH
    OR-amplification: per-table recall p becomes 1-(1-p)^L), then exact
    re-rank.  Scale path: the bucket join stays a single equi-join on
    (table, sig); the embedding side carries L rows per vector — the
    production layout is the signature table bucketed by (tbl, sig),
    written once, reused per query batch.  ``n_tables=1`` (default) is
    the near-exact-duplicate configuration the planted gate proves;
    raise it (8-16) for ordinary ~0.9-cosine neighbors, where a single
    12-plane table's bucket collision probability collapses (recall
    curve in BASELINE.md).

    Pass ``dim`` explicitly on large tables — the fallback probes one row
    driver-side to learn it."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    tables = [_planes(seed + 7919 * t, n_planes, dim) for t in range(n_tables)]
    e = emb.select(
        F.col(id_col).alias("cand_id"),
        _quantized(F.col(vec_col)).alias("qv"),
        F.posexplode(
            F.array(*[lsh_signature(F.col(vec_col), p) for p in tables])
        ).alias("tbl", "sig"),
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _quantized(F.col(vec_col)).alias("qqv"),
        *[
            lsh_signature(F.col(vec_col), p).alias(f"_qs{t}")
            for t, p in enumerate(tables)
        ],
    ).withColumn("qqn", _dot(F.col("qqv"), F.col("qqv")))
    # multi-probe: each table's own bucket plus all its 1-bit flips
    probe_structs = []
    for t in range(n_tables):
        qs = F.col(f"_qs{t}")
        for s in (qs, *[qs.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]):
            probe_structs.append(F.struct(F.lit(t).alias("tbl"), s.alias("sig")))
    qp = q.select(
        "query_id", "qqv", "qqn",
        F.explode(F.array(*probe_structs)).alias("_p"),
    ).select(
        "query_id", "qqv", "qqn",
        F.col("_p.tbl").alias("tbl"), F.col("_p.sig").alias("sig"),
    )
    pairs = e.join(F.broadcast(qp), ["tbl", "sig"]).filter(
        F.col("cand_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("qqv")) / F.sqrt(F.col("qn") * F.col("qqn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        pairs.select("query_id", "cand_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    seed: int = 7,
    max_iter: int = 5,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the IVF coarse quantizer: distributed k-means (pyspark.ml,
    k-means|| init) over the embedding column.  Returns the (n_cells, dim)
    centroid matrix — the small index artifact a production deployment
    would persist next to the table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"))
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, featuresCol="_v", predictionCol="_cell"
    ).fit(v)
    return np.asarray(model.clusterCenters())


def _centroid_structs(centroids: np.ndarray) -> Column:
    """Quantized centroid literal array [(cid, qc array)] — cell counts are
    small (sqrt-of-corpus scale), so inlining keeps assignment in codegen."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(round(x * SCALE))) for x in c]).alias("qc"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def _cell_scores(qv: Column, cent: Column) -> Column:
    """(dist, cid) structs per centroid; exact integer L2 on quantized
    vectors, lexicographic struct sort == (dist ASC, cid ASC)."""
    return F.transform(
        cent,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(qv, c["qc"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: corpus rows carry their nearest-centroid cell,
    queries probe their ``nprobe`` nearest cells, exact cosine re-rank
    inside the probed cells.

    Scale shape: assignment is per-row codegen (no shuffle of the corpus
    beyond the one equi-join on ``cell``); a production layout bucketing
    the table BY cell makes the probe a partition-pruned scan.  A query's
    own cell is always its rank-1 probe, so an exact duplicate of a query
    is found with certainty at any ``nprobe >= 1`` (the planted-twin gate
    invariant)."""
    cent = _centroid_structs(centroids)
    e = emb.select(
        F.col(id_col).alias("cand_id"), _quantized(F.col(vec_col)).alias("qv")
    ).withColumn(
        "cell", F.array_min(_cell_scores(F.col("qv"), cent))["cid"]
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col)).alias("qqv")
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(F.array_sort(_cell_scores(F.col("qqv"), cent)), 1, nprobe),
                lambda s: s["cid"],
            )
        ),
    ).withColumn("qqn", _dot(F.col("qqv"), F.col("qqv")))
    pairs = e.join(F.broadcast(q), "cell").filter(F.col("cand_id") != F.col("query_id"))
    cos = _dot(F.col("qv"), F.col("qqv")) / F.sqrt(F.col("qn") * F.col("qqn"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        pairs.select("query_id", "cand_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH buckets +
    exact verify (the embedding analog of MinHash dedup).

    ``bands=None`` buckets on the FULL signature — high precision, recall
    only for near-identical vectors.  ``bands=k`` splits the signature
    into k chunks and candidates collide on ANY chunk (OR-amplification,
    exactly the MinHash banding move): per-band collision probability is
    (1 - theta/pi)^(n_planes/k), so recall at a given cosine rises
    steeply with k while the exact verify keeps precision.  Exact twins
    collide in every band under either setting (the planted-gate
    invariant).  Still an equi-self-join — scales the same way.

    Pass ``dim`` explicitly on large tables — the fallback probes one row
    driver-side to learn it."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = _planes(seed, n_planes, dim)
    e = emb.select(
        F.col(id_col).alias("id"),
        _quantized(F.col(vec_col)).alias("qv"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    if bands is not None and (bands < 2 or bands > n_planes):
        # bands > n_planes would make every band width 0 (mask 0): every
        # row collides in every band and the equi-self-join degenerates
        # into an O(n^2) cross product (round-3 ADVICE)
        raise ValueError(f"bands must be in [2, n_planes={n_planes}], got {bands}")
    if bands is not None and bands > 1:
        # distribute sign bits across bands; the first n_planes % bands
        # bands get one extra bit so no bit is silently dropped
        width = n_planes // bands
        widths = [width + (1 if i < n_planes % bands else 0) for i in range(bands)]
        offsets = [sum(widths[:i]) for i in range(bands)]
        key = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sig", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("k"),
                    )
                    for i in range(bands)
                ]
            )
        )
        e = e.select("id", "qv", "qn", key.alias("bk")).select(
            "id", "qv", "qn", F.col("bk.band").alias("band"), F.col("bk.k").alias("k")
        )
        join_cond_cols = ["band", "k"]
    else:
        e = e.withColumnRenamed("sig", "k")
        join_cond_cols = ["k"]
    a = e.alias("a")
    b = e.alias("b")
    cond = (F.col("a.id") < F.col("b.id"))
    for c in join_cond_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cos = _dot(F.col("a.qv"), F.col("b.qv")) / F.sqrt(F.col("a.qn") * F.col("b.qn"))
    out = (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cosine"))
    )
    if bands is not None and bands > 1:
        out = out.dropDuplicates(["id_a", "id_b"])
    return out.filter(F.col("cosine") >= threshold)
