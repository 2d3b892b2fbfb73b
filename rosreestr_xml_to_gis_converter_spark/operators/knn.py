"""kNN-to-nearest-parcel (the no-match fallback of the spatial join).

Images whose point lies in no parcel polygon are assigned their k nearest
parcels (by centroid distance, planar).  Two strategies:

* ``knn_bruteforce`` — broadcast cross-join + ranking window.  The right
  plan when the parcel-centroid side is broadcastable (it usually is:
  even 10^7 centroids is ~200 MB); cost is O(|images| * |parcels|) inside
  codegen, no shuffle of the big side beyond the final window.
* ``knn_grid`` — the scale path (SURVEY.md §2.2): encode both sides at a
  coarse resolution, explode the small side over a bounded ``grid_disk``
  (a literal (dx,dy) offset array — JVM-side, no UDF), equi-join on cell,
  then rank.  Exact whenever the disk radius covers the true kNN radius;
  ``knn_grid`` therefore takes the radius explicitly and the caller
  (or a test) asserts parity against brute force on representative
  layers.  This is the grid-based distributed kNN-join pattern
  (cf. PAPERS.md, stream kNN-join literature).

Ranking is deterministic: ties broken by ``cad_number``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.index.grid import (
    _IDX_MASK,
    _IX_SHIFT,
    _RES_SHIFT,
    cell_col,
)
from rosreestr_xml_to_gis_converter_spark.operators.spatial_join import with_geotag
from rosreestr_xml_to_gis_converter_spark.synth import GeoBox

KNN_OUT_COLS = ["image_id", "cad_number", "rank", "dist"]


def _dist(lon: Column, lat: Column, clon: Column, clat: Column) -> Column:
    dx = lon - clon
    dy = lat - clat
    return F.sqrt(dx * dx + dy * dy)


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    """Per-image top-k by (dist, cad_number).

    Hash aggregation (collect_list -> array_sort -> slice) instead of a
    row_number window: candidates per image are bounded (by the disk or
    the centroid count), so the aggregate gets map-side partial combine
    and avoids the window's full sort of every candidate row — the
    dominant cost at 10^12-image scale.
    """
    item = F.struct(F.col("dist").alias("dist"), F.col("cad_number").alias("cad_number"))
    agg = cand.groupBy("image_id").agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("top")
    )
    return agg.select(
        "image_id", F.posexplode("top").alias("pos", "t")
    ).select(
        "image_id",
        F.col("t.cad_number").alias("cad_number"),
        (F.col("pos") + 1).alias("rank"),
        F.col("t.dist").alias("dist"),
    )


def knn_bruteforce(
    images: DataFrame, centroids: DataFrame, box: GeoBox, k: int
) -> DataFrame:
    """Exact kNN via broadcast nested-loop (small centroid side).

    ``centroids``: (cad_number, clon, clat).
    """
    pts = with_geotag(images, box).select("image_id", "lon", "lat")
    cand = pts.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", _dist(F.col("lon"), F.col("lat"), F.col("clon"), F.col("clat"))
    )
    return _rank_topk(cand, k)


def knn_literal(
    images: DataFrame,
    centroids: list[tuple[str, float, float]],
    box: GeoBox,
    k: int,
) -> DataFrame:
    """Zero-shuffle kNN for a small centroid set (the common
    parcel-layer-as-dimension case).

    The centroids become a literal array of structs; per image row a
    higher-order ``transform`` computes every distance, ``array_sort``
    orders (dist, cad) lexicographically — identical tie-breaking to the
    window/agg paths — and ``slice`` keeps k.  Everything stays inside
    WholeStageCodegen: no shuffle, no aggregation state, perfectly linear
    in |images|.  Use ``knn_grid`` when the centroid side is too large to
    inline/broadcast.
    """
    pts = with_geotag(images, box).select("image_id", "lon", "lat")
    cen_arr = F.array(
        *[
            F.struct(
                F.lit(clon).alias("clon"), F.lit(clat).alias("clat"), F.lit(cad).alias("cad")
            )
            for cad, clon, clat in centroids
        ]
    )
    scored = F.transform(
        cen_arr,
        lambda c: F.struct(
            _dist(F.col("lon"), F.col("lat"), c["clon"], c["clat"]).alias("dist"),
            c["cad"].alias("cad_number"),
        ),
    )
    top = F.slice(F.array_sort(scored), 1, k)
    return pts.select("image_id", F.posexplode(top).alias("pos", "t")).select(
        "image_id",
        F.col("t.cad_number").alias("cad_number"),
        (F.col("pos") + 1).alias("rank"),
        F.col("t.dist").alias("dist"),
    )


# Worst-case euclidean ground distance (in LAT-cell units) covered by one
# Chebyshev cell ring: the grid splits 360 deg of lon and 180 deg of lat
# into the same 2^res cells, so a lon cell is 2 lat-cells wide and a point
# within Chebyshev distance d of a cell is at most (d+1)*sqrt(wx^2+wy^2)
# = (d+1)*wy*sqrt(5) degrees away (wx = 2*wy).
_CELL_ASPECT_DIAG = math.sqrt(5.0)


def _exact_disk(d: int) -> int:
    """Smallest Chebyshev cell radius guaranteed to hold every TRUE kNN
    candidate once >= k centroids are known within Chebyshev radius ``d``
    of the image's cell: the kth distance is then at most
    (d+1)*wy*sqrt(5), and any centroid that close sits within
    ceil((d+1)*sqrt(5)) + 1 cells on the narrow (lat) axis — the wide
    (lon) axis needs fewer, the square disk is a superset."""
    return int(math.ceil((d + 1) * _CELL_ASPECT_DIAG)) + 1


def knn_grid(
    images: DataFrame,
    centroids: DataFrame,
    box: GeoBox,
    k: int,
    res: int,
    disk: int,
    escalate: tuple[int, ...] | None = None,
    layer_fallback: bool | None = None,
    layer_fallback_max_rows: int = 1_000_000,
) -> DataFrame:
    """Grid-bounded kNN: candidates limited to centroids whose cell is
    within Chebyshev distance ``disk`` of the image's cell at ``res``.

    Exact iff every image's true k nearest centroids fall inside that
    disk; pick ``res``/``disk`` so the disk's ground extent exceeds the
    worst-case kNN radius of the layer (asserted in tests).  Candidate
    expansion replicates the SMALL side (2*disk+1)^2 times — the 10^12-row
    image side is never exploded.

    Precondition: ``image_id`` must be unique in ``images`` (true of a
    real image table).  Top-k is computed per input ROW — duplicate ids
    would each emit their own k rows; callers joining from tables with
    repeated keys (e.g. the driver testdata's duplicate (orderkey,
    linenumber) pairs) must ``dropDuplicates(["image_id"])`` first, as
    the gate queries do.  Deduping here would force a shuffle of the big
    side on every call, which the zero-shuffle design exists to avoid.

    Completeness (SURVEY §2.2 "unmatched images -> k nearest", round-4
    VERDICT next-round #3): an image whose disk holds fewer than ``k``
    candidates (sparse region) is NOT dropped — it escalates through
    BOUNDED ITERATIVE RING EXPANSION: for each multiplier m in
    ``escalate`` a further broadcast map carries, for ONLY the cells
    still short at the previous level, the candidates within the exact
    disk ``_exact_disk(disk*m)`` plus the count within ``disk*m``; the
    first level whose count reaches k supplies the candidate list, and
    because that list spans the conservative exact disk the result is
    TRUE kNN for escalated rows (no caller-tuned radius needed).  All
    levels are broadcast left-joins on the same cell key: the image side
    is scanned ONCE and never shuffles (pinned by a plan test); the
    escalation maps cover only under-covered cells, so their size scales
    with the layer's sparse boundary, not with the layer.

    Images short even at the largest escalation fall to a whole-layer
    broadcast ranking — SIZE-GATED (round-4 ADVICE): built when
    ``layer_fallback`` is True, or when it is None (auto) and the layer
    has at most ``layer_fallback_max_rows`` rows (one count() on the
    dimension side; callers who KNOW the layer is dimension-sized
    should pass ``layer_fallback=True`` — the auto count() costs a full
    job launch per call, ~0.4 s of overhead even on a literal layer).  With the gate open the output is exactly
    min(k, |centroids|) rows per image; with it closed (huge layers)
    a still-short image ranks the nearest available escalated candidates
    and may emit fewer than k rows — at 10^7-centroid density the
    escalation ladder makes that combination practically unreachable.

    ``escalate=None`` (default) is AUTO: when the layer gate is open the
    ladder is skipped entirely — for a dimension-sized layer the
    whole-layer terminal already yields the identical TRUE-kNN result
    for every frontier row, so the ladder would only add centroid-side
    stages (measured: +50% on the sf0.1 gate query for zero output
    change); when the gate is closed the ladder defaults to (2, 4).
    Pass an explicit tuple to force it (e.g. to bound per-frontier-row
    ranking cost on a near-cap layer), or ``()`` to disable it.
    """
    pts = with_geotag(images, box).select("image_id", "lon", "lat")
    pts = pts.withColumn("cell", cell_col(F.col("lat"), F.col("lon"), res))
    return _knn_grid_join(
        pts, centroids, k, res, disk, escalate, layer_fallback,
        layer_fallback_max_rows,
    )


def _exploded_cells(centroids: DataFrame, res: int, outer: int) -> DataFrame:
    """grid_disk as relational algebra: each centroid exploded over the
    (2*outer+1)^2 neighbor offsets -> one row per (covered cell,
    centroid), with ``_dx``/``_dy`` kept for inner-ring tests.  Decompose
    the centroid cell, shift, bounds-clamp, re-pack — all Column
    arithmetic, offsets from ``sequence()`` (no literal-array blowup at
    large disks).  The ONE place the cell bit-packing formula lives on
    the centroid side: both the candidates maps and the counts-only
    frontier filter aggregate this lineage, so their join keys can never
    drift apart."""
    n_minus_1 = (1 << res) - 1
    return (
        centroids.withColumn("_c", cell_col(F.col("clat"), F.col("clon"), res))
        .withColumn("_ix", F.shiftright(F.col("_c"), _IX_SHIFT).bitwiseAND(F.lit(_IDX_MASK)))
        .withColumn("_iy", F.col("_c").bitwiseAND(F.lit(_IDX_MASK)))
        .withColumn("_dx", F.explode(F.sequence(F.lit(-outer), F.lit(outer))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-outer), F.lit(outer))))
        .withColumn("_nx", F.col("_ix") + F.col("_dx"))
        .withColumn("_ny", F.col("_iy") + F.col("_dy"))
        .filter(
            (F.col("_nx") >= 0)
            & (F.col("_nx") <= n_minus_1)
            & (F.col("_ny") >= 0)
            & (F.col("_ny") <= n_minus_1)
        )
        .withColumn(
            "cell",
            F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT).cast("long")
            + F.col("_nx") * F.lit(1 << _IX_SHIFT).cast("long")
            + F.col("_ny"),
        )
    )


def _cen_cells(
    centroids: DataFrame,
    res: int,
    outer: int,
    inner: int,
    cand_cols: tuple[str, ...] = ("clon", "clat", "cad_number"),
) -> DataFrame:
    """Centroids exploded over the (2*outer+1)^2 neighbor offsets ->
    one row per covered cell: ``_cands`` (all candidates within Chebyshev
    ``outer``) + ``_cnt`` (how many lie within ``inner``).

    ``cand_cols`` picks the fields packed per candidate — the whole-layer
    gate path substitutes an integer ``_ord`` for the cad string so the
    per-row top-k sorts a numeric-only struct (see ``_knn_grid_join``).
    """
    cen = _exploded_cells(centroids, res, outer).withColumn(
        "_in",
        ((F.abs(F.col("_dx")) <= inner) & (F.abs(F.col("_dy")) <= inner)).cast("int"),
    )
    return cen.groupBy("cell").agg(
        F.collect_list(F.struct(*cand_cols)).alias("_cands"),
        F.sum("_in").alias("_cnt"),
    )


def _cen_counts(centroids: DataFrame, res: int, d: int) -> DataFrame:
    """Counts-only twin of :func:`_cen_cells`: cell -> number of
    centroids within Chebyshev ``d``.  Used as the next escalation
    level's frontier filter — Spark does not reuse the full map's
    aggregation across subplans (measured: zero ReusedExchange), so a
    dedicated counts lineage keeps each heavy collect_list map computed
    exactly once and the filter side list-free."""
    return (
        _exploded_cells(centroids, res, d)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )


def _knn_grid_join(
    pts: DataFrame,
    centroids: DataFrame,
    k: int,
    res: int,
    disk: int,
    escalate: tuple[int, ...] | None = (),
    layer_fallback: bool | None = None,
    layer_fallback_max_rows: int = 1_000_000,
) -> DataFrame:
    use_layer = layer_fallback
    if use_layer is None:
        # auto gate (round-4 ADVICE): the whole-layer single-row broadcast
        # is only safe for dimension-sized layers — one cheap count() on
        # the small side decides, no manual knob
        use_layer = centroids.count() <= layer_fallback_max_rows
    if escalate is None:
        # AUTO ladder: redundant (identical output, extra stages) while
        # the whole-layer terminal exists; the scale path without it
        escalate = () if use_layer else (2, 4)
    # Candidate encoding (round-6 optimization, guide §2 "per-task work"):
    # with the whole-layer gate OPEN the layer is dimension-sized, so each
    # centroid gets an integer ``_ord`` = its rank by cad_number (layer-
    # wide window on the SMALL side only) and candidates travel as
    # struct(dist, _ord) — the per-row transform/array_sort then touches
    # only fixed-width numerics instead of copying/comparing cad strings
    # (measured: the string-struct transform was ~2.4 s of the 2.7 s
    # top-k cost at sf1.0).  ``(dist, _ord)`` orders identically to
    # ``(dist, cad_number)`` because _ord is rank-by-cad (ties on equal
    # cads emit identical rows either way); the string reappears only in
    # the final projection via one element_at into the rank->cad array.
    # Gate CLOSED (huge layer) keeps the string encoding: a layer-wide
    # window/array would violate the no-whole-layer-materialization rule.
    if use_layer:
        from pyspark.sql import Window

        cen = centroids.withColumn(
            "_ord", F.row_number().over(Window.orderBy("cad_number"))
        )
        cand_cols: tuple[str, ...] = ("clon", "clat", "_ord")
    else:
        cen = centroids
        cand_cols = ("clon", "clat", "cad_number")
    # ZERO-SHUFFLE top-k: every candidate of an image comes from the one
    # broadcast-join row that matched its cell, so a groupBy/window over
    # exploded candidate rows would shuffle 8-10x the output for nothing
    # (measured: the agg was ~90% of the query's wall time).  Instead the
    # SMALL side is pre-aggregated per cell (still broadcast-sized), the
    # join is 1:1, and top-k is a higher-order array expression — the big
    # side never shuffles and the whole query stays in codegen.
    levels = [_cen_cells(cen, res, disk, disk, cand_cols)]
    prev_d = disk
    for mult in escalate:
        d_i = disk * mult
        mi_full = _cen_cells(cen, res, _exact_disk(d_i), d_i, cand_cols)
        # keep only cells the PREVIOUS level left short: the escalation
        # maps' size tracks the sparse boundary, not the whole layer.
        # The filter reads a counts-only map (not the previous full map,
        # which Spark would recompute — no cross-subplan reuse).
        prev_cnt = _cen_counts(centroids, res, prev_d)
        levels.append(
            mi_full.join(prev_cnt, "cell", "left")
            .filter(F.coalesce(F.col("_pc"), F.lit(0)) < k)
            .select("cell", "_cands", "_cnt")
        )
        prev_d = d_i
    # All levels join the image side as broadcast LEFT joins on the same
    # cell key — SINGLE-PASS: no union of covered/frontier branches (that
    # would rescan the 10^12-row table once per level), no shuffle of the
    # big side; codegen evaluates each level's array lazily, so covered
    # rows never touch the escalation columns.
    joined = pts
    for i, mi in enumerate(levels):
        joined = joined.join(
            F.broadcast(
                mi.select(
                    "cell",
                    F.col("_cands").alias(f"_cands{i}"),
                    F.col("_cnt").alias(f"_cnt{i}"),
                )
            ),
            "cell",
            "left",
        )
    if use_layer:
        all_cands = cen.groupBy().agg(
            F.collect_list(F.struct(*cand_cols)).alias("_all"),
            # rank->cad lookup for the final projection: position i holds
            # the cad_number whose _ord is i (array_sort on (ord, cad)
            # structs orders by the unique ord)
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ord", "cad_number"))),
                lambda s: s["cad_number"],
            ).alias("_cads"),
        )
        joined = joined.crossJoin(F.broadcast(all_cands))
        terminal = F.col("_all")
    else:
        # huge layer, gate closed: rank the nearest available escalated
        # candidates (documented: may yield < k rows for an image with
        # nothing within the largest escalation disk)
        terminal = F.coalesce(
            *[F.col(f"_cands{i}") for i in reversed(range(len(levels)))]
        )
    cands = terminal
    for i in reversed(range(len(levels))):
        cands = F.when(
            F.coalesce(F.col(f"_cnt{i}"), F.lit(0)) >= k, F.col(f"_cands{i}")
        ).otherwise(cands)
    if use_layer:
        scored = F.transform(
            cands,
            lambda c: F.struct(
                _dist(F.col("lon"), F.col("lat"), c["clon"], c["clat"]).alias("dist"),
                c["_ord"].alias("_ord"),
            ),
        )
        # numeric struct sort == (dist ASC, _ord ASC) == (dist ASC,
        # cad_number ASC): _ord is rank-by-cad_number
        top = F.slice(F.array_sort(scored), 1, k)
        return joined.select(
            "image_id", "_cads", F.posexplode(top).alias("pos", "t")
        ).select(
            "image_id",
            F.element_at(F.col("_cads"), F.col("t._ord")).alias("cad_number"),
            (F.col("pos") + 1).alias("rank"),
            F.col("t.dist").alias("dist"),
        )
    scored = F.transform(
        cands,
        lambda c: F.struct(
            _dist(F.col("lon"), F.col("lat"), c["clon"], c["clat"]).alias("dist"),
            c["cad_number"].alias("cad_number"),
        ),
    )
    # lexicographic struct sort == (dist ASC, cad_number ASC) tie-breaking,
    # identical to the window/agg realizations
    top = F.slice(F.array_sort(scored), 1, k)
    return joined.select("image_id", F.posexplode(top).alias("pos", "t")).select(
        "image_id",
        F.col("t.cad_number").alias("cad_number"),
        (F.col("pos") + 1).alias("rank"),
        F.col("t.dist").alias("dist"),
    )
