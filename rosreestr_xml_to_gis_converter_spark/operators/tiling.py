"""Raster <-> vector tiling: per-cell rasterized parcel masks.

Generalizes the reference's shapefile emission (one polygon record per
contour, /root/reference/main.py:379-414) to the raster side of the north
rule: for every (tile_cell, parcel) pair of the cover, rasterize the
parcel's mask inside that tile at ``px`` x ``px`` pixels.

Distribution shape: the cover table already assigns parcels to tiles, so
rasterization is embarrassingly parallel over cover rows; full-interior
tiles short-circuit to an all-ones mask (constant hash) without touching
geometry.  Pixel-center sampling uses the same half-open PIP kernel as
the spatial join, so mask semantics and join semantics agree exactly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rosreestr_xml_to_gis_converter_spark.functions.geometry import (
    points_in_rings,
    unpack_rings,
)
from rosreestr_xml_to_gis_converter_spark.index.grid import cell_to_bounds

TILE_SCHEMA = "tile_cell long, cad_number string, coverage_px long, mask_md5 string"


def rasterize_mask(
    cell: int, rings: list[np.ndarray] | None, px: int, full: bool
) -> np.ndarray:
    """Binary mask of the polygon inside the cell rectangle (pixel-center
    sampling, row 0 = south edge)."""
    if full:
        return np.ones((px, px), dtype=np.uint8)
    x0, y0, x1, y1 = (float(v) for v in cell_to_bounds(np.int64(cell)))
    xs = x0 + (np.arange(px) + 0.5) * (x1 - x0) / px
    ys = y0 + (np.arange(px) + 0.5) * (y1 - y0) / px
    gx, gy = np.meshgrid(xs, ys)
    inside = points_in_rings(gx.ravel(), gy.ravel(), rings or [])
    return inside.reshape(px, px).astype(np.uint8)


def tile_masks(cover: DataFrame, px: int = 32) -> DataFrame:
    """cover (cell, cad_number, full, geom) -> per-tile parcel masks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        full_hash = hashlib.md5(np.ones((px, px), dtype=np.uint8).tobytes()).hexdigest()
        for pdf in it:
            out = []
            ring_cache: dict[bytes, list[np.ndarray]] = {}
            for cell, cad, full, geom in zip(
                pdf["cell"], pdf["cad_number"], pdf["full"], pdf["geom"]
            ):
                if full:
                    out.append((int(cell), cad, px * px, full_hash))
                    continue
                rings = ring_cache.get(geom)
                if rings is None:
                    rings = unpack_rings(geom)
                    ring_cache[geom] = rings
                mask = rasterize_mask(int(cell), rings, px, False)
                out.append(
                    (int(cell), cad, int(mask.sum()), hashlib.md5(mask.tobytes()).hexdigest())
                )
            yield pd.DataFrame(
                out, columns=["tile_cell", "cad_number", "coverage_px", "mask_md5"]
            )

    return cover.mapInPandas(batches, schema=TILE_SCHEMA)
