"""Streaming near-duplicate detection against a static signature layer.

The continuous-ingestion twin of the batch pHash near-dup path
(``operators/dedupe.py``): a stream of fingerprinted images joins the
STATIC banded-chunk signature table — a stateless stream-static
equi-join, the only state in the query being the watermarked per-probe
aggregation that collapses band multiplicity.  At 10^12 rows the static
side is the bucketed signature table written once (``Catalog.
write_bucketed`` on (band, key)); every micro-batch joins it without
reshuffling history, which is the property that makes continuous dedup
affordable at that scale — a self-join per batch would rescan the
corpus.

Mirrors the reference's ingest-time duplicate handling (the converter
skips already-seen cad numbers on re-runs — last-writer-wins upsert,
``real_estate.py`` parse loop); here the same idea is generalized to
perceptual near-duplicates of the image payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.operators.dedupe import (
    hamming_match_static,
)

IMAGES_STREAM_SCHEMA = "image_id string, phash long, ts timestamp"


def read_images_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(IMAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _matches_agg(pairs: DataFrame, window: str) -> DataFrame:
    """Per (window, probe) match list: ``collect_set`` absorbs the
    once-per-band pair multiplicity the stateless matcher documents, and
    ``sort_array`` makes the output deterministic."""
    return (
        pairs.groupBy(F.window("ts", window).alias("win"), "probe_id")
        .agg(F.sort_array(F.collect_set("static_id")).alias("matches"))
        .select(
            F.col("win.start").alias("win_start"),
            "probe_id",
            "matches",
            F.size("matches").cast("long").alias("n_matches"),
        )
    )


def stream_near_dup_matches(
    stream: DataFrame,
    static: DataFrame,
    max_hamming: int = 4,
    window: str = "4 hours",
    watermark: str = "1 hour",
    n_bands: int | None = None,
    chunks_per_band: int = 1,
) -> DataFrame:
    """(win_start, probe_id, matches, n_matches) per streamed image with
    at least one static near-duplicate within ``max_hamming``.

    Stage 1 (stateless): the stream's fingerprints chunk and equi-join
    the static signature layer per micro-batch.  Stage 2 (the only
    state): a watermarked tumbling-window aggregation per probe id —
    bounded state, late rows beyond the watermark dropped, the same
    late-data policy as ``windowed_counts``."""
    pairs = hamming_match_static(
        stream.withWatermark("ts", watermark),
        static,
        max_hamming,
        probe_id_col="image_id",
        probe_hash_col="phash",
        static_id_col="image_id",
        static_hash_col="phash",
        n_bands=n_bands,
        chunks_per_band=chunks_per_band,
        carry=("ts",),
    )
    return _matches_agg(pairs, window)


def near_dup_matches_batch(
    probe: DataFrame,
    static: DataFrame,
    max_hamming: int = 4,
    window: str = "4 hours",
    n_bands: int | None = None,
    chunks_per_band: int = 1,
) -> DataFrame:
    """Batch twin of :func:`stream_near_dup_matches` — identical Column
    expressions minus the watermark (all data present in batch)."""
    pairs = hamming_match_static(
        probe,
        static,
        max_hamming,
        probe_id_col="image_id",
        probe_hash_col="phash",
        static_id_col="image_id",
        static_hash_col="phash",
        n_bands=n_bands,
        chunks_per_band=chunks_per_band,
        carry=("ts",),
    )
    return _matches_agg(pairs, window)
