"""Batch/stream parity for the streaming operators."""

from __future__ import annotations

import shutil

import pytest

from rosreestr_xml_to_gis_converter_spark.streaming.events import (
    read_events_stream,
    run_complete_to_memory,
    run_to_memory,
    stream_dedup,
    windowed_counts,
    windowed_counts_batch,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    # split the events table into several files so maxFilesPerTrigger
    # produces multiple micro-batches (exercises incremental state)
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "events_stream")
    src.repartition(4).write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_windowed_counts_stream_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_complete_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r.win_start, r.event_type): (r.n, r.sum_value_cents)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r.win_start, r.event_type): (r.n, r.sum_value_cents)
        for r in windowed_counts_batch(batch).collect()
    }
    assert got == want
    assert len(want) > 10


def test_stream_dedup_removes_replayed_rows(spark, events_dir, tmp_path):
    # replay the same files twice (duplicate event_ids in a later batch)
    dup_dir = str(tmp_path / "events_dup")
    spark.read.parquet(events_dir).write.parquet(dup_dir)
    spark.read.parquet(events_dir).write.mode("append").parquet(dup_dir)
    stream = read_events_stream(spark, dup_dir)
    # files arrive in arbitrary event-time order; the dedup horizon must
    # cover the table's full span or replayed rows land "late"
    run_to_memory(stream_dedup(stream, watermark="60 days").select("event_id"), "dedup_out")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    want = spark.read.parquet(events_dir).count()
    assert got.d == want
    # every surviving row unique; duplicates within the watermark dropped
    assert got.n == got.d


def test_stateful_user_totals_final_state_equals_batch(spark, events_dir):
    """applyInPandasWithState running totals: the LAST emitted row per
    user (after all micro-batches) must equal the batch aggregation."""
    from rosreestr_xml_to_gis_converter_spark.streaming.events import (
        stateful_user_totals,
        user_totals_batch,
    )

    stream = read_events_stream(spark, events_dir)
    q = (
        stateful_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # n_total is monotonically nondecreasing per user -> the final state
    # is the max-n_total emission
    got = {
        r.user_id: (r.n_total, r.sum_value_cents)
        for r in spark.sql(
            """SELECT user_id, n_total, sum_value_cents FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_total DESC) rn
                 FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_total, r.sum_value_cents)
        for r in user_totals_batch(spark.read.parquet(events_dir)).collect()
    }
    assert got == want
    assert len(want) >= 10


def test_stream_lww_upsert_final_winner_equals_batch(spark, sf_dir, events_dir):
    """The stateful LWW winner after all micro-batches equals the batch
    G4 window realization (queries_ref.g4_lww_upsert semantics)."""
    from rosreestr_xml_to_gis_converter_spark.queries_ref import g4_lww_upsert
    from rosreestr_xml_to_gis_converter_spark.streaming.events import (
        read_events_stream,
        stream_lww_upsert,
    )

    stream = read_events_stream(spark, events_dir)
    q = (
        stream_lww_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("lww_sink")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.table("lww_sink").toPandas()
    # winners are monotone per user in (ts, event_id): final = max emitted
    final = (
        emitted.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .tail(1)[["user_id", "event_id", "event_type"]]
    )
    got = {tuple(r) for r in final.itertuples(index=False, name=None)}
    want = {
        (r.user_id, r.event_id, r.event_type)
        for r in g4_lww_upsert(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_near_dup_matches_equals_batch(spark, tmp_path):
    """Stream-static near-dup: a planted-twin image stream joined to a
    static signature layer must yield exactly the batch twin's rows —
    per window and probe, the same sorted match list.  The stream side
    arrives in 4 micro-batch files (exercises per-batch stream-static
    joins + incremental window-agg state)."""
    import shutil

    from pyspark.sql import functions as F

    from rosreestr_xml_to_gis_converter_spark.streaming.near_dup import (
        near_dup_matches_batch,
        read_images_stream,
        stream_near_dup_matches,
    )
    from rosreestr_xml_to_gis_converter_spark.synth import images_from_lineitem

    img = images_from_lineitem(
        spark, "/root/testdata/sf0.001"
    ).dropDuplicates(["image_id"])
    okey = F.split("image_id", "-")[1].cast("long")
    static = img.filter(okey < 400).select("image_id", "phash")
    k = F.split("image_id", "-")[1].cast("long") % 7
    mask = (F.pow(F.lit(2.0), k.cast("double"))).cast("long") - 1
    probes = static.select(
        F.concat("image_id", F.lit("~")).alias("image_id"),
        F.col("phash").bitwiseXOR(mask).alias("phash"),
        F.timestamp_seconds(
            F.split("image_id", "-")[1].cast("long") * 3600
        ).alias("ts"),
    )
    stream_dir = str(tmp_path / "img_stream")
    probes.repartition(4).write.parquet(stream_dir)
    try:
        stream = read_images_stream(spark, stream_dir)
        run_complete_to_memory(
            stream_near_dup_matches(stream, static, max_hamming=4),
            "neardup_stream",
        )
        got = {
            (r.win_start, r.probe_id): (tuple(r.matches), r.n_matches)
            for r in spark.sql("SELECT * FROM neardup_stream").collect()
        }
        want = {
            (r.win_start, r.probe_id): (tuple(r.matches), r.n_matches)
            for r in near_dup_matches_batch(
                spark.read.parquet(stream_dir), static, max_hamming=4
            ).collect()
        }
        assert got == want
        assert len(want) > 100
        # closed-form: every match list is exactly the probe's own base
        for (_, probe_id), (matches, n) in want.items():
            assert n == 1 and matches == (probe_id[:-1],)
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
