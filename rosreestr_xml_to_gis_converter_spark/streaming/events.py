"""Streaming ingest operators.

The reference processes a directory incrementally with per-file progress
(/root/reference/main.py:347-461); the engine's streaming analog is a
Structured Streaming source over arriving files with watermarked,
windowed state.  Batch/stream parity is the correctness contract: every
streaming query here has a batch twin computed with identical Column
expressions, and tests assert equality after ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_counts(events: DataFrame, window: str = "6 hours", watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event type (late rows beyond
    the watermark are dropped — the engine's late-data policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "6 hours") -> DataFrame:
    """Batch twin of :func:`windowed_counts` (no watermark semantics needed
    in batch — all data is present)."""
    return (
        events.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value_cents")
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon (stateful dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across
    micro-batches via ``applyInPandasWithState`` (the engine's pattern
    for operators Spark's built-in windowed aggs can't express —
    SURVEY.md §2.2 checkpointable per-key state).

    State: (n events seen, fixed-point value sum).  Emits the updated
    running totals for every user present in the batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_total long, sum_value_cents long"
    state_schema = "n long, s long"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pd.Series(pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_total": [n], "sum_value_cents": [s]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def stream_lww_upsert(events: DataFrame) -> DataFrame:
    """G4's streaming twin: last-writer-wins upsert per key
    (real_estate.py:781-782 applies dict.update per entity; the batch
    realization is the row_number window in queries_ref.g4_lww_upsert).

    Custom stateful operator (``applyInPandasWithState``): state holds
    the current winner (ts, event_id, event_type) per user; each
    micro-batch emits the updated winner for every key it touched.
    Ordering matches the batch twin: (ts DESC, event_id DESC).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, event_id long, event_type string, ts timestamp"
    state_schema = "ts timestamp, event_id long, event_type string"

    def update(key, pdfs, state: GroupState):
        best = state.get if state.exists else None  # (ts, event_id, type)
        for pdf in pdfs:
            for ts, eid, et in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                cand = (ts.to_pydatetime(), int(eid), str(et))
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[1]],
                "event_type": [best[2]],
                "ts": [best[0]],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful operator's FINAL state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    )


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drive a streaming query to completion synchronously (test helper)."""
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()


def run_complete_to_memory(df: DataFrame, name: str) -> None:
    q = df.writeStream.outputMode("complete").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
