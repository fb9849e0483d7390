"""Event-time streaming ops over the events schema
(event_id long, ts timestamp, user_id long, event_type string, value double).

Streaming twins of __spark_entry__.q_ev_tumbling_counts / q_ev_sessionize:
same aggregation logic, expressed with watermarks + event-time windows so late
data is handled. Tested with a rate/memory source feeding the same rows as the
batch parquet — outputs must converge to the batch results once the watermark
passes (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    # watermarks require TIMESTAMP (tz-aware); parquet often carries NTZ
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling window per event_type with late-data watermark."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            (F.unix_timestamp(F.col("w.start")) / 3600).cast("long").alias("hour_bucket"),
            "event_type",
            "n_events",
            F.round(F.col("min_value").cast("double"), 6).alias("min_value"),
            F.round(F.col("max_value").cast("double"), 6).alias("max_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions via the native session_window (stateful streaming
    analogue of the batch lag/cumsum sessionizer)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup: drop events whose event_id was already seen
    within the watermark horizon — the streaming twin of the batch
    dedup_keep_first / OnlyOnceDataset contract (state is bounded by the
    watermark, so this runs forever on an unbounded stream; at-least-once
    sources become effectively-once downstream)."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
