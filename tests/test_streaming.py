"""Structured Streaming twins: streaming over the events rows must converge to
the batch query results once all data is processed."""

import pytest
from pyspark.sql import functions as F

from mel_spark.streaming.events import sessionize_stream, tumbling_counts_stream


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _run_stream_once(spark, batch_df, transform, tmpdir):
    """Feed the batch rows through a file streaming source, run to completion
    in availableNow mode, return the final complete-output table."""
    src = f"{tmpdir}/src"
    batch_df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sink")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("stream_sink")


def test_tumbling_counts_converge_to_batch(spark, events_batch, tmp_path):
    got = _run_stream_once(spark, events_batch, tumbling_counts_stream, str(tmp_path))
    from __spark_entry__ import q_ev_tumbling_counts

    import os

    expected = q_ev_tumbling_counts(spark, os.environ.get("MEL_TEST_SF_DIR", "/root/testdata/sf0.001"))
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0


def test_session_window_counts(spark, events_batch, tmp_path):
    got = _run_stream_once(spark, events_batch, sessionize_stream, str(tmp_path))
    # sanity: every user appears; session event counts sum to total events
    totals = got.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    per_user = {r["user_id"]: r["n"] for r in totals}
    batch_counts = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_user == batch_counts


def test_streaming_dedup_drops_watermark_duplicates(spark, events_batch, tmp_path):
    """dropDuplicatesWithinWatermark twin of the batch exact-dedup: feeding
    each event twice yields each event_id exactly once downstream."""
    from mel_spark.streaming.events import dedup_stream

    doubled = events_batch.union(events_batch)
    src = f"{tmp_path}/dsrc"
    doubled.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(doubled.schema).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/dckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_sink")
    n_ids = events_batch.select("event_id").distinct().count()
    assert got.count() == n_ids
    assert got.select("event_id").distinct().count() == n_ids
