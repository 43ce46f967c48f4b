"""Streaming rolling z-score anomalies — on in-order arrival the
stateful twin must equal batch x73 row-for-row, across micro-batch
boundaries (the value buffer persists in the state store)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_anomaly_stream_matches_batch(spark, tmp_path):
    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.streaming.stateful import anomaly_stream
    from video_stream_processing_spark.tables import load_table

    batch = {
        (r["user_id"], r["event_id"]): (r["value"], r["zscore"])
        for r in query_map()["x73_rolling_zscore_anomalies"](spark, SF).collect()
    }
    assert batch  # fixture produces anomalies

    d = str(tmp_path / "events")
    events = load_table(spark, SF, "events").select("user_id", "event_id", "ts", "value")
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    events.where(F.unix_micros("ts") <= cut).write.mode("overwrite").parquet(d + "/b1")
    events.where(F.unix_micros("ts") > cut).write.mode("overwrite").parquet(d + "/b2")

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*")
    )
    q = (
        anomaly_stream(stream)
        .writeStream.format("memory")
        .queryName("anom")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_id"], r["event_id"]): (r["value"], r["zscore"])
            for r in spark.sql("SELECT * FROM anom").collect()
        }
    finally:
        q.stop()

    assert streamed == batch


def test_gap_stream_matches_batch_histogram(spark, tmp_path):
    """x90 streaming twin: per-event gap buckets from the stateful
    stream, aggregated, must equal the batch lag-window histogram —
    across micro-batch boundaries (last-ms persists in state)."""
    from collections import Counter

    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.streaming.stateful import gap_stream
    from video_stream_processing_spark.tables import load_table

    batch = {
        (r["event_type"], r["log2_bucket"]): r["n_gaps"]
        for r in query_map()["x90_gap_log_histogram"](spark, SF).collect()
    }
    assert batch

    d = str(tmp_path / "events")
    events = load_table(spark, SF, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    events.where(F.unix_micros("ts") <= cut).write.mode("overwrite").parquet(d + "/b1")
    events.where(F.unix_micros("ts") > cut).write.mode("overwrite").parquet(d + "/b2")

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*")
    )
    q = (
        gap_stream(stream)
        .writeStream.format("memory")
        .queryName("gaps")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = Counter(
            (r["event_type"], r["log2_bucket"])
            for r in spark.sql("SELECT * FROM gaps").collect()
        )
    finally:
        q.stop()

    assert dict(streamed) == batch
