"""Streaming funnel (CEP-style state machine) — on in-order arrival it
must equal batch b55's converted rows exactly, including microsecond
timestamps; state must survive micro-batch splits."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _batch_converted(spark):
    from video_stream_processing_spark.plans.registry import query_map

    b55 = query_map()["b55_funnel_steps"](spark, SF)
    return {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in b55.where("converted").collect()
    }


def test_funnel_stream_matches_batch(spark, tmp_path):
    from video_stream_processing_spark.streaming.stateful import funnel_stream
    from video_stream_processing_spark.tables import load_table

    d = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    events = load_table(spark, SF, "events").select("user_id", "event_type", "ts")
    # two in-order batches so the state machine provably crosses a
    # micro-batch boundary mid-funnel
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    events.where(F.unix_micros("ts") <= cut).write.mode("overwrite").parquet(d + "/b1")
    events.where(F.unix_micros("ts") > cut).write.mode("overwrite").parquet(d + "/b2")

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*")
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
            for r in spark.sql("SELECT * FROM funnel").collect()
        }
    finally:
        q.stop()

    assert streamed == _batch_converted(spark)
    assert len(streamed) > 0  # the fixture actually converts someone
