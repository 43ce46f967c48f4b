"""Streaming twin of the curation pipeline: the batch rules and
normalization (shared expressions, operators/text.py) applied on a
document stream, with exact dedup as dropDuplicatesWithinWatermark — so
junk is filtered, duplicates within the watermark are dropped exactly
once, and the dedup state provably EXPIRES (a re-arrival after the
watermark passes is re-emitted, which is the bounded-state contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

BASE = 1_700_000_000_000  # ms

GOOD = "the " + " ".join(f"word{i}" for i in range(39))  # passes every rule
SHORT = "tiny doc only"  # fails the word-count floor


def _write(spark, d, rows, mode):
    (
        spark.createDataFrame(rows, "doc_id long, ts_ms long, text string")
        .select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text")
        .coalesce(1)
        .write.mode(mode)
        .parquet(d)
    )


def test_curation_stream_filters_dedups_and_expires_state(spark, tmp_path):
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    d = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")

    # batch 1: a good doc, an exact duplicate (punctuation variant that
    # normalizes to the same text), and a junk doc
    _write(
        spark,
        d,
        [(1, BASE, GOOD), (2, BASE + 1_000, GOOD + "!!"), (3, BASE + 2_000, SHORT)],
        "overwrite",
    )
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        curation_stream(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("curation")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM curation").collect()
        assert [r["doc_id"] for r in rows] == [1]  # junk dropped, dup dropped
        assert rows[0]["n_tokens"] == 40

        # batch 2: the same content arrives again while the dedup state is
        # still live (watermark has not passed BASE + 10 min) -> dropped
        _write(spark, d, [(4, BASE + 30 * 60_000, GOOD)], "append")
        q.processAllAvailable()
        q.processAllAvailable()
        assert [r["doc_id"] for r in spark.sql("SELECT * FROM curation").collect()] == [1]

        # batch 3: after batch 2 the watermark advanced to +20 min, past the
        # hash's expiry (BASE + 10 min) -> state evicted -> re-emitted
        _write(spark, d, [(5, BASE + 31 * 60_000, GOOD)], "append")
        q.processAllAvailable()
        q.processAllAvailable()
        ids = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM curation").collect())
        assert ids == [1, 5]
    finally:
        q.stop()
