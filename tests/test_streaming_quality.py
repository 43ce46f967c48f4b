"""Streaming maintenance of the per-source quality-prune statistics:
replaying the documents corpus through ``quality_histogram_sink`` across
multiple micro-batches, the stored histogram partials merge to EXACTLY
the batch histogram and the prune decision recomputed from them equals
the batch x112 report — storage is the state, the engine holds none.
"""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_streaming_histogram_partials_equal_batch_prune(spark, sf_dir, tmp_path):
    from video_stream_processing_spark.operators.text import (
        merge_quality_histograms,
        quality_prune_report,
    )
    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.streaming.pipeline import (
        quality_histogram_sink,
    )

    batch = {
        r["source"]: tuple(r)
        for r in query_map()["x112_source_quality_prune"](spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "doc_stream")
    out = str(tmp_path / "partials")
    ck = str(tmp_path / "ck")
    # two arrival waves -> at least two micro-batches
    docs.where("doc_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    q = quality_histogram_sink(stream, out, ck).start()
    try:
        q.processAllAvailable()
        docs.where("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    stored = spark.read.parquet(out)
    merged = merge_quality_histograms(stored)
    streamed = {
        r["source"]: tuple(r) for r in quality_prune_report(merged).collect()
    }
    assert streamed == batch
