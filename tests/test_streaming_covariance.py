"""Streaming maintenance of the PCA covariance statistics: replaying
the embedding corpus through ``covariance_partials_sink`` across
multiple micro-batches, the accumulated partial table merges + finishes
to EXACTLY the batch covariance — storage is the state (2080 rows per
micro-batch), the streaming engine holds none.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
def test_streaming_partials_equal_batch_covariance(spark, sf_dir, tmp_path):
    from video_stream_processing_spark.operators.stats import (
        covariance_upper_triangle_arrow,
        finish_covariance,
        merge_covariance_partials,
    )
    from video_stream_processing_spark.streaming.pipeline import (
        covariance_partials_sink,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_upper_triangle_arrow(emb).collect()
    }

    src = str(tmp_path / "emb_stream")
    out = str(tmp_path / "partials")
    ck = str(tmp_path / "ck")
    # two arrival waves -> at least two micro-batches
    emb.where("vec_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label long"
    ).parquet(src)
    q = covariance_partials_sink(
        stream.select("vec_id", "embedding"), out, ck
    ).start()
    try:
        q.processAllAvailable()
        emb.where("vec_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    stored = spark.read.parquet(out)
    # stored partial table: one shard per micro-batch, n bounded rows
    assert stored.count() % 2080 == 0 and stored.count() >= 2 * 2080
    merged = {
        (r["i"], r["j"]): r["cov"]
        for r in finish_covariance(merge_covariance_partials(stored)).collect()
    }
    assert merged == batch
