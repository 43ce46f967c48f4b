"""Engine facade + CLI surface."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from video_stream_processing_spark.engine import Engine

    return Engine(spark, sf_dir=sf_dir)


def test_engine_catalog_and_run(engine):
    qs = engine.queries()
    assert "b01_pricing_summary" in qs and len(qs) >= 70
    df = engine.run("b32_distinct")
    assert df.count() > 0
    with pytest.raises(KeyError):
        engine.run("no_such_query")


def test_engine_sql_over_views(engine):
    out = engine.sql("SELECT count(*) AS n FROM lineitem").collect()
    assert out[0]["n"] > 0


def test_engine_table(engine):
    assert engine.table("region").count() == 5


@pytest.mark.slow
def test_engine_start_pipeline(engine, tmp_path):
    from pyspark.sql import functions as F

    frames = (
        engine.spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .select(
            F.lit("s1").alias("stream_id"),
            F.col("value").alias("frame_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).cast("double").alias("scene_signal"),
            F.encode(F.col("value").cast("string"), "UTF-8").alias("frame_data"),
        )
    )
    det, seg = engine.start_pipeline(
        frames, str(tmp_path / "out"), str(tmp_path / "ck"), segment_duration_ms=5_000
    )
    import time

    try:
        # rate source is unbounded: wait for first micro-batches instead
        # of processAllAvailable (which would never return)
        deadline = time.time() + 60
        while time.time() < deadline and not (
            det.lastProgress and det.lastProgress["numInputRows"] >= 0
        ):
            time.sleep(1)
        assert det.isActive and seg.isActive
    finally:
        det.stop()
        seg.stop()


def test_cli_list(capsys):
    from video_stream_processing_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "b01_pricing_summary" in out and "x02_minhash_lsh_neardup" in out


@pytest.mark.slow
def test_engine_config_drives_pipeline(spark, sf_dir, tmp_path):
    """EngineConfig (the application.properties analog) supplies pipeline
    parameters when call-site arguments are omitted."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.config import EngineConfig
    from video_stream_processing_spark.engine import Engine

    cfg = EngineConfig.load(
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        segment_duration_ms=5_000,
        keyframe_min_interval_ms=1_000,
    )
    eng = Engine(spark, sf_dir=sf_dir, config=cfg)
    assert eng.config.segment_duration_ms == 5_000

    d = str(tmp_path / "frames")
    rows = [("s1", 1_700_000_000_000 + i * 500) for i in range(40)]
    (
        spark.createDataFrame(rows, "stream_id string, ts_ms long")
        .select(
            "stream_id",
            F.timestamp_millis("ts_ms").alias("ts"),
            (F.col("ts_ms") % 100 / 1.0).alias("scene_signal"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(d)
    )
    frames = spark.readStream.schema(
        "stream_id string, ts timestamp, scene_signal double"
    ).parquet(d)
    det, seg = eng.start_pipeline(frames)  # all params from config
    try:
        det.processAllAvailable()
        seg.processAllAvailable()
    finally:
        det.stop()
        seg.stop()
    segs = spark.read.parquet(str(tmp_path / "out" / "segments"))
    # 40 frames over 20s with 5s segments -> multiple closed segments
    assert segs.count() >= 3
