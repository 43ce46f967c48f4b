"""Checkpoint recovery — the reference's restore path is dead code
(initializeState runs before open(), buffered frames are dropped on
restart; SURVEY.md §2.6(d)). Structured Streaming's state store restores
correctly by construction: stop a stateful query mid-stream, deliver
more data, restart from the same checkpoint, and the result equals a
single uninterrupted run — no lost buffers, no duplicated segments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SEG_MS = 180_000
BASE = 1_700_000_000_000


def _write(spark, d, rows, mode="overwrite"):
    (
        spark.createDataFrame(rows, "stream_id string, ts_ms long")
        .select("stream_id", F.timestamp_millis("ts_ms").alias("ts"))
        .coalesce(1)
        .write.mode(mode)
        .parquet(d)
    )


@pytest.fixture()
def batches():
    first = [("s1", BASE + o) for o in (0, 40_000, 90_000)]  # open buffer...
    second = [("s1", BASE + o) for o in (180_000, 200_000, 500_000)] + [
        ("sentinel", BASE + 90_000_000)
    ]
    return first, second


def _run_to_parquet(spark, frames_dir, ck, out_dir):
    from video_stream_processing_spark.streaming.stateful import exact_segments_stream

    def sink(batch_df, batch_id):
        if batch_df.count():
            batch_df.write.mode("append").parquet(out_dir)

    stream = spark.readStream.schema("stream_id string, ts timestamp").parquet(frames_dir)
    q = (
        exact_segments_stream(stream, duration_ms=SEG_MS, watermark="1 minute")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()


@pytest.mark.slow
def test_segments_survive_restart(spark, tmp_path, batches):
    first, second = batches
    d = str(tmp_path / "frames")
    ck = str(tmp_path / "ck")

    out = str(tmp_path / "out")

    # run 1: only the first half — buffer stays OPEN in state (no frame
    # 180s past the start yet)
    _write(spark, d, first)
    _run_to_parquet(spark, d, ck, out)
    import os

    assert not os.path.isdir(out) or not [
        r for r in spark.read.parquet(out).collect() if r["stream_id"] == "s1"
    ]  # nothing closed yet — state is buffered

    # run 2: deliver the rest, RESTART from the same checkpoint
    _write(spark, d, second, mode="append")
    _run_to_parquet(spark, d, ck, out)
    got = sorted(
        (r["start_time"], r["end_time"], r["frame_count"])
        for r in spark.read.parquet(out).collect()
        if r["stream_id"] == "s1"
    )

    # reference result: one uninterrupted batch over ALL frames
    from video_stream_processing_spark.operators.segments import segment_windows_exact

    all_frames = spark.read.parquet(d).where(F.col("stream_id") == "s1")
    want = sorted(
        (r["start_time"], r["end_time"], r["frame_count"])
        for r in segment_windows_exact(
            all_frames.select("stream_id", "ts"), duration_ms=SEG_MS
        ).collect()
    )
    # the restarted stream must produce exactly the closed segments of
    # the uninterrupted run (the restored buffer spans the restart!);
    # tails flush via the sentinel-advanced watermark
    assert got == want
    # the first segment spans frames from BOTH runs -> proves the state
    # restored rather than restarting empty: 3 pre-restart frames + the
    # post-restart trigger frame at +180s (trigger-inclusive close)
    assert got[0][2] == 4


@pytest.mark.slow
def test_bytes_keyframe_gate_survives_restart(spark, tmp_path):
    """The binary-driven gate's state (last-kept time + previous frame's
    byte histogram) must restore across a restart: a scene cut whose
    PREVIOUS frame arrived before the stop is only detectable if the
    restored prev_hist spans the restart."""
    from video_stream_processing_spark.functions.imagecodec import encode_bmp
    from video_stream_processing_spark.operators.scene import keyframe_gate_from_bytes
    from video_stream_processing_spark.streaming.stateful import (
        keyframes_from_bytes_stream,
    )
    import numpy as np

    def frame(v):
        return bytearray(encode_bmp(np.full((16, 16, 3), v, dtype=np.uint8)))

    # scene A up to t=4, scene B from t=5 (the cut's prev frame is t=4,
    # delivered BEFORE the restart; the cut frame t=5 arrives after)
    first = [("s1", BASE + t * 1000, frame(50)) for t in range(5)]
    second = [("s1", BASE + t * 1000, frame(200)) for t in range(5, 10)]

    d = str(tmp_path / "frames")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def write(rows, mode):
        (
            spark.createDataFrame(rows, "stream_id string, ts_ms long, frame_data binary")
            .select("stream_id", F.timestamp_millis("ts_ms").alias("ts"), "frame_data")
            .coalesce(1)
            .write.mode(mode)
            .parquet(d)
        )

    def run():
        def sink(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(out)

        stream = spark.readStream.schema(
            "stream_id string, ts timestamp, frame_data binary"
        ).parquet(d)
        q = (
            keyframes_from_bytes_stream(stream, min_interval_ms=60_000)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write(first, "overwrite")
    run()
    write(second, "append")
    run()

    got = sorted(
        int(r["ts"].timestamp() * 1000) - BASE
        for r in spark.read.parquet(out).collect()
        if r["is_keyframe"]
    )
    # uninterrupted batch reference over all frames
    all_frames = spark.read.parquet(d)
    want = sorted(
        int(r["ts"].timestamp() * 1000) - BASE
        for r in keyframe_gate_from_bytes(
            all_frames, min_interval_ms=60_000
        ).collect()
    )
    assert got == want == [0, 5_000]  # t=0 interval; t=5s ONLY if prev_hist restored
