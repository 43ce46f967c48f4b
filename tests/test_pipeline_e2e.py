"""End-to-end streaming pipeline tests: pipeline.py's two queries (the
reference's side-output fan-out re-expressed as independent queries) run
against a file-replayed frame stream into real sinks, plus observe()
metric counters and the NDJSON sink wire format."""

from __future__ import annotations

import pytest

import json
import os

from pyspark.sql import functions as F


def _frames_dir(spark, tmp_path, n=120):
    d = str(tmp_path / "frames")
    rows = []
    base = 1_700_000_000_000
    for i in range(n):
        sid = f"cam{i % 2}"
        rows.append((sid, i, base + i * 20_000, float((i * 37) % 100)))
    (
        spark.createDataFrame(rows, "stream_id string, frame_id long, ts_ms long, scene_signal double")
        .select("stream_id", "frame_id", F.timestamp_millis("ts_ms").alias("ts"), "scene_signal")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


@pytest.mark.slow
def test_detection_query_end_to_end(spark, tmp_path):
    from video_stream_processing_spark.streaming.pipeline import detection_query

    frames = spark.readStream.schema(
        "stream_id string, frame_id long, ts timestamp, scene_signal double"
    ).parquet(_frames_dir(spark, tmp_path))
    fact_dir = str(tmp_path / "fact")
    q = detection_query(
        frames,
        fact_dir,
        str(tmp_path / "ck-det"),
        min_interval_ms=60_000,
        scene_threshold=30.0,
        trigger_seconds=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    fact = spark.read.parquet(fact_dir)
    assert fact.count() > 0
    cols = set(fact.columns)
    assert {"stream_id", "detection_time", "object_class", "confidence",
            "date_key", "hour_key"} <= cols
    # partitioned layout exists (partition pruning surface)
    assert any(p.startswith("stream_id=") for p in os.listdir(fact_dir))


@pytest.mark.slow
def test_segment_query_end_to_end(spark, tmp_path):
    from video_stream_processing_spark.streaming.pipeline import segment_query

    frames = spark.readStream.schema(
        "stream_id string, frame_id long, ts timestamp, scene_signal double"
    ).parquet(_frames_dir(spark, tmp_path))
    seg_dir = str(tmp_path / "segments")
    q = segment_query(
        frames, seg_dir, str(tmp_path / "ck-seg"), duration_ms=600_000, trigger_seconds=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    segs = spark.read.parquet(seg_dir)
    rows = segs.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["object_key"].startswith(f"videos/{r['stream_id']}/")
        assert r["file_size"] == r["frame_count"] * 1024  # NoopEncoder


@pytest.mark.slow
def test_segment_hook_applied_before_sink(spark, tmp_path):
    """SURVEY §2.2 #13 analog: the pass-through VideoSegmentFunction is a
    declarative hook on the segment stream; a non-identity hook (quality
    flag + filter) must be visible in the sink output."""
    from video_stream_processing_spark.streaming.pipeline import segment_query

    frames = spark.readStream.schema(
        "stream_id string, frame_id long, ts timestamp, scene_signal double"
    ).parquet(_frames_dir(spark, tmp_path))
    seg_dir = str(tmp_path / "segments-hook")

    def quality_hook(segs):
        return segs.withColumn("quality_ok", F.col("frame_count") >= 2).where(
            F.col("quality_ok")
        )

    q = segment_query(
        frames,
        seg_dir,
        str(tmp_path / "ck-seg-hook"),
        duration_ms=600_000,
        trigger_seconds=1,
        segment_hook=quality_hook,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(seg_dir).collect()
    assert len(rows) > 0
    assert all(r["quality_ok"] and r["frame_count"] >= 2 for r in rows)


def test_observe_metrics(spark, sf_dir):
    from video_stream_processing_spark.operators.metrics import observe_frames
    from video_stream_processing_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("stream_id"), "ts"
    )
    df, obs = observe_frames(ev)
    n = df.count()
    got = obs.get
    assert got["processed_frames"] == n
    assert got["approx_streams"] > 0
    assert got["min_ts"] <= got["max_ts"]


def test_ndjson_sink_wire_format(spark, tmp_path):
    from video_stream_processing_spark.streaming.sinks import write_detections_ndjson

    batch = spark.createDataFrame(
        [("s1", "2024-03-05 14:30:00", 7, "car", 0.9)],
        "stream_id string, detection_time string, frame_id long, object_class string, confidence double",
    ).select(
        "stream_id",
        F.col("detection_time").cast("timestamp").alias("detection_time"),
        "frame_id",
        "object_class",
        "confidence",
    )
    out_dir = str(tmp_path / "ndjson")
    write_detections_ndjson(out_dir)(batch, 0)
    lines = [
        json.loads(line)
        for f in os.listdir(out_dir)
        if f.endswith(".txt") or f.startswith("part-")
        for line in open(os.path.join(out_dir, f))
        if line.strip()
    ]
    assert len(lines) == 1
    rec = lines[0]
    # reference sink format: yyyy-MM-dd HH:mm:ss (DorisSinkBuilder.java:105,111)
    assert rec["detection_time"] == "2024-03-05 14:30:00"
    assert rec["object_class"] == "car" and rec["frame_id"] == 7


def test_idempotent_sink_replay_does_not_duplicate(spark, tmp_path):
    """Simulate the failure window between sink write and checkpoint
    commit: deliver the SAME micro-batch (same batch_id) twice — the
    idempotent sink must keep exactly one copy; the plain append sink
    would double it."""
    from video_stream_processing_spark.streaming.sinks import (
        write_detections_fact,
        write_detections_fact_idempotent,
    )

    batch = spark.createDataFrame(
        [("s1", "2024-03-05 14:30:00", "car", 0.9), ("s2", "2024-03-05 15:00:00", "dog", 0.8)],
        "stream_id string, detection_time string, object_class string, confidence double",
    ).select(
        "stream_id",
        F.col("detection_time").cast("timestamp").alias("detection_time"),
        "object_class",
        "confidence",
    )

    idem_dir = str(tmp_path / "idem")
    sink = write_detections_fact_idempotent(idem_dir)
    sink(batch, 7)
    sink(batch, 7)  # replay of the SAME batch id
    assert spark.read.parquet(idem_dir).count() == 2  # no duplicates

    sink(batch, 8)  # a genuinely new batch appends
    assert spark.read.parquet(idem_dir).count() == 4

    # contrast: plain append sink duplicates on replay (documented)
    app_dir = str(tmp_path / "app")
    plain = write_detections_fact(app_dir)
    plain(batch, 7)
    plain(batch, 7)
    assert spark.read.parquet(app_dir).count() == 4


def test_idempotent_segments_sink_replay_does_not_duplicate(spark, tmp_path):
    """VERDICT r1 item 5: write_segments was mode-append — a replayed
    micro-batch duplicated segment rows. The idempotent variant must
    keep one copy per (batch_id, segment) and derive identical object
    keys on replay."""
    from video_stream_processing_spark.streaming.sinks import write_segments_idempotent

    batch = spark.createDataFrame(
        [
            ("s1", "2024-03-05 14:30:00", "2024-03-05 14:33:00", 181, 180_000),
            ("s2", "2024-03-05 15:00:00", "2024-03-05 15:03:10", 190, 190_000),
        ],
        "stream_id string, start_time string, end_time string, frame_count int, duration_ms long",
    ).select(
        "stream_id",
        F.col("start_time").cast("timestamp").alias("start_time"),
        F.col("end_time").cast("timestamp").alias("end_time"),
        "frame_count",
        "duration_ms",
    )

    seg_dir = str(tmp_path / "segs")
    sink = write_segments_idempotent(seg_dir)
    sink(batch, 3)
    sink(batch, 3)  # replay of the SAME batch id
    rows = spark.read.parquet(seg_dir).collect()
    assert len(rows) == 2  # no duplicate segment rows
    keys = {r["object_key"] for r in rows}
    assert keys == {
        "videos/s1/20240305/14/s1_1709649000000.mp4",
        "videos/s2/20240305/15/s2_1709650800000.mp4",
    }
    sink(batch, 4)  # genuinely new batch id appends
    assert spark.read.parquet(seg_dir).count() == 4
