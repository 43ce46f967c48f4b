"""Pipeline metrics — the engine analog of the reference's per-subtask
counters (processedFrames/keyFrames/detections, logged every 100 frames
and lost on restart — VideoProcessFunction.java:50-51,85,104,134-138;
README.md:283-289 monitoring).

Spark-first: ``DataFrame.observe`` attaches named aggregate metrics to a
plan; they are computed DURING the action (no second pass), surfaced on
the Observation object in batch and in each StreamingQueryProgress in
streaming — durable and exactly-once, unlike the reference's plain
fields (SURVEY.md §2.6(h))."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_frames(df: DataFrame, name: str = "frame_metrics"):
    """Attach frame-path counters. Returns (df, observation). Works on
    any DataFrame with (stream_id, ts); extra aggregates are computed
    only if their column exists."""
    obs = Observation(name)
    aggs = [
        F.count(F.lit(1)).alias("processed_frames"),
        F.approx_count_distinct("stream_id").alias("approx_streams"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ]
    if "is_keyframe" in df.columns:
        aggs.append(
            F.sum(F.col("is_keyframe").cast("long")).alias("keyframes")
        )
    return df.observe(obs, *aggs), obs


def observe_detections(df: DataFrame, name: str = "detection_metrics"):
    """Counters for the flattened detections fact path: rows, distinct
    classes (approx), mean confidence."""
    obs = Observation(name)
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("detections"),
            F.approx_count_distinct("object_class").alias("approx_classes"),
            F.avg("confidence").alias("mean_confidence"),
        ),
        obs,
    )
