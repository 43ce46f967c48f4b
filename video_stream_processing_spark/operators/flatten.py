"""Flatten/explode — the reference's DetectionResult -> Doris fact-row
conversion (DorisSinkBuilder.convertToJson,
/root/reference/src/main/java/com/video/streaming/sink/DorisSinkBuilder.java:100-124):
one output row per element of the `detections` array, projected onto the
10 Doris columns; frames with a null/empty array produce NOTHING (the
method returns null and nulls are filtered — VideoStreamProcessingJob.java:77-79,
SURVEY.md §2.6(e)).

Spark-first: a single inner ``explode`` (zero-drop semantics for free)
followed by a codegen'd projection. ``explode_outer`` is provided for the
presence-tracking variant the reference cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Flattened fact-table column order per the Doris DDL
# (/root/reference/README.md:81-100).
FACT_COLUMNS = (
    "stream_id",
    "detection_time",
    "frame_id",
    "object_class",
    "confidence",
    "bbox_x1",
    "bbox_y1",
    "bbox_x2",
    "bbox_y2",
    "frame_url",
)


def flatten_detections(
    nested: DataFrame,
    detections_col: str = "detections",
    keep_empty: bool = False,
) -> DataFrame:
    """detections_nested (SURVEY.md §1.4) -> video_detections fact rows.

    ``keep_empty=False`` reproduces the reference's drop-on-empty
    semantics (inner explode). ``keep_empty=True`` uses explode_outer and
    emits one all-null detection row per empty frame.
    """
    exploder = F.explode_outer if keep_empty else F.explode
    d = exploder(F.col(detections_col)).alias("d")
    return nested.select(
        F.col("stream_id"),
        F.col("ts").alias("detection_time"),
        F.col("frame_id"),
        d,
    ).select(
        "stream_id",
        "detection_time",
        "frame_id",
        F.col("d.object_class").alias("object_class"),
        F.col("d.confidence").alias("confidence"),
        F.col("d.bbox.x1").alias("bbox_x1"),
        F.col("d.bbox.y1").alias("bbox_y1"),
        F.col("d.bbox.x2").alias("bbox_x2"),
        F.col("d.bbox.y2").alias("bbox_y2"),
        F.lit("").alias("frame_url"),  # always empty in the reference (§2.6(f))
    )
