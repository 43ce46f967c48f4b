"""UDF surface (M3) — declared queries for the pandas-UDF inference path,
mirroring the reference's entire user-function surface (SURVEY.md §2.3):
YOLODetector.detect + applyNMS, hard-wired at VideoProcessFunction.java:108-109.

u01 runs the REAL pandas-UDF machinery (Arrow batch in, numpy scoring,
array<struct> out, inner explode) with a deterministic stub scorer whose
math is re-expressed in the DuckDB oracle — so the JVM<->Python boundary,
schema mapping and explode semantics are all hash-checked, per SURVEY.md
§5.2. NMS (u02) is iterative-greedy and genuinely non-SQL-expressible:
rows-only here, exhaustively property-tested in tests/test_nms.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from video_stream_processing_spark.functions.coco import coco_sql_array
from video_stream_processing_spark.operators.detection import (
    N_ANCHORS,
    nms_udf,
    stub_detect_udf,
    stub_detector_oracle_fragment,
)
from video_stream_processing_spark.plans.registry import register
from video_stream_processing_spark.tables import load_table

_U01_ORACLE = f"""
WITH scored AS ({stub_detector_oracle_fragment()})
SELECT vec_id,
       {coco_sql_array()}[(8 * j + 1) % 80 + 1] AS object_class,
       round(conf, 4) AS confidence,
       CAST((17 * j) % 320 AS DOUBLE) AS bbox_x1,
       CAST((29 * j) % 320 AS DOUBLE) AS bbox_y1,
       CAST((17 * j) % 320 + 64 + j AS DOUBLE) AS bbox_x2,
       CAST((29 * j) % 320 + 48 + j AS DOUBLE) AS bbox_y2
FROM scored
WHERE conf > 0.5
"""


@register("u01_stub_inference", oracle=_U01_ORACLE, tags=("udf", "pandas_udf"))
def u01_stub_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference hot path (SURVEY.md §3.2) on the embedding stand-in:
    Arrow-batched pandas UDF -> ARRAY<STRUCT> detections -> inner explode
    to flat rows. bench:headline — the Python-boundary cost is exactly
    what §4.2's UDF-boundary discipline manages at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    detect = stub_detect_udf()
    dets = emb.select("vec_id", detect(F.col("embedding")).alias("detections"))
    d = F.explode("detections").alias("d")
    return dets.select("vec_id", d).select(
        "vec_id",
        F.col("d.object_class").alias("object_class"),
        # confidence was rounded to 4 in float32; re-round after the
        # double upcast so 0.5005f doesn't surface as 0.50050002...
        F.round(F.col("d.confidence").cast("double"), 4).alias("confidence"),
        F.col("d.bbox.x1").cast("double").alias("bbox_x1"),
        F.col("d.bbox.y1").cast("double").alias("bbox_y1"),
        F.col("d.bbox.x2").cast("double").alias("bbox_x2"),
        F.col("d.bbox.y2").cast("double").alias("bbox_y2"),
    )


@register("u02_nms", oracle=None, tags=("udf", "pandas_udf", "rows_only"))
def u02_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect -> NMS -> explode, the complete reference UDF chain
    (VideoProcessFunction.java:108-109). Greedy suppression is iterative
    => rows-only driver check; invariants proven in tests/test_nms.py
    (output subset of input, no same-class surviving pair with IoU > 0.45,
    confidence-desc greedy order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    detect = stub_detect_udf()
    nms = nms_udf()
    dets = emb.select(
        "vec_id", nms(detect(F.col("embedding"))).alias("detections")
    )
    d = F.explode("detections").alias("d")
    return dets.select("vec_id", d).select(
        "vec_id",
        F.col("d.object_class").alias("object_class"),
        F.col("d.confidence").cast("double").alias("confidence"),
    )


_U03_ORACLE = f"""
WITH scored AS ({stub_detector_oracle_fragment()})
SELECT vec_id, count(*) AS n_detections,
       round(CAST(max(conf) AS DOUBLE), 4) AS top_confidence
FROM scored
WHERE conf > 0.5
GROUP BY vec_id
HAVING count(*) >= {N_ANCHORS // 5}
"""


@register("u03_detection_stats", oracle=_U03_ORACLE, tags=("udf", "pandas_udf"))
def u03_detection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation directly over the UDF output column (array functions on
    the nested shape, no explode): detections-per-frame stats — the
    monitoring counters the reference only logs (SURVEY.md §2.6(h)),
    done as a real query."""
    emb = load_table(spark, sf_dir, "embeddings")
    detect = stub_detect_udf()
    dets = emb.select("vec_id", detect(F.col("embedding")).alias("detections"))
    return (
        dets.select(
            "vec_id",
            F.size("detections").cast("long").alias("n_detections"),
            F.round(
                F.array_max(F.col("detections.confidence")).cast("double"), 4
            ).alias("top_confidence"),
        )
        .where(F.col("n_detections") >= N_ANCHORS // 5)
    )
