"""UDF surface (M3) — declared queries for the pandas-UDF inference path,
mirroring the reference's entire user-function surface (SURVEY.md §2.3):
YOLODetector.detect + applyNMS, hard-wired at VideoProcessFunction.java:108-109.

u01 runs the REAL pandas-UDF machinery (Arrow batch in, numpy scoring,
array<struct> out, inner explode) with a deterministic stub scorer whose
math is re-expressed in the DuckDB oracle — so the JVM<->Python boundary,
schema mapping and explode semantics are all hash-checked, per SURVEY.md
§5.2. NMS (u02) is iterative-greedy; since round 4 its oracle replays
the greedy walk as a DuckDB linear RECURSIVE CTE (accepted-box list as
recursion state), on top of the property tests in tests/test_nms.py.
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


# IoU of an accepted box `a` against the candidate row `cand`, inline in
# a list lambda — calculateIOU's arithmetic (YOLODetector.java:324-336):
# intersection / (areaA + areaB - intersection), denom<=0 -> 0.
_IOU_SQL = """
(CASE WHEN (greatest(0.0, a.x2 - a.x1) * greatest(0.0, a.y2 - a.y1)
            + greatest(0.0, cand.x2 - cand.x1) * greatest(0.0, cand.y2 - cand.y1)
            - greatest(0.0, least(a.x2, cand.x2) - greatest(a.x1, cand.x1))
              * greatest(0.0, least(a.y2, cand.y2) - greatest(a.y1, cand.y1))) > 0
      THEN (greatest(0.0, least(a.x2, cand.x2) - greatest(a.x1, cand.x1))
            * greatest(0.0, least(a.y2, cand.y2) - greatest(a.y1, cand.y1)))
           / (greatest(0.0, a.x2 - a.x1) * greatest(0.0, a.y2 - a.y1)
              + greatest(0.0, cand.x2 - cand.x1) * greatest(0.0, cand.y2 - cand.y1)
              - greatest(0.0, least(a.x2, cand.x2) - greatest(a.x1, cand.x1))
                * greatest(0.0, least(a.y2, cand.y2) - greatest(a.y1, cand.y1)))
      ELSE 0.0 END)
"""

# Greedy NMS as a DuckDB linear RECURSIVE CTE per frame (depth <= 10
# anchors): rank candidates (conf DESC, anchor j tiebreak — the stable
# input order of the stable Java sort, YOLODetector.java:294), walk the
# ranks carrying the accepted-box LIST, suppress iff any accepted
# SAME-CLASS box has IoU > 0.45. Both engines sort on the 4-decimal
# rounded conf, so the greedy order is engine-identical.
_U02_ORACLE = f"""
WITH RECURSIVE cands AS MATERIALIZED (
    SELECT vec_id, j,
           {coco_sql_array()}[(8 * j + 1) % 80 + 1] AS cls,
           round(conf, 4) AS conf,
           CAST((17 * j) % 320 AS DOUBLE) AS x1,
           CAST((29 * j) % 320 AS DOUBLE) AS y1,
           CAST((17 * j) % 320 + 64 + j AS DOUBLE) AS x2,
           CAST((29 * j) % 320 + 48 + j AS DOUBLE) AS y2
    FROM (SELECT * FROM ({stub_detector_oracle_fragment()}) s0
          WHERE conf > 0.5) s
),
ranked AS MATERIALIZED (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY conf DESC, j) AS rnk
    FROM cands
),
walk AS (
    SELECT vec_id, rnk, cls, conf,
           [struct_pack(cls := cls, x1 := x1, y1 := y1, x2 := x2, y2 := y2)] AS accepted,
           TRUE AS keep
    FROM ranked WHERE rnk = 1
    UNION ALL
    SELECT cand.vec_id, cand.rnk, cand.cls, cand.conf,
           CASE WHEN len(list_filter(w.accepted, a -> a.cls = cand.cls AND {_IOU_SQL} > 0.45)) = 0
                THEN list_append(w.accepted, struct_pack(cls := cand.cls, x1 := cand.x1, y1 := cand.y1, x2 := cand.x2, y2 := cand.y2))
                ELSE w.accepted END AS accepted,
           len(list_filter(w.accepted, a -> a.cls = cand.cls AND {_IOU_SQL} > 0.45)) = 0 AS keep
    FROM walk w JOIN ranked cand ON cand.vec_id = w.vec_id AND cand.rnk = w.rnk + 1
)
SELECT vec_id, cls AS object_class, conf AS confidence FROM walk WHERE keep
"""


@register("u02_nms", oracle=_U02_ORACLE, tags=("udf", "pandas_udf"))
def u02_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect -> NMS -> explode, the complete reference UDF chain
    (VideoProcessFunction.java:108-109). Greedy suppression runs in the
    pandas UDF; the oracle replays it as a DuckDB linear RECURSIVE CTE
    carrying the accepted-box list (round-4 upgrade from rows-only), on
    top of the invariants proven in tests/test_nms.py (output subset of
    input, no same-class surviving pair with IoU > 0.45, confidence-desc
    greedy order)."""
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
        # re-round after the float32 -> double upcast (see u01)
        F.round(F.col("d.confidence").cast("double"), 4).alias("confidence"),
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


# --------------------------------------------------------------------------
# u04: the REAL model chain — a .onnx graph executed by the engine's own
# numpy executor, no onnxruntime, no fake session (round-8 close of
# SURVEY §2 #14 against YOLODetector.java:92-175).
# --------------------------------------------------------------------------

_U04_SAMPLE_HEX = "15"  # md5 prefix < 0x15 ~= 21/256 ~= 8% of rows


def _u04_detector():
    """One parsed model + session per Python worker (the reference builds
    one YOLODetector per subtask in open(), VideoProcessFunction.java:60-66).
    The fixture model is deterministic (seed-pinned weights), so every
    worker materializes byte-identical weights locally — nothing but the
    Arrow batches crosses the JVM boundary."""
    global _U04_DET
    try:
        return _U04_DET
    except NameError:
        from video_stream_processing_spark.operators.detection import OnnxDetector
        from video_stream_processing_spark.operators.onnx_numpy import (
            NumpyGraphSession,
            make_yolov8n_skeleton,
        )

        _U04_DET = OnnxDetector(session=NumpyGraphSession(make_yolov8n_skeleton()))
        return _U04_DET


@register(
    "u04_onnx_numpy_detect",
    oracle=None,
    tags=("udf", "pandas_udf", "multimodal", "rows_only"),
)
def u04_onnx_numpy_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> preprocess -> ONNX graph (numpy executor) -> postprocess
    -> NMS on REAL image bytes AT THE REAL HEAD GEOMETRY: each sampled
    embedding is rendered into a deterministic baseline JPEG — the
    reference's ACTUAL wire format (VideoStreamMockProducer.java:211-218),
    encoded and decoded by the engine's own pure-numpy codec
    (functions/jpegcodec.py) — and OnnxDetector runs
    the seed-pinned make_yolov8n_skeleton fixture — the reference's
    actual topology (C2f Split/Concat blocks, SPPF MaxPool stack, PAN
    neck, decoupled DFL head with Softmax+frozen-arange Conv, anchor
    dist2bbox) fused to the true [1,84,8400] output contract
    (YOLODetector.java:180-206, yolo_export.py) — so postprocess (argmax
    rows 4..83, 0.5 gate, rescale, clamp) and per-class NMS run at true
    8400-candidate scale per image. rows_only: a conv graph is not
    ANSI-SQL-expressible; the numerics are instead pinned end-to-end by
    tests/test_onnx_numpy.py (sha256-pinned bytes, DFL/dist2bbox replayed
    manually, hand-checked kernels). Scale posture: md5-deterministic ~8%
    sample bounds work per run; repartition BEFORE binary synthesis so
    image bytes never cross a shuffle; one session per worker reused
    across Arrow batches (~0.1 s/image, ~1e8 MACs through skeleton
    widths)."""
    import numpy as np
    import pandas as pd

    from video_stream_processing_spark.functions.jpegcodec import encode_jpeg
    from video_stream_processing_spark.operators.detection import DETECTIONS_TYPE

    emb = load_table(spark, sf_dir, "embeddings")
    sel = emb.where(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) < _U04_SAMPLE_HEX
    ).repartition(32, "vec_id")

    @F.pandas_udf("binary")
    def render_jpeg(vec_id, embedding):  # no hints: pd is a local import
        out = []
        for vid, e in zip(vec_id, embedding):
            if e is None:
                out.append(None)
                continue
            v = np.asarray(e, dtype=np.float64)
            # validity gate (the stats.py _valid_vectors discipline): a
            # null ELEMENT arrives as nan, and nan->uint8 casts are
            # platform-undefined — render nothing, detector emits []
            if v.ndim != 1 or v.size == 0 or not np.isfinite(v).all():
                out.append(None)
                continue
            h = 40 + int(vid) % 25
            w = 56 + int(vid) % 31
            span = float(v.max() - v.min()) or 1.0
            px = np.resize(((v - v.min()) / span * 255.0), h * w * 3)
            out.append(encode_jpeg(np.rint(px).astype(np.uint8).reshape(h, w, 3)))
        return pd.Series(out, dtype=object)

    @F.pandas_udf(DETECTIONS_TYPE)
    def detect(blobs):  # no hints: pd is a local import
        return _u04_detector().detect_batch(blobs)

    d = F.explode(detect(render_jpeg("vec_id", "embedding")).alias("dets")).alias("d")
    return (
        sel.select("vec_id", d)
        .select(
            "vec_id",
            F.col("d.object_class").alias("object_class"),
            F.round(F.col("d.confidence").cast("double"), 4).alias("confidence"),
            F.round(F.col("d.bbox.x1").cast("double"), 2).alias("bbox_x1"),
            F.round(F.col("d.bbox.y1").cast("double"), 2).alias("bbox_y1"),
            F.round(F.col("d.bbox.x2").cast("double"), 2).alias("bbox_x2"),
            F.round(F.col("d.bbox.y2").cast("double"), 2).alias("bbox_y2"),
        )
    )


# --------------------------------------------------------------------------
# u05: the ONNX lane DIFFERENTIAL-checked (VERDICT r13 task 2) — an
# integer-exact conv graph through the SAME numpy executor + pandas-UDF
# plumbing as u04, with a DuckDB oracle that replays the forward pass
# arithmetically. u04 stays the full-geometry skeleton run (rows_only);
# u05 makes the executor itself hash-checked end-to-end.
# --------------------------------------------------------------------------

_U05_ORACLE = r"""
WITH w AS (
  SELECT
    list_transform(range(4), vc -> list_transform(range(9), vt ->
        ('0x' || substr(md5('cw:' || CAST(vc AS VARCHAR) || ':' || CAST(vt AS VARCHAR)), 1, 8))::BIGINT % 5 - 2)) AS cw,
    list_transform(range(4), vc ->
        ('0x' || substr(md5('cb:' || CAST(vc AS VARCHAR)), 1, 8))::BIGINT % 7 - 3) AS cb,
    list_transform(range(5), vo -> list_transform(range(36), vk ->
        ('0x' || substr(md5('gw:' || CAST(vo AS VARCHAR) || ':' || CAST(vk AS VARCHAR)), 1, 8))::BIGINT % 5 - 2)) AS gw,
    list_transform(range(5), vo ->
        ('0x' || substr(md5('gb:' || CAST(vo AS VARCHAR)), 1, 8))::BIGINT % 9 - 4) AS gb
),
px AS (
  SELECT doc_id,
         list_transform(range(64), vp ->
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(vp AS VARCHAR)), 1, 8))::BIGINT % 256) AS pxl
  FROM documents WHERE doc_id % 5 = 0
),
conv AS (
  SELECT doc_id,
         list_transform(range(4), vc -> list_transform(range(36), vp ->
             greatest(CAST(0 AS BIGINT), CAST(w.cb[vc + 1] + list_sum(list_transform(range(9), vt ->
                 w.cw[vc + 1][vt + 1] * pxl[((vp // 6) + (vt // 3)) * 8 + (vp % 6) + (vt % 3) + 1])) AS BIGINT)))) AS y
  FROM px, w
),
pool AS (
  SELECT doc_id,
         list_transform(range(36), vk ->
             greatest(y[vk // 9 + 1][(2 * ((vk % 9) // 3)) * 6 + 2 * ((vk % 9) % 3) + 1],
                      y[vk // 9 + 1][(2 * ((vk % 9) // 3)) * 6 + 2 * ((vk % 9) % 3) + 2],
                      y[vk // 9 + 1][(2 * ((vk % 9) // 3) + 1) * 6 + 2 * ((vk % 9) % 3) + 1],
                      y[vk // 9 + 1][(2 * ((vk % 9) // 3) + 1) * 6 + 2 * ((vk % 9) % 3) + 2])) AS flat
  FROM conv
),
lg AS (
  SELECT doc_id,
         list_transform(range(5), vo ->
             CAST(w.gb[vo + 1] + list_sum(list_transform(range(36), vk ->
                 w.gw[vo + 1][vk + 1] * flat[vk + 1])) AS BIGINT)) AS lgv
  FROM pool, w
)
SELECT doc_id, CAST(t.vo AS INT) AS class_idx, lgv[t.vo + 1] AS logit
FROM lg, range(5) t(vo)
"""


def _u05_session():
    """One parsed int8-convnet session per Python worker, reused across
    Arrow batches — the identical per-worker memo discipline as
    ``_u04_detector`` (the reference builds one OrtSession per subtask in
    open(), VideoProcessFunction.java:60-66)."""
    global _U05_SESSION
    try:
        return _U05_SESSION
    except NameError:
        from video_stream_processing_spark.operators.onnx_numpy import (
            NumpyGraphSession,
            make_int8_convnet,
        )

        _U05_SESSION = NumpyGraphSession(make_int8_convnet().serialize())
        return _U05_SESSION


@register(
    "u05_onnx_integer_convnet",
    oracle=_U05_ORACLE,
    tags=("udf", "pandas_udf", "multimodal", "onnx"),
)
def u05_onnx_integer_convnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONNX inference DIFFERENTIAL-checked end-to-end: every sampled doc
    renders a deterministic 8x8 integer image (md5 synth, the x145
    fixture discipline) and runs it through the engine's OWN numpy ONNX
    executor (operators/onnx_numpy.py — the same NumpyGraphSession that
    executes u04's full YOLOv8 skeleton, fed serialized model BYTES so
    the onnxproto parse path is in the certified chain) over
    make_int8_convnet: Conv 1->4 3x3 -> Relu -> MaxPool 2x2/2 ->
    Flatten -> Gemm, all weights md5-derived small integers, so the
    float32 forward pass is exact integer arithmetic (|logit| << 2^24)
    and the DuckDB oracle replays conv/relu/pool/gemm as nested list
    folds — the inference contract the reference hands to onnxruntime
    (YOLODetector.java:92-175) certified VALUE-exactly, not rows-only.
    Output: (doc_id, class_idx, logit) — 5 logits per doc.
    Scale posture: one session per worker (weights never in a row);
    repartition BEFORE synthesis so pixels never cross a shuffle;
    the 1/5 md5-free modulo sample bounds work per run."""
    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 5 == 0)
        .repartition(32, "doc_id")
    )

    @F.pandas_udf("array<long>")
    def infer(doc_id):  # no hints: pd is a local import
        import hashlib

        sess = _u05_session()
        out = []
        for d in doc_id:
            pxl = np.array(
                [
                    int(hashlib.md5(f"{int(d)}:{p}".encode()).hexdigest()[:8], 16)
                    % 256
                    for p in range(64)
                ],
                dtype=np.float32,
            ).reshape(1, 1, 8, 8)
            logits = sess.run(None, {"pix": pxl})[0]
            out.append([int(v) for v in logits.ravel()])
        return pd.Series(out)

    return docs.select(
        "doc_id", F.posexplode(infer("doc_id")).alias("class_idx", "logit")
    ).select("doc_id", F.col("class_idx").cast("int").alias("class_idx"), "logit")
