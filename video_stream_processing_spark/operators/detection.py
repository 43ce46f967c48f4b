"""ML-inference UDF surface — the engine analog of the reference's YOLOv8
ONNX detector + greedy NMS (the entire user-function surface of the
reference, SURVEY.md §2.3):

- YOLODetector.detect(byte[]) -> List<Detection>
  (/root/reference/src/main/java/com/video/streaming/processor/YOLODetector.java:92-175)
- applyNMS / calculateIOU (same file :289-336, IoU default 0.45 at :58)
- confidence threshold 0.5 (:32, application.properties:31)

Spark-first design: inference is an Arrow-batched pandas UDF returning an
``ARRAY<STRUCT<object_class, confidence, bbox<x1,y1,x2,y2>>>`` column —
the `detections_nested` shape (SURVEY.md §1.4). The detector body is
pluggable:

- ``StubDetector``: deterministic linear scorer over an embedding vector
  (the image-tensor stand-in) — SQL-expressible, so the whole pandas-UDF
  path is verified against the DuckDB oracle (plans/udf_surface.py).
- ``OnnxDetector``: the real onnxruntime path, import-gated (onnxruntime
  is not installed in this container) with the reference's exact
  postprocessing contract documented.

NMS is a standalone array-in/array-out pandas UDF so it is independently
testable (tests/test_nms.py, hypothesis invariants), mirroring how the
reference isolates it behind ``applyNMS``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

from video_stream_processing_spark.functions.coco import COCO_CLASSES

CONF_THRESHOLD = 0.5  # yolo.confidence.threshold (application.properties:31)
NMS_IOU_THRESHOLD = 0.45  # YOLODetector.java:58

BBOX_SCHEMA = StructType(
    [
        StructField("x1", FloatType()),
        StructField("y1", FloatType()),
        StructField("x2", FloatType()),
        StructField("y2", FloatType()),
    ]
)

DETECTION_SCHEMA = StructType(
    [
        StructField("object_class", StringType()),
        StructField("confidence", FloatType()),
        StructField("bbox", BBOX_SCHEMA),
    ]
)

DETECTIONS_TYPE = ArrayType(DETECTION_SCHEMA)

# --------------------------------------------------------------------------
# Stub detector: deterministic, SQL-expressible linear scorer.
#
# For anchor j in 0..N_ANCHORS-1 over a D-dim embedding e (cast double):
#   logit_j = sum_i e[i] * (((i + 3*j) % 7) - 3) / 10
#   conf_j  = sigmoid(logit_j);  keep iff conf_j > 0.5  (<=> logit_j > 0)
#   class_j = COCO_CLASSES[(8*j + 1) % 80]
#   bbox_j  = (17j % 320, 29j % 320, +64+j, +48+j)   [deterministic]
# --------------------------------------------------------------------------

N_ANCHORS = 10


def _stub_weights(dim: int) -> np.ndarray:
    i = np.arange(dim)[:, None]
    j = np.arange(N_ANCHORS)[None, :]
    return (((i + 3 * j) % 7) - 3) / 10.0  # (dim, N_ANCHORS)


def stub_anchor_class(j: int) -> str:
    return COCO_CLASSES[(8 * j + 1) % 80]


def stub_anchor_bbox(j: int) -> tuple[float, float, float, float]:
    x1 = float((17 * j) % 320)
    y1 = float((29 * j) % 320)
    return (x1, y1, x1 + 64.0 + j, y1 + 48.0 + j)


class StubDetector:
    """Deterministic detector over embedding vectors (image stand-in)."""

    def __init__(self, conf_threshold: float = CONF_THRESHOLD):
        self.conf_threshold = conf_threshold

    def detect_batch(self, embeddings: pd.Series) -> pd.Series:
        out = []
        for emb in embeddings:
            if emb is None or len(emb) == 0:
                out.append([])
                continue
            e = np.asarray(emb, dtype=np.float64)
            w = _stub_weights(len(e))
            # Sequential-order accumulation (matches list_sum in the
            # DuckDB oracle bit-for-bit closer than pairwise np.dot).
            logits = np.add.reduce(e[:, None] * w, axis=0)
            dets = []
            for j in range(N_ANCHORS):
                conf = 1.0 / (1.0 + math.exp(-logits[j]))
                if conf > self.conf_threshold:
                    x1, y1, x2, y2 = stub_anchor_bbox(j)
                    dets.append(
                        {
                            "object_class": stub_anchor_class(j),
                            "confidence": float(round(conf, 4)),
                            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
                        }
                    )
            out.append(dets)
        return pd.Series(out, dtype=object)


class OnnxDetector:
    """Real YOLOv8 ONNX path. The tensor math (preprocess resize/CHW/255,
    postprocess argmax/threshold/rescale/clamp + NMS) is fully implemented
    in pure numpy (operators/yolo.py, matching YOLODetector.java:234-287
    and ImageUtils.java:41-74). ``backend="numpy"`` executes the .onnx
    graph itself with the engine's dependency-free executor
    (operators/onnx_numpy.py over functions/onnxproto.py), so the full
    decode -> preprocess -> graph -> postprocess -> NMS chain runs a REAL
    model file in this container; ``backend="ort"`` (default) uses
    onnxruntime when installed, with the reference's session options
    mirrored: 2 intra-op threads, basic graph opt
    (YOLODetector.java:71-75).

    ``session`` and ``decoder`` are injectable: tests drive the complete
    detect_batch chain with a fake session emitting hand-built [1,84,N]
    tensors. ``decoder`` returns an (H, W, 3) uint8 BGR array or None;
    undecodable frames yield an empty detection list
    (YOLODetector.java:115-118). The default decoder is the dependency-
    free numpy codec (functions/imagecodec.py: BMP/PPM native, Pillow
    only as an optional fallback for JPEG/PNG) so real binary frames run
    through the full chain in this container.
    """

    def __init__(
        self,
        model_path: str | None = None,
        session=None,
        decoder=None,
        conf_threshold: float = CONF_THRESHOLD,
        iou_threshold: float = NMS_IOU_THRESHOLD,
        input_name: str = "images",  # YOLODetector.java:137
        backend: str = "ort",  # "ort" | "numpy"
    ):
        if session is None and backend == "numpy":
            # dependency-free executor (operators/onnx_numpy.py) over the
            # engine's own ONNX protobuf layer — the same run() contract
            from video_stream_processing_spark.operators.onnx_numpy import (
                NumpyGraphSession,
            )

            session = NumpyGraphSession(model_path)
        if session is None:  # pragma: no cover - onnxruntime not installed here
            try:
                import onnxruntime as ort
            except ImportError as e:
                raise NotImplementedError(
                    "onnxruntime is not available in this environment; use "
                    "backend='numpy' (operators/onnx_numpy.py), inject a "
                    "session= (tests), or use StubDetector (SURVEY.md §5.2)"
                ) from e
            opts = ort.SessionOptions()
            opts.intra_op_num_threads = 2
            opts.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_BASIC
            session = ort.InferenceSession(model_path, opts)
        from video_stream_processing_spark.functions.imagecodec import decode_image_bgr

        self.session = session
        self.decoder = decoder if decoder is not None else decode_image_bgr
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self.input_name = input_name

    def detect_batch(self, images: pd.Series) -> pd.Series:
        """bytes -> ARRAY<STRUCT> detections, one list per image — the
        engine analog of YOLODetector.detect(byte[]) (:92-175)."""
        from video_stream_processing_spark.operators import yolo

        out = []
        for blob in images:
            img = self.decoder(blob) if blob is not None else None
            if img is None or img.size == 0:
                out.append([])  # decode failure -> empty (YOLODetector.java:115-118)
                continue
            oh, ow = img.shape[:2]
            tensor = self.session.run(None, {self.input_name: yolo.preprocess(img)})[0]
            out.append(
                yolo.detect_from_output(tensor, ow, oh, self.conf_threshold, self.iou_threshold)
            )
        return pd.Series(out, dtype=object)


def stub_detect_udf(conf_threshold: float = CONF_THRESHOLD):
    """Arrow-batched pandas UDF: embedding ARRAY<FLOAT> -> detections.

    One detector instance per Python worker (the reference builds one
    YOLODetector per subtask in open(), VideoProcessFunction.java:60-66);
    batches flow JVM->Arrow->numpy with zero per-row overhead.
    """
    detector = StubDetector(conf_threshold)

    @F.pandas_udf(DETECTIONS_TYPE)
    def detect(embeddings: pd.Series) -> pd.Series:
        return detector.detect_batch(embeddings)

    return detect


def stub_detector_oracle_fragment() -> str:
    """DuckDB SQL computing the same (vec_id, j, conf) the stub emits.

    DuckDB list lambdas index from 1 -> (i-1) matches numpy's 0-base.
    """
    return f"""
SELECT vec_id, j,
       1.0 / (1.0 + exp(-(list_sum(list_transform(embedding,
           (x, i) -> CAST(x AS DOUBLE) * ((((i - 1) + 3 * j) % 7) - 3) / 10.0))))) AS conf
FROM embeddings
CROSS JOIN (SELECT unnest(range({N_ANCHORS})) AS j) anchors
"""


# --------------------------------------------------------------------------
# NMS — greedy per-class suppression, exactly the reference algorithm:
# sort by confidence desc; accept a box iff IoU with every previously
# accepted SAME-CLASS box <= threshold (YOLODetector.java:289-322).
# --------------------------------------------------------------------------


def nms_py(dets: list[dict], iou_threshold: float = NMS_IOU_THRESHOLD) -> list[dict]:
    """Pure-Python/numpy greedy NMS on one frame's detection list.

    Kept Spark-free so hypothesis property tests run without a session.
    Ties on confidence keep input order (Java's stable List.sort,
    YOLODetector.java:294).
    """
    if not dets:
        return []
    order = sorted(range(len(dets)), key=lambda k: -float(dets[k]["confidence"]))
    boxes = np.array(
        [
            [
                dets[k]["bbox"]["x1"],
                dets[k]["bbox"]["y1"],
                dets[k]["bbox"]["x2"],
                dets[k]["bbox"]["y2"],
            ]
            for k in order
        ],
        dtype=np.float64,
    )
    classes = [dets[k]["object_class"] for k in order]
    kept_idx: list[int] = []
    for i in range(len(order)):
        suppressed = False
        for kept in kept_idx:
            if classes[kept] != classes[i]:
                continue  # per-class guard (YOLODetector.java:310-312)
            if _iou(boxes[kept], boxes[i]) > iou_threshold:
                suppressed = True
                break
        if not suppressed:
            kept_idx.append(i)
    return [dets[order[i]] for i in kept_idx]


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU per YOLODetector.calculateIOU (:324-336): intersection /
    (areaA + areaB - intersection); degenerate boxes -> area 0."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    denom = area_a + area_b - inter
    return float(inter / denom) if denom > 0 else 0.0


def nms_udf(iou_threshold: float = NMS_IOU_THRESHOLD):
    """Standalone array-UDF ``nms(ARRAY<STRUCT>) -> ARRAY<STRUCT>``."""

    @F.pandas_udf(DETECTIONS_TYPE)
    def nms(det_col: pd.Series) -> pd.Series:
        return pd.Series(
            [nms_py(list(d) if d is not None else [], iou_threshold) for d in det_col],
            dtype=object,
        )

    return nms
