"""YOLOv8 pre/postprocess numerics in pure numpy — the executable analog
of the reference's tensor math, unit-testable without onnxruntime/cv2:

- preprocess  = ImageUtils.matToFloatArray + the resize at
  YOLODetector.detectInternal (/root/reference/src/main/java/com/video/
  streaming/util/ImageUtils.java:41-74, processor/YOLODetector.java:122-124):
  resize to 640x640 (bilinear, half-pixel centers = OpenCV INTER_LINEAR
  geometry), BGR->RGB, HWC->CHW, /255 normalize, float32.
- postprocess = YOLODetector.postProcess (processor/YOLODetector.java:234-287):
  per-candidate class argmax over rows 4..83 (first-max-wins, exactly the
  Java loop that updates only on strictly-greater), drop when
  maxConfidence < threshold (equal PASSES — the Java test is `<`),
  cxcywh -> xyxy scaled by (origW/640, origH/640), clamp to [0, orig],
  drop degenerate (x2 <= x1 or y2 <= y1), candidates kept in input order.
- detect_from_output = postprocess + greedy per-class NMS
  (detection.nms_py), i.e. the tail of YOLODetector.detect().

Everything here is (N-candidate)-vectorized numpy in float32 so the
arithmetic matches the Java float math; only ``ort.InferenceSession``
construction remains import-gated (operators/detection.OnnxDetector).
"""

from __future__ import annotations

import numpy as np

from video_stream_processing_spark.functions.coco import COCO_CLASSES
from video_stream_processing_spark.operators.detection import (
    CONF_THRESHOLD,
    NMS_IOU_THRESHOLD,
    nms_py,
)

INPUT_WIDTH = 640  # YOLODetector.java:29-30
INPUT_HEIGHT = 640


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with half-pixel-center sampling (OpenCV
    INTER_LINEAR geometry: src = (dst + 0.5) * scale - 0.5, coordinates
    clamped at the borders). uint8 in -> uint8 out (rounded), matching
    the uint8 Mat the reference resizes into."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img.copy()
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    f = img.astype(np.float64)
    if f.ndim == 2:
        f = f[:, :, None]
    top = f[y0c][:, x0c] * (1.0 - wx) + f[y0c][:, x1c] * wx
    bot = f[y1c][:, x0c] * (1.0 - wx) + f[y1c][:, x1c] * wx
    out = top * (1.0 - wy) + bot * wy
    if img.ndim == 2:
        out = out[:, :, 0]
    if np.issubdtype(img.dtype, np.integer):
        return np.rint(out).clip(0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def preprocess(img_bgr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 BGR image -> (1, 3, 640, 640) float32 CHW in
    [0, 1]: resize, BGR->RGB channel flip, HWC->CHW transpose, /255
    (ImageUtils.java:45-67; channel c outer, row h, col w inner — exactly
    ``transpose(2, 0, 1)`` of the RGB image)."""
    resized = resize_bilinear(img_bgr, INPUT_HEIGHT, INPUT_WIDTH)
    rgb = resized[:, :, ::-1]
    chw = rgb.transpose(2, 0, 1).astype(np.float32) / np.float32(255.0)
    return chw[None, :, :, :]


def postprocess(
    output: np.ndarray,
    original_width: int,
    original_height: int,
    conf_threshold: float = CONF_THRESHOLD,
) -> list[dict]:
    """[1,84,N] or [84,N] raw YOLOv8 head output -> detections (pre-NMS),
    bit-matching YOLODetector.postProcess (:234-287). Returns the kept
    candidates in input (column) order as DETECTION_SCHEMA-shaped dicts."""
    out = np.asarray(output, dtype=np.float32)
    if out.ndim == 3:
        out = out[0]
    if out.ndim != 2 or out.shape[0] < 84:  # "Invalid output data" guard (:238)
        return []

    cx, cy, w, h = out[0], out[1], out[2], out[3]
    cls_scores = out[4:84]  # 80 COCO classes
    # Java scans j=4..83 updating only on strictly-greater -> first max
    # wins; np.argmax has identical first-occurrence semantics.
    max_idx = np.argmax(cls_scores, axis=0)
    max_conf = cls_scores[max_idx, np.arange(out.shape[1])]

    scale_x = np.float32(original_width) / np.float32(INPUT_WIDTH)
    scale_y = np.float32(original_height) / np.float32(INPUT_HEIGHT)
    half_w = w / np.float32(2.0)
    half_h = h / np.float32(2.0)
    x1 = np.clip((cx - half_w) * scale_x, 0, original_width)
    y1 = np.clip((cy - half_h) * scale_y, 0, original_height)
    x2 = np.clip((cx + half_w) * scale_x, 0, original_width)
    y2 = np.clip((cy + half_h) * scale_y, 0, original_height)

    keep = (max_conf >= conf_threshold) & (x2 > x1) & (y2 > y1)
    return [
        {
            "object_class": COCO_CLASSES[int(max_idx[i])],
            "confidence": float(max_conf[i]),
            "bbox": {
                "x1": float(x1[i]),
                "y1": float(y1[i]),
                "x2": float(x2[i]),
                "y2": float(y2[i]),
            },
        }
        for i in np.flatnonzero(keep)
    ]


def detect_from_output(
    output: np.ndarray,
    original_width: int,
    original_height: int,
    conf_threshold: float = CONF_THRESHOLD,
    iou_threshold: float = NMS_IOU_THRESHOLD,
) -> list[dict]:
    """postprocess + greedy per-class NMS — the tail of
    YOLODetector.detect() (:170, :287)."""
    return nms_py(
        postprocess(output, original_width, original_height, conf_threshold),
        iou_threshold,
    )
