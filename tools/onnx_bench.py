#!/usr/bin/env python
"""Measure the numpy ONNX executor's per-image latency on both fixture
models — the ms/image note behind COVERAGE.md's u04 entry (VERDICT r8
task 1 asked for the number at true 8400-candidate scale).

Usage: python tools/onnx_bench.py [reps]
Prints one JSON line: median end-to-end (preprocess -> graph ->
postprocess -> NMS) and graph-only ms/image for make_tiny_detector
(1600 candidates) and make_yolov8n_skeleton (8400 candidates).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_stream_processing_spark.operators import yolo
from video_stream_processing_spark.operators.onnx_numpy import (
    NumpyGraphSession,
    make_tiny_detector,
    make_yolov8n_skeleton,
)


def _gradient_bgr(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)


def measure(reps: int = 5) -> dict:
    img = _gradient_bgr(96, 128)
    out = {}
    for name, maker, cands in (
        ("tiny", make_tiny_detector, 1600),
        ("yolov8n_skeleton", make_yolov8n_skeleton, 8400),
    ):
        sess = NumpyGraphSession(maker())
        x = yolo.preprocess(img)
        sess.run(None, {"images": x})  # warm-up
        graph_ms, e2e_ms, n_det = [], [], 0
        for _ in range(reps):
            t0 = time.perf_counter()
            raw = sess.run(None, {"images": x})[0]
            graph_ms.append((time.perf_counter() - t0) * 1000)
            t0 = time.perf_counter()
            yolo.preprocess(img)
            raw = sess.run(None, {"images": x})[0]
            dets = yolo.detect_from_output(raw, 128, 96)
            e2e_ms.append((time.perf_counter() - t0) * 1000)
            n_det = len(dets)
        out[name] = {
            "candidates": cands,
            "graph_ms_median": round(statistics.median(graph_ms), 1),
            "e2e_ms_median": round(statistics.median(e2e_ms), 1),
            "n_detections": n_det,
        }
    return out


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(json.dumps({"metric": "onnx_ms_per_image", **measure(reps)}))
