"""YOLO pre/postprocess numerics vs hand-computed expectations.

Spark-free: the numerics (operators/yolo.py) mirror the reference's
tensor math (YOLODetector.java:234-287 postprocess, ImageUtils.java:41-74
preprocess) and must be assertable on hand-built [1,84,N] outputs with no
onnxruntime/cv2 in the container.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from video_stream_processing_spark.functions.coco import COCO_CLASSES
from video_stream_processing_spark.operators import yolo


def _tensor(candidates: list[dict], n_extra: int = 0) -> np.ndarray:
    """Build a [1, 84, N] head output from candidate specs
    {cx, cy, w, h, scores: {class_idx: score}}; extra columns are
    all-zero (dropped by the confidence threshold)."""
    n = len(candidates) + n_extra
    out = np.zeros((1, 84, n), dtype=np.float32)
    for i, c in enumerate(candidates):
        out[0, 0, i] = c["cx"]
        out[0, 1, i] = c["cy"]
        out[0, 2, i] = c["w"]
        out[0, 3, i] = c["h"]
        for cls_idx, score in c["scores"].items():
            out[0, 4 + cls_idx, i] = score
    return out


def test_postprocess_hand_built_tensor():
    # original 1280x960 -> scale_x = 2.0, scale_y = 1.5
    tensor = _tensor(
        [
            # kept: plain box, class 2, conf 0.9
            {"cx": 320, "cy": 320, "w": 100, "h": 80, "scores": {2: 0.9}},
            # dropped: below threshold
            {"cx": 320, "cy": 320, "w": 100, "h": 80, "scores": {0: 0.4}},
            # dropped: degenerate after rescale (w=0 -> x2 == x1)
            {"cx": 320, "cy": 320, "w": 0, "h": 80, "scores": {1: 0.9}},
            # kept: out-of-frame corners clamp to 0
            {"cx": 10, "cy": 10, "w": 100, "h": 100, "scores": {7: 0.8}},
            # kept: conf exactly == threshold passes (Java drops only on <)
            {"cx": 100, "cy": 100, "w": 10, "h": 10, "scores": {3: 0.5}},
            # kept: score tie -> FIRST class index wins (strictly-greater update)
            {"cx": 200, "cy": 200, "w": 20, "h": 20, "scores": {5: 0.8, 9: 0.8}},
        ],
        n_extra=10,
    )
    dets = yolo.postprocess(tensor, original_width=1280, original_height=960)
    assert [d["object_class"] for d in dets] == [
        COCO_CLASSES[2],
        COCO_CLASSES[7],
        COCO_CLASSES[3],
        COCO_CLASSES[5],
    ]
    d0 = dets[0]
    assert d0["confidence"] == pytest.approx(0.9, abs=1e-6)
    assert d0["bbox"] == {
        "x1": pytest.approx(540.0),
        "y1": pytest.approx(420.0),
        "x2": pytest.approx(740.0),
        "y2": pytest.approx(540.0),
    }
    d1 = dets[1]  # (10,10,100,100): x1=(10-50)*2 -> clamp 0; y1=(10-50)*1.5 -> 0
    assert d1["bbox"] == {
        "x1": 0.0,
        "y1": 0.0,
        "x2": pytest.approx(120.0),
        "y2": pytest.approx(90.0),
    }
    assert dets[2]["confidence"] == pytest.approx(0.5)


def test_postprocess_invalid_output_guard():
    assert yolo.postprocess(np.zeros((1, 10, 5), np.float32), 640, 640) == []
    assert yolo.postprocess(np.zeros((84,), np.float32), 640, 640) == []


def test_postprocess_clamps_to_original_dims():
    t = _tensor([{"cx": 620, "cy": 620, "w": 100, "h": 100, "scores": {0: 0.9}}])
    (d,) = yolo.postprocess(t, original_width=320, original_height=320)
    assert d["bbox"]["x2"] == 320.0 and d["bbox"]["y2"] == 320.0


def test_detect_from_output_applies_per_class_nms():
    # two heavily-overlapping same-class boxes + one other-class box
    t = _tensor(
        [
            {"cx": 320, "cy": 320, "w": 100, "h": 100, "scores": {2: 0.7}},
            {"cx": 322, "cy": 322, "w": 100, "h": 100, "scores": {2: 0.95}},
            {"cx": 321, "cy": 321, "w": 100, "h": 100, "scores": {4: 0.6}},
        ]
    )
    dets = yolo.detect_from_output(t, 640, 640)
    # higher-confidence same-class box wins; other class untouched
    assert sorted((d["object_class"], round(d["confidence"], 2)) for d in dets) == sorted(
        [(COCO_CLASSES[2], 0.95), (COCO_CLASSES[4], 0.6)]
    )


def test_resize_bilinear_half_pixel_centers():
    img = np.array([[0, 100], [50, 150]], dtype=np.uint8)
    out = yolo.resize_bilinear(img, 4, 4)
    assert out.shape == (4, 4) and out.dtype == np.uint8
    # corners replicate (sampling clamps outside the source grid)
    assert out[0, 0] == 0 and out[0, 3] == 100 and out[3, 0] == 50 and out[3, 3] == 150
    # interior (1,1): src y=x=0.25 -> 0.75/0.25 blend = 37.5 -> rounds to 38
    assert out[1, 1] == 38


def test_preprocess_layout_and_normalization():
    # uniform B=10, G=20, R=30 image: after BGR->RGB + CHW, channel 0 is
    # R/255 everywhere, channel 2 is B/255
    img = np.zeros((48, 64, 3), dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 10, 20, 30
    x = yolo.preprocess(img)
    assert x.shape == (1, 3, 640, 640) and x.dtype == np.float32
    assert np.allclose(x[0, 0], np.float32(30) / 255)
    assert np.allclose(x[0, 1], np.float32(20) / 255)
    assert np.allclose(x[0, 2], np.float32(10) / 255)


class _FakeSession:
    """Stands in for ort.InferenceSession: shape-checks the preprocessed
    input, returns a fixed hand-built tensor."""

    def __init__(self, tensor: np.ndarray):
        self.tensor = tensor
        self.seen_inputs: list[np.ndarray] = []

    def run(self, _out_names, feeds):
        x = feeds["images"]
        assert x.shape == (1, 3, 640, 640) and x.dtype == np.float32
        self.seen_inputs.append(x)
        return [self.tensor]


def test_onnx_detector_chain_with_fake_session():
    from video_stream_processing_spark.operators.detection import OnnxDetector

    tensor = _tensor(
        [
            {"cx": 320, "cy": 320, "w": 100, "h": 100, "scores": {2: 0.7}},
            {"cx": 322, "cy": 322, "w": 100, "h": 100, "scores": {2: 0.95}},
        ]
    )
    session = _FakeSession(tensor)

    def fake_decode(blob: bytes):
        if blob == b"bad":
            return None  # undecodable frame
        return np.full((480, 640, 3), 128, dtype=np.uint8)

    det = OnnxDetector(session=session, decoder=fake_decode)
    out = det.detect_batch(pd.Series([b"img-a", b"bad", None, b"img-b"]))
    assert list(out.map(len)) == [1, 0, 0, 1]  # NMS collapsed the overlap
    assert out[0] == yolo.detect_from_output(tensor, 640, 480)
    assert out[0][0]["object_class"] == COCO_CLASSES[2]
    assert out[0][0]["confidence"] == pytest.approx(0.95, abs=1e-6)
    assert len(session.seen_inputs) == 2  # undecodable/None frames never hit the session


def test_onnx_detector_session_construction_import_gated():
    from video_stream_processing_spark.operators.detection import OnnxDetector

    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        OnnxDetector(model_path="/nonexistent/model.onnx")
