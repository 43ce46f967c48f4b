"""NMS invariants (SURVEY.md §5.2) — property-based, Spark-free.

Greedy per-class NMS contract mirrored from the reference
(YOLODetector.applyNMS/calculateIOU,
/root/reference/src/main/java/com/video/streaming/processor/YOLODetector.java:289-336):
  1. output is a subset of the input (identity-preserving);
  2. no surviving same-class pair has IoU > threshold;
  3. greedy: the highest-confidence box of every class always survives;
  4. different classes never suppress each other.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from video_stream_processing_spark.operators.detection import (
    NMS_IOU_THRESHOLD,
    _iou,
    nms_py,
)


def _det(cls: str, conf: float, x1: float, y1: float, w: float, h: float) -> dict:
    return {
        "object_class": cls,
        "confidence": conf,
        "bbox": {"x1": x1, "y1": y1, "x2": x1 + w, "y2": y1 + h},
    }


dets_strategy = st.lists(
    st.builds(
        _det,
        st.sampled_from(["person", "car", "dog"]),
        st.floats(0.01, 1.0, allow_nan=False),
        st.floats(0.0, 200.0, allow_nan=False),
        st.floats(0.0, 200.0, allow_nan=False),
        st.floats(1.0, 100.0, allow_nan=False),
        st.floats(1.0, 100.0, allow_nan=False),
    ),
    max_size=24,
)


def _box(d: dict) -> list[float]:
    b = d["bbox"]
    return [b["x1"], b["y1"], b["x2"], b["y2"]]


@settings(max_examples=200, deadline=None)
@given(dets_strategy)
def test_output_subset_of_input(dets):
    out = nms_py(dets)
    for d in out:
        assert d in dets


@settings(max_examples=200, deadline=None)
@given(dets_strategy)
def test_no_same_class_overlap_survives(dets):
    import numpy as np

    out = nms_py(dets)
    for i, a in enumerate(out):
        for b in out[i + 1 :]:
            if a["object_class"] == b["object_class"]:
                assert (
                    _iou(np.array(_box(a)), np.array(_box(b))) <= NMS_IOU_THRESHOLD + 1e-9
                )


@settings(max_examples=200, deadline=None)
@given(dets_strategy)
def test_per_class_max_survives(dets):
    out = nms_py(dets)
    by_class: dict[str, float] = {}
    for d in dets:
        c = d["object_class"]
        by_class[c] = max(by_class.get(c, -math.inf), d["confidence"])
    surviving = {d["object_class"]: True for d in out}
    for c, _ in by_class.items():
        # every class present in the input keeps at least its top box
        assert c in surviving


def test_identical_boxes_suppressed():
    a = _det("car", 0.9, 10, 10, 50, 50)
    b = _det("car", 0.8, 10, 10, 50, 50)
    assert nms_py([b, a]) == [a]


def test_different_class_not_suppressed():
    a = _det("car", 0.9, 10, 10, 50, 50)
    b = _det("dog", 0.8, 10, 10, 50, 50)
    assert nms_py([b, a]) == [a, b]


def test_disjoint_boxes_all_kept():
    a = _det("car", 0.9, 0, 0, 10, 10)
    b = _det("car", 0.8, 100, 100, 10, 10)
    assert len(nms_py([a, b])) == 2


def test_empty_and_none():
    assert nms_py([]) == []


def test_iou_degenerate_box_zero():
    import numpy as np

    assert _iou(np.array([0, 0, 0, 0]), np.array([0, 0, 10, 10])) == 0.0


def test_chain_suppression_is_greedy():
    # a(0.9) suppresses b(0.8); c(0.7) overlaps b but NOT a -> c survives
    # because greedy only checks against *accepted* boxes.
    # 20x20 boxes: shift 4 -> IoU 0.667 (suppress); shift 8 -> IoU 0.429 (keep)
    a = _det("car", 0.9, 0, 0, 20, 20)
    b = _det("car", 0.8, 4, 0, 20, 20)
    c = _det("car", 0.7, 8, 0, 20, 20)
    out = nms_py([a, b, c])
    assert a in out and c in out and b not in out
