"""Numpy ONNX executor (operators/onnx_numpy.py over functions/onnxproto.py).

Covers:
- byte-for-byte determinism of the generated fixture model (sha256-pinned;
  serializer writes fields in ascending field-number order),
- each op kernel against a naive/hand-computed reference,
- the corrupt-protobuf hardening (truncated buffers, wire-type mismatch,
  raw_data length validation, writable tensors),
- the full reference chain on a REAL model file: decode -> preprocess ->
  NumpyGraphSession.run -> postprocess -> NMS via
  OnnxDetector(backend="numpy") — YOLODetector.java:92-175 without
  onnxruntime and without a fake session.

All Spark-free (pure numpy), mirroring how the reference isolates the
detector from the stream job.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from video_stream_processing_spark.functions import onnxproto as oproto
from video_stream_processing_spark.functions.imagecodec import encode_bmp
from video_stream_processing_spark.functions.onnxproto import (
    AttributeProto,
    NodeProto,
    TensorProto,
    numpy_to_tensor,
    tensor_to_numpy,
)
from video_stream_processing_spark.operators import yolo
from video_stream_processing_spark.operators.onnx_numpy import (
    NumpyGraphSession,
    _OPS,
    make_tiny_detector,
)

# Pinned fixture bytes: PCG64(seed=7) weights + deterministic serializer.
# Any change to the generator or the wire writer must update this hash
# consciously.
FIXTURE_SHA256 = "e4b9901d999419d76e8e0fb1e4d497aaee2491cfbfcc47c3bb44fb0807188e91"


def _node(op_type: str, inputs, outputs, **attrs) -> NodeProto:
    alist = []
    for k, v in attrs.items():
        if isinstance(v, int):
            alist.append(AttributeProto.make_int(k, v))
        elif isinstance(v, float):
            alist.append(AttributeProto.make_float(k, v))
        elif isinstance(v, str):
            alist.append(AttributeProto.make_string(k, v))
        else:
            alist.append(AttributeProto.make_ints(k, list(v)))
    return NodeProto(op_type=op_type, input=list(inputs), output=list(outputs), attribute=alist)


def _run_op(op_type: str, inputs, **attrs):
    node = _node(op_type, [f"i{k}" for k in range(len(inputs))], ["out"], **attrs)
    return _OPS[op_type](node, list(inputs))


# --------------------------------------------------------------------------
# fixture determinism
# --------------------------------------------------------------------------


def test_fixture_model_bytes_pinned():
    b1 = make_tiny_detector().serialize()
    b2 = make_tiny_detector().serialize()
    assert b1 == b2
    assert hashlib.sha256(b1).hexdigest() == FIXTURE_SHA256


def test_fixture_model_parse_roundtrip():
    b1 = make_tiny_detector().serialize()
    assert oproto.ModelProto.parse(b1).serialize() == b1


# --------------------------------------------------------------------------
# op kernels vs naive references
# --------------------------------------------------------------------------


def _naive_conv(X, W, B, strides, pads, dilations, group):
    N, C, H, Wd = X.shape
    M, _, kH, kW = W.shape
    sH, sW = strides
    dH, dW = dilations
    Xp = np.pad(X, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])))
    Hp, Wp = Xp.shape[2:]
    oH = (Hp - ((kH - 1) * dH + 1)) // sH + 1
    oW = (Wp - ((kW - 1) * dW + 1)) // sW + 1
    out = np.zeros((N, M, oH, oW), dtype=np.float64)
    cg = C // group
    mg = M // group
    for n in range(N):
        for m in range(M):
            g = m // mg
            for y in range(oH):
                for x in range(oW):
                    acc = 0.0
                    for c in range(cg):
                        for i in range(kH):
                            for j in range(kW):
                                acc += (
                                    Xp[n, g * cg + c, y * sH + i * dH, x * sW + j * dW]
                                    * W[m, c, i, j]
                                )
                    out[n, m, y, x] = acc + (B[m] if B is not None else 0.0)
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "strides,pads,dilations,group",
    [
        ([1, 1], [0, 0, 0, 0], [1, 1], 1),
        ([2, 2], [1, 1, 1, 1], [1, 1], 1),
        ([1, 2], [0, 1, 0, 1], [2, 1], 1),
        ([1, 1], [1, 1, 1, 1], [1, 1], 2),
    ],
)
def test_conv_matches_naive(strides, pads, dilations, group):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((2, 4, 7, 6)).astype(np.float32)
    W = rng.standard_normal((6, 4 // group, 3, 3)).astype(np.float32)
    B = rng.standard_normal(6).astype(np.float32)
    (got,) = _run_op(
        "Conv", [X, W, B],
        kernel_shape=[3, 3], strides=strides, pads=pads,
        dilations=dilations, group=group,
    )
    want = _naive_conv(X, W, B, strides, pads, dilations, group)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_maxpool_matches_naive():
    rng = np.random.default_rng(12)
    X = rng.standard_normal((1, 3, 9, 8)).astype(np.float32)
    (got,) = _run_op("MaxPool", [X], kernel_shape=[3, 2], strides=[2, 2], pads=[1, 0, 1, 0])
    Xp = np.pad(X, ((0, 0), (0, 0), (1, 1), (0, 0)), constant_values=-np.inf)
    oH = (Xp.shape[2] - 3) // 2 + 1
    oW = (Xp.shape[3] - 2) // 2 + 1
    want = np.empty((1, 3, oH, oW), dtype=np.float32)
    for y in range(oH):
        for x in range(oW):
            want[:, :, y, x] = Xp[:, :, 2 * y : 2 * y + 3, 2 * x : 2 * x + 2].max(axis=(2, 3))
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_x2_is_repeat():
    rng = np.random.default_rng(13)
    X = rng.standard_normal((1, 2, 5, 4)).astype(np.float32)
    (got,) = _run_op(
        "Resize", [X, None, np.array([1, 1, 2, 2], dtype=np.float32)],
        mode="nearest", coordinate_transformation_mode="asymmetric", nearest_mode="floor",
    )
    want = np.repeat(np.repeat(X, 2, axis=2), 2, axis=3)
    np.testing.assert_array_equal(got, want)


def test_resize_rejects_unsupported_modes():
    X = np.zeros((1, 1, 2, 2), dtype=np.float32)
    with pytest.raises(NotImplementedError):
        _run_op(
            "Resize", [X, None, np.array([1, 1, 2, 2], dtype=np.float32)],
            mode="linear", coordinate_transformation_mode="asymmetric", nearest_mode="floor",
        )


def test_elementwise_and_shape_ops():
    rng = np.random.default_rng(14)
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((1, 3, 1)).astype(np.float32)
    np.testing.assert_array_equal(_run_op("Add", [a, b])[0], a + b)
    np.testing.assert_array_equal(_run_op("Sub", [a, b])[0], a - b)
    np.testing.assert_array_equal(_run_op("Mul", [a, b])[0], a * b)
    np.testing.assert_array_equal(_run_op("Div", [a, b])[0], a / b)
    np.testing.assert_array_equal(_run_op("Relu", [a])[0], np.maximum(a, 0))
    np.testing.assert_allclose(
        _run_op("Sigmoid", [a])[0], 1.0 / (1.0 + np.exp(-a.astype(np.float64))), rtol=1e-6
    )
    np.testing.assert_array_equal(
        _run_op("Transpose", [a], perm=[2, 0, 1])[0], a.transpose(2, 0, 1)
    )
    np.testing.assert_array_equal(
        _run_op("Reshape", [a, np.array([0, -1], dtype=np.int64)])[0], a.reshape(2, 12)
    )
    np.testing.assert_array_equal(
        _run_op("Concat", [a, a], axis=2)[0], np.concatenate([a, a], axis=2)
    )


def test_sigmoid_extreme_inputs_no_overflow():
    x = np.array([-1e4, -88.0, 0.0, 88.0, 1e4], dtype=np.float32)
    got = _run_op("Sigmoid", [x])[0]
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)
    assert got.dtype == np.float32


def test_split_slice_softmax_matmul_gemm():
    rng = np.random.default_rng(15)
    X = rng.standard_normal((1, 10, 3)).astype(np.float32)
    node = _node("Split", ["x", "s"], ["a", "b"], axis=1)
    p1, p2 = _OPS["Split"](node, [X, np.array([4, 6], dtype=np.int64)])
    np.testing.assert_array_equal(p1, X[:, :4])
    np.testing.assert_array_equal(p2, X[:, 4:])
    # equal split from output count, no split input
    node2 = _node("Split", ["x"], ["a", "b"], axis=1)
    q1, q2 = _OPS["Split"](node2, [X])
    np.testing.assert_array_equal(q1, X[:, :5])
    np.testing.assert_array_equal(q2, X[:, 5:])

    (sl,) = _run_op(
        "Slice",
        [X, np.array([1], dtype=np.int64), np.array([7], dtype=np.int64),
         np.array([1], dtype=np.int64), np.array([2], dtype=np.int64)],
    )
    np.testing.assert_array_equal(sl, X[:, 1:7:2])

    (sm,) = _run_op("Softmax", [X], axis=1)
    e = np.exp(X - X.max(axis=1, keepdims=True))
    np.testing.assert_allclose(sm, e / e.sum(axis=1, keepdims=True), rtol=1e-6)

    A = rng.standard_normal((3, 4)).astype(np.float32)
    B = rng.standard_normal((4, 5)).astype(np.float32)
    C = rng.standard_normal((3, 5)).astype(np.float32)
    np.testing.assert_allclose(_run_op("MatMul", [A, B])[0], A @ B, rtol=1e-6)
    np.testing.assert_allclose(
        _run_op("Gemm", [A.T, B, C], alpha=2.0, beta=0.5, transA=1)[0],
        np.float32(2.0) * (A @ B) + np.float32(0.5) * C,
        rtol=1e-5,
    )


def test_constant_node():
    t = numpy_to_tensor("c", np.arange(6, dtype=np.float32).reshape(2, 3))
    node = NodeProto(
        op_type="Constant", output=["out"],
        attribute=[AttributeProto(name="value", type=oproto.AT_TENSOR, t=t)],
    )
    np.testing.assert_array_equal(
        _OPS["Constant"](node, [])[0], np.arange(6, dtype=np.float32).reshape(2, 3)
    )


# --------------------------------------------------------------------------
# hardening (ADVICE r7): corrupt buffers fail loudly, tensors validate
# --------------------------------------------------------------------------


def test_truncated_length_delimited_raises():
    good = make_tiny_detector().serialize()
    with pytest.raises(ValueError, match="overruns"):
        oproto.ModelProto.parse(good[: len(good) // 2])


def test_wrong_wire_type_for_float_attr_raises():
    # AttributeProto.f (field 2) encoded as varint (wire 0) instead of fixed32
    bad = bytearray()
    oproto._emit_len(bad, 1, b"alpha")
    oproto._emit_tag(bad, 2, 0)
    oproto._write_varint(bad, 42)
    with pytest.raises(ValueError, match="wire type"):
        AttributeProto.parse(bytes(bad))


def test_tensor_raw_data_length_validated():
    t = TensorProto(name="w", data_type=oproto.DT_FLOAT, dims=[2, 3], raw_data=b"\x00" * 8)
    with pytest.raises(ValueError, match="raw_data"):
        tensor_to_numpy(t)
    t2 = TensorProto(name="w", data_type=oproto.DT_FLOAT, dims=[2], float_data=[1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="typed elements"):
        tensor_to_numpy(t2)


def test_tensor_to_numpy_returns_writable():
    t = numpy_to_tensor("w", np.ones((2, 2), dtype=np.float32))
    arr = tensor_to_numpy(t)
    arr[0, 0] = 5.0  # would raise "read-only" on a frombuffer view
    assert arr[0, 0] == 5.0


def test_unsupported_op_rejected_at_construction():
    m = make_tiny_detector()
    m.graph.node.append(NodeProto(op_type="LSTM", input=["output0"], output=["z"]))
    with pytest.raises(NotImplementedError, match="LSTM"):
        NumpyGraphSession(m)


def test_missing_tensor_name_raises_keyerror():
    m = make_tiny_detector()
    m.graph.node[0].input[0] = "not_a_tensor"
    sess = NumpyGraphSession(m)
    with pytest.raises(KeyError):
        sess.run(None, {"images": np.zeros((1, 3, 640, 640), dtype=np.float32)})


# --------------------------------------------------------------------------
# end-to-end: the real chain on a real model file, no fake session
# --------------------------------------------------------------------------


def _gradient_bgr(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)


def test_executor_end_to_end_deterministic(tmp_path):
    path = str(tmp_path / "tiny.onnx")
    oproto.save_model(make_tiny_detector(), path)
    sess = NumpyGraphSession(path)
    assert [a.name for a in sess.get_inputs()] == ["images"]
    assert sess.get_outputs()[0].shape == [1, 84, 1600]

    img = _gradient_bgr(96, 128)
    x = yolo.preprocess(img)
    out1 = sess.run(None, {"images": x})[0]
    out2 = sess.run(None, {"images": x})[0]
    out3 = NumpyGraphSession(oproto.load_model(path)).run(None, {"images": x})[0]
    assert out1.shape == (1, 84, 1600) and out1.dtype == np.float32
    # byte-reproducible: same session, fresh session, save/load round-trip
    assert out1.tobytes() == out2.tobytes() == out3.tobytes()

    pre = yolo.postprocess(out1, 128, 96)
    dets = yolo.detect_from_output(out1, 128, 96)
    assert len(pre) == 84  # fixture tuned: sparse tail above conf 0.5
    assert len(dets) == 8  # after greedy per-class NMS
    assert [d["object_class"] for d in dets[:3]] == ["mouse", "knife", "mouse"]
    assert round(dets[0]["confidence"], 2) == 0.82
    for d in dets:
        assert d["confidence"] >= 0.5
        bb = d["bbox"]
        assert 0 <= bb["x1"] < bb["x2"] <= 128
        assert 0 <= bb["y1"] < bb["y2"] <= 96


def test_onnx_detector_numpy_backend(tmp_path):
    """OnnxDetector(backend='numpy'): real bytes in, real graph, real NMS —
    closes SURVEY §2 #14 without onnxruntime (YOLODetector.java:92-175)."""
    import pandas as pd

    from video_stream_processing_spark.operators.detection import OnnxDetector

    path = str(tmp_path / "tiny.onnx")
    oproto.save_model(make_tiny_detector(), path)
    det = OnnxDetector(model_path=path, backend="numpy")

    img = _gradient_bgr(96, 128)
    blobs = pd.Series([encode_bmp(img), None, b"not an image"])
    out = det.detect_batch(blobs)
    assert list(map(len, out)) == [8, 0, 0]  # undecodable -> empty list
    # identical to the direct (no-detector) chain: BMP decode is lossless
    direct = yolo.detect_from_output(
        NumpyGraphSession(path).run(None, {"images": yolo.preprocess(img)})[0], 128, 96
    )
    assert out[0] == direct


def test_avgpool_globalavgpool_clip_flatten_pad():
    rng = np.random.default_rng(16)
    X = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    # AveragePool, no padding
    (ap,) = _run_op("AveragePool", [X], kernel_shape=[2, 2], strides=[2, 2])
    want = X.reshape(1, 2, 3, 2, 3, 2).mean(axis=(3, 5), dtype=np.float32)
    np.testing.assert_allclose(ap, want, rtol=1e-6)
    # padded AveragePool excludes pad cells from the divisor by default
    (app,) = _run_op("AveragePool", [X], kernel_shape=[3, 3], strides=[3, 3],
                     pads=[1, 1, 2, 2])
    # corner window covers rows/cols 0..1 of the input (1 pad row/col)
    np.testing.assert_allclose(
        app[0, 0, 0, 0], X[0, 0, :2, :2].mean(dtype=np.float32), rtol=1e-5
    )
    # count_include_pad=1 divides by the full kernel area
    (apf,) = _run_op("AveragePool", [X], kernel_shape=[3, 3], strides=[3, 3],
                     pads=[1, 1, 2, 2], count_include_pad=1)
    np.testing.assert_allclose(
        apf[0, 0, 0, 0], X[0, 0, :2, :2].sum(dtype=np.float32) / 9, rtol=1e-5
    )
    (gap,) = _run_op("GlobalAveragePool", [X])
    assert gap.shape == (1, 2, 1, 1)
    np.testing.assert_allclose(gap[:, :, 0, 0], X.mean(axis=(2, 3), dtype=np.float32), rtol=1e-6)
    # Clip: opset-11 input form and attribute form
    (cl,) = _run_op("Clip", [X, np.float32(-0.5), np.float32(0.5)])
    np.testing.assert_array_equal(cl, np.clip(X, -0.5, 0.5))
    node = _node("Clip", ["x"], ["y"], min=0.0, max=6.0)
    np.testing.assert_array_equal(_OPS["Clip"](node, [X])[0], np.clip(X, 0.0, 6.0))
    (fl,) = _run_op("Flatten", [X], axis=1)
    assert fl.shape == (1, 72)
    np.testing.assert_array_equal(fl, X.reshape(1, -1))
    # negative axis per spec: axis=-1 on rank 4 means axis 3 (NOT a
    # trailing (24,1) split — the round-8 `% (ndim+1)` bug)
    (fln,) = _run_op("Flatten", [X], axis=-1)
    assert fln.shape == (12, 6)
    np.testing.assert_array_equal(fln, X.reshape(12, 6))
    (fl0,) = _run_op("Flatten", [X], axis=0)
    assert fl0.shape == (1, 72)
    (flm,) = _run_op("Flatten", [X], axis=-4)  # -r -> axis 0
    assert flm.shape == (1, 72)
    with pytest.raises(NotImplementedError):
        _run_op("Flatten", [X], axis=5)
    (pd_,) = _run_op("Pad", [X, np.array([0, 0, 1, 1, 0, 0, 1, 1], dtype=np.int64)])
    assert pd_.shape == (1, 2, 8, 8)
    np.testing.assert_array_equal(pd_[:, :, 1:-1, 1:-1], X)
    assert float(pd_[0, 0, 0, 0]) == 0.0


# --------------------------------------------------------------------------
# make_yolov8n_skeleton: the REAL head geometry (round-9 close of the
# u04 fidelity item — YOLODetector.java:180-206 reads [1,84,8400])
# --------------------------------------------------------------------------

SKELETON_SHA256 = "77ba8cbffbed187a771d972b1effec8b8c1b620ecffcff7984d2ef27b802143d"


def _skeleton_session():
    from video_stream_processing_spark.operators.onnx_numpy import (
        make_yolov8n_skeleton,
    )

    return NumpyGraphSession(make_yolov8n_skeleton()), make_yolov8n_skeleton()


def test_yolov8n_skeleton_bytes_pinned():
    from video_stream_processing_spark.operators.onnx_numpy import (
        make_yolov8n_skeleton,
    )

    b1 = make_yolov8n_skeleton().serialize()
    b2 = make_yolov8n_skeleton().serialize()
    assert b1 == b2
    assert hashlib.sha256(b1).hexdigest() == SKELETON_SHA256
    # parse round-trip survives
    assert oproto.ModelProto.parse(b1).serialize() == b1


def test_yolov8n_skeleton_topology():
    """Every architectural element of the real export is present: SiLU
    conv blocks, C2f Split/Concat, an SPPF MaxPool(5) stack, two PAN
    Resize upsamples, the DFL Softmax + frozen-arange Conv, and the
    fused [1,84,8400] output over strides 8/16/32."""
    from collections import Counter

    from video_stream_processing_spark.operators.onnx_numpy import (
        make_yolov8n_skeleton,
    )

    m = make_yolov8n_skeleton()
    ops = Counter(n.op_type for n in m.graph.node)
    assert ops["Resize"] == 2  # PAN top-down x2
    assert ops["MaxPool"] == 3  # SPPF stack
    assert ops["Softmax"] == 1 and ops["Transpose"] == 1  # DFL
    assert ops["Split"] >= 10  # 9 C2f blocks + head/dist splits
    assert ops["Sigmoid"] == ops["Mul"]  # every SiLU is Sigmoid x Mul (+cls/d2b pairs)
    # SPPF pools are k=5 s=1 p=2
    sppf = [n for n in m.graph.node if n.op_type == "MaxPool"]
    for n in sppf:
        a = n.attrs()
        assert list(a["kernel_shape"].ints) == [5, 5]
        assert list(a["strides"].ints) == [1, 1]
        assert list(a["pads"].ints) == [2, 2, 2, 2]
    # DFL conv weights are frozen arange(16)
    inits = {t.name: tensor_to_numpy(t) for t in m.graph.initializer}
    np.testing.assert_array_equal(
        inits["dfl_w"].reshape(-1), np.arange(16, dtype=np.float32)
    )
    # anchor grid: x inner / y outer per scale, +0.5 centers, strides fused
    anchors, strides = inits["anchors"], inits["strides"]
    assert anchors.shape == (1, 2, 8400) and strides.shape == (1, 1, 8400)
    assert anchors[0, 0, 0] == 0.5 and anchors[0, 0, 1] == 1.5  # x advances
    assert anchors[0, 1, 0] == 0.5 and anchors[0, 1, 80] == 1.5  # y advances per row
    assert strides[0, 0, 0] == 8 and strides[0, 0, 6400] == 16 and strides[0, 0, 8000] == 32
    out = m.graph.output[0]
    assert [d.dim_value for d in out.dims] == [1, 84, 8400]


def test_yolov8n_skeleton_dfl_and_dist2bbox_replayed():
    """The graph's DFL + dist2bbox tail equals a manual numpy replay of
    the published math (softmax over 16 bins -> expectation; anchor
    lt/rb decode -> cxcywh -> stride scale)."""
    sess, _ = _skeleton_session()
    img = _gradient_bgr(96, 128)
    x = yolo.preprocess(img)
    dist_raw, dfl_sm, dist, box, out0 = sess.run(
        ["dist_raw", "dfl_sm", "dist", "box", "output0"], {"images": x}
    )
    assert dist_raw.shape == (1, 64, 8400) and dist.shape == (1, 4, 8400)
    # DFL: reshape->transpose->softmax->E[bin]
    t = dist_raw.reshape(1, 4, 16, 8400).transpose(0, 2, 1, 3)
    m = t.max(axis=1, keepdims=True)
    e = np.exp(t - m)
    sm = e / e.sum(axis=1, keepdims=True)
    np.testing.assert_array_equal(sm.astype(np.float32), dfl_sm)
    mdist = (sm * np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)).sum(
        axis=1, dtype=np.float32
    ).reshape(1, 4, 8400)
    np.testing.assert_allclose(mdist, dist, atol=1e-5)
    # dist2bbox over the constant anchor grid
    ax, ay, astr = [], [], []
    for s, g in ((8, 80), (16, 40), (32, 20)):
        xs = np.arange(g, dtype=np.float32) + 0.5
        ax.append(np.tile(xs, g))
        ay.append(np.repeat(xs, g))
        astr.append(np.full(g * g, s, dtype=np.float32))
    anchors = np.stack([np.concatenate(ax), np.concatenate(ay)])[None]
    lt, rb = dist[:, :2], dist[:, 2:]
    x1y1 = anchors - lt
    x2y2 = anchors + rb
    mbox = np.concatenate([(x1y1 + x2y2) / 2.0, x2y2 - x1y1], axis=1)
    mbox = mbox * np.concatenate(astr).reshape(1, 1, 8400)
    np.testing.assert_allclose(mbox, box, atol=1e-4)
    # output0 rows 0..3 are the box; rows 4.. are sigmoids in (0,1)
    np.testing.assert_array_equal(out0[:, :4], box.astype(np.float32))
    cls = out0[0, 4:]
    assert cls.shape == (80, 8400)
    assert float(cls.min()) > 0.0 and float(cls.max()) < 1.0


def test_yolov8n_skeleton_end_to_end_pinned():
    """Full chain at true candidate scale, deterministic: preprocess ->
    218-node graph -> postprocess over 8400 candidates -> NMS."""
    sess, _ = _skeleton_session()
    img = _gradient_bgr(96, 128)
    x = yolo.preprocess(img)
    out = sess.run(None, {"images": x})[0]
    assert out.shape == (1, 84, 8400) and out.dtype == np.float32
    out2 = sess.run(None, {"images": x})[0]
    assert out.tobytes() == out2.tobytes()
    pre = yolo.postprocess(out, 128, 96)
    dets = yolo.detect_from_output(out, 128, 96)
    assert len(pre) == 109  # sparse tail of 8400 clears conf 0.5
    assert len(dets) == 7  # after greedy per-class NMS
    assert [d["object_class"] for d in dets[:3]] == ["chair", "spoon", "chair"]
    assert round(dets[0]["confidence"], 4) == 0.5544
    bb = dets[0]["bbox"]
    assert (round(bb["x1"], 2), round(bb["y1"], 2), round(bb["x2"], 2), round(bb["y2"], 2)) == (
        73.32, 81.7, 97.91, 96.0,
    )
    for d in dets:
        assert d["confidence"] >= 0.5
        assert 0 <= d["bbox"]["x1"] < d["bbox"]["x2"] <= 128
        assert 0 <= d["bbox"]["y1"] < d["bbox"]["y2"] <= 96


def test_plumbing_ops_match_numpy():
    """r9 real-export plumbing kernels vs direct numpy reference."""
    rng = np.random.default_rng(17)
    X = rng.standard_normal((2, 3, 4)).astype(np.float32)

    (c,) = _run_op("Cast", [X], to=7)
    assert c.dtype == np.int64
    np.testing.assert_array_equal(c, X.astype(np.int64))
    with pytest.raises(NotImplementedError):
        _run_op("Cast", [X], to=99)

    (sh,) = _run_op("Shape", [X])
    np.testing.assert_array_equal(sh, np.array([2, 3, 4], dtype=np.int64))

    idx = np.array([2, 0], dtype=np.int64)
    (g,) = _run_op("Gather", [X, idx], axis=1)
    np.testing.assert_array_equal(g, np.take(X, idx, axis=1))

    (u,) = _run_op("Unsqueeze", [X, np.array([0, -1], dtype=np.int64)])
    assert u.shape == (1, 2, 3, 4, 1)
    (sq,) = _run_op("Squeeze", [u, np.array([0], dtype=np.int64)])
    assert sq.shape == (2, 3, 4, 1)
    (sq2,) = _run_op("Squeeze", [u])
    assert sq2.shape == (2, 3, 4)

    (e,) = _run_op("Expand", [np.ones((3, 1), dtype=np.float32),
                              np.array([2, 3, 4], dtype=np.int64)])
    assert e.shape == (2, 3, 4)

    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        _run_op("Where", [X > 0, X, a])[0], np.where(X > 0, X, a)
    )
    np.testing.assert_array_equal(_run_op("Equal", [X, X])[0], np.ones_like(X, dtype=bool))
    np.testing.assert_array_equal(_run_op("Greater", [X, a])[0], X > a)
    np.testing.assert_array_equal(_run_op("Less", [X, a])[0], X < a)
    np.testing.assert_array_equal(_run_op("Neg", [X])[0], -X)
    np.testing.assert_allclose(_run_op("Exp", [X])[0], np.exp(X), rtol=1e-6)
    np.testing.assert_allclose(_run_op("Sqrt", [np.abs(X)])[0], np.sqrt(np.abs(X)), rtol=1e-6)
    np.testing.assert_allclose(
        _run_op("Pow", [np.abs(X), np.float32(2.0)])[0], np.abs(X) ** 2, rtol=1e-6
    )
    np.testing.assert_allclose(_run_op("Tanh", [X])[0], np.tanh(X), rtol=1e-6)
    np.testing.assert_allclose(
        _run_op("LeakyRelu", [X], alpha=0.1)[0],
        np.where(X >= 0, X, 0.1 * X), rtol=1e-6,
    )

    # reductions: attr axes, input axes (opset 18), keepdims both ways
    np.testing.assert_allclose(
        _run_op("ReduceSum", [X, np.array([1], dtype=np.int64)])[0],
        X.sum(axis=1, keepdims=True), rtol=1e-6,
    )
    np.testing.assert_allclose(
        _run_op("ReduceMax", [X], axes=[0, 2], keepdims=0)[0],
        X.max(axis=(0, 2)), rtol=1e-6,
    )
    np.testing.assert_allclose(
        _run_op("ReduceMean", [X], axes=[-1])[0],
        X.mean(axis=-1, keepdims=True), rtol=1e-5,
    )
    # no axes -> reduce over everything
    np.testing.assert_allclose(
        _run_op("ReduceMin", [X], keepdims=0)[0], X.min(), rtol=1e-6
    )

    # ADVICE r9 (low): unsupported attributes RAISE rather than silently
    # mis-executing — Shape's opset-15 start/end slice and the opset-18
    # noop_with_empty_axes reduce flip.
    with pytest.raises(NotImplementedError, match="start/end"):
        _run_op("Shape", [X], start=1)
    with pytest.raises(NotImplementedError, match="start/end"):
        _run_op("Shape", [X], end=2)
    with pytest.raises(NotImplementedError, match="noop_with_empty_axes"):
        _run_op("ReduceSum", [X], noop_with_empty_axes=1)
    # explicit 0 is the default behavior and must still work
    np.testing.assert_allclose(
        _run_op("ReduceSum", [X], noop_with_empty_axes=0, keepdims=0)[0],
        X.sum(), rtol=1e-6,
    )


def test_batchnorm_inference_matches_manual():
    rng = np.random.default_rng(18)
    X = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
    scale = rng.standard_normal(4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    mean = rng.standard_normal(4).astype(np.float32)
    var = np.abs(rng.standard_normal(4)).astype(np.float32) + 0.5
    (got,) = _run_op("BatchNormalization", [X, scale, bias, mean, var], epsilon=1e-3)
    want = (
        (X - mean.reshape(1, 4, 1, 1))
        / np.sqrt(var.reshape(1, 4, 1, 1) + np.float32(1e-3))
        * scale.reshape(1, 4, 1, 1)
        + bias.reshape(1, 4, 1, 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


INT8_CONVNET_SHA256 = "ac4442316d8d80ae3d78346c722900940bb0e8da1cc6c7775209f9dff78365ce"


def test_int8_convnet_bytes_pinned():
    """u05's fixture model is fully md5-derived — byte-identical on every
    worker and across rounds (a drift here would silently desynchronize
    the Spark side from the DuckDB oracle's arithmetic replay)."""
    from video_stream_processing_spark.operators.onnx_numpy import make_int8_convnet

    b1 = make_int8_convnet().serialize()
    b2 = make_int8_convnet().serialize()
    assert b1 == b2
    assert hashlib.sha256(b1).hexdigest() == INT8_CONVNET_SHA256


def test_int8_convnet_forward_is_exact_integer():
    """The float32 forward pass through the REAL executor equals a
    pure-python INTEGER replay of conv/relu/pool/gemm — the exactness
    claim u05's DuckDB oracle relies on (all intermediates << 2^24)."""
    from video_stream_processing_spark.operators.onnx_numpy import (
        NumpyGraphSession,
        make_int8_convnet,
    )

    sess = NumpyGraphSession(make_int8_convnet().serialize())

    def mi(tag, mod, shift):
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % mod - shift

    for d in (0, 1, 97, 12345):
        pxl = [
            int(hashlib.md5(f"{d}:{p}".encode()).hexdigest()[:8], 16) % 256
            for p in range(64)
        ]
        x = np.array(pxl, dtype=np.float32).reshape(1, 1, 8, 8)
        got = [int(v) for v in sess.run(None, {"pix": x})[0].ravel()]
        y = [
            [
                max(
                    0,
                    mi(f"cb:{c}", 7, 3)
                    + sum(
                        mi(f"cw:{c}:{t}", 5, 2)
                        * pxl[((vp // 6) + (t // 3)) * 8 + (vp % 6) + (t % 3)]
                        for t in range(9)
                    ),
                )
                for vp in range(36)
            ]
            for c in range(4)
        ]
        mp = [
            [
                max(
                    y[c][(2 * (q // 3)) * 6 + 2 * (q % 3)],
                    y[c][(2 * (q // 3)) * 6 + 2 * (q % 3) + 1],
                    y[c][(2 * (q // 3) + 1) * 6 + 2 * (q % 3)],
                    y[c][(2 * (q // 3) + 1) * 6 + 2 * (q % 3) + 1],
                )
                for q in range(9)
            ]
            for c in range(4)
        ]
        flat = [mp[k // 9][k % 9] for k in range(36)]
        want = [
            mi(f"gb:{o}", 9, 4)
            + sum(mi(f"gw:{o}:{k}", 5, 2) * flat[k] for k in range(36))
            for o in range(5)
        ]
        assert got == want


def test_int8_convnet_exact_on_arbitrary_uint8_inputs():
    """Property form of the u05 exactness claim: for ARBITRARY uint8
    images (not just the md5 fixture), the float32 forward pass through
    the executor equals a pure-integer replay — the |intermediate| <<
    2^24 bound holds for the worst case (all-255 input, max-magnitude
    weights), so no input can expose rounding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from video_stream_processing_spark.operators.onnx_numpy import (
        NumpyGraphSession,
        make_int8_convnet,
    )

    sess = NumpyGraphSession(make_int8_convnet())
    w_conv = sess._init["w_conv"].astype(np.int64)
    b_conv = sess._init["b_conv"].astype(np.int64)
    w_fc = sess._init["w_fc"].astype(np.int64)
    b_fc = sess._init["b_fc"].astype(np.int64)

    def int_replay(px: np.ndarray) -> list[int]:
        x = px.astype(np.int64)
        y = np.zeros((4, 6, 6), dtype=np.int64)
        for c in range(4):
            for r in range(6):
                for s in range(6):
                    y[c, r, s] = max(
                        0,
                        int(b_conv[c])
                        + int((w_conv[c, 0] * x[r : r + 3, s : s + 3]).sum()),
                    )
        mp = y.reshape(4, 3, 2, 3, 2).max(axis=(2, 4))
        flat = mp.reshape(-1)
        return [int(b_fc[o] + (w_fc[o] * flat).sum()) for o in range(5)]

    @settings(max_examples=40, deadline=None)
    @given(arrays(np.uint8, (8, 8)))
    def check(px):
        got = sess.run(None, {"pix": px.astype(np.float32).reshape(1, 1, 8, 8)})[0]
        assert [int(v) for v in got.ravel()] == int_replay(px)

    check()
