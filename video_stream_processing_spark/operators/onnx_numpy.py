"""Pure-numpy ONNX graph executor over functions/onnxproto.py.

The reference executes its detector with onnxruntime
(/root/reference/src/main/java/com/video/streaming/processor/
YOLODetector.java:71-90 builds an OrtSession; :137-139 feeds a
float[1,3,640,640] named "images" and reads output[0]); onnxruntime is
not installed in this container, so this module executes the parsed
GraphProto with numpy instead. :class:`NumpyGraphSession` mirrors the
two ort.InferenceSession surfaces the engine touches —
``run(output_names, feed_dict)`` and ``get_inputs()/get_outputs()`` —
so ``OnnxDetector(backend="numpy")`` (operators/detection.py) drives
the identical decode -> preprocess -> run -> postprocess -> NMS chain.

Implemented op set (ONNX opset 13-17 semantics, the subset a YOLO-style
detector head needs): Conv, MaxPool, AveragePool, GlobalAveragePool,
Sigmoid, Relu, Clip, Mul, Add, Sub, Div, Concat, Resize
(nearest/asymmetric/floor — the torch Upsample export), Transpose,
Reshape, Flatten, Pad (constant), Slice, Split, Softmax, MatMul, Gemm,
Constant — plus the real-export plumbing set (r9): Cast, Shape, Gather,
Unsqueeze, Squeeze, Expand, Where, Equal/Greater/Less, Neg, Exp, Log,
Sqrt, Pow, Tanh, LeakyRelu, ReduceMax/Min/Sum/Mean, BatchNormalization
(inference form).
Everything is vectorized numpy (Conv/MaxPool via an explicit
kH*kW-offset im2col + einsum); unsupported ops/attributes raise
NotImplementedError rather than silently mis-executing.

Scale note (SURVEY §4.2): one session is constructed per Python worker
and reused across Arrow batches (the reference likewise builds one
OrtSession per subtask in open(), VideoProcessFunction.java:60-66); the
weights live in the worker, never in a Spark row, and inference stays
inside the pandas-UDF batch loop.

``make_tiny_detector`` builds the small deterministic fixture model
(tests/test_onnx_numpy.py pins its serialized bytes and the end-to-end
detection output) covering every mandated op on the real [1,3,640,640]
-> [1,84,N] wire shape. ``make_yolov8n_skeleton`` builds the
full-geometry fixture: the actual YOLOv8 topology (C2f/SPPF backbone,
PAN neck, decoupled DFL head) fused to the reference's true
[1,84,8400] output contract (YOLODetector.java:180-206), with seeded
weights — u04 runs it end-to-end at true candidate scale.
"""

from __future__ import annotations

import numpy as np

from video_stream_processing_spark.functions import onnxproto as op
from video_stream_processing_spark.functions.onnxproto import (
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    ValueInfoProto,
    numpy_to_tensor,
    tensor_to_numpy,
)

__all__ = ["NumpyGraphSession", "make_tiny_detector", "make_yolov8n_skeleton"]


# --------------------------------------------------------------------------
# attribute helpers
# --------------------------------------------------------------------------


def _ints(attrs: dict, name: str, default: list[int] | None = None) -> list[int]:
    if name in attrs:
        return list(attrs[name].ints)
    if default is None:
        raise NotImplementedError(f"required attribute {name!r} missing")
    return list(default)


def _int(attrs: dict, name: str, default: int) -> int:
    return int(attrs[name].i) if name in attrs else default


def _str(attrs: dict, name: str, default: str) -> str:
    return attrs[name].s.decode("utf-8") if name in attrs else default


def _check_notset_autopad(attrs: dict, opname: str) -> None:
    ap = _str(attrs, "auto_pad", "NOTSET")
    if ap not in ("", "NOTSET"):
        raise NotImplementedError(f"{opname}: auto_pad={ap!r} (use explicit pads)")


def _im2col(
    X: np.ndarray,
    kH: int,
    kW: int,
    sH: int,
    sW: int,
    dH: int,
    dW: int,
    pads: list[int],
    pad_value: float,
) -> np.ndarray:
    """(N,C,H,W) -> (N,C,kH,kW,oH,oW) window gather: one strided slice per
    kernel offset (kH*kW slices, no per-pixel Python), the standard
    vectorized-numpy conv/pool front end."""
    if pads != [0, 0, 0, 0]:
        X = np.pad(
            X,
            ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])),
            constant_values=pad_value,
        )
    N, C, H, W = X.shape
    eKH, eKW = (kH - 1) * dH + 1, (kW - 1) * dW + 1
    oH = (H - eKH) // sH + 1
    oW = (W - eKW) // sW + 1
    if oH <= 0 or oW <= 0:
        raise ValueError(f"window {kH}x{kW} larger than padded input {H}x{W}")
    cols = np.empty((N, C, kH, kW, oH, oW), dtype=X.dtype)
    for i in range(kH):
        for j in range(kW):
            cols[:, :, i, j] = X[
                :,
                :,
                i * dH : i * dH + sH * (oH - 1) + 1 : sH,
                j * dW : j * dW + sW * (oW - 1) + 1 : sW,
            ]
    return cols


# --------------------------------------------------------------------------
# operator kernels: (attrs, inputs) -> list of outputs
# --------------------------------------------------------------------------


def _op_conv(node: NodeProto, inp: list) -> list:
    X, W = inp[0], inp[1]
    B = inp[2] if len(inp) > 2 else None
    attrs = node.attrs()
    _check_notset_autopad(attrs, "Conv")
    if X.ndim != 4 or W.ndim != 4:
        raise NotImplementedError("Conv: only 2-D (NCHW) convolution supported")
    kH, kW = int(W.shape[2]), int(W.shape[3])
    ks = _ints(attrs, "kernel_shape", [kH, kW])
    if ks != [kH, kW]:
        raise ValueError(f"Conv: kernel_shape {ks} != weight spatial dims {[kH, kW]}")
    sH, sW = _ints(attrs, "strides", [1, 1])
    dH, dW = _ints(attrs, "dilations", [1, 1])
    pads = _ints(attrs, "pads", [0, 0, 0, 0])
    g = _int(attrs, "group", 1)
    C = X.shape[1]
    M = W.shape[0]
    if C % g or M % g or W.shape[1] != C // g:
        raise ValueError(f"Conv: group={g} inconsistent with X C={C}, W {W.shape}")
    cols = _im2col(X, kH, kW, sH, sW, dH, dW, pads, 0.0)
    N, _, _, _, oH, oW = cols.shape
    cols_g = cols.reshape(N, g, C // g, kH, kW, oH, oW)
    Wg = W.reshape(g, M // g, C // g, kH, kW)
    out = np.einsum("ngcijyx,gmcij->ngmyx", cols_g, Wg, optimize=True)
    out = np.ascontiguousarray(out.reshape(N, M, oH, oW).astype(X.dtype, copy=False))
    if B is not None:
        out += B.reshape(1, M, 1, 1).astype(out.dtype, copy=False)
    return [out]


def _op_maxpool(node: NodeProto, inp: list) -> list:
    X = inp[0]
    attrs = node.attrs()
    _check_notset_autopad(attrs, "MaxPool")
    if X.ndim != 4:
        raise NotImplementedError("MaxPool: only 2-D (NCHW) pooling supported")
    if _int(attrs, "ceil_mode", 0):
        raise NotImplementedError("MaxPool: ceil_mode=1 not supported")
    kH, kW = _ints(attrs, "kernel_shape")
    sH, sW = _ints(attrs, "strides", [1, 1])
    dH, dW = _ints(attrs, "dilations", [1, 1])
    pads = _ints(attrs, "pads", [0, 0, 0, 0])
    cols = _im2col(X, kH, kW, sH, sW, dH, dW, pads, -np.inf)
    return [cols.max(axis=(2, 3))]


def _op_resize(node: NodeProto, inp: list) -> list:
    X = inp[0]
    scales = inp[2] if len(inp) > 2 else None
    sizes = inp[3] if len(inp) > 3 else None
    attrs = node.attrs()
    mode = _str(attrs, "mode", "nearest")
    ctm = _str(attrs, "coordinate_transformation_mode", "half_pixel")
    nearest = _str(attrs, "nearest_mode", "round_prefer_floor")
    # The torch nn.Upsample(scale_factor=2) export — the only Resize a
    # YOLO backbone emits: nearest / asymmetric / floor.
    if mode != "nearest" or ctm != "asymmetric" or nearest != "floor":
        raise NotImplementedError(
            f"Resize: only nearest/asymmetric/floor supported, got "
            f"{mode}/{ctm}/{nearest}"
        )
    if X.ndim != 4:
        raise NotImplementedError("Resize: only NCHW input supported")
    N, C, H, W = X.shape
    if sizes is not None and np.asarray(sizes).size:
        sz = np.asarray(sizes).astype(np.int64)
        if int(sz[0]) != N or int(sz[1]) != C:
            raise NotImplementedError("Resize: N/C resize not supported")
        oH, oW = int(sz[2]), int(sz[3])
        sh, sw = oH / H, oW / W
    elif scales is not None and np.asarray(scales).size:
        sc = np.asarray(scales).astype(np.float64)
        if sc[0] != 1.0 or sc[1] != 1.0:
            raise NotImplementedError("Resize: N/C resize not supported")
        sh, sw = float(sc[2]), float(sc[3])
        oH, oW = int(np.floor(H * sh)), int(np.floor(W * sw))
    else:
        raise ValueError("Resize: one of scales/sizes must be provided")
    iy = np.clip(np.floor(np.arange(oH) / sh).astype(np.int64), 0, H - 1)
    ix = np.clip(np.floor(np.arange(oW) / sw).astype(np.int64), 0, W - 1)
    return [np.ascontiguousarray(X[:, :, iy][:, :, :, ix])]


def _op_reshape(node: NodeProto, inp: list) -> list:
    X, shape = inp[0], np.asarray(inp[1]).astype(np.int64)
    if _int(node.attrs(), "allowzero", 0):
        raise NotImplementedError("Reshape: allowzero=1 not supported")
    dims = [int(X.shape[i]) if s == 0 else int(s) for i, s in enumerate(shape)]
    return [X.reshape(dims)]  # a single -1 is resolved by numpy itself


def _op_transpose(node: NodeProto, inp: list) -> list:
    X = inp[0]
    perm = _ints(node.attrs(), "perm", list(range(X.ndim))[::-1])
    return [np.ascontiguousarray(X.transpose(perm))]


def _op_concat(node: NodeProto, inp: list) -> list:
    axis = int(node.attrs()["axis"].i)
    return [np.concatenate(inp, axis=axis)]


def _op_split(node: NodeProto, inp: list) -> list:
    X = inp[0]
    attrs = node.attrs()
    axis = _int(attrs, "axis", 0)
    if len(inp) > 1 and inp[1] is not None:  # opset 13: split as input
        split = np.asarray(inp[1]).astype(np.int64).tolist()
    elif "split" in attrs:  # opset <13: split as attribute
        split = _ints(attrs, "split")
    else:
        n = len(node.output)
        if X.shape[axis] % n:
            raise ValueError(f"Split: axis dim {X.shape[axis]} not divisible by {n}")
        split = [X.shape[axis] // n] * n
    return [np.ascontiguousarray(s) for s in np.split(X, np.cumsum(split)[:-1], axis=axis)]


def _op_slice(node: NodeProto, inp: list) -> list:
    X = inp[0]
    starts = np.asarray(inp[1]).astype(np.int64)
    ends = np.asarray(inp[2]).astype(np.int64)
    axes = (
        np.asarray(inp[3]).astype(np.int64)
        if len(inp) > 3 and inp[3] is not None
        else np.arange(len(starts), dtype=np.int64)
    )
    steps = (
        np.asarray(inp[4]).astype(np.int64)
        if len(inp) > 4 and inp[4] is not None
        else np.ones(len(starts), dtype=np.int64)
    )
    sl = [slice(None)] * X.ndim
    for a, s, e, st in zip(axes, starts, ends, steps):
        a = int(a) % X.ndim
        sl[a] = slice(int(s), int(e), int(st))
    return [np.ascontiguousarray(X[tuple(sl)])]


def _op_softmax(node: NodeProto, inp: list) -> list:
    X = inp[0]
    axis = _int(node.attrs(), "axis", -1)
    m = X.max(axis=axis, keepdims=True)
    e = np.exp(X - m)
    return [e / e.sum(axis=axis, keepdims=True)]


def _op_gemm(node: NodeProto, inp: list) -> list:
    A, B = inp[0], inp[1]
    C = inp[2] if len(inp) > 2 else None
    attrs = node.attrs()
    alpha = attrs["alpha"].f if "alpha" in attrs else 1.0
    beta = attrs["beta"].f if "beta" in attrs else 1.0
    if _int(attrs, "transA", 0):
        A = A.T
    if _int(attrs, "transB", 0):
        B = B.T
    Y = np.asarray(alpha, dtype=A.dtype) * (A @ B)
    if C is not None:
        Y = Y + np.asarray(beta, dtype=A.dtype) * C
    return [Y]


def _op_avgpool(node: NodeProto, inp: list) -> list:
    X = inp[0]
    attrs = node.attrs()
    _check_notset_autopad(attrs, "AveragePool")
    if X.ndim != 4:
        raise NotImplementedError("AveragePool: only 2-D (NCHW) pooling supported")
    if _int(attrs, "ceil_mode", 0):
        raise NotImplementedError("AveragePool: ceil_mode=1 not supported")
    kH, kW = _ints(attrs, "kernel_shape")
    sH, sW = _ints(attrs, "strides", [1, 1])
    pads = _ints(attrs, "pads", [0, 0, 0, 0])
    cip = _int(attrs, "count_include_pad", 0)
    cols = _im2col(X, kH, kW, sH, sW, 1, 1, pads, 0.0)
    if cip or pads == [0, 0, 0, 0]:
        return [cols.mean(axis=(2, 3), dtype=X.dtype)]
    # divisor = number of NON-PAD cells per window: pool a ones-mask
    ones = _im2col(np.ones(X.shape[2:], dtype=X.dtype)[None, None], kH, kW, sH, sW, 1, 1, pads, 0.0)
    return [cols.sum(axis=(2, 3)) / ones.sum(axis=(2, 3))]


def _op_globalavgpool(node: NodeProto, inp: list) -> list:
    X = inp[0]
    return [X.mean(axis=tuple(range(2, X.ndim)), keepdims=True, dtype=X.dtype)]


def _op_clip(node: NodeProto, inp: list) -> list:
    X = inp[0]
    attrs = node.attrs()
    # opset 11+: min/max as optional inputs; opset <11: attributes
    lo = inp[1] if len(inp) > 1 and inp[1] is not None else (
        np.asarray(attrs["min"].f, dtype=X.dtype) if "min" in attrs else None
    )
    hi = inp[2] if len(inp) > 2 and inp[2] is not None else (
        np.asarray(attrs["max"].f, dtype=X.dtype) if "max" in attrs else None
    )
    return [np.clip(X, lo, hi)]


def _op_flatten(node: NodeProto, inp: list) -> list:
    X = inp[0]
    axis = _int(node.attrs(), "axis", 1)
    # ONNX spec: axis in [-r, r]; negative axis means axis + r (so axis=-1
    # on rank 3 is axis 2, NOT the trailing split `% (r+1)` would give).
    if not -X.ndim <= axis <= X.ndim:
        raise NotImplementedError(f"Flatten: axis={axis} out of range for rank {X.ndim}")
    if axis < 0:
        axis += X.ndim
    lead = int(np.prod(X.shape[:axis])) if axis else 1
    return [X.reshape(lead, -1)]


def _op_pad(node: NodeProto, inp: list) -> list:
    X = inp[0]
    attrs = node.attrs()
    mode = _str(attrs, "mode", "constant")
    if mode != "constant":
        raise NotImplementedError(f"Pad: mode={mode!r} not supported")
    pads = (
        np.asarray(inp[1]).astype(np.int64)
        if len(inp) > 1 and inp[1] is not None
        else np.asarray(_ints(attrs, "pads"), dtype=np.int64)
    )
    value = (
        float(np.asarray(inp[2]))
        if len(inp) > 2 and inp[2] is not None
        else (attrs["value"].f if "value" in attrs else 0.0)
    )
    half = len(pads) // 2
    spec = [(int(pads[i]), int(pads[i + half])) for i in range(half)]
    return [np.pad(X, spec, constant_values=value)]


def _op_constant(node: NodeProto, inp: list) -> list:
    attrs = node.attrs()
    if "value" not in attrs or attrs["value"].t is None:
        raise NotImplementedError("Constant: only the tensor `value` form supported")
    return [tensor_to_numpy(attrs["value"].t)]




# ONNX TensorProto dtype codes -> numpy (the subset real exports emit)
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
    9: np.bool_, 10: np.float16, 11: np.float64,
}


def _op_cast(node: NodeProto, inp: list) -> list:
    to = _int(node.attrs(), "to", 0)
    if to not in _DTYPES:
        raise NotImplementedError(f"Cast: to={to} not supported")
    return [inp[0].astype(_DTYPES[to])]


def _op_gather(node: NodeProto, inp: list) -> list:
    X, idx = inp[0], np.asarray(inp[1]).astype(np.int64)
    axis = _int(node.attrs(), "axis", 0)
    return [np.take(X, idx, axis=axis)]


def _op_unsqueeze(node: NodeProto, inp: list) -> list:
    X = inp[0]
    axes = (
        np.asarray(inp[1]).astype(np.int64).tolist()
        if len(inp) > 1 and inp[1] is not None
        else _ints(node.attrs(), "axes")
    )
    out_rank = X.ndim + len(axes)
    axes = sorted(a + out_rank if a < 0 else a for a in axes)
    for a in axes:
        X = np.expand_dims(X, a)
    return [X]


def _op_squeeze(node: NodeProto, inp: list) -> list:
    X = inp[0]
    axes = (
        np.asarray(inp[1]).astype(np.int64).tolist()
        if len(inp) > 1 and inp[1] is not None
        else _ints(node.attrs(), "axes", [])
    )
    if not axes:
        return [np.squeeze(X)]
    axes = tuple(a + X.ndim if a < 0 else a for a in axes)
    return [np.squeeze(X, axis=axes)]


def _op_expand(node: NodeProto, inp: list) -> list:
    X, shape = inp[0], np.asarray(inp[1]).astype(np.int64).tolist()
    # ONNX Expand is numpy broadcasting to the mutual broadcast shape
    return [np.broadcast_to(X, np.broadcast_shapes(X.shape, tuple(shape))).copy()]


def _op_shape(node: NodeProto, inp: list) -> list:
    # Opset-15 added start/end slicing attributes; a real export using
    # Shape(start=...) would silently get the FULL shape if we ignored
    # them — raise instead (module contract).
    attrs = node.attrs()
    if "start" in attrs or "end" in attrs:
        raise NotImplementedError("Shape: start/end attributes are not supported")
    return [np.asarray(inp[0].shape, dtype=np.int64)]


def _reduce(np_fn):
    def _op(node: NodeProto, inp: list) -> list:
        X = inp[0]
        attrs = node.attrs()
        if len(inp) > 1 and inp[1] is not None:  # opset 18: axes as input
            axes = np.asarray(inp[1]).astype(np.int64).tolist()
        else:
            axes = _ints(attrs, "axes", [])
        keep = bool(_int(attrs, "keepdims", 1))
        if _int(attrs, "noop_with_empty_axes", 0):
            # opset-18 attribute that flips the empty-axes meaning from
            # "reduce all" to "identity" — raise rather than mis-execute
            # (module contract: unsupported attributes are errors).
            raise NotImplementedError(
                f"{node.op_type}: noop_with_empty_axes=1 is not supported"
            )
        ax = tuple(a + X.ndim if a < 0 else a for a in axes) or None
        return [np_fn(X, axis=ax, keepdims=keep).astype(X.dtype, copy=False)]

    return _op


def _op_batchnorm(node: NodeProto, inp: list) -> list:
    X, scale, B, mean, var = inp[:5]
    eps = node.attrs()["epsilon"].f if "epsilon" in node.attrs() else 1e-5
    shape = (1, -1) + (1,) * (X.ndim - 2)
    return [
        (X - mean.reshape(shape))
        / np.sqrt(var.reshape(shape) + np.asarray(eps, dtype=X.dtype))
        * scale.reshape(shape)
        + B.reshape(shape)
    ]


def _op_leakyrelu(node: NodeProto, inp: list) -> list:
    X = inp[0]
    alpha = node.attrs()["alpha"].f if "alpha" in node.attrs() else 0.01
    return [np.where(X >= 0, X, X * np.asarray(alpha, dtype=X.dtype))]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # Branch on sign for overflow-free float32 (exp of a large positive
    # would warn/inf; both branches keep the input dtype).
    pos = x >= 0
    out = np.empty_like(x)
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


_OPS: dict = {
    "Conv": _op_conv,
    "MaxPool": _op_maxpool,
    "AveragePool": _op_avgpool,
    "GlobalAveragePool": _op_globalavgpool,
    "Clip": _op_clip,
    "Flatten": _op_flatten,
    "Pad": _op_pad,
    "Resize": _op_resize,
    "Reshape": _op_reshape,
    "Transpose": _op_transpose,
    "Concat": _op_concat,
    "Split": _op_split,
    "Slice": _op_slice,
    "Softmax": _op_softmax,
    "Gemm": _op_gemm,
    "MatMul": lambda node, inp: [inp[0] @ inp[1]],
    "Constant": _op_constant,
    "Sigmoid": lambda node, inp: [_sigmoid(inp[0])],
    "Relu": lambda node, inp: [np.maximum(inp[0], 0)],
    "Mul": lambda node, inp: [inp[0] * inp[1]],
    "Add": lambda node, inp: [inp[0] + inp[1]],
    "Sub": lambda node, inp: [inp[0] - inp[1]],
    "Div": lambda node, inp: [inp[0] / inp[1]],
    # real-export plumbing ops (shape math, casts, reductions — present
    # in non-constant-folded ultralytics/torch exports)
    "Cast": _op_cast,
    "Shape": _op_shape,
    "Gather": _op_gather,
    "Unsqueeze": _op_unsqueeze,
    "Squeeze": _op_squeeze,
    "Expand": _op_expand,
    "Where": lambda node, inp: [np.where(inp[0], inp[1], inp[2])],
    "Equal": lambda node, inp: [inp[0] == inp[1]],
    "Greater": lambda node, inp: [inp[0] > inp[1]],
    "Less": lambda node, inp: [inp[0] < inp[1]],
    "Neg": lambda node, inp: [-inp[0]],
    "Exp": lambda node, inp: [np.exp(inp[0])],
    "Log": lambda node, inp: [np.log(inp[0])],
    "Sqrt": lambda node, inp: [np.sqrt(inp[0])],
    "Pow": lambda node, inp: [np.power(inp[0], inp[1]).astype(inp[0].dtype, copy=False)],
    "Tanh": lambda node, inp: [np.tanh(inp[0])],
    "LeakyRelu": _op_leakyrelu,
    "ReduceMax": _reduce(np.max),
    "ReduceMin": _reduce(np.min),
    "ReduceSum": _reduce(np.sum),
    "ReduceMean": _reduce(np.mean),
    "BatchNormalization": _op_batchnorm,
}


# --------------------------------------------------------------------------
# session
# --------------------------------------------------------------------------


class _IOArg:
    """Minimal ort.NodeArg stand-in (name/shape are what callers read)."""

    def __init__(self, name: str, shape: list[int]):
        self.name = name
        self.shape = shape

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"_IOArg(name={self.name!r}, shape={self.shape})"


class NumpyGraphSession:
    """ort.InferenceSession-shaped executor for a parsed ONNX model.

    ``model`` may be a ModelProto, a path, or raw bytes. Nodes execute in
    graph order (ONNX requires topological order; a forward reference
    raises KeyError with the missing tensor name). All intermediates are
    numpy arrays keyed by tensor name; initializers are materialized once
    at construction and shared across run() calls.
    """

    def __init__(self, model: ModelProto | str | bytes):
        if not isinstance(model, ModelProto):
            model = op.load_model(model)
        self.model = model
        g = model.graph
        self._init = {t.name: tensor_to_numpy(t) for t in g.initializer}
        for node in g.node:
            if node.op_type not in _OPS:
                raise NotImplementedError(
                    f"op {node.op_type!r} (node {node.name!r}) not in the "
                    f"supported set {sorted(_OPS)}"
                )
        self._inputs = [
            _IOArg(v.name, [d.dim_value for d in v.dims])
            for v in g.input
            if v.name not in self._init
        ]
        self._outputs = [
            _IOArg(v.name, [d.dim_value for d in v.dims]) for v in g.output
        ]

    def get_inputs(self) -> list[_IOArg]:
        return self._inputs

    def get_outputs(self) -> list[_IOArg]:
        return self._outputs

    def run(self, output_names: list[str] | None, input_feed: dict) -> list:
        values = dict(self._init)
        for name, arr in input_feed.items():
            values[name] = np.asarray(arr)
        for node in self.model.graph.node:
            kernel = _OPS[node.op_type]
            # "" marks an omitted optional input (ONNX convention)
            args = [values[n] if n else None for n in node.input]
            outs = kernel(node, args)
            for name, arr in zip(node.output, outs):
                if name:
                    values[name] = arr
        names = output_names or [o.name for o in self._outputs]
        return [values[n] for n in names]


# --------------------------------------------------------------------------
# deterministic fixture model
# --------------------------------------------------------------------------


def make_tiny_detector(seed: int = 7, num_classes: int = 80) -> ModelProto:
    """Tiny YOLO-shaped detector exercising every mandated op on the real
    wire contract: input "images" [1,3,640,640] float32, output
    "output0" [1,4+num_classes,1600] with rows 0..3 = (cx,cy,w,h) in
    640-space and rows 4.. = sigmoid class scores — exactly the tensor
    YOLODetector.postProcess consumes (YOLODetector.java:137,234-287).

    stem Conv16s16 -> SiLU -> {branch A: kept at 40x40} ;
    MaxPool2 -> mid Conv3x3(pad1) -> SiLU -> +residual Add ->
    Resize x2 (nearest) -> Concat(A) -> head Conv1x1 -> Split(4/nc) ->
    box: Mul/Add affine to 640-space ; cls: Mul/Sub then Sigmoid ->
    Concat -> Transpose -> Reshape [1,84,1600].

    Weights come from numpy's PCG64 generator (seed fixed) — the model
    bytes are fully deterministic, pinned by sha256 in
    tests/test_onnx_numpy.py.
    """
    rng = np.random.default_rng(seed)
    ch = 8

    def w(name: str, *shape: int, gain: float = 1.0):
        arr = (rng.standard_normal(shape) * gain).astype(np.float32)
        return numpy_to_tensor(name, arr)

    nc = num_classes
    inits = [
        w("w_stem", ch, 3, 16, 16, gain=0.08),
        w("b_stem", ch, gain=0.1),
        w("w_mid", ch, ch, 3, 3, gain=0.15),
        w("b_mid", ch, gain=0.1),
        w("w_head", 4 + nc, 2 * ch, 1, 1, gain=0.4),
        w("b_head", 4 + nc, gain=0.1),
        numpy_to_tensor("up_scales", np.array([1, 1, 2, 2], dtype=np.float32)),
        numpy_to_tensor("split_4_nc", np.array([4, nc], dtype=np.int64)),
        # box affine: cx,cy around 320 +/- 40*raw; w,h around 64 + 12*raw
        numpy_to_tensor(
            "box_scale", np.array([40, 40, 12, 12], dtype=np.float32).reshape(1, 4, 1, 1)
        ),
        numpy_to_tensor(
            "box_off", np.array([320, 320, 64, 64], dtype=np.float32).reshape(1, 4, 1, 1)
        ),
        # cls logits shifted down so only a sparse tail clears conf 0.5
        numpy_to_tensor("cls_gain", np.array([1.5], dtype=np.float32)),
        numpy_to_tensor("cls_shift", np.array([2.5], dtype=np.float32)),
        numpy_to_tensor(
            "out_shape", np.array([1, 4 + nc, 1600], dtype=np.int64)
        ),
    ]

    def n(op_type: str, inputs: list[str], outputs: list[str], name: str, **attrs):
        alist = []
        for k, v in attrs.items():
            if isinstance(v, int):
                alist.append(AttributeProto.make_int(k, v))
            elif isinstance(v, float):
                alist.append(AttributeProto.make_float(k, v))
            elif isinstance(v, str):
                alist.append(AttributeProto.make_string(k, v))
            elif isinstance(v, list):
                alist.append(AttributeProto.make_ints(k, v))
            else:  # pragma: no cover - fixture-internal
                raise TypeError(f"attr {k}: {type(v)}")
        return NodeProto(op_type=op_type, name=name, input=inputs, output=outputs, attribute=alist)

    nodes = [
        n("Conv", ["images", "w_stem", "b_stem"], ["c1"], "stem",
          kernel_shape=[16, 16], strides=[16, 16], pads=[0, 0, 0, 0]),
        n("Sigmoid", ["c1"], ["c1_sig"], "stem_sig"),
        n("Mul", ["c1", "c1_sig"], ["silu1"], "stem_silu"),
        n("MaxPool", ["silu1"], ["p1"], "pool",
          kernel_shape=[2, 2], strides=[2, 2]),
        n("Conv", ["p1", "w_mid", "b_mid"], ["c2"], "mid",
          kernel_shape=[3, 3], strides=[1, 1], pads=[1, 1, 1, 1]),
        n("Sigmoid", ["c2"], ["c2_sig"], "mid_sig"),
        n("Mul", ["c2", "c2_sig"], ["silu2"], "mid_silu"),
        n("Add", ["p1", "silu2"], ["r2"], "residual"),
        n("Resize", ["r2", "", "up_scales"], ["up"], "upsample",
          mode="nearest", coordinate_transformation_mode="asymmetric",
          nearest_mode="floor"),
        n("Concat", ["up", "silu1"], ["cat"], "neck_concat", axis=1),
        n("Conv", ["cat", "w_head", "b_head"], ["head"], "head",
          kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0]),
        n("Split", ["head", "split_4_nc"], ["box_raw", "cls_raw"], "split_head", axis=1),
        n("Mul", ["box_raw", "box_scale"], ["box_scaled"], "box_mul"),
        n("Add", ["box_scaled", "box_off"], ["box"], "box_add"),
        n("Mul", ["cls_raw", "cls_gain"], ["cls_gained"], "cls_mul"),
        n("Sub", ["cls_gained", "cls_shift"], ["cls_logit"], "cls_sub"),
        n("Sigmoid", ["cls_logit"], ["cls"], "cls_sig"),
        n("Concat", ["box", "cls"], ["pre"], "out_concat", axis=1),
        n("Transpose", ["pre"], ["pre_t"], "out_transpose", perm=[0, 1, 3, 2]),
        n("Reshape", ["pre_t", "out_shape"], ["output0"], "out_reshape"),
    ]

    graph = GraphProto(
        name="tiny-detector",
        node=nodes,
        initializer=inits,
        input=[ValueInfoProto.make("images", [1, 3, 640, 640])],
        output=[ValueInfoProto.make("output0", [1, 4 + nc, 1600])],
    )
    return ModelProto(graph=graph)


def make_yolov8n_skeleton(
    seed: int = 11,
    num_classes: int = 80,
    gain_mult: float = 1.7,
    cls_gain: float = 5.0,
    cls_bias: float = -0.75,
) -> ModelProto:
    """Structurally faithful YOLOv8 detector at the reference's REAL head
    geometry (S/processor/YOLODetector.java:180-206 reads output0
    [1, 84, 8400]; src/main/resources/models/yolo_export.py exports
    yolov8n at opset 12): input "images" [1,3,640,640], three detection
    scales (stride 8/16/32 -> 80x80 + 40x40 + 20x20 = 8400 candidates)
    fused to output0 [1, 4+num_classes, 8400] with rows 0..3 =
    (cx, cy, w, h) in 640-space and rows 4.. = sigmoid class scores.

    Every architectural element of the ultralytics graph is present and
    runs through this module's op table:

    - Conv + SiLU (Sigmoid x Mul) blocks throughout;
    - C2f blocks: 1x1 cv1 -> Split(h,h) -> 3x3/3x3 bottleneck (+residual
      Add when shortcut) -> 3-way Concat -> 1x1 cv2;
    - SPPF: 1x1 -> three stacked MaxPool(k=5, s=1, p=2) -> 4-way Concat
      -> 1x1;
    - PAN neck: two nearest/asymmetric/floor Resize x2 upsamples with
      lateral Concats, then two stride-2 Conv downsamples with Concats;
    - decoupled head per scale (box and cls towers), per-scale Reshape
      to [1,144,hw] and cross-scale Concat on the anchor axis;
    - DFL: Reshape [1,4,16,8400] -> Transpose -> Softmax(axis=1) ->
      1x1 Conv with frozen arange(16) weights -> Reshape [1,4,8400];
    - dist2bbox: Split(lt,rb) -> anchor Sub/Add -> center/size
      Add/Div/Sub -> Concat -> per-anchor stride Mul (anchor grid and
      stride row are Constant-folded initializers, as in the static
      opset-12 export);
    - Sigmoid over the 80 class logits, final Concat to [1,84,8400].

    What is NOT real: the weights (seeded PCG64 noise — no network access
    to fetch yolov8n.pt) and the channel widths (4..32 vs 16..256, so the
    pure-numpy graph stays ~1e8 MACs/image). Gains are fan-in scaled so
    activations neither die nor blow up through the 30-conv depth; the
    cls tower's final bias sits low enough that only a sparse tail of the
    8400 candidates clears the 0.5 confidence gate, exercising
    postprocess + per-class NMS at true candidate scale.
    """
    rng = np.random.default_rng(seed)
    nc = num_classes
    inits: list = []
    nodes: list = []

    def const(name: str, arr: np.ndarray) -> str:
        inits.append(numpy_to_tensor(name, np.ascontiguousarray(arr)))
        return name

    def weight(name: str, *shape: int, gain: float) -> str:
        return const(name, (rng.standard_normal(shape) * gain).astype(np.float32))

    def node(op_type: str, inputs: list, outputs: list, name: str, **attrs):
        alist = []
        for k, v in attrs.items():
            if isinstance(v, int):
                alist.append(AttributeProto.make_int(k, v))
            elif isinstance(v, float):
                alist.append(AttributeProto.make_float(k, v))
            elif isinstance(v, str):
                alist.append(AttributeProto.make_string(k, v))
            elif isinstance(v, list):
                alist.append(AttributeProto.make_ints(k, v))
            else:  # pragma: no cover - fixture-internal
                raise TypeError(f"attr {k}: {type(v)}")
        nodes.append(
            NodeProto(op_type=op_type, name=name, input=inputs, output=outputs, attribute=alist)
        )

    # SiLU attenuates variance by ~0.36 for zero-mean input; 1.7/sqrt(fan_in)
    # holds activation scale roughly flat through the stack.
    def conv(x: str, cin: int, cout: int, k: int, s: int, tag: str,
             act: bool = True, bias_shift: float = 0.0, gmult: float | None = None) -> str:
        gain = (gain_mult if gmult is None else gmult) / float(np.sqrt(cin * k * k))
        wn = weight(f"w_{tag}", cout, cin, k, k, gain=gain)
        b = (rng.standard_normal(cout) * 0.02 + bias_shift).astype(np.float32)
        bn = const(f"b_{tag}", b)
        p = k // 2
        node("Conv", [x, wn, bn], [f"{tag}_c"], tag,
             kernel_shape=[k, k], strides=[s, s], pads=[p, p, p, p])
        if not act:
            return f"{tag}_c"
        node("Sigmoid", [f"{tag}_c"], [f"{tag}_s"], f"{tag}_sig")
        node("Mul", [f"{tag}_c", f"{tag}_s"], [tag], f"{tag}_silu")
        return tag

    def c2f(x: str, cin: int, cout: int, tag: str, shortcut: bool) -> str:
        h = cout // 2
        y = conv(x, cin, cout, 1, 1, f"{tag}_cv1")
        node("Split", [y, const(f"{tag}_hh", np.array([h, h], dtype=np.int64))],
             [f"{tag}_a", f"{tag}_b"], f"{tag}_sp", axis=1)
        m = conv(f"{tag}_b", h, h, 3, 1, f"{tag}_m1")
        m = conv(m, h, h, 3, 1, f"{tag}_m2")
        if shortcut:
            node("Add", [f"{tag}_b", m], [f"{tag}_mr"], f"{tag}_add")
            m = f"{tag}_mr"
        node("Concat", [f"{tag}_a", f"{tag}_b", m], [f"{tag}_cat"], f"{tag}_cc", axis=1)
        return conv(f"{tag}_cat", 3 * h, cout, 1, 1, f"{tag}_cv2")

    def sppf(x: str, c: int, tag: str) -> str:
        h = c // 2
        y = conv(x, c, h, 1, 1, f"{tag}_cv1")
        prev = y
        pools = []
        for i in (1, 2, 3):
            node("MaxPool", [prev], [f"{tag}_p{i}"], f"{tag}_mp{i}",
                 kernel_shape=[5, 5], strides=[1, 1], pads=[2, 2, 2, 2])
            pools.append(f"{tag}_p{i}")
            prev = f"{tag}_p{i}"
        node("Concat", [y] + pools, [f"{tag}_cat"], f"{tag}_cc", axis=1)
        return conv(f"{tag}_cat", 4 * h, c, 1, 1, f"{tag}_cv2")

    def upsample(x: str, tag: str) -> str:
        node("Resize", [x, "", "up2_scales"], [tag], f"{tag}_rs",
             mode="nearest", coordinate_transformation_mode="asymmetric",
             nearest_mode="floor")
        return tag

    const("up2_scales", np.array([1, 1, 2, 2], dtype=np.float32))

    # ---- backbone (yolov8n topology, depth 1, skeleton widths) ----
    c1, c2, c3, c4, c5 = 4, 8, 16, 24, 32
    x = conv("images", 3, c1, 3, 2, "bb0")            # P1 320x320
    x = conv(x, c1, c2, 3, 2, "bb1")                  # P2 160x160
    x = c2f(x, c2, c2, "bb2", shortcut=True)
    x = conv(x, c2, c3, 3, 2, "bb3")                  # P3 80x80
    p3 = c2f(x, c3, c3, "bb4", shortcut=True)
    x = conv(p3, c3, c4, 3, 2, "bb5")                 # P4 40x40
    p4 = c2f(x, c4, c4, "bb6", shortcut=True)
    x = conv(p4, c4, c5, 3, 2, "bb7")                 # P5 20x20
    x = c2f(x, c5, c5, "bb8", shortcut=True)
    p5 = sppf(x, c5, "bb9")

    # ---- PAN neck ----
    u5 = upsample(p5, "nk_u5")                        # 32 @ 40x40
    node("Concat", [u5, p4], ["nk_cat54"], "nk_cc54", axis=1)
    n4 = c2f("nk_cat54", c5 + c4, c4, "nk12", shortcut=False)
    u4 = upsample(n4, "nk_u4")                        # 24 @ 80x80
    node("Concat", [u4, p3], ["nk_cat43"], "nk_cc43", axis=1)
    n3 = c2f("nk_cat43", c4 + c3, c3, "nk15", shortcut=False)   # head in, stride 8
    d3 = conv(n3, c3, c3, 3, 2, "nk16")               # 16 @ 40x40
    node("Concat", [d3, n4], ["nk_cat34"], "nk_cc34", axis=1)
    n4b = c2f("nk_cat34", c3 + c4, c4, "nk18", shortcut=False)  # head in, stride 16
    d4 = conv(n4b, c4, c4, 3, 2, "nk19")              # 24 @ 20x20
    node("Concat", [d4, p5], ["nk_cat45"], "nk_cc45", axis=1)
    n5 = c2f("nk_cat45", c4 + c5, c5, "nk21", shortcut=False)   # head in, stride 32

    # ---- decoupled head per scale ----
    reg_max, ch_head = 16, 16

    def head(x: str, cin: int, hw: int, tag: str) -> str:
        b = conv(x, cin, ch_head, 3, 1, f"{tag}_b1")
        b = conv(b, ch_head, ch_head, 3, 1, f"{tag}_b2")
        box = conv(b, ch_head, 4 * reg_max, 1, 1, f"{tag}_box", act=False)
        c = conv(x, cin, ch_head, 3, 1, f"{tag}_c1")
        c = conv(c, ch_head, ch_head, 3, 1, f"{tag}_c2")
        # low bias: sigmoid(logit) clears 0.5 only on the sparse tail
        cls = conv(c, ch_head, nc, 1, 1, f"{tag}_cls", act=False,
                   bias_shift=cls_bias, gmult=cls_gain)
        node("Concat", [box, cls], [f"{tag}_bc"], f"{tag}_cc", axis=1)
        node("Reshape",
             [f"{tag}_bc", const(f"{tag}_shape",
                                 np.array([1, 4 * reg_max + nc, hw], dtype=np.int64))],
             [f"{tag}_flat"], f"{tag}_rs")
        return f"{tag}_flat"

    h3 = head(n3, c3, 80 * 80, "hd8")
    h4 = head(n4b, c4, 40 * 40, "hd16")
    h5 = head(n5, c5, 20 * 20, "hd32")
    node("Concat", [h3, h4, h5], ["fused"], "fuse", axis=2)   # [1,144,8400]
    node("Split", ["fused", const("sp_box_cls",
                                  np.array([4 * reg_max, nc], dtype=np.int64))],
         ["dist_raw", "cls_raw"], "sp_head", axis=1)

    # ---- DFL (ultralytics nn.modules.block.DFL as exported) ----
    na = 80 * 80 + 40 * 40 + 20 * 20  # 8400
    node("Reshape", ["dist_raw", const("dfl_view",
                                       np.array([1, 4, reg_max, na], dtype=np.int64))],
         ["dfl_r"], "dfl_reshape")
    node("Transpose", ["dfl_r"], ["dfl_t"], "dfl_transpose", perm=[0, 2, 1, 3])
    node("Softmax", ["dfl_t"], ["dfl_sm"], "dfl_softmax", axis=1)
    node("Conv", ["dfl_sm", const("dfl_w",
                                  np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1))],
         ["dfl_c"], "dfl_conv", kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0])
    node("Reshape", ["dfl_c", const("dist_view", np.array([1, 4, na], dtype=np.int64))],
         ["dist"], "dist_reshape")

    # ---- dist2bbox over the constant-folded anchor grid ----
    ax, ay, astr = [], [], []
    for s, g in ((8, 80), (16, 40), (32, 20)):
        xs = np.arange(g, dtype=np.float32) + 0.5
        ax.append(np.tile(xs, g))          # x inner (row-major flatten of h,w)
        ay.append(np.repeat(xs, g))        # y outer
        astr.append(np.full(g * g, s, dtype=np.float32))
    anchors = np.stack([np.concatenate(ax), np.concatenate(ay)])[None]  # [1,2,8400]
    const("anchors", anchors.astype(np.float32))
    const("strides", np.concatenate(astr).reshape(1, 1, na))
    const("two", np.array(2.0, dtype=np.float32))
    node("Split", ["dist", const("sp_ltrb", np.array([2, 2], dtype=np.int64))],
         ["lt", "rb"], "sp_dist", axis=1)
    node("Sub", ["anchors", "lt"], ["x1y1"], "d2b_sub")
    node("Add", ["anchors", "rb"], ["x2y2"], "d2b_add")
    node("Add", ["x1y1", "x2y2"], ["xysum"], "d2b_sum")
    node("Div", ["xysum", "two"], ["cxy"], "d2b_div")
    node("Sub", ["x2y2", "x1y1"], ["wh"], "d2b_wh")
    node("Concat", ["cxy", "wh"], ["box_grid"], "d2b_cat", axis=1)
    node("Mul", ["box_grid", "strides"], ["box"], "d2b_scale")
    node("Sigmoid", ["cls_raw"], ["cls"], "cls_sigmoid")
    node("Concat", ["box", "cls"], ["output0"], "out", axis=1)

    graph = GraphProto(
        name="yolov8n-skeleton",
        node=nodes,
        initializer=inits,
        input=[ValueInfoProto.make("images", [1, 3, 640, 640])],
        output=[ValueInfoProto.make("output0", [1, 4 + nc, na])],
    )
    return ModelProto(graph=graph)


def make_int8_convnet(num_classes: int = 5) -> ModelProto:
    """Integer-exact convnet fixture for the DIFFERENTIAL-checked ONNX
    lane (u05): Conv 1->4 3x3 valid -> Relu -> MaxPool 2x2/2 -> Flatten
    -> Gemm(transB) over an 8x8 single-channel integer image. Every
    weight is a SMALL INTEGER derived from md5 (replayable in ANSI SQL:
    conv taps/Gemm in [-2,2], conv bias [-3,3], Gemm bias [-4,4]),
    stored as float32; with uint8 inputs the largest intermediate is
    |logit| <= 36 * 2 * (3 + 9*2*255) + 4 ~ 3.3e5 << 2^24, so the
    float32 forward pass is EXACT integer arithmetic end-to-end and a
    SQL engine can replay it with nested list folds (u05's oracle).
    The executor path certified is the same one u04's full skeleton
    exercises (im2col Conv, MaxPool, Gemm — YOLODetector.java:92-175's
    inference contract)."""
    import hashlib

    def mi(tag: str, mod: int, shift: int) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % mod - shift

    nc = num_classes
    w_conv = np.array(
        [[mi(f"cw:{c}:{t}", 5, 2) for t in range(9)] for c in range(4)],
        dtype=np.float32,
    ).reshape(4, 1, 3, 3)
    b_conv = np.array([mi(f"cb:{c}", 7, 3) for c in range(4)], dtype=np.float32)
    w_fc = np.array(
        [[mi(f"gw:{o}:{k}", 5, 2) for k in range(36)] for o in range(nc)],
        dtype=np.float32,
    )
    b_fc = np.array([mi(f"gb:{o}", 9, 4) for o in range(nc)], dtype=np.float32)

    def attr_ints(name: str, v: list[int]) -> AttributeProto:
        return AttributeProto.make_ints(name, v)

    nodes = [
        NodeProto(
            op_type="Conv",
            name="conv",
            input=["pix", "w_conv", "b_conv"],
            output=["c1"],
            attribute=[
                attr_ints("kernel_shape", [3, 3]),
                attr_ints("strides", [1, 1]),
                attr_ints("pads", [0, 0, 0, 0]),
            ],
        ),
        NodeProto(op_type="Relu", name="relu", input=["c1"], output=["r1"], attribute=[]),
        NodeProto(
            op_type="MaxPool",
            name="pool",
            input=["r1"],
            output=["p1"],
            attribute=[attr_ints("kernel_shape", [2, 2]), attr_ints("strides", [2, 2])],
        ),
        NodeProto(
            op_type="Flatten",
            name="flat",
            input=["p1"],
            output=["f1"],
            attribute=[AttributeProto.make_int("axis", 1)],
        ),
        NodeProto(
            op_type="Gemm",
            name="fc",
            input=["f1", "w_fc", "b_fc"],
            output=["logits"],
            attribute=[AttributeProto.make_int("transB", 1)],
        ),
    ]
    graph = GraphProto(
        name="int8-convnet",
        node=nodes,
        initializer=[
            numpy_to_tensor("w_conv", w_conv),
            numpy_to_tensor("b_conv", b_conv),
            numpy_to_tensor("w_fc", w_fc),
            numpy_to_tensor("b_fc", b_fc),
        ],
        input=[ValueInfoProto.make("pix", [1, 1, 8, 8])],
        output=[ValueInfoProto.make("logits", [1, nc])],
    )
    return ModelProto(graph=graph)
