"""Minimal, dependency-free ONNX protobuf reader/writer.

The reference runs its detector through onnxruntime
(/root/reference/src/main/java/com/video/streaming/processor/
YOLODetector.java:71-90 builds an OrtSession from a .onnx file); this
container has no onnxruntime wheel, so the engine carries its own tiny
ONNX layer: this module parses/serializes the handful of message types a
detector graph needs, and operators/onnx_numpy.py executes the parsed
graph with numpy. Everything here is derived from the PUBLIC protobuf
wire format (varint / length-delimited / fixed32) and the PUBLIC
onnx.proto schema field numbers — no onnx package required.

Only the fields the executor consumes are materialized; unknown fields
are skipped on read (forward-compatible, per protobuf semantics) and
never written. Supported subset:

  ModelProto { ir_version=1, producer_name=2, graph=7, opset_import=8 }
  OperatorSetIdProto { domain=1, version=2 }
  GraphProto { node=1, name=2, initializer=5, input=11, output=12 }
  NodeProto { input=1, output=2, name=3, op_type=4, attribute=5 }
  AttributeProto { name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20 }
  TensorProto { dims=1, data_type=2, float_data=4, int32_data=5,
                int64_data=7, name=8, raw_data=9 }
  ValueInfoProto { name=1, type=2 } / TypeProto { tensor_type=1 }
  TypeProto.Tensor { elem_type=1, shape=2 }
  TensorShapeProto { dim=1 } / Dimension { dim_value=1, dim_param=2 }

Serialization is deterministic (fields in ascending field-number order,
repeated fields in insertion order), so a generated fixture model is
byte-for-byte reproducible — tests/test_onnx_numpy.py pins that.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "AttributeProto",
    "Dimension",
    "GraphProto",
    "ModelProto",
    "NodeProto",
    "OperatorSetIdProto",
    "TensorProto",
    "ValueInfoProto",
    "load_model",
    "save_model",
    "tensor_to_numpy",
    "numpy_to_tensor",
]

# TensorProto.DataType values (onnx.proto, public enum)
DT_FLOAT = 1
DT_UINT8 = 2
DT_INT32 = 6
DT_INT64 = 7

# AttributeProto.AttributeType values
AT_FLOAT = 1
AT_INT = 2
AT_STRING = 3
AT_TENSOR = 4
AT_FLOATS = 6
AT_INTS = 7


# --------------------------------------------------------------------------
# wire-format primitives
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt protobuf)")


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # two's-complement int64, 10-byte encoding
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _signed(value: int) -> int:
    """Interpret a decoded varint as int64 (negative values are encoded
    as their 2^64 complement)."""
    return value - (1 << 64) if value >= 1 << 63 else value


def _read_tag(buf: bytes, pos: int) -> tuple[int, int, int]:
    tag, pos = _read_varint(buf, pos)
    return tag >> 3, tag & 0x7, pos


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_varint(buf, pos)
    end = pos + n
    if end > len(buf):
        raise ValueError(
            f"length-delimited field of {n} bytes overruns buffer "
            f"({len(buf) - pos} remaining) — corrupt protobuf"
        )
    return buf[pos:end], end


def _read_fixed32_float(buf: bytes, pos: int) -> tuple[float, int]:
    if pos + 4 > len(buf):
        raise ValueError("fixed32 field overruns buffer — corrupt protobuf")
    return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4


def _read_repeated_int(buf: bytes, pos: int, wire: int, dest: list[int]) -> int:
    """Repeated int64 field: packed (wire 2) or one-at-a-time (wire 0)."""
    if wire == 2:
        chunk, pos = _read_bytes(buf, pos)
        p = 0
        while p < len(chunk):
            v, p = _read_varint(chunk, p)
            dest.append(_signed(v))
        return pos
    if wire != 0:
        raise ValueError(f"repeated int64 field has wire type {wire}, expected 0 or 2")
    v, pos = _read_varint(buf, pos)
    dest.append(_signed(v))
    return pos


def _read_repeated_float(buf: bytes, pos: int, wire: int, dest: list[float]) -> int:
    if wire == 2:
        chunk, pos = _read_bytes(buf, pos)
        if len(chunk) % 4:
            raise ValueError(
                f"packed float field length {len(chunk)} not a multiple of 4"
            )
        dest.extend(struct.unpack(f"<{len(chunk) // 4}f", chunk))
        return pos
    if wire != 5:
        raise ValueError(f"repeated float field has wire type {wire}, expected 5 or 2")
    v, pos = _read_fixed32_float(buf, pos)
    dest.append(v)
    return pos


def _emit_tag(out: bytearray, fieldno: int, wire: int) -> None:
    _write_varint(out, (fieldno << 3) | wire)


def _emit_len(out: bytearray, fieldno: int, payload: bytes) -> None:
    _emit_tag(out, fieldno, 2)
    _write_varint(out, len(payload))
    out.extend(payload)


def _emit_int(out: bytearray, fieldno: int, value: int) -> None:
    _emit_tag(out, fieldno, 0)
    _write_varint(out, value)


def _emit_packed_ints(out: bytearray, fieldno: int, values: list[int]) -> None:
    if not values:
        return
    body = bytearray()
    for v in values:
        _write_varint(body, v)
    _emit_len(out, fieldno, bytes(body))


def _emit_packed_floats(out: bytearray, fieldno: int, values: list[float]) -> None:
    if not values:
        return
    _emit_len(out, fieldno, struct.pack(f"<{len(values)}f", *values))


# --------------------------------------------------------------------------
# message types (only the consumed subset)
# --------------------------------------------------------------------------


@dataclass
class TensorProto:
    name: str = ""
    data_type: int = DT_FLOAT
    dims: list[int] = field(default_factory=list)
    float_data: list[float] = field(default_factory=list)
    int32_data: list[int] = field(default_factory=list)
    int64_data: list[int] = field(default_factory=list)
    raw_data: bytes = b""

    @classmethod
    def parse(cls, buf: bytes) -> "TensorProto":
        t = cls()
        pos = 0
        while pos < len(buf):
            f, wire, pos = _read_tag(buf, pos)
            if f == 1:
                pos = _read_repeated_int(buf, pos, wire, t.dims)
            elif f == 2:
                v, pos = _read_varint(buf, pos)
                t.data_type = v
            elif f == 4:
                pos = _read_repeated_float(buf, pos, wire, t.float_data)
            elif f == 5:
                pos = _read_repeated_int(buf, pos, wire, t.int32_data)
            elif f == 7:
                pos = _read_repeated_int(buf, pos, wire, t.int64_data)
            elif f == 8:
                b, pos = _read_bytes(buf, pos)
                t.name = b.decode("utf-8")
            elif f == 9:
                t.raw_data, pos = _read_bytes(buf, pos)
            else:
                pos = _skip_field(buf, pos, wire)
        return t

    def serialize(self) -> bytes:
        out = bytearray()
        _emit_packed_ints(out, 1, self.dims)
        _emit_int(out, 2, self.data_type)
        _emit_packed_floats(out, 4, self.float_data)
        _emit_packed_ints(out, 5, self.int32_data)
        _emit_packed_ints(out, 7, self.int64_data)
        if self.name:
            _emit_len(out, 8, self.name.encode("utf-8"))
        if self.raw_data:
            _emit_len(out, 9, self.raw_data)
        return bytes(out)


@dataclass
class AttributeProto:
    name: str = ""
    type: int = 0
    f: float = 0.0
    i: int = 0
    s: bytes = b""
    t: TensorProto | None = None
    floats: list[float] = field(default_factory=list)
    ints: list[int] = field(default_factory=list)

    @classmethod
    def parse(cls, buf: bytes) -> "AttributeProto":
        a = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                b, pos = _read_bytes(buf, pos)
                a.name = b.decode("utf-8")
            elif fno == 2:
                if wire != 5:
                    raise ValueError(
                        f"AttributeProto.f has wire type {wire}, expected 5 (fixed32)"
                    )
                a.f, pos = _read_fixed32_float(buf, pos)
            elif fno == 3:
                v, pos = _read_varint(buf, pos)
                a.i = _signed(v)
            elif fno == 4:
                a.s, pos = _read_bytes(buf, pos)
            elif fno == 5:
                b, pos = _read_bytes(buf, pos)
                a.t = TensorProto.parse(b)
            elif fno == 7:
                pos = _read_repeated_float(buf, pos, wire, a.floats)
            elif fno == 8:
                pos = _read_repeated_int(buf, pos, wire, a.ints)
            elif fno == 20:
                a.type, pos = _read_varint(buf, pos)
            else:
                pos = _skip_field(buf, pos, wire)
        return a

    def serialize(self) -> bytes:
        out = bytearray()
        _emit_len(out, 1, self.name.encode("utf-8"))
        if self.type == AT_FLOAT:
            _emit_tag(out, 2, 5)
            out.extend(struct.pack("<f", self.f))
        elif self.type == AT_INT:
            _emit_tag(out, 3, 0)
            _write_varint(out, self.i)
        elif self.type == AT_STRING:
            _emit_len(out, 4, self.s)
        elif self.type == AT_TENSOR and self.t is not None:
            _emit_len(out, 5, self.t.serialize())
        elif self.type == AT_FLOATS:
            _emit_packed_floats(out, 7, self.floats)
        elif self.type == AT_INTS:
            _emit_packed_ints(out, 8, self.ints)
        _emit_int(out, 20, self.type)
        return bytes(out)

    # convenience constructors used by the fixture generator
    @classmethod
    def make_int(cls, name: str, value: int) -> "AttributeProto":
        return cls(name=name, type=AT_INT, i=value)

    @classmethod
    def make_ints(cls, name: str, values: list[int]) -> "AttributeProto":
        return cls(name=name, type=AT_INTS, ints=list(values))

    @classmethod
    def make_float(cls, name: str, value: float) -> "AttributeProto":
        return cls(name=name, type=AT_FLOAT, f=value)

    @classmethod
    def make_string(cls, name: str, value: str) -> "AttributeProto":
        return cls(name=name, type=AT_STRING, s=value.encode("utf-8"))


@dataclass
class NodeProto:
    op_type: str = ""
    name: str = ""
    input: list[str] = field(default_factory=list)
    output: list[str] = field(default_factory=list)
    attribute: list[AttributeProto] = field(default_factory=list)

    @classmethod
    def parse(cls, buf: bytes) -> "NodeProto":
        n = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                b, pos = _read_bytes(buf, pos)
                n.input.append(b.decode("utf-8"))
            elif fno == 2:
                b, pos = _read_bytes(buf, pos)
                n.output.append(b.decode("utf-8"))
            elif fno == 3:
                b, pos = _read_bytes(buf, pos)
                n.name = b.decode("utf-8")
            elif fno == 4:
                b, pos = _read_bytes(buf, pos)
                n.op_type = b.decode("utf-8")
            elif fno == 5:
                b, pos = _read_bytes(buf, pos)
                n.attribute.append(AttributeProto.parse(b))
            else:
                pos = _skip_field(buf, pos, wire)
        return n

    def serialize(self) -> bytes:
        out = bytearray()
        for s in self.input:
            _emit_len(out, 1, s.encode("utf-8"))
        for s in self.output:
            _emit_len(out, 2, s.encode("utf-8"))
        if self.name:
            _emit_len(out, 3, self.name.encode("utf-8"))
        _emit_len(out, 4, self.op_type.encode("utf-8"))
        for a in self.attribute:
            _emit_len(out, 5, a.serialize())
        return bytes(out)

    def attrs(self) -> dict[str, AttributeProto]:
        return {a.name: a for a in self.attribute}


@dataclass
class Dimension:
    dim_value: int = -1
    dim_param: str = ""

    @classmethod
    def parse(cls, buf: bytes) -> "Dimension":
        d = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                v, pos = _read_varint(buf, pos)
                d.dim_value = _signed(v)
            elif fno == 2:
                b, pos = _read_bytes(buf, pos)
                d.dim_param = b.decode("utf-8")
            else:
                pos = _skip_field(buf, pos, wire)
        return d

    def serialize(self) -> bytes:
        out = bytearray()
        if self.dim_param:
            _emit_len(out, 2, self.dim_param.encode("utf-8"))
        else:
            _emit_int(out, 1, self.dim_value)
        return bytes(out)


@dataclass
class ValueInfoProto:
    """ValueInfoProto with the TypeProto/Tensor/Shape chain flattened to
    (elem_type, dims) — the only content the executor needs."""

    name: str = ""
    elem_type: int = DT_FLOAT
    dims: list[Dimension] = field(default_factory=list)

    @classmethod
    def parse(cls, buf: bytes) -> "ValueInfoProto":
        v = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                b, pos = _read_bytes(buf, pos)
                v.name = b.decode("utf-8")
            elif fno == 2:  # TypeProto
                b, pos = _read_bytes(buf, pos)
                v._parse_type(b)
            else:
                pos = _skip_field(buf, pos, wire)
        return v

    def _parse_type(self, buf: bytes) -> None:
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:  # TypeProto.Tensor
                b, pos = _read_bytes(buf, pos)
                self._parse_tensor_type(b)
            else:
                pos = _skip_field(buf, pos, wire)

    def _parse_tensor_type(self, buf: bytes) -> None:
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                v, pos = _read_varint(buf, pos)
                self.elem_type = v
            elif fno == 2:  # TensorShapeProto
                b, pos = _read_bytes(buf, pos)
                p = 0
                while p < len(b):
                    f2, w2, p = _read_tag(b, p)
                    if f2 == 1:
                        db, p = _read_bytes(b, p)
                        self.dims.append(Dimension.parse(db))
                    else:
                        p = _skip_field(b, p, w2)
            else:
                pos = _skip_field(buf, pos, wire)

    def serialize(self) -> bytes:
        shape = bytearray()
        for d in self.dims:
            _emit_len(shape, 1, d.serialize())
        tensor_type = bytearray()
        _emit_int(tensor_type, 1, self.elem_type)
        _emit_len(tensor_type, 2, bytes(shape))
        type_proto = bytearray()
        _emit_len(type_proto, 1, bytes(tensor_type))
        out = bytearray()
        _emit_len(out, 1, self.name.encode("utf-8"))
        _emit_len(out, 2, bytes(type_proto))
        return bytes(out)

    @classmethod
    def make(cls, name: str, dims: list[int], elem_type: int = DT_FLOAT) -> "ValueInfoProto":
        return cls(name=name, elem_type=elem_type, dims=[Dimension(dim_value=d) for d in dims])


@dataclass
class GraphProto:
    name: str = ""
    node: list[NodeProto] = field(default_factory=list)
    initializer: list[TensorProto] = field(default_factory=list)
    input: list[ValueInfoProto] = field(default_factory=list)
    output: list[ValueInfoProto] = field(default_factory=list)

    @classmethod
    def parse(cls, buf: bytes) -> "GraphProto":
        g = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                b, pos = _read_bytes(buf, pos)
                g.node.append(NodeProto.parse(b))
            elif fno == 2:
                b, pos = _read_bytes(buf, pos)
                g.name = b.decode("utf-8")
            elif fno == 5:
                b, pos = _read_bytes(buf, pos)
                g.initializer.append(TensorProto.parse(b))
            elif fno == 11:
                b, pos = _read_bytes(buf, pos)
                g.input.append(ValueInfoProto.parse(b))
            elif fno == 12:
                b, pos = _read_bytes(buf, pos)
                g.output.append(ValueInfoProto.parse(b))
            else:
                pos = _skip_field(buf, pos, wire)
        return g

    def serialize(self) -> bytes:
        out = bytearray()
        for n in self.node:
            _emit_len(out, 1, n.serialize())
        _emit_len(out, 2, self.name.encode("utf-8"))
        for t in self.initializer:
            _emit_len(out, 5, t.serialize())
        for v in self.input:
            _emit_len(out, 11, v.serialize())
        for v in self.output:
            _emit_len(out, 12, v.serialize())
        return bytes(out)


@dataclass
class OperatorSetIdProto:
    domain: str = ""
    version: int = 17

    @classmethod
    def parse(cls, buf: bytes) -> "OperatorSetIdProto":
        o = cls()
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                b, pos = _read_bytes(buf, pos)
                o.domain = b.decode("utf-8")
            elif fno == 2:
                v, pos = _read_varint(buf, pos)
                o.version = _signed(v)
            else:
                pos = _skip_field(buf, pos, wire)
        return o

    def serialize(self) -> bytes:
        out = bytearray()
        if self.domain:
            _emit_len(out, 1, self.domain.encode("utf-8"))
        _emit_int(out, 2, self.version)
        return bytes(out)


@dataclass
class ModelProto:
    ir_version: int = 8
    producer_name: str = "video-stream-processing-spark"
    graph: GraphProto = field(default_factory=GraphProto)
    opset_import: list[OperatorSetIdProto] = field(
        default_factory=lambda: [OperatorSetIdProto()]
    )

    @classmethod
    def parse(cls, buf: bytes) -> "ModelProto":
        m = cls(opset_import=[])
        pos = 0
        while pos < len(buf):
            fno, wire, pos = _read_tag(buf, pos)
            if fno == 1:
                v, pos = _read_varint(buf, pos)
                m.ir_version = _signed(v)
            elif fno == 2:
                b, pos = _read_bytes(buf, pos)
                m.producer_name = b.decode("utf-8")
            elif fno == 7:
                b, pos = _read_bytes(buf, pos)
                m.graph = GraphProto.parse(b)
            elif fno == 8:
                b, pos = _read_bytes(buf, pos)
                m.opset_import.append(OperatorSetIdProto.parse(b))
            else:
                pos = _skip_field(buf, pos, wire)
        if not m.opset_import:
            m.opset_import = [OperatorSetIdProto()]
        return m

    def serialize(self) -> bytes:
        out = bytearray()
        _emit_int(out, 1, self.ir_version)
        _emit_len(out, 2, self.producer_name.encode("utf-8"))
        _emit_len(out, 7, self.graph.serialize())
        for o in self.opset_import:
            _emit_len(out, 8, o.serialize())
        return bytes(out)


# --------------------------------------------------------------------------
# numpy bridge + file I/O
# --------------------------------------------------------------------------


def tensor_to_numpy(t: TensorProto):
    """TensorProto -> numpy array (always a fresh WRITABLE array; the
    executor may fold weights in place). raw_data (little-endian, the
    ONNX spec's layout) takes precedence over the typed repeated fields;
    either payload's element count is validated against prod(dims) so a
    truncated tensor raises instead of silently mis-shaping."""
    import numpy as np

    if t.data_type == DT_FLOAT:
        dtype = np.dtype("<f4")
        typed = t.float_data
    elif t.data_type == DT_INT64:
        dtype = np.dtype("<i8")
        typed = t.int64_data
    elif t.data_type == DT_INT32:
        dtype = np.dtype("<i4")
        typed = t.int32_data
    elif t.data_type == DT_UINT8:
        dtype = np.dtype("u1")
        typed = t.int32_data  # spec stores uint8 in int32_data
    else:
        raise NotImplementedError(f"tensor data_type {t.data_type} not supported")
    n_expected = 1
    for d in t.dims:
        n_expected *= d
    if t.raw_data:
        if len(t.raw_data) != n_expected * dtype.itemsize:
            raise ValueError(
                f"tensor {t.name!r}: raw_data is {len(t.raw_data)} bytes, "
                f"dims {t.dims} require {n_expected * dtype.itemsize}"
            )
        # .copy(): np.frombuffer views the (immutable) bytes read-only
        arr = np.frombuffer(t.raw_data, dtype=dtype).copy()
    else:
        if len(typed) != n_expected:
            raise ValueError(
                f"tensor {t.name!r}: {len(typed)} typed elements, "
                f"dims {t.dims} require {n_expected}"
            )
        arr = np.asarray(typed, dtype=dtype)
    return arr.reshape(t.dims if t.dims else ())


def numpy_to_tensor(name: str, arr) -> TensorProto:
    """numpy array -> TensorProto (raw_data layout, little-endian)."""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype == np.float32:
        dt = DT_FLOAT
    elif a.dtype == np.int64:
        dt = DT_INT64
    elif a.dtype == np.int32:
        dt = DT_INT32
    elif a.dtype == np.uint8:
        dt = DT_UINT8
    else:
        raise NotImplementedError(f"dtype {a.dtype} not supported; cast first")
    return TensorProto(
        name=name,
        data_type=dt,
        dims=list(a.shape),
        raw_data=np.ascontiguousarray(a).astype(a.dtype.newbyteorder("<")).tobytes(),
    )


def load_model(path_or_bytes) -> ModelProto:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return ModelProto.parse(bytes(path_or_bytes))
    with open(path_or_bytes, "rb") as fh:
        return ModelProto.parse(fh.read())


def save_model(model: ModelProto, path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(model.serialize())
