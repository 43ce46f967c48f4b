"""Dependency-free image codec (functions/imagecodec.py) + the closed
bytes->decode->preprocess->detect->NMS chain it enables (VERDICT r3
item 3): real planted BMP/PPM bytes flow through OnnxDetector's DEFAULT
decoder with no Pillow in the container.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from video_stream_processing_spark.functions.imagecodec import (
    decode_bmp,
    decode_image_bgr,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    sniff_format,
)


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic non-uniform BGR test image (no two rows equal)."""
    y = np.arange(h, dtype=np.uint32)[:, None]
    x = np.arange(w, dtype=np.uint32)[None, :]
    img = np.stack([(y * 7 + x) % 256, (y + x * 5) % 256, (y * 3 + x * 11) % 256], axis=2)
    return img.astype(np.uint8)


# --------------------------------------------------------------------------
# Round trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (32, 32), (17, 13)])
def test_bmp_roundtrip_exact(h, w):
    img = _gradient(h, w)
    out = decode_bmp(encode_bmp(img))
    assert out is not None and out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (17, 13)])
def test_ppm_roundtrip_exact(h, w):
    img = _gradient(h, w)
    out = decode_ppm(encode_ppm(img))
    assert out is not None and out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, img)


def test_bmp_matches_ffmpeg_test_writer():
    """encode_bmp must stay byte-identical to the numpy/struct writer the
    ffmpeg integration test uses, so both feed the same bits."""
    import os
    import struct

    img = _gradient(5, 3)
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        img[y].astype(np.uint8).tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    assert encode_bmp(img) == header + body
    assert os.path.exists("tests/test_ffmpeg_encoder.py")  # provenance of the layout


# --------------------------------------------------------------------------
# Format variants
# --------------------------------------------------------------------------


def test_bmp_topdown_and_32bit():
    img = _gradient(4, 6)
    blob = bytearray(encode_bmp(img))
    # flip to top-down: negative height + rows in natural order
    import struct

    struct.pack_into("<i", blob, 22, -4)
    stride = (6 * 3 + 3) & ~3
    rows = [bytes(blob[54 + i * stride : 54 + (i + 1) * stride]) for i in range(4)]
    blob[54:] = b"".join(reversed(rows))
    out = decode_bmp(bytes(blob))
    np.testing.assert_array_equal(out, img)

    # 32-bit BGRA, bottom-up, no padding needed
    bgra = np.dstack([img, np.full((4, 6), 255, dtype=np.uint8)])
    body = b"".join(bgra[y].tobytes() for y in range(3, -1, -1))
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, 6, 4, 1, 32, 0, len(body), 2835, 2835, 0, 0,
    )
    out32 = decode_bmp(header + body)
    np.testing.assert_array_equal(out32, img)  # alpha dropped


def test_ppm_header_whitespace_and_comments():
    img = _gradient(2, 3)
    rgb = img[:, :, ::-1]
    blob = b"P6 # comment after magic\n3\t2 # dims\n 255\n" + rgb.tobytes()
    out = decode_ppm(blob)
    np.testing.assert_array_equal(out, img)


# --------------------------------------------------------------------------
# Malformed input -> None, never an exception (ImageUtils null contract)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        None,
        b"BM",  # truncated header
        b"not an image at all" * 10,
        encode_bmp(_gradient(4, 4))[:-7],  # truncated body
        b"P6\n4 4\n255\n" + b"\x00" * 10,  # truncated PPM body
        b"P6\n-3 4\n255\n" + b"\x00" * 64,  # bad dims
        b"P6\n4 4\n65535\n" + b"\x00" * 96,  # 16-bit maxval unsupported
    ],
)
def test_undecodable_returns_none(blob):
    assert decode_image_bgr(blob) is None


def test_bmp_unsupported_modes_return_none():
    import struct

    good = bytearray(encode_bmp(_gradient(4, 4)))
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 compression
    pal = bytearray(good)
    struct.pack_into("<H", pal, 28, 8)  # 8-bit palette
    assert decode_bmp(bytes(rle)) is None
    assert decode_bmp(bytes(pal)) is None


def test_sniff_format():
    assert sniff_format(encode_bmp(_gradient(2, 2))) == "bmp"
    assert sniff_format(encode_ppm(_gradient(2, 2))) == "ppm"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_format(b"??") is None
    assert sniff_format(None) is None


# --------------------------------------------------------------------------
# Closed chain: planted image bytes -> DEFAULT decoder -> preprocess ->
# fake session -> postprocess -> NMS. No Pillow, no injected decoder.
# --------------------------------------------------------------------------


def _head_tensor() -> np.ndarray:
    """[1,84,2] head output: two overlapping class-2 candidates in the
    640x640 model frame; NMS must keep only the higher-confidence one."""
    out = np.zeros((1, 84, 2), dtype=np.float32)
    out[0, :4, 0] = [320, 320, 100, 100]
    out[0, 4 + 2, 0] = 0.7
    out[0, :4, 1] = [322, 322, 100, 100]
    out[0, 4 + 2, 1] = 0.95
    return out


class _FakeSession:
    def __init__(self, tensor):
        self.tensor = tensor
        self.n_runs = 0

    def run(self, _out_names, feeds):
        x = feeds["images"]
        assert x.shape == (1, 3, 640, 640) and x.dtype == np.float32
        self.n_runs += 1
        return [self.tensor]


def test_detector_chain_on_real_bmp_bytes_without_pillow():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; the no-image-lib path is the one under test")
    except ImportError:
        pass
    from video_stream_processing_spark.functions.coco import COCO_CLASSES
    from video_stream_processing_spark.operators.detection import OnnxDetector
    from video_stream_processing_spark.operators import yolo

    session = _FakeSession(_head_tensor())
    det = OnnxDetector(session=session)  # default decoder = numpy codec

    bmp = encode_bmp(_gradient(480, 640))
    ppm = encode_ppm(_gradient(240, 320))
    out = det.detect_batch(pd.Series([bmp, b"garbage-bytes", None, ppm]))

    # undecodable/None frames never reached the session; real ones did
    assert session.n_runs == 2
    assert list(out.map(len)) == [1, 0, 0, 1]
    # full-chain equality with the raw tensor math at each frame's size
    assert out[0] == yolo.detect_from_output(session.tensor, 640, 480)
    assert out[3] == yolo.detect_from_output(session.tensor, 320, 240)
    assert out[0][0]["object_class"] == COCO_CLASSES[2]
    assert out[0][0]["confidence"] == pytest.approx(0.95, abs=1e-6)


def test_real_decode_meta_on_planted_images(spark):
    """Spark-side real decode: BMP/PPM payloads get true dimensions,
    garbage gets nulls + 'undecodable' (a10/x20-style, VERDICT item 3)."""
    from video_stream_processing_spark.operators.multimodal import real_decode_meta

    rows = [
        (1, bytearray(encode_bmp(_gradient(48, 64)))),
        (2, bytearray(encode_ppm(_gradient(24, 32)))),
        (3, bytearray(b"\xff\xd8\xffnot really a jpeg")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in real_decode_meta(df).collect()}

    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (64, 48, 3)
    assert got[1]["format"] == "bmp"
    assert (got[2]["width"], got[2]["height"]) == (32, 24)
    assert got[2]["format"] == "ppm"
    for bad in (3, 4):
        assert got[bad]["width"] is None and got[bad]["height"] is None
        assert got[bad]["format"] == "undecodable"
    assert got[4]["n_bytes"] == 0


# --------------------------------------------------------------------------
# Property tests (hypothesis): round-trip exactness over arbitrary
# shapes/content; decode never raises on arbitrary or corrupted bytes.
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_codec_roundtrip_property(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@given(blob=st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_decode_never_raises_on_arbitrary_bytes(blob):
    out = decode_image_bgr(blob)  # None or an array; never an exception
    assert out is None or out.dtype == np.uint8


@given(
    pos=st.integers(0, 200),
    val=st.integers(0, 255),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_decode_never_raises_on_corrupted_bmp(pos, val, seed):
    img = np.random.RandomState(seed).randint(0, 256, (6, 6, 3)).astype(np.uint8)
    blob = bytearray(encode_bmp(img))
    blob[pos % len(blob)] = val  # single-byte corruption anywhere
    out = decode_image_bgr(bytes(blob))
    assert out is None or (out.dtype == np.uint8 and out.ndim == 3)
