"""PNG codec (functions/pngcodec.py) — round-trips, every scanline
filter, every supported color type, CRC verification, malformed input.
No image library involved: filtered scanlines are hand-built."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from video_stream_processing_spark.functions.pngcodec import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
)


def _build(w, h, ctype, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_round_trip_basic():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_round_trip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_scanline_filter_reconstructs(ftype):
    """Hand-filter a known RGB image with one filter type for every row
    and require exact reconstruction — covers Sub/Up/Average/Paeth."""
    rng = np.random.default_rng(ftype + 10)
    h, w, bpp = 6, 7, 3
    rgb = rng.integers(0, 256, (h, w * bpp), dtype=np.uint8).astype(np.int32)
    lines = []
    for y in range(h):
        cur = rgb[y]
        prev = rgb[y - 1] if y else np.zeros(w * bpp, np.int32)
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - left) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - (left + prev) // 2) % 256
        else:

            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            pred = np.array(
                [paeth(int(left[i]), int(prev[i]), int(ul[i])) for i in range(w * bpp)]
            )
            filt = (cur - pred) % 256
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
    blob = _build(w, h, 2, b"".join(lines))
    got = decode_png(blob)
    expect = rgb.astype(np.uint8).reshape(h, w, bpp)[:, :, ::-1]  # RGB->BGR
    assert np.array_equal(got, expect), f"filter {ftype}"


def test_grayscale_and_alpha_types():
    h, w = 3, 4
    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    out = decode_png(_build(w, h, 0, raw))
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)

    ga = np.dstack([gray, np.full((h, w), 7, np.uint8)])  # gray+alpha
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    out = decode_png(_build(w, h, 4, raw))
    assert np.array_equal(out[:, :, 1], gray)  # alpha dropped

    rgba = np.dstack([gray, gray + 1, gray + 2, np.full((h, w), 9, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    out = decode_png(_build(w, h, 6, raw))
    assert np.array_equal(out[:, :, 2], gray)  # R channel -> BGR index 2


def test_palette_type():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    blob = _build(2, 2, 3, raw, extra=_chunk(b"PLTE", plte))
    out = decode_png(blob)
    assert out[0, 0].tolist() == [0, 0, 255]  # red in BGR
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [255, 0, 0]
    # out-of-range palette index -> None
    bad = np.array([[5]], dtype=np.uint8)
    blob = _build(1, 1, 3, b"\x00" + bad.tobytes(), extra=_chunk(b"PLTE", plte))
    assert decode_png(blob) is None


def test_crc_corruption_rejected():
    blob = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    blob[60] ^= 0xFF
    assert decode_png(bytes(blob)) is None


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        _SIG,  # signature only
        _SIG + b"garbage-after-signature",
        encode_png(np.zeros((4, 4, 3), np.uint8))[:30],  # truncated
        b"\xff\xd8\xff\xe0 not png",
    ],
)
def test_malformed_returns_none(blob):
    assert decode_png(blob) is None


def test_interlaced_and_16bit_rejected():
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlaced
    raw = zlib.compress(b"\x00" * 14)
    blob = _SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IDAT", raw) + _chunk(b"IEND", b"")
    assert decode_png(blob) is None
    ihdr_16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = _SIG + _chunk(b"IHDR", ihdr_16) + _chunk(b"IDAT", raw) + _chunk(b"IEND", b"")
    assert decode_png(blob) is None


def test_multiple_idat_chunks_concatenate():
    img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    canonical = encode_png(img)
    # rebuild with the zlib stream split across two IDAT chunks
    rgb = img[:, :, ::-1]
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(3))
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    blob = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[: len(z) // 2])
        + _chunk(b"IDAT", z[len(z) // 2 :])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), decode_png(canonical))


def test_decode_image_bgr_routes_png(spark):
    """The engine entry point decodes PNG natively (no Pillow)."""
    from video_stream_processing_spark.functions.imagecodec import (
        decode_image_bgr,
        sniff_format,
    )

    img = np.full((5, 6, 3), 77, np.uint8)
    blob = encode_png(img)
    assert sniff_format(blob) == "png"
    assert np.array_equal(decode_image_bgr(blob), img)
