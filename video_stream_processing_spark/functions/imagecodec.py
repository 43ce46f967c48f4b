"""Dependency-free image codec (pure numpy + struct).

Closes the decode gap in operator #11 (SURVEY.md §2.1): the container has
no Pillow/cv2, but the reference's decode step
(`ImageUtils.decodeImage`, /root/reference/src/main/java/com/video/
streaming/util/ImageUtils.java:23-36) has a simple contract — bytes in,
pixel matrix out, undecodable -> null. Two uncompressed container
formats are enough to run the REAL bytes->decode->preprocess->detect
chain end to end with zero new dependencies:

- BMP (BITMAPINFOHEADER, BI_RGB uncompressed, 24/32-bit, bottom-up or
  top-down) — what the ffmpeg tests already write with numpy/struct;
- PPM (binary ``P6``, maxval <= 255) — the one-header-line format every
  tool can emit.

``decode_image_bgr`` dispatches on magic bytes and falls back to Pillow
when (and only when) it is importable, mirroring the reference's
"any-format in, null on failure" semantics. All decoders return an
(H, W, 3) uint8 **BGR** array (the reference works in OpenCV/BGR space;
YOLODetector preprocess expects BGR — operators/yolo.py:38) or ``None``.

The encoders exist so tests and the streaming pipeline can produce real
binary frames without an image library (`encode_bmp` matches the writer
in tests/test_ffmpeg_encoder.py byte-for-byte).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_image_bgr",
    "decode_bmp",
    "decode_ppm",
    "encode_bmp",
    "encode_ppm",
    "sniff_format",
]


def sniff_format(blob: bytes | None) -> str | None:
    """Container format from magic bytes; None if unrecognized."""
    if not blob or len(blob) < 2:
        return None
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] == b"P6":
        return "ppm"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


# --------------------------------------------------------------------------
# BMP — BITMAPFILEHEADER (14B) + BITMAPINFOHEADER (>=40B), BI_RGB only.
# Pixel rows are 4-byte aligned; biHeight > 0 means bottom-up storage.
# --------------------------------------------------------------------------


def decode_bmp(blob: bytes) -> np.ndarray | None:
    """Decode an uncompressed 24/32-bit BMP to (H, W, 3) uint8 BGR.

    Returns None on anything malformed/unsupported (palette, RLE,
    bitfields, truncated body) — never raises on bad bytes, matching
    ImageUtils.decodeImage's null-on-failure contract."""
    try:
        if len(blob) < 54 or blob[:2] != b"BM":
            return None
        data_offset = struct.unpack_from("<I", blob, 10)[0]
        header_size = struct.unpack_from("<I", blob, 14)[0]
        if header_size < 40:  # BITMAPCOREHEADER etc. unsupported
            return None
        width, height = struct.unpack_from("<ii", blob, 18)
        planes, bpp = struct.unpack_from("<HH", blob, 26)
        compression = struct.unpack_from("<I", blob, 30)[0]
        if planes != 1 or compression != 0 or bpp not in (24, 32):
            return None
        if width <= 0 or height == 0:
            return None
        bottom_up = height > 0
        h, w = abs(height), width
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        body = blob[data_offset : data_offset + stride * h]
        if len(body) < stride * h:
            return None
        rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if bottom_up:
            px = px[::-1]
        return np.ascontiguousarray(px[:, :, :3])  # BMP stores BGR(A)
    except Exception:
        return None


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> minimal bottom-up 24-bit uncompressed BMP."""
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
    return header + body


# --------------------------------------------------------------------------
# PPM — binary P6: "P6\n<w> <h>\n<maxval>\n" + w*h*3 RGB bytes.
# Whitespace/comment handling per the Netpbm spec (tokens separated by
# any whitespace; '#' starts a comment through end of line).
# --------------------------------------------------------------------------


def decode_ppm(blob: bytes) -> np.ndarray | None:
    """Decode a binary P6 PPM (maxval <= 255) to (H, W, 3) uint8 BGR."""
    try:
        if len(blob) < 2 or blob[:2] != b"P6":
            return None
        pos = 2
        fields: list[int] = []
        while len(fields) < 3 and pos < len(blob):
            c = blob[pos]
            if c in b" \t\r\n":
                pos += 1
            elif c == ord("#"):
                while pos < len(blob) and blob[pos] not in b"\r\n":
                    pos += 1
            elif ord("0") <= c <= ord("9"):
                start = pos
                while pos < len(blob) and ord("0") <= blob[pos] <= ord("9"):
                    pos += 1
                fields.append(int(blob[start:pos]))
            else:
                return None
        if len(fields) < 3:
            return None
        w, h, maxval = fields
        if w <= 0 or h <= 0 or not (0 < maxval < 256):
            return None
        pos += 1  # exactly one whitespace byte after maxval
        body = blob[pos : pos + w * h * 3]
        if len(body) < w * h * 3:
            return None
        rgb = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
        return np.ascontiguousarray(rgb[:, :, ::-1])  # RGB -> BGR
    except Exception:
        return None


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> binary P6 PPM."""
    h, w, _ = img.shape
    rgb = np.ascontiguousarray(img[:, :, ::-1].astype(np.uint8))
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def decode_image_bgr(blob: bytes | None) -> np.ndarray | None:
    """bytes -> (H, W, 3) uint8 BGR or None — the engine's
    ImageUtils.decodeImage analog (ImageUtils.java:23-36).

    Native numpy paths for BMP/PPM/baseline-JPEG (the reference's actual
    wire format — VideoStreamMockProducer.java:211-218 JPEG-encodes every
    frame) and 8-bit PNG (functions/pngcodec.py — stdlib zlib);
    progressive-JPEG/interlaced-PNG/anything-else go through Pillow only
    if it happens to be importable. Undecodable -> None (the caller then
    emits empty detections / skips the frame, matching
    YOLODetector.java:115-118 and KeyFrameExtractor.java:94,107)."""
    if not blob:
        return None
    fmt = sniff_format(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "ppm":
        return decode_ppm(blob)
    if fmt == "jpeg":
        from video_stream_processing_spark.functions.jpegcodec import decode_jpeg

        img = decode_jpeg(blob)
        if img is not None:
            return img
        # fall through: progressive/arithmetic JPEG may still decode via
        # Pillow when it is importable
    if fmt == "png":
        from video_stream_processing_spark.functions.pngcodec import decode_png

        img = decode_png(blob)
        if img is not None:
            return img
        # fall through: interlaced/16-bit PNG may still decode via Pillow
    try:  # pragma: no cover - Pillow absent in this container
        import io

        from PIL import Image

        rgb = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        return np.ascontiguousarray(rgb[:, :, ::-1])
    except Exception:
        return None
