"""Dependency-free PNG codec (stdlib zlib + numpy).

Closes the last common still-image format gap dependency-free: BMP/PPM
(imagecodec.py) and baseline JPEG (jpegcodec.py) already decode
natively; PNG needs only the stdlib ``zlib`` inflate plus the five
scanline filters, both implemented here. Same engine contract as every
codec: decode-or-None (ImageUtils.java:23-36 analog), BGR uint8 out.

Supported subset (the overwhelmingly common case on the wire):
- 8-bit depth; color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); alpha is dropped (detection pipelines are
  RGB);
- all five scanline filters (None/Sub/Up/Average/Paeth) — Sub via
  per-channel cumulative sum, Average/Paeth scalar loops (rows are
  short; correctness over micro-speed here);
- chunk CRCs are VERIFIED (a corrupt IDAT/IHDR must not decode);
- interlace (Adam7) and 16-bit depth are rejected -> None, documented.

Encode emits 8-bit RGB, filter 0, one zlib stream — the minimal
canonical file, which the round-trip tests and the x63 oracle pin.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 BGR -> PNG bytes (8-bit RGB, filter 0)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) BGR, got {arr.shape}")
    h, w, _ = arr.shape
    rgb = np.ascontiguousarray(arr[:, :, ::-1])
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray | None:
    """Reverse the per-scanline filters -> (h, w*bpp) uint8."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += stride + 1
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: prefix sum per channel offset
            rec = line.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype == 3:  # Average
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + _paeth(int(left), int(prev[x]), int(ul))) % 256
        else:
            return None
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(blob: bytes | None) -> np.ndarray | None:
    """PNG bytes -> (H, W, 3) uint8 BGR, or None on anything malformed,
    CRC-corrupt, interlaced, 16-bit, or outside the supported subset."""
    if blob is None or len(blob) < 8 or bytes(blob[:8]) != _SIG:
        return None
    data = bytes(blob)
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            return None
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not seen_iend:
        return None
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or w < 1 or h < 1:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if channels is None or (ctype_n == 3 and plte is None):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    grid = _unfilter(raw, h, w, channels)
    if grid is None:
        return None
    px = grid.reshape(h, w, channels)
    if ctype_n == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif ctype_n == 2:
        rgb = px
    elif ctype_n == 3:
        idx = px[:, :, 0]
        if idx.max() >= plte.shape[0]:
            return None
        rgb = plte[idx]
    elif ctype_n == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)  # drop alpha
    else:  # 6
        rgb = px[:, :, :3]
    return np.ascontiguousarray(rgb[:, :, ::-1])
