"""Baseline sequential JPEG codec in pure numpy (no Pillow, no cv2).

The reference's actual wire format is JPEG: the mock producer encodes
every frame with OpenCV (`VideoStreamMockProducer.java:211-218`,
``opencv_imgcodecs.imencode(".jpg", ...)``) and the decode step reads it
back (`util/ImageUtils.java:23-36`).  This module implements the subset
of ITU-T T.81 those calls exercise — baseline sequential DCT, 8-bit,
Huffman entropy coding — from the public spec, so the engine can run the
reference's true bytes->decode->preprocess->detect chain with zero new
dependencies:

- ``encode_jpeg``: 3-component 4:4:4 (no chroma subsampling) baseline
  JPEG with the Annex K quantization + Huffman tables (quality-scaled by
  the public IJG formula).  4:4:4 keeps the round-trip math exact for
  flat blocks, which is what makes x43's DuckDB oracle arithmetic.
- ``decode_jpeg``: markers -> DQT/SOF0/DHT/DRI/SOS parse -> Huffman
  decode (canonical mincode/maxcode walk) -> dequant -> de-zigzag ->
  iDCT -> chroma upsample (any h/v in {1,2,4}, so 4:2:0 files from
  other encoders decode too) -> YCbCr->BGR.  Returns ``None`` on
  anything malformed or out of scope (progressive SOF2, arithmetic
  coding, 12-bit), matching ImageUtils.decodeImage's null-on-failure
  contract.

Both directions share one orthonormal DCT-II matrix ``_DCT_M``; JPEG's
FDCT/IDCT (T.81 A.3.3) is exactly ``T @ B @ T.T`` in that basis (the
constant block c has DC = 8c in both conventions), so the transform is
pinned to the spec by arithmetic, not by mirroring a library.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — the public example tables every
# baseline encoder ships).
# --------------------------------------------------------------------------

# Zigzag position -> row-major index within an 8x8 block.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Huffman table specs: (BITS[1..16], HUFFVAL) per T.81 Annex K.3.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    # Orthonormal DCT-II: row 0 = 1/sqrt(8), row k = 1/2 cos((2i+1)k pi/16).
    # In this basis F = T @ B @ T.T is bit-for-bit JPEG's A.3.3 FDCT.
    i = np.arange(8)
    T = 0.5 * np.cos((2 * i[None, :] + 1) * i[:, None] * np.pi / 16)
    T[0, :] = np.sqrt(1.0 / 8.0)
    return T


_DCT_M = _dct_matrix()


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling: 50 = Annex K as-is."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing (F.1.2.3).
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuff
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _ScanEnd(Exception):
    pass


class _BitReader:
    """Reads entropy-coded bits from an already-destuffed byte segment.

    Multi-bit reads via byte-slice windows — the original bit-at-a-time
    accumulator was the decode hot spot (82k read_bit calls per 10
    images profiled; the Huffman walk + per-bit receive dominated
    decode wall-clock). Semantics are unchanged: any read that would
    cross the end of the segment raises _ScanEnd, exactly when the
    per-bit reader needed a byte beyond the data."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0
        self.nbits = 8 * len(data)

    def peek16(self) -> int:
        """Next 16 bits, 1-padded past the segment end (never raises —
        callers bound-check against nbits)."""
        byte = self.bitpos >> 3
        off = self.bitpos & 7
        chunk = self.data[byte : byte + 4]
        if len(chunk) < 4:
            chunk = chunk + b"\xff" * (4 - len(chunk))
        return (int.from_bytes(chunk, "big") >> (16 - off)) & 0xFFFF

    def read_bit(self) -> int:
        return self.receive(1)

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bitpos + n > self.nbits:
            raise _ScanEnd
        byte = self.bitpos >> 3
        off = self.bitpos & 7
        nbytes = (off + n + 7) >> 3
        chunk = int.from_bytes(self.data[byte : byte + nbytes], "big")
        self.bitpos += n
        return (chunk >> (nbytes * 8 - off - n)) & ((1 << n) - 1)


# --------------------------------------------------------------------------
# Canonical Huffman tables (C.2 generation; F.2.2.3 decode walk).
# --------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@lru_cache(maxsize=64)
def _huff_lut(bits: tuple[int, ...], vals: tuple[int, ...]):
    """(symbol, length) lookup tables indexed by the NEXT 16 bits of the
    stream — the table-driven form of the F.2.2.3 decode walk. Every
    16-bit pattern whose prefix is a valid code maps to that code's
    symbol and length; patterns with no valid prefix keep length 0
    (-> corrupt-stream error, same as the walk exceeding 16 bits).
    Cached per Huffman table: the Annex K tables recur across images."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for symbol, (code, length) in _canonical_codes(list(bits), list(vals)).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = symbol
        ln[lo:hi] = length
    # native containers: indexing a numpy array with a Python int returns
    # a numpy scalar per lookup, which measured SLOWER than the bit walk
    # it replaced; list/bytes lookups return plain ints
    return sym.tolist(), bytes(ln.tolist())


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self._sym, self._len = _huff_lut(tuple(bits), tuple(vals))

    def decode(self, br: _BitReader) -> int:
        if br.bitpos >= br.nbits:
            raise _ScanEnd  # the walk would raise on its first bit read
        p = br.peek16()
        length = self._len[p]
        if length == 0:
            # the walk reads 16 REAL bits before declaring corruption; with
            # fewer remaining it runs out first -> _ScanEnd, not ValueError
            if br.bitpos + 16 > br.nbits:
                raise _ScanEnd
            raise ValueError("corrupt Huffman stream")
        if br.bitpos + length > br.nbits:
            raise _ScanEnd  # code would cross the segment end mid-walk
        br.bitpos += length
        return self._sym[p]


def _extend(v: int, size: int) -> int:
    # F.2.2.1: map `size`-bit magnitude to signed value.
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _bgr_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    b = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    r = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Edge-pad a float plane to multiples of 8 and cut (N, 8, 8) blocks
    in raster order."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_component(
    zz: np.ndarray,
    bw: _BitWriter,
    order: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
    idx: int,
) -> int:
    """Entropy-code one block (already zigzagged, (N,64) int array)."""
    blk = zz[idx]
    dc = int(blk[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    # code bits then magnitude bits is one concatenated write — the
    # two-call form doubled the writer calls (encode hot spot, profiled)
    if s:
        mag = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write((code << s) | mag, length + s)
    else:
        bw.write(code, length)
    # iterate ONLY the nonzero coefficients (zero runs come from index
    # gaps) instead of stepping Python through every zero
    nz = (np.nonzero(blk[1:])[0] + 1).tolist()
    prev = 0
    for k in nz:
        v = int(blk[k])
        run = k - prev - 1
        while run > 15:
            zcode, zlen = ac_codes[0xF0]  # ZRL
            bw.write(zcode, zlen)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        mag = v if v >= 0 else v + (1 << s) - 1
        bw.write((code << s) | mag, length + s)
        prev = k
    if (nz[-1] if nz else 0) < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """(H, W, 3) uint8 BGR -> baseline 4:4:4 JFIF bytes.

    The analog of the producer's ``imencode(".jpg", ...)``
    (VideoStreamMockProducer.java:211-218), with the Annex K tables so
    the output is decodable by any baseline decoder."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) BGR")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    qy = _scaled_qtable(_Q_LUM, quality)
    qc = _scaled_qtable(_Q_CHROM, quality)

    planes = _bgr_to_ycbcr(img)
    comps = []
    for plane, q in zip(planes, (qy, qc, qc)):
        blocks = _blocks_of(plane - 128.0)
        coeffs = _DCT_M[None] @ blocks @ _DCT_M.T[None]
        zz = np.round(coeffs / q[None]).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comps.append(zz)

    dc_lum = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chrom = _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_chrom = _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    tables = [(dc_lum, ac_lum), (dc_chrom, ac_chrom), (dc_chrom, ac_chrom)]
    n_blocks = comps[0].shape[0]
    for i in range(n_blocks):  # MCU = one block per component at 4:4:4
        for c in range(3):
            preds[c] = _encode_component(
                comps[c], bw, ZIGZAG, tables[c][0], tables[c][1], preds[c], i
            )
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytearray()
    dqt += bytes([0x00]) + bytes(int(qy.flat[ZIGZAG[k]]) for k in range(64))
    dqt += bytes([0x01]) + bytes(int(qc.flat[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # h=1, v=1 (4:4:4)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0x00, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(0x10, _AC_LUM_BITS, _AC_LUM_VALS)
    out += _dht_segment(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS)
    out += _dht_segment(0x11, _AC_CHROM_BITS, _AC_CHROM_VALS)
    sos = bytearray([3])
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tdta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bx", "by")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        self.cid = cid
        self.h = h
        self.v = v
        self.tq = tq
        self.td = 0
        self.ta = 0
        self.blocks: np.ndarray | None = None
        self.bx = 0
        self.by = 0


def _destuff_scan(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded segments split at RST markers, plus the index of the
    terminating marker's 0xFF."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(blob)
    while i < n:
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = blob[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_block(
    br: _BitReader, dc_tab: _HuffDecoder, ac_tab: _HuffDecoder, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    s = dc_tab.decode(br)
    diff = _extend(br.receive(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    return zz, dc


def decode_jpeg(blob: bytes) -> np.ndarray | None:
    """Baseline JPEG bytes -> (H, W, 3) uint8 BGR, or None.

    Scope: SOF0/SOF1, 8-bit, Huffman, 1 or 3 components, sampling
    factors in {1, 2, 4}, single interleaved scan, optional restart
    markers.  Progressive / arithmetic / hierarchical -> None (same
    skip-the-frame behavior the reference shows for undecodable bytes,
    KeyFrameExtractor.java:94,107)."""
    try:
        return _decode_jpeg_strict(blob)
    except Exception:
        return None


def _decode_jpeg_strict(blob: bytes) -> np.ndarray | None:
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    i = 2
    n = len(blob)
    scan_segs: list[bytes] | None = None
    while i < n:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = struct.unpack_from(">H", blob, i + 2)[0]
        seg = blob[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    vals = (
                        np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    )
                    p += 128
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals  # stored in zigzag order
                qtables[tq] = tab.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec = seg[0]
            if prec != 8:
                return None
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comp = _Component(cid, hv >> 4, hv & 0x0F, tq)
                if comp.h not in (1, 2, 4) or comp.v not in (1, 2, 4):
                    return None
                comps.append(comp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/arithmetic/hierarchical out of scope
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if tc == 0:
                    dc_tabs[th] = _HuffDecoder(bits, vals)
                else:
                    ac_tabs[th] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps) or not comps:
                return None
            by_id = {c.cid: c for c in comps}
            order = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = by_id.get(cid)
                if comp is None:
                    return None
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                order.append(comp)
            comps = order
            scan_segs, i = _destuff_scan(blob, i + 2 + seglen)
            continue  # i now points at the terminating marker
        i += 2 + seglen
        if scan_segs is not None:
            break
    if scan_segs is None or not comps or height == 0 or width == 0:
        return None

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        c.bx = mcux * c.h
        c.by = mcuy * c.v
        c.blocks = np.zeros((c.by * c.bx, 64), dtype=np.int64)

    preds = {c.cid: 0 for c in comps}
    seg_idx = 0
    br = _BitReader(scan_segs[0])
    since_restart = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_restart == restart_interval:
                seg_idx += 1
                if seg_idx >= len(scan_segs):
                    raise ValueError("missing restart segment")
                br = _BitReader(scan_segs[seg_idx])
                preds = {c.cid: 0 for c in comps}
                since_restart = 0
            for c in comps:
                for v in range(c.v):
                    for h_ in range(c.h):
                        zz, dc = _decode_block(
                            br, dc_tabs[c.td], ac_tabs[c.ta], preds[c.cid]
                        )
                        preds[c.cid] = dc
                        row = my * c.v + v
                        col = mx * c.h + h_
                        c.blocks[row * c.bx + col] = zz
            since_restart += 1

    planes = []
    for c in comps:
        q = qtables[c.tq]
        coeffs = np.zeros((c.blocks.shape[0], 64), dtype=np.float64)
        coeffs[:, ZIGZAG] = c.blocks  # de-zigzag
        coeffs = coeffs.reshape(-1, 8, 8) * q[None]
        pix = _DCT_M.T[None] @ coeffs @ _DCT_M[None] + 128.0
        plane = (
            pix.reshape(c.by, c.bx, 8, 8).transpose(0, 2, 1, 3).reshape(c.by * 8, c.bx * 8)
        )
        fy, fx = vmax // c.v, hmax // c.h
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.stack([gray, gray, gray], axis=-1))
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    bgr = np.stack([b, g, r], axis=-1)
    return np.clip(np.round(bgr), 0, 255).astype(np.uint8)
