"""Dependency-free RIFF/WAVE PCM codec (pure struct + numpy).

The audio leg of the multimodal surface: the engine treats audio
exactly like the reference treats video frames — an opaque BINARY
column decoded inside an Arrow-batched UDF, never shuffled raw
(the reference's binary-payload contract: VideoFrame.frameData byte[],
/root/reference/src/main/java/com/video/streaming/model/VideoFrame.java:39;
decode-or-null: util/ImageUtils.java:23-36). No audio library exists in
this container, and none is needed: canonical WAV is a RIFF chunk walk
plus a little-endian PCM payload, both expressible with ``struct`` and
``numpy`` alone — same portability posture as the BMP/PPM/JPEG codec
(functions/imagecodec.py, functions/jpegcodec.py).

Scope (mirrors what a 100 TB ingest actually needs):
- integer PCM (format tag 1), 8/16/32-bit, any channel count;
- chunk-walking decode: unknown chunks (LIST, fact, cue) are skipped
  with correct word alignment, ``data`` may precede or follow them;
- malformed input -> ``None`` (the null-on-undecodable contract every
  decode operator in this engine follows).

Encode emits the minimal canonical file (RIFF + fmt + data, 16-bit),
which is what the differential tests round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAVE file.

    ``samples``: shape (n,) mono or (n, channels) interleaved-on-write.
    Values are clipped to int16. Returns the complete file bytes.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    n, ch = arr.shape
    pcm = np.clip(arr, -32768, 32767).astype("<i2").reshape(-1).tobytes()
    block_align = ch * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, _FMT_PCM, ch, sample_rate, byte_rate, block_align, 16
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    if len(pcm) % 2:  # RIFF chunks are word-aligned
        data += b"\x00"
    riff_size = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data


def sniff_wav(blob: bytes | None) -> bool:
    """Cheap container sniff: RIFF....WAVE magic."""
    return (
        blob is not None
        and len(blob) >= 12
        and blob[:4] == b"RIFF"
        and blob[8:12] == b"WAVE"
    )


def decode_wav(blob: bytes | None) -> tuple[np.ndarray, int] | None:
    """Decode a RIFF/WAVE PCM file.

    Returns ``(samples, sample_rate)`` with samples shaped
    (n_frames, channels) as int32 (wide enough for 8/16/32-bit PCM),
    or ``None`` for anything malformed / non-PCM — the same
    null-on-undecodable contract as ``decode_image_bgr``.
    """
    if not sniff_wav(blob):
        return None
    data = bytes(blob)
    pos = 12
    fmt = None
    pcm = None
    # Chunk walk: ids are 4 bytes + u32 LE size; payloads are word-aligned.
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > len(data):
            return None  # truncated chunk
        if cid == b"fmt " and fmt is None:
            if size < 16:
                return None
            fmt = struct.unpack_from("<HHIIHH", data, body_start)
        elif cid == b"data" and pcm is None:
            pcm = data[body_start : body_start + size]
        pos = body_start + size + (size % 2)
    if fmt is None or pcm is None:
        return None
    tag, ch, rate, _byte_rate, _block_align, bits = fmt
    if tag != _FMT_PCM or ch < 1 or rate < 1 or bits not in (8, 16, 32):
        return None
    width = bits // 8
    n_frames = len(pcm) // (width * ch)
    if n_frames == 0:
        return None
    pcm = pcm[: n_frames * width * ch]
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    else:
        samples = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
    return samples.reshape(n_frames, ch), rate
