"""One real FFmpegEncoder execution (VERDICT r1 item 8) — skipped
cleanly where ffmpeg is absent (this container has none; CI/cluster
images do). Frames are minimal 24-bit BMPs written with numpy/struct so
no image library is needed.
"""

from __future__ import annotations

import os
import shutil
import struct

import numpy as np
import pytest

ffmpeg_missing = shutil.which("ffmpeg") is None


def _write_bmp(path: str, img: np.ndarray) -> None:
    """Minimal bottom-up 24-bit uncompressed BMP (BGR rows padded to 4B)."""
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
    with open(path, "wb") as f:
        f.write(header + body)


@pytest.mark.skipif(ffmpeg_missing, reason="ffmpeg not installed in this environment")
def test_ffmpeg_encoder_end_to_end(tmp_path):
    from video_stream_processing_spark.streaming.sinks import FFmpegEncoder

    workdir = str(tmp_path)
    # 10 tiny frames with a moving bar so the encoder sees real motion
    for i in range(10):
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        img[:, (i * 3) % 32 : (i * 3) % 32 + 3] = 255
        _write_bmp(os.path.join(workdir, f"frame_{i + 1:05d}.bmp"), img)

    enc = FFmpegEncoder(workdir=workdir, fps=5, frame_pattern="frame_%05d.bmp")
    path, size = enc.encode("cam1", 1_700_000_000_000, frame_count=10)
    assert os.path.isfile(path) and path.endswith("cam1_1700000000000.mp4")
    assert size == os.path.getsize(path) > 0
    with open(path, "rb") as f:
        head = f.read(12)
    assert head[4:8] == b"ftyp"  # ISO BMFF (mp4) container magic


def test_ffmpeg_encoder_skips_gracefully_without_ffmpeg(tmp_path):
    """Where ffmpeg is absent the real encoder must fail loudly (callers
    choose NoopEncoder for correctness tests), not hang or corrupt."""
    if not ffmpeg_missing:
        pytest.skip("ffmpeg present; absence path not exercisable")
    from video_stream_processing_spark.streaming.sinks import FFmpegEncoder

    with pytest.raises(FileNotFoundError):
        FFmpegEncoder(workdir=str(tmp_path)).encode("cam1", 0, 1)
