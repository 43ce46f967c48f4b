"""ISO-BMFF box walker (functions/mp4probe.py) — hand-built boxes
covering largesize escapes, size-0 tail boxes, v1 mvhd, unknown-box
skipping, and malformed rejection."""

import struct

import pytest

from video_stream_processing_spark.functions.mp4probe import (
    _box,
    build_mp4,
    probe_mp4,
)


def test_basic_probe():
    m = probe_mp4(build_mp4(duration=7000, timescale=1000, tracks=[(640, 360)]))
    assert (m.duration, m.timescale, m.n_tracks, m.width, m.height) == (
        7000,
        1000,
        1,
        640,
        360,
    )


def test_junk_and_largesize_boxes_skipped():
    with_junk = probe_mp4(build_mp4(100, tracks=[(32, 16)], junk=True))
    without = probe_mp4(build_mp4(100, tracks=[(32, 16)], junk=False))
    assert with_junk == without


def test_v1_mvhd_64bit_times():
    mvhd = bytes([1, 0, 0, 0]) + bytes(16) + struct.pack(">I", 90000) + struct.pack(
        ">Q", 12345678901
    ) + bytes(76)
    moov = _box(b"moov", _box(b"mvhd", mvhd))
    m = probe_mp4(_box(b"ftyp", b"isom") + moov)
    assert m.duration == 12345678901 and m.timescale == 90000
    assert m.n_tracks == 0 and m.width == 0


def test_size_zero_box_extends_to_end():
    mvhd = bytes(12) + struct.pack(">II", 1000, 42) + bytes(80)
    inner = _box(b"mvhd", mvhd)
    moov_zero = struct.pack(">I4s", 0, b"moov") + inner  # size 0 = to EOF
    m = probe_mp4(_box(b"ftyp", b"isom") + moov_zero)
    assert m.duration == 42


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        b"\x00" * 7,
        b"mp4 but not really a box structure!",
        build_mp4(10)[:20],  # truncated
        _box(b"ftyp", b"isom"),  # no moov
        struct.pack(">I4s", 3, b"bad!"),  # size smaller than header
    ],
)
def test_malformed_returns_none(blob):
    assert probe_mp4(blob) is None


def test_zero_timescale_rejected():
    mvhd = bytes(12) + struct.pack(">II", 0, 42) + bytes(80)
    blob = _box(b"ftyp", b"isom") + _box(b"moov", _box(b"mvhd", mvhd))
    assert probe_mp4(blob) is None


def test_multi_track_counts_and_first_dims():
    m = probe_mp4(build_mp4(500, tracks=[(100, 50), (200, 150), (64, 64)]))
    assert m.n_tracks == 3
    assert (m.width, m.height) == (100, 50)


def test_webdataset_extractor_edge_cases(spark):
    """Readable tar with an undecodable image -> null dims; sample with
    caption only -> null dims; unknown extensions ignored; unreadable
    tar -> no rows."""
    import io
    import tarfile

    import numpy as np

    from video_stream_processing_spark.functions.pngcodec import encode_png
    from video_stream_processing_spark.operators.multimodal import webdataset_samples

    def tar_bytes(entries):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for name, data in entries:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        return buf.getvalue()

    good = tar_bytes(
        [
            ("a.png", encode_png(np.zeros((3, 5, 3), np.uint8))),
            ("a.txt", b"hello"),
            ("a.json", b"{}"),  # ignored extension
            ("b.png", b"not-an-image"),
            ("b.txt", b"x"),
            ("c.txt", b"caption-only"),
        ]
    )
    df = spark.createDataFrame(
        [(0, good), (1, b"definitely not a tar")], "doc_id long, payload binary"
    )
    rows = {r["sample_key"]: r for r in webdataset_samples(df).collect()}
    assert set(rows) == {"a", "b", "c"}  # doc 1 contributed nothing
    assert (rows["a"]["width"], rows["a"]["height"], rows["a"]["caption_len"]) == (5, 3, 5)
    assert rows["b"]["width"] is None and rows["b"]["caption_len"] == 1
    assert rows["c"]["width"] is None and rows["c"]["caption_len"] == 12
