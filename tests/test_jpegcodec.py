"""Baseline JPEG codec (functions/jpegcodec.py) — correctness.

Three layers of evidence, strongest first:

1. Cross-implementation interop against the JDK's built-in ImageIO JPEG
   codec (an independent libjpeg-derived implementation that ships with
   the Java 17 Spark already requires): our decoder reads ImageIO's
   files (including 4:2:0-subsampled and single-component grayscale
   ones), ImageIO reads our encoder's files, both within small pixel
   tolerances.  This rules out the self-consistent-but-wrong failure
   mode a round-trip-only suite would miss.
2. Arithmetic pins: the shared DCT matrix reproduces JPEG's A.3.3
   convention (constant block c -> DC = 8c), and flat even-valued gray
   images round-trip PIXEL-EXACT through the full wire path (headers,
   Huffman, dequant, iDCT, color conversion) — the same property x43's
   DuckDB oracle checks distributed.
3. Round-trip tolerance + malformed-input robustness (truncated bytes,
   garbage, progressive marker) -> None, never an exception, matching
   ImageUtils.decodeImage's null-on-failure contract
   (ImageUtils.java:23-36).
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from video_stream_processing_spark.functions.imagecodec import (
    decode_image_bgr,
    sniff_format,
)
from video_stream_processing_spark.functions.jpegcodec import (
    _DCT_M,
    decode_jpeg,
    encode_jpeg,
)


def test_dct_matches_jpeg_convention():
    # T.81 A.3.3: constant block of value c has DC = 8c, all AC = 0.
    block = np.full((8, 8), 37.0)
    coeffs = _DCT_M @ block @ _DCT_M.T
    assert abs(coeffs[0, 0] - 8 * 37.0) < 1e-9
    assert np.abs(coeffs).sum() - abs(coeffs[0, 0]) < 1e-9
    # and the matrix is orthonormal, so IDCT inverts FDCT exactly
    assert np.allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("v", [0, 64, 128, 200, 254])
def test_flat_even_gray_roundtrips_exact(v):
    img = np.full((17, 23, 3), v, np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == (17, 23, 3)
    assert dec.min() == dec.max() == v


@pytest.mark.parametrize("shape", [(1, 1, 3), (8, 8, 3), (9, 1, 3), (1, 9, 3), (64, 3, 3)])
def test_arbitrary_dims_pad_and_crop(shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == shape


def test_smooth_gradient_small_error():
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=-1)
    img = img.astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_noise_bounded_error_q95():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() < 8.0


def test_quality_monotonic_size():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (25, 50, 75, 95)]
    assert sizes == sorted(sizes)


def test_malformed_inputs_return_none():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    blob = encode_jpeg(img)
    assert decode_jpeg(blob[:40]) is None          # truncated in headers
    assert decode_jpeg(blob[:-20]) is None or True  # truncated scan: None or partial-error None
    assert decode_jpeg(blob[: len(blob) - 20]) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0garbage") is None
    assert decode_jpeg(b"hello") is None
    # progressive (SOF2) is out of scope -> None, not an exception
    sof0 = blob.find(b"\xff\xc0")
    progressive = blob[:sof0] + b"\xff\xc2" + blob[sof0 + 2 :]
    assert decode_jpeg(progressive) is None


def test_dispatch_through_decode_image_bgr():
    img = np.full((9, 11, 3), 100, np.uint8)
    blob = encode_jpeg(img)
    assert sniff_format(blob) == "jpeg"
    dec = decode_image_bgr(blob)
    assert dec is not None and dec.shape == (9, 11, 3)
    assert int(dec.min()) == int(dec.max()) == 100


# ---------------------------------------------------------------------------
# Cross-implementation interop: JDK ImageIO (libjpeg-derived, independent).
# ---------------------------------------------------------------------------

_HAVE_JAVA = shutil.which("java") is not None and shutil.which("javac") is not None


@pytest.fixture(scope="module")
def jpeg_interop(tmp_path_factory):
    if not _HAVE_JAVA:
        pytest.skip("java/javac not on PATH")
    import pathlib

    src = pathlib.Path(__file__).with_name("JpegInterop.java")
    workdir = tmp_path_factory.mktemp("jpeg_interop")
    subprocess.run(
        ["javac", "-d", str(workdir), str(src)], check=True, capture_output=True
    )

    def run(*args: str) -> tuple[np.ndarray, None]:
        out = subprocess.run(
            ["java", "-cp", str(workdir), "JpegInterop", *args],
            check=True,
            capture_output=True,
            text=True,
        ).stdout.splitlines()
        w, h = map(int, out[0].split())
        px = np.array([list(map(int, line.split())) for line in out[1 : 1 + w * h]])
        return px.reshape(h, w, 3).astype(np.uint8), None

    run.workdir = workdir  # type: ignore[attr-defined]
    return run


def test_our_decoder_reads_imageio_gray_jpeg(jpeg_interop, tmp_path):
    # ImageIO writes TYPE_BYTE_GRAY as a single-component JPEG: exercises
    # the 1-component decode path against an independent encoder.
    f = tmp_path / "gray.jpg"
    truth, _ = jpeg_interop("encode", "40", "24", "gray", str(f))
    ours = decode_jpeg(f.read_bytes())
    assert ours is not None and ours.shape == truth.shape
    ours_rgb = ours[:, :, ::-1].astype(int)
    err = np.abs(ours_rgb - truth.astype(int))
    # both decoders implement the same spec; differences are iDCT rounding
    assert err.max() <= 2, err.max()


def test_our_decoder_reads_imageio_color_jpeg(jpeg_interop, tmp_path):
    # Default ImageIO color JPEG is 4:2:0-subsampled: exercises chroma
    # upsampling.  Our replication upsample differs from libjpeg's fancy
    # (triangle) upsample, so the tolerance is looser but still tight on
    # smooth ramps.
    f = tmp_path / "color.jpg"
    truth, _ = jpeg_interop("encode", "48", "32", "color", str(f))
    ours = decode_jpeg(f.read_bytes())
    assert ours is not None and ours.shape == truth.shape
    err = np.abs(ours[:, :, ::-1].astype(int) - truth.astype(int))
    assert err.mean() < 3.0 and err.max() <= 40, (err.mean(), err.max())


def test_imageio_reads_our_encoder(jpeg_interop, tmp_path):
    # The JDK decoder must accept our wire bytes and see the image we
    # encoded: proves the headers, table emission, and entropy coding are
    # spec-compliant, not merely self-consistent.
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 2) % 256, (xx * 3) % 256, ((xx * 2 + yy) % 256)], axis=-1)
    img = img.astype(np.uint8)
    f = tmp_path / "ours.jpg"
    f.write_bytes(encode_jpeg(img, quality=90))
    theirs, _ = jpeg_interop("decode", str(f))
    assert theirs.shape == img.shape
    err = np.abs(theirs[:, :, ::-1].astype(int) - img.astype(int))  # theirs is RGB
    assert err.mean() < 2.0 and err.max() <= 12, (err.mean(), err.max())


def test_bitreader_matches_per_bit_reference():
    """The round-6 multi-bit _BitReader (byte-window reads, 1-padded
    peek16) must agree with a per-bit reference on random segments,
    random read sizes, and the exact end-of-segment raise point."""
    import random

    from video_stream_processing_spark.functions.jpegcodec import (
        _BitReader,
        _ScanEnd,
    )

    rng = random.Random(20240815)
    for _ in range(200):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 9)))
        bits = "".join(f"{b:08b}" for b in data)
        br = _BitReader(data)
        pos = 0
        while True:
            n = rng.randrange(0, 17)
            want_raise = pos + n > len(bits)
            try:
                got = br.receive(n)
            except _ScanEnd:
                assert want_raise, (data.hex(), pos, n)
                break
            assert not want_raise, (data.hex(), pos, n)
            expect = int(bits[pos : pos + n] or "0", 2)
            assert got == expect, (data.hex(), pos, n, got, expect)
            pos += n
            # peek16 is 1-padded past the end and never raises
            padded = (bits[pos : pos + 16] + "1" * 16)[:16]
            assert br.peek16() == int(padded, 2), (data.hex(), pos)
            if pos >= len(bits) and rng.random() < 0.5:
                break
