"""Multimodal column plumbing — images/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

This is the engine analog of the reference's binary frame payload
(VideoFrame.frameData byte[], /root/reference/src/main/java/com/video/
streaming/model/VideoFrame.java:39) and its decode step
(ImageUtils.decodeImage, util/ImageUtils.java:23-36).

The real codec libraries (Pillow/cv2/ffmpeg bindings) are NOT in this
container, so the decode BODY is pluggable:

- ``fake_decode_meta``: deterministic arithmetic on the raw bytes
  (length/first-byte derived) — the Spark-side plumbing (binary schema,
  Arrow batch shape, mapInPandas iterator contract, partition layout) is
  fully real and oracle-checked;
- ``real_decode_meta``: import-gated Pillow path raising
  NotImplementedError here, with the intended contract documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, format string"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text stand
    in for JPEG bytes — same BinaryType plumbing end to end)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_decode_meta(df: DataFrame) -> DataFrame:
    """mapInPandas "decode": bytes -> typed metadata.

    Deterministic fake: width = n_bytes % 640 + 16, height = first byte
    value + 16, channels = 3, format = 'fake-jpeg'. Bytes never leave the
    executor; the output drops the payload column (UDF-boundary
    discipline — SURVEY.md §4.2: project binary away outside the UDF).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "width": payload.map(lambda b: len(b) % 640 + 16).astype("int32"),
                    "height": payload.map(lambda b: (b[0] if len(b) else 0) + 16).astype(
                        "int32"
                    ),
                    "channels": 3,
                    "format": "fake-jpeg",
                }
            )

    return df.mapInPandas(decode, schema=META_SCHEMA)


def real_decode_meta(df: DataFrame) -> DataFrame:  # pragma: no cover
    """Real image decode (Pillow), import-gated.

    Contract when the lib exists: same META_SCHEMA, width/height from the
    actual image header, format from the container; decode failures yield
    nulls (the reference treats undecodable frames as similarity 1.0 /
    skip — KeyFrameExtractor.java:94,107)."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Pillow is not available in this container; use fake_decode_meta "
            "(deterministic, oracle-checked plumbing)"
        ) from e
    raise NotImplementedError("wire PIL.Image.open over payload bytes here")


def frame_sample(
    frames: DataFrame, key_col: str = "stream_id", ts_col: str = "ts", every_n: int = 10
) -> DataFrame:
    """Every-Nth-frame sampling per stream (video frame-sample analog):
    one window shuffle on the stream key, keep ranks 1, 1+N, 1+2N, ...
    ((rn-1) % N == 0 — degrades correctly to all rows at every_n=1)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    return (
        frames.withColumn("rn", F.row_number().over(w))
        .where(((F.col("rn") - 1) % every_n) == 0)
        .drop("rn")
    )
