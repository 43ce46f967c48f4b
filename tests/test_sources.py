"""Kafka wire-format (de)serialization round-trip — the reference's
VideoFrameDeserializationSchema / mock-producer JSON contract, tested on
static DataFrames (no broker needed: the operator is a pure
DataFrame->DataFrame function)."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F


def _wire_json() -> str:
    return json.dumps(
        {
            "streamId": "camera_001",
            "frameId": 42,
            "timestamp": 1700000000123,
            "frameData": base64.b64encode(b"\xff\xd8jpegbytes").decode(),
            "frameSequence": 7,
            "metadata": {"width": 1920, "height": 1080, "fps": 25, "codec": "h264"},
            "unknownField": "ignored",  # Jackson/from_json both drop it
        }
    )


def test_deserialize_frames(spark):
    from video_stream_processing_spark.sources.kafka import deserialize_frames

    raw = spark.createDataFrame([(bytearray(_wire_json().encode()),)], "value binary")
    row = deserialize_frames(raw).collect()[0]
    assert row["stream_id"] == "camera_001"
    assert row["frame_id"] == 42
    assert row["ts"].isoformat().startswith("2023-11-14T22:13:20.123")
    assert bytes(row["frame_data"]) == b"\xff\xd8jpegbytes"
    assert row["frame_sequence"] == 7
    assert row["metadata"]["width"] == 1920 and row["metadata"]["codec"] == "h264"


def test_deserialize_missing_fields_null(spark):
    from video_stream_processing_spark.sources.kafka import deserialize_frames

    raw = spark.createDataFrame(
        [(bytearray(b'{"streamId": "s1"}'),), (bytearray(b"not json"),)], "value binary"
    )
    rows = {r["stream_id"]: r for r in deserialize_frames(raw).collect()}
    assert rows["s1"]["frame_id"] is None and rows["s1"]["metadata"] is None
    assert None in rows  # malformed JSON -> all-null row (PERMISSIVE mode)


def test_serialize_round_trip(spark):
    from video_stream_processing_spark.sources.kafka import (
        deserialize_frames,
        serialize_frames,
    )

    raw = spark.createDataFrame([(bytearray(_wire_json().encode()),)], "value binary")
    frames = deserialize_frames(raw)
    wire = serialize_frames(frames)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert wire.collect()[0]["key"] == "camera_001"
    back = deserialize_frames(wire.select(F.encode("value", "UTF-8").alias("value")))
    a = frames.collect()[0].asDict(recursive=True)
    b = back.collect()[0].asDict(recursive=True)
    assert a == b
