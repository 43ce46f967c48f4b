"""Kafka frame source — the reference's ingest path re-expressed as
Structured Streaming (SURVEY.md §2.1 #1-#2):

- KafkaSource builder: topic `video-stream-topic`, group
  `video-processing-group`, latest offsets, value-only deserialization
  (VideoStreamProcessingJob.java:134-142; defaults
  VideoStreamConfig.java:82-84);
- Jackson JSON -> VideoFrame binding (VideoFrameDeserializationSchema
  .java:13-31): explicit schema, missing fields -> null, binary payload
  base64 in the JSON (Jackson's byte[] convention; the reference's
  Python producer example base64-encodes explicitly, README.md:170-186).

No broker exists in this container, so ``kafka_frames`` only BUILDS the
streaming DataFrame (lazy — nothing connects until .start()); the
deserialization step is a pure DataFrame->DataFrame function tested on
static data (tests/test_sources.py), which is exactly the operator the
reference isolates behind its DeserializationSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_TOPIC = "video-stream-topic"  # kafka.topic default (VideoStreamConfig.java:83)
DEFAULT_GROUP = "video-processing-group"  # kafka.group.id default (:84)

# Wire schema of the Kafka JSON (VideoFrame POJO, model/VideoFrame.java:17-77).
# frameData arrives base64 (string) per Jackson byte[] convention.
FRAME_WIRE_SCHEMA = StructType(
    [
        StructField("streamId", StringType()),
        StructField("frameId", LongType()),
        StructField("timestamp", LongType()),  # epoch millis
        StructField("frameData", StringType()),  # base64
        StructField("frameSequence", IntegerType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("fps", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)


def deserialize_frames(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka bytes -> engine `frames` schema (SURVEY.md §1.4).

    ``from_json`` with the EXPLICIT wire schema (never inference —
    §1.2): unknown JSON fields are ignored, missing become null, exactly
    the Jackson databind behavior. Epoch-ms -> TimestampType at ingest;
    base64 -> BinaryType."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), FRAME_WIRE_SCHEMA).alias("f")
    )
    return parsed.select(
        F.col("f.streamId").alias("stream_id"),
        F.col("f.frameId").alias("frame_id"),
        F.timestamp_millis(F.col("f.timestamp")).alias("ts"),
        F.unbase64(F.col("f.frameData")).cast(BinaryType()).alias("frame_data"),
        F.col("f.frameSequence").alias("frame_sequence"),
        F.col("f.metadata").alias("metadata"),
    )


def kafka_frames(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """readStream.format("kafka") -> deserialized frames (lazy builder).

    `latest` offsets mirror OffsetsInitializer.latest()
    (VideoStreamProcessingJob.java:139). Consumer-group semantics differ
    by design: Spark tracks offsets in its checkpoint, not in Kafka's
    group coordinator — exactly-once comes from checkpoint + idempotent
    sink rather than group commits."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return deserialize_frames(raw)


def serialize_frames(frames: DataFrame) -> DataFrame:
    """Inverse wire mapping for the mock-producer analog
    (VideoStreamMockProducer.buildVideoFrame :201-245): frames ->
    (key, value) JSON keyed by stream_id (messages are keyed by streamId,
    :153-157)."""
    return frames.select(
        F.col("stream_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("stream_id").alias("streamId"),
                F.col("frame_id").alias("frameId"),
                F.unix_millis(F.col("ts")).alias("timestamp"),
                F.base64(F.col("frame_data")).alias("frameData"),
                F.col("frame_sequence").alias("frameSequence"),
                F.col("metadata").alias("metadata"),
            )
        ).alias("value"),
    )
