"""EngineConfig resolution — defaults mirror the reference's
application.properties / VideoStreamConfig code defaults."""

from __future__ import annotations

from video_stream_processing_spark.config import EngineConfig


def test_defaults_match_reference():
    c = EngineConfig.load()
    assert c.kafka_topic == "video-stream-topic"
    assert c.kafka_group_id == "video-processing-group"
    assert c.keyframe_min_interval_ms == 5_000
    assert c.segment_duration_ms == 180_000
    assert c.confidence_threshold == 0.5
    assert c.nms_iou_threshold == 0.45
    assert c.video_bitrate == "2048k" and c.video_fps == 25


def test_properties_file_and_overrides(tmp_path):
    p = tmp_path / "application.properties"
    p.write_text(
        "# comment\n"
        "kafka.topic=other-topic\n"
        "video.segment.duration=60000\n"
        "scene.change.threshold=0.7\n"
        "unknown.key=ignored\n"
    )
    c = EngineConfig.load(str(p))
    assert c.kafka_topic == "other-topic"
    assert c.segment_duration_ms == 60_000
    assert abs(c.scene_change_threshold - 0.7) < 1e-9
    # kwargs beat the file
    c2 = EngineConfig.load(str(p), kafka_topic="explicit")
    assert c2.kafka_topic == "explicit"


def test_env_resolution(monkeypatch):
    monkeypatch.setenv("VSP_KAFKA_TOPIC", "env-topic")
    monkeypatch.setenv("VSP_SEGMENT_DURATION_MS", "30000")
    c = EngineConfig.load()
    assert c.kafka_topic == "env-topic"
    assert c.segment_duration_ms == 30_000
