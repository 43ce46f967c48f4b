"""Scene-change signal from payload bytes: planted scene cuts must drive
the keyframe gate end-to-end from BINARY frames (VERDICT r1 item 3).

Scenes are simulated with distinct byte distributions: frames inside a
scene share a payload pattern (histogram correlation ~1.0), a cut
switches to a disjoint byte range (correlation ~<=0), so the gate's
scene rule (sim < 1 - threshold) fires exactly at the cuts.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

BASE_MS = 1_700_000_000_000


def _scene_payload(scene: int, jitter: int) -> bytes:
    # scene 0 -> bytes 0..63, scene 1 -> bytes 128..191: disjoint ranges,
    # tiny per-frame jitter so payloads aren't literally identical
    lo = 128 * scene
    return bytes((lo + ((i * 7 + jitter) % 64)) for i in range(256))


def _frames(spark, rows):
    return spark.createDataFrame(
        rows, "stream_id string, ts_ms long, frame_data binary"
    ).select("stream_id", F.timestamp_millis("ts_ms").alias("ts"), "frame_data")


@pytest.fixture(scope="module")
def planted_cut_rows():
    # 1 fps, 30 frames: scene 0 for t=0..11, cut at t=12, scene 1 onward.
    return [
        ("cam", BASE_MS + t * 1000, _scene_payload(0 if t < 12 else 1, t))
        for t in range(30)
    ]


def _expected_keyframes(n=30, cut=12, interval_s=5):
    # reference recurrence: interval rule (>= 5 s since last KEPT) first,
    # scene rule at the cut; both reset the interval clock
    kept, last = [], None
    for t in range(n):
        if last is None or t - last >= interval_s:
            kept.append(t)
            last = t
        elif t == cut:  # similarity collapses exactly at the cut
            kept.append(t)
            last = t
    return [BASE_MS + t * 1000 for t in kept]


def test_hist_correlation_math(spark):
    from video_stream_processing_spark.operators.scene import hist_correlation

    df = spark.createDataFrame(
        [
            ([0.5, 0.5, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0]),  # identical -> 1
            ([0.5, 0.5, 0.0, 0.0], [0.0, 0.0, 0.5, 0.5]),  # disjoint -> -1
            ([0.25, 0.25, 0.25, 0.25], [0.25, 0.25, 0.25, 0.25]),  # zero var, equal -> 1
            ([0.25, 0.25, 0.25, 0.25], [0.5, 0.5, 0.0, 0.0]),  # zero var, differ -> 0
        ],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(hist_correlation(F.col("a"), F.col("b"))).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(-1.0)
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(0.0)


def test_with_scene_similarity_values(spark, planted_cut_rows):
    from video_stream_processing_spark.operators.scene import with_scene_similarity

    out = (
        with_scene_similarity(_frames(spark, planted_cut_rows))
        .orderBy("ts")
        .collect()
    )
    assert "frame_data" not in out[0].asDict()  # binary projected away
    sims = [r["scene_sim"] for r in out]
    assert sims[0] is None  # no predecessor
    within = sims[1:12] + sims[13:]
    assert all(s > 0.9 for s in within)  # same scene: near-perfect correlation
    assert sims[12] < 0.5  # the cut: disjoint byte ranges


def test_keyframe_gate_from_bytes_planted_cuts(spark, planted_cut_rows):
    from video_stream_processing_spark.operators.scene import keyframe_gate_from_bytes

    kept = sorted(
        r["ts"]
        for r in keyframe_gate_from_bytes(_frames(spark, planted_cut_rows)).collect()
    )
    kept_ms = [int(t.timestamp() * 1000) for t in kept]
    assert kept_ms == _expected_keyframes()


def test_gate_undecodable_frames_fall_back_to_interval(spark):
    from video_stream_processing_spark.operators.scene import keyframe_gate_from_bytes

    rows = [("cam", BASE_MS + t * 1000, None) for t in range(12)]
    kept = keyframe_gate_from_bytes(_frames(spark, rows)).collect()
    kept_ms = sorted(int(r["ts"].timestamp() * 1000) for r in kept)
    # similarity is forced to 1.0 -> only the 5 s interval rule fires
    assert kept_ms == [BASE_MS, BASE_MS + 5_000, BASE_MS + 10_000]


def test_streaming_bytes_gate_matches_batch(spark, planted_cut_rows, tmp_path):
    from video_stream_processing_spark.operators.scene import keyframe_gate_from_bytes
    from video_stream_processing_spark.streaming.stateful import (
        keyframes_from_bytes_stream,
    )

    d = str(tmp_path / "frames")
    _frames(spark, planted_cut_rows).coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "stream_id string, ts timestamp, frame_data binary"
    ).parquet(d)
    q = (
        keyframes_from_bytes_stream(stream)
        .writeStream.format("memory")
        .queryName("kf_bytes")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        int(r["ts"].timestamp() * 1000)
        for r in spark.sql("SELECT * FROM kf_bytes WHERE is_keyframe").collect()
    }
    batch = {
        int(r["ts"].timestamp() * 1000)
        for r in keyframe_gate_from_bytes(_frames(spark, planted_cut_rows)).collect()
    }
    assert got == batch == set(_expected_keyframes())


def test_byte_histogram_normalized(spark):
    from video_stream_processing_spark.operators.scene import byte_histogram_udf

    df = spark.createDataFrame(
        [(bytes([0, 0, 1, 255]),), (b"",), (None,)], "payload binary"
    )
    h0, h_empty, h_null = [
        r[0] for r in df.select(byte_histogram_udf()(F.col("payload"))).collect()
    ]
    assert h_empty is None and h_null is None
    arr = np.asarray(h0)
    assert arr.shape == (256,)
    assert arr[0] == pytest.approx(0.5) and arr[1] == pytest.approx(0.25)
    assert arr[255] == pytest.approx(0.25) and arr.sum() == pytest.approx(1.0)


def test_np_correlation_matches_jvm_hist_correlation(spark):
    """The fused gate's numpy correlation twin must agree with the JVM
    hist_correlation on random normalized histograms to well inside the
    gate's threshold margins (sub-ulp summation-order differences are
    the only permitted divergence), and on both zero-variance edge
    cases."""
    import numpy as np

    from video_stream_processing_spark.operators.scene import (
        _np_hist_correlation,
        hist_correlation,
    )

    rng = np.random.RandomState(42)
    pairs = []
    for _ in range(50):
        a = rng.rand(256)
        b = rng.rand(256)
        a, b = a / a.sum(), b / b.sum()
        pairs.append((list(map(float, a)), list(map(float, b))))
    flat = [0.00390625] * 256  # 1/256: zero variance
    pairs.append((flat, flat))  # equal -> 1.0
    pairs.append((flat, list(map(float, np.arange(256) / np.arange(256).sum()))))

    df = spark.createDataFrame(pairs, "a array<double>, b array<double>")
    jvm = [r[0] for r in df.select(hist_correlation(F.col("a"), F.col("b"))).collect()]
    for (a, b), expect in zip(pairs, jvm):
        got = _np_hist_correlation(np.array(a), np.array(b))
        assert got == pytest.approx(expect, abs=1e-9)
