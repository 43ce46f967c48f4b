#!/usr/bin/env python
"""Streaming-mode throughput check: replay the events table as a frame
stream through the stateful keyframe gate and the exact segment operator
(the two applyInPandasWithState paths), and report end-to-end frames/s.

Reference design point: 25 fps x 3 streams = 75 frames/s
(BASELINE.md; VideoStreamMockProducer defaults). Prints one JSON line.

``measure(spark, sf_dir, paths=...)`` is importable — bench.py calls it
to record a ``stream_throughput_fps`` metric next to the headline total
(VERDICT r7 task 5).

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from video_stream_processing_spark.session import get_spark
from video_stream_processing_spark.tables import load_table

ALL_PATHS = (
    "keyframe_gate",
    "exact_segments",
    "full_detection_path",
    "funnel_cep",
    "neardup_gate",
)


def measure(spark, sf_dir: str, paths: tuple[str, ...] = ALL_PATHS) -> dict:
    """Run the requested stateful-streaming paths end-to-end (noop sink,
    processAllAvailable) and return {path: {sec, frames_per_sec}} plus
    n_frames. Work dir (replayed frames + checkpoints) is temp-scoped."""
    work = tempfile.mkdtemp(prefix="vsp-stream-bench-")
    frames_dir = os.path.join(work, "frames")
    try:
        ev = load_table(spark, sf_dir, "events")
        n_frames = ev.count()
        (
            ev.select(
                F.col("user_id").cast("string").alias("stream_id"),
                "ts",
                F.col("value").alias("scene_signal"),
            )
            .write.mode("overwrite")
            .parquet(frames_dir)
        )

        from video_stream_processing_spark.streaming.stateful import (
            exact_segments_stream,
            keyframes_stream,
        )

        stream = spark.readStream.schema(
            "stream_id string, ts timestamp, scene_signal double"
        ).parquet(frames_dir)

        def full_detection_path():
            """gate -> stub-UDF inference -> NMS -> explode (the §3.2 hot
            path, exactly as streaming/pipeline.detection_query wires it)."""
            from video_stream_processing_spark.operators.detection import (
                nms_udf,
                stub_detect_udf,
            )

            gated = keyframes_stream(stream, 300_000, 50.0).where(F.col("is_keyframe"))
            with_vec = gated.withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(0), F.lit(15)),
                    lambda i: ((F.col("scene_signal") + i) % 7 - 3).cast("float") / 3.0,
                ),
            )
            detect = stub_detect_udf()
            nms = nms_udf()
            return with_vec.select(
                "stream_id", F.explode(nms(detect(F.col("embedding")))).alias("d")
            )

        def funnel_path():
            """view->click->purchase CEP state machine (b55's streaming
            twin) — per-user O(1) state, event-time timeout expiry."""
            from video_stream_processing_spark.streaming.stateful import funnel_stream

            events_dir = os.path.join(work, "events")
            ev.select("user_id", "event_type", "ts").write.mode("overwrite").parquet(
                events_dir
            )
            ev_stream = spark.readStream.schema(
                "user_id long, event_type string, ts timestamp"
            ).parquet(events_dir)
            return funnel_stream(ev_stream)

        def neardup_gate_path():
            """The streaming NEAR-dup ingest gate (the r13/r14 flagship
            front): replayed 64-bit signatures against a 50k-signature
            stored index — 4 banded hash anti-joins + the
            watermark-bounded exact gate per micro-batch. Signatures are
            synthetic (xxhash64-derived bit strings): the gate's cost is
            the join/state machinery, and the per-modality hash kernels
            are measured by their own decode paths. The banded index
            materializes once at graph build (amortized across a real
            deployment's micro-batches), so it is outside the timed
            window by construction of `builders[name]()`."""
            from video_stream_processing_spark.streaming.pipeline import (
                neardup_gate_stream,
            )

            def sig64(*cols):
                return F.lpad(F.bin(F.xxhash64(*cols)), 64, "0")

            sigs_dir = os.path.join(work, "sigs")
            (
                ev.select(
                    F.xxhash64("user_id", "ts").alias("doc_id"),
                    "ts",
                    sig64(F.col("user_id"), F.col("value")).alias("sig"),
                )
                .write.mode("overwrite")
                .parquet(sigs_dir)
            )
            index_sig = spark.range(50_000).select(
                F.col("id").alias("doc_id"), sig64(F.col("id"), F.col("id")).alias("sig")
            )
            sig_stream = spark.readStream.schema(
                "doc_id long, ts timestamp, sig string"
            ).parquet(sigs_dir)
            return neardup_gate_stream(sig_stream, index_sig)

        builders = {
            "keyframe_gate": lambda: keyframes_stream(stream, 300_000, 50.0),
            "exact_segments": lambda: exact_segments_stream(
                stream.select("stream_id", "ts")
            ),
            "full_detection_path": full_detection_path,
            "funnel_cep": funnel_path,
            "neardup_gate": neardup_gate_path,
        }

        results: dict = {"n_frames": n_frames}
        for name in paths:
            q = (
                builders[name]()
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(work, f"ck-{name}"))
                .outputMode("append")
                .start()
            )
            try:
                t0 = time.perf_counter()
                q.processAllAvailable()
                dt = time.perf_counter() - t0
            finally:
                # ALWAYS stop: an orphaned stream keeps running while the
                # finally below rmtree's its checkpoint dir out from under
                # it, spraying errors into the caller's stdout (bench.py's
                # single-line output contract)
                q.stop()
            results[name] = {
                "sec": round(dt, 2),
                "frames_per_sec": round(n_frames / dt, 1),
            }
        return results
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    results = measure(spark, sf_dir)
    n_frames = results.pop("n_frames")
    print(
        json.dumps(
            {
                "metric": "streaming_stateful_throughput",
                "n_frames": n_frames,
                "sf_dir": sf_dir,
                "reference_design_point_fps": 75,
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
