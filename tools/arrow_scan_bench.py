#!/usr/bin/env python
"""Microbenchmark: pandas keyed scan (mapInPandas) vs the Arrow-native
twin (mapInArrow) on the stateful keyframe gate over a synthetic hot-key
corpus. Prints one JSON line; numbers are recorded in SCALE.md.

Usage: python tools/arrow_scan_bench.py [n_rows] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from video_stream_processing_spark.operators.keyframe import (
    keyframe_gate_stateful,
    keyframe_gate_stateful_arrow,
)
from video_stream_processing_spark.operators.scene import (
    keyframe_gate_from_bytes,
    keyframe_gate_from_bytes_arrow,
)
from video_stream_processing_spark.session import get_spark


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("arrow-scan-bench")
    # 8 keys so the 32 cores see real per-partition sorted runs; 1 s
    # cadence and a rolling scene signal as in tests/test_keyed_scan.py
    frames = (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("cam_"), (F.col("id") % 8).cast("string")).alias(
                "stream_id"
            ),
            F.timestamp_millis((F.col("id") / 8).cast("long") * 1000).alias("ts"),
            ((F.col("id") % 100) / 100.0).alias("scene_signal"),
        )
        .localCheckpoint(eager=True)  # time the scan, not the generator
    )
    # binary-payload corpus for the fused gate pair: 300-byte payloads
    # whose content flips every 97 rows (scene cuts at varying offsets)
    byte_frames = (
        spark.range(n_rows // 4)
        .select(
            F.concat(F.lit("cam_"), (F.col("id") % 8).cast("string")).alias(
                "stream_id"
            ),
            F.timestamp_millis((F.col("id") / 8).cast("long") * 1000).alias("ts"),
            F.encode(
                F.repeat(
                    F.concat(
                        F.lit("s"), ((F.col("id") / 97).cast("long") % 7).cast("string")
                    ),
                    150,
                ),
                "UTF-8",
            ).alias("frame_data"),
        )
        .localCheckpoint(eager=True)
    )
    report: dict = {"n_rows": n_rows, "reps": reps, "pairs": {}}
    pairs = {
        "signal_gate": (
            frames,
            {"signal_col": "scene_signal"},
            keyframe_gate_stateful,
            keyframe_gate_stateful_arrow,
        ),
        "fused_bytes_gate": (
            byte_frames,
            {},
            keyframe_gate_from_bytes,
            keyframe_gate_from_bytes_arrow,
        ),
    }
    for pair_name, (df, kw, pandas_fn, arrow_fn) in pairs.items():
        timings: dict[str, float] = {}
        counts: dict[str, int] = {}
        for name, fn in (("map_in_pandas", pandas_fn), ("map_in_arrow", arrow_fn)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.monotonic()
                counts[name] = fn(df, **kw).count()
                best = min(best, time.monotonic() - t0)
            timings[name] = round(best, 3)
        assert counts["map_in_pandas"] == counts["map_in_arrow"], (pair_name, counts)
        report["pairs"][pair_name] = {
            "input_rows": df.count(),
            "kept_rows": counts["map_in_arrow"],
            "best_sec": timings,
            "arrow_speedup": round(
                timings["map_in_pandas"] / timings["map_in_arrow"], 3
            ),
        }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
