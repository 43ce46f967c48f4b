#!/usr/bin/env python
"""Microbenchmark: x109's JVM explode covariance vs the Arrow-native
twin (operators/stats.py, one numpy Gram matmul per batch). Prints one
JSON line; numbers are recorded in SCALE.md.

Usage: python tools/covariance_bench.py [sf_dir|n_rows] [reps]
  - a path runs on that testdata dir's embeddings.parquet
  - an integer synthesizes that many 64-dim vectors (scale probe)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from video_stream_processing_spark.operators.stats import (
    covariance_upper_triangle_arrow,
    covariance_upper_triangle_jvm,
)
from video_stream_processing_spark.session import get_spark


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("covariance-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.isdir(arg):
        emb = spark.read.parquet(os.path.join(arg, "embeddings.parquet"))
        source = arg
    else:
        n = int(arg)
        emb = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: (
                        F.sin(F.col("id") * 0.37 + i * 1.13) * 0.3
                    ).cast("float"),
                ).alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        source = f"synthetic:{n}"

    jvm_df = covariance_upper_triangle_jvm(emb)
    arrow_df = covariance_upper_triangle_arrow(emb)

    report: dict = {"source": source, "reps": reps, "best_sec": {}}
    for name, df in (("jvm_explode", jvm_df), ("arrow_gram", arrow_df)):
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        report["best_sec"][name] = round(best, 3)
    a = {(r["i"], r["j"]): r["cov"] for r in jvm_df.collect()}
    b = {(r["i"], r["j"]): r["cov"] for r in arrow_df.collect()}
    report["identical"] = a == b
    report["speedup"] = round(
        report["best_sec"]["jvm_explode"] / report["best_sec"]["arrow_gram"], 3
    )
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
