#!/usr/bin/env python
"""Targeted per-query timing with bench.py's exact methodology (noop
sink, warmup at sf0.001, System.gc() between reps, round-robin reps,
median + spread + probes) for a SUBSET of queries — the interleaved-A/B
tool for optimization work, so a change can be measured without paying
a full 43-query bench run.

Usage: python tools/time_queries.py [sf_dir] name [name...]
       SPARK_GRAFT_BENCH_REPS=N (default 5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.plans.registry import query_map  # noqa: E402
from video_stream_processing_spark.session import (  # noqa: E402
    get_spark,
    release_since,
    snapshot_persistent_ids,
)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    jvm = spark.sparkContext._jvm

    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def probe() -> float:
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr("sum(id * 2) AS s").collect()
        return round(time.perf_counter() - t0, 3)

    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        if os.path.isdir(warm_dir):
            try:
                run_full(qmap[n](spark, warm_dir))
            except Exception:
                pass

    samples: dict[str, list[float]] = {n: [] for n in names}
    probes = []
    for _ in range(reps):
        probes.append(probe())
        for n in names:
            base = snapshot_persistent_ids(spark)
            jvm.java.lang.System.gc()
            t0 = time.perf_counter()
            run_full(qmap[n](spark, sf_dir))
            samples[n].append(round(time.perf_counter() - t0, 3))
            release_since(spark, base)
    probes.append(probe())
    out = {
        "queries": {n: round(statistics.median(ts), 3) for n, ts in samples.items()},
        "samples": samples,
        "probe_sec": probes,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
