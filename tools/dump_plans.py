#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<dir>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <out_dir> <tag> <sf_dir> name [name...]

Used in optimization rounds to commit before/after physical plans for
every query a change touched (the judge checks plan claims against
these files). The dump is the FINAL adaptive plan where possible: each
query is executed once through the noop sink first so AQE's re-planned
form (join strategies, coalesced reads) is what gets printed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.plans.registry import query_map
from video_stream_processing_spark.session import (
    get_spark,
    release_since,
    snapshot_persistent_ids,
)


def main() -> int:
    out_dir, tag, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for n in names:
        base = snapshot_persistent_ids(spark)
        df = qmap[n](spark, sf_dir)
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # still dump the static plan
            print(f"{n}: execution failed ({e}); dumping pre-execution plan")
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        release_since(spark, base)
        print(f"wrote {n}_{tag}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
