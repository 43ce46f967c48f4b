#!/usr/bin/env python
"""Dump the formatted plan of every frame a query materializes via
localCheckpoint, plus the final plan — closing the evidence gap VERDICT
r15 item 9 called out: for checkpoint-staged queries the committed
final plan starts at `Scan ExistingRDD`, so claims about the stage that
FEEDS the checkpoint (spread exchanges, expression chains) were not
visible in the dumps. This wraps DataFrame.localCheckpoint to write
each checkpointed frame's plan before materializing it.

Usage: python tools/dump_checkpoint_plans.py <out_dir> <tag> <sf_dir> name [...]
Writes <out_dir>/<query>_ckpt<N>_<tag>.txt per checkpoint site.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# patch the CONCRETE class: in Spark 4 `pyspark.sql.DataFrame` is the
# abstract base and instances are the classic subclass, which defines
# its own localCheckpoint — patching the base would not intercept
try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # Spark 3.x
    from pyspark.sql import DataFrame

from video_stream_processing_spark.plans.registry import query_map
from video_stream_processing_spark.session import get_spark


def main() -> int:
    out_dir, tag, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-ckpt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    orig = DataFrame.localCheckpoint
    for n in names:
        counter = {"i": 0}

        def capture(df, eager=True, *a, **kw):
            counter["i"] += 1
            plan = df._jdf.queryExecution().explainString(mode)
            path = os.path.join(out_dir, f"{n}_ckpt{counter['i']}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}")
            return orig(df, eager, *a, **kw)

        DataFrame.localCheckpoint = capture
        try:
            df = qmap[n](spark, sf_dir)
        finally:
            DataFrame.localCheckpoint = orig
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{n}_final_{tag}.txt"), "w") as fh:
            fh.write(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
