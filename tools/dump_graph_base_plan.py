#!/usr/bin/env python
"""Dump the co-purchase GRAPH BASE-BUILD plan (the pair-aggregation job
that _materialized_graph checkpoints) — VERDICT r15 item 9: the
committed x82/x89/b63 dumps start at the checkpointed RDD, so the
base-stage claims (exchange-free self-join over the persisted baskets,
packed BIGINT pair key) were not visible in them. This dumps the
pre-checkpoint pairs plan itself.

Usage: python tools/dump_graph_base_plan.py <out_file> <sf_dir>
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.plans.graph_mining import _copurchase_edges
from video_stream_processing_spark.session import get_spark


def main() -> int:
    out_file, sf_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("dump-graph-base")
    spark.sparkContext.setLogLevel("ERROR")
    res = _copurchase_edges(spark, sf_dir)
    pairs = res[0]
    # run the base job once so the dump is the final adaptive plan
    pairs.write.format("noop").mode("overwrite").save()
    mode = spark.sparkContext._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pairs._jdf.queryExecution().explainString(mode)
    with open(out_file, "w") as fh:
        fh.write(plan)
    print(f"wrote {out_file}")
    # best effort: release the baskets cache if this revision returns it
    if len(res) > 3 and inspect.ismethod(getattr(res[3], "unpersist", None)):
        res[3].unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
