#!/usr/bin/env python
"""Run the full differential gate locally: every declared query vs its
DuckDB oracle at the given scale factor (default sf0.01, same as the
driver's t2). Usage: python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.oracle import run_all
from video_stream_processing_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or None
    spark = get_spark("correctness-check")
    results = run_all(spark, sf_dir, names=names)
    n_fail = sum(1 for r in results if not r.ok)
    for r in results:
        print(r)
    print(f"\n{len(results) - n_fail}/{len(results)} passed at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
