#!/usr/bin/env python
"""Audit for InferFiltersFromGenerate double-evaluation (r15 finding 3,
guide §4.4's duplicated-evaluation trap in JVM-expression form).

``explode(arr)`` makes the optimizer synthesize ``size(arr) > 0 AND
isnotnull(arr)``; when ``arr`` is a COMPUTED expression (not a plain
attribute), predicate pushdown inlines its defining expression into the
filter, so the whole chain evaluates twice per row. This tool builds the
optimized plan for every registered query and reports any Filter whose
``size(...)`` argument is a function call rather than an attribute.

Usage: python tools/generator_filter_audit.py [sf_dir] [names...]
Exit code 1 if any site is found.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.plans.registry import all_queries, query_map
from video_stream_processing_spark.session import get_spark

# size(foo#123...) over a bare attribute is the cheap inferred filter we
# keep, and size(fn(attr#123)) is a rule legitimately computed over a
# stored array (x35's curation conjuncts); size(fn(gn(...))) — two or
# more nested calls — means a DERIVATION CHAIN (split(trim(...)),
# zip_with(slice(split(...)))) was substituted into the filter and
# re-evaluates per conjunct: that is the duplication this audit hunts.
_COMPUTED_SIZE = re.compile(r"size\((\w+)\(\s*(\w+)\(")


def scan(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    hits = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ")
        if not stripped.startswith("Filter"):
            continue
        for m in _COMPUTED_SIZE.finditer(line):
            fn = m.group(1)
            hits.append(f"size({fn}(... in: {stripped[:160]}")
    return hits


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("generator-filter-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    todo = names or all_queries()
    bad = 0
    for n in todo:
        try:
            hits = scan(qmap[n](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            print(f"[ERR] {n}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if hits:
            bad += 1
            print(f"[HIT] {n}")
            for h in hits:
                print(f"      {h}")
    print(f"\n{bad} queries with computed-array generator filters "
          f"(of {len(todo)} audited)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
