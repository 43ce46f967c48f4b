"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline query on sf0.001 (smoke).
queries()     -> every declared operator query (SURVEY.md §2 coverage).
oracle_sql()  -> matching DuckDB SQL for the differential correctness gate.

Implementation lives in the ``video_stream_processing_spark`` package;
this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from video_stream_processing_spark.plans.registry import oracle_map, query_map  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = query_map()
    return qs["flagship_segment_pipeline"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (SQL-expressible subset)."""
    return oracle_map()
