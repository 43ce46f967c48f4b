"""Bounded-memory per-key sequential scans.

``groupBy(key).applyInPandas`` materializes EACH GROUP as one pandas
DataFrame — at 100 TB a hot stream (months of frames on one key) OOMs the
task. The scalable shape for per-key sequential recurrences is:

    repartition(key)                  # one hash shuffle, same as groupBy
      .sortWithinPartitions(key, ts)  # external sort, spills to disk
      .mapInPandas(scan_fn)           # Arrow chunks of <= maxRecordsPerBatch

``mapInPandas`` streams each partition's rows IN ORDER as a sequence of
bounded Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch,
default 10k rows), so the scan carries O(keys-in-flight) state — a dict
entry per key, never a key's whole history. Keys are contiguous after the
sort, so state can be dropped as soon as the key changes.

This module hosts the one shared wrapper; the recurrence bodies live with
their operators (keyframe gate, exact segments, scene gate).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

ScanFn = Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]
ArrowScanFn = Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]


def _scan_partitions(frames: DataFrame) -> int:
    """Partition count for the keyed exchange feeding a Python scan.

    ``repartition(key)`` without a count is a REPARTITION_BY_COL
    exchange, which AQE coalesces BY BYTES — and the scan body's cost is
    per-row Python/Arrow compute, not bytes, so byte-based coalescing
    serializes it (r15 profile: a10's gate ran 5.6 s of Python on 2
    tasks because 2.4 MB of frames "fit" in 2 partitions). An explicit
    count pins the exchange (REPARTITION_BY_NUM is exempt from AQE
    coalescing); the value stays the session's shuffle-partition conf,
    so a cluster still sizes it centrally. Platforms that set the conf
    to a non-numeric value (e.g. 'auto') fall back to the scheduler's
    default parallelism (r15 ADVICE)."""
    try:
        return int(frames.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return frames.sparkSession.sparkContext.defaultParallelism


def keyed_sorted_scan(
    frames: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    scan_fn: ScanFn,
    out_schema,
) -> DataFrame:
    """Hash-partition on ``key_col``, sort each partition by
    (key, *order_cols), stream bounded Arrow chunks through ``scan_fn``.

    ``scan_fn`` must tolerate a key spanning multiple consecutive chunks
    (carry state) and multiple keys inside one chunk (keys arrive
    contiguously in sorted order)."""
    return (
        frames.repartition(_scan_partitions(frames), key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInPandas(scan_fn, schema=out_schema)
    )


def keyed_sorted_scan_arrow(
    frames: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    scan_fn: ArrowScanFn,
    out_schema,
) -> DataFrame:
    """Arrow-native twin of :func:`keyed_sorted_scan` (Spark 4's
    ``mapInArrow``): identical shuffle + external-sort shape, but
    ``scan_fn`` consumes and produces ``pyarrow.RecordBatch`` directly —
    the pandas Block-manager conversion on BOTH worker boundaries is
    skipped, which is pure overhead for scan bodies that only read a few
    primitive columns and emit a row filter/projection of the input.

    Same chunking contract as the pandas form: keys arrive contiguously
    in sorted order, a key may span consecutive batches (carry state),
    and multiple keys may share one batch. Measured vs the pandas twin
    in SCALE.md (keyed-scan section)."""
    return (
        frames.repartition(_scan_partitions(frames), key_col)
        .sortWithinPartitions(key_col, *order_cols)
        .mapInArrow(scan_fn, schema=out_schema)
    )
