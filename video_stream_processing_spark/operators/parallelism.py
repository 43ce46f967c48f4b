"""Scan-parallelism guard for compute-heavy map stages.

A parquet scan yields one task per file split; when the input is a
handful of small files (one row group at the test scale factors), every
downstream NARROW operation — codec decode, shingling + md5, per-row
folds, Python/Arrow passes — inherits that single task and serializes
onto one core while the rest of the machine idles. The guard measures
the scan's split count from driver-side metadata and round-robin
repartitions to the default parallelism ONLY when the scan cannot fill
the cores; at real scale (inputs >> cores x 128 MB) it is a no-op, so
no extra full-corpus shuffle is ever introduced on a cluster.

Apply it to inputs whose per-row work dominates (hash pipelines, codec
renders, tokenizer folds, Python boundaries) — not to plain relational
scans, where an extra exchange of the full rows would cost more than
the scan stage it parallelizes.

Moved here (round 15) from operators/dedup.py so every operator family
shares the one audited implementation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Spread compute-heavy per-row work when the scan produced fewer
    splits than cores (small-file inputs — documents.parquet is ONE row
    group at test SFs, which serialized 30M md5 calls onto one task). At
    real scale the scan already yields >= cores splits and this is a
    no-op, so no extra full-corpus shuffle is introduced.

    Pass a high-cardinality column (the row id) as ``keys`` whenever one
    exists: a keyed hash repartition skips round-robin's mandatory local
    sort of the input (spark.sql.execution.sortBeforeRepartition —
    measured 2x on the spread itself) AND is deterministic under task
    retries by construction, which is the very hazard the sort exists to
    paper over (SPARK-38388, guide §2.5).

    The guard is driver-side scan metadata (inputFiles + local file
    sizes), never df.rdd — an .rdd access forces physical planning and a
    Python<->JVM RDD conversion on every call."""
    if df.isStreaming:
        # micro-batch partitioning is the source's business (and
        # inputFiles() is undefined on a streaming plan)
        return df

    def spread(frame: DataFrame, n: int) -> DataFrame:
        return frame.repartition(n, *keys) if keys else frame.repartition(n)

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files = df.inputFiles()
    if not files:
        # Non-file source (createDataFrame / in-memory view): no scan
        # metadata to reason from, and such inputs are driver-originated
        # and small, so an unconditional spread is cheap and avoids
        # serializing the hash work onto one task.
        return spread(df, target)
    if len(files) >= target:
        return df
    # A big splittable file still fans out to ~ceil(size/128MB) scan
    # tasks, so only repartition when the estimated split count is below
    # cores (ceiling division: a 200MB file is 2 splits, not 1).
    est_splits = 0
    for f in files:
        size = 0
        if f.startswith("file:"):
            try:
                size = os.path.getsize(f[len("file:"):])
            except OSError:
                size = 0
        est_splits += max(1, -(-size // (128 << 20)))
    if est_splits < target:
        return spread(df, target)
    return df
