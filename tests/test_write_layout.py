"""Write-layer layout controls — the output-side half of the 100 TB
story: bounded file sizes (compaction) and range-sorted files whose
min/max footers make point/range scans prune whole files."""

import os

from pyspark.sql import functions as F


def _parquet_files(d):
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def test_max_records_per_file_bounds_file_sizes(spark, sf_dir, tmp_path):
    """maxRecordsPerFile is the compaction knob: no output file may
    exceed the bound, so a skewed upstream partition cannot produce a
    pathological multi-GB file."""
    from video_stream_processing_spark.tables import load_table

    out = str(tmp_path / "bounded")
    e = load_table(spark, sf_dir, "events")
    n = e.count()
    (
        e.coalesce(1)  # worst case: everything lands in one task
        .write.option("maxRecordsPerFile", 1000)
        .mode("overwrite")
        .parquet(out)
    )
    files = _parquet_files(out)
    assert len(files) >= n // 1000  # the single task was split up
    for f in files:
        cnt = spark.read.parquet(f).count()
        assert cnt <= 1000


def test_range_partitioned_write_gives_disjoint_files(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions writes files with
    DISJOINT key ranges — the precondition for parquet min/max footer
    pruning on a sorted key (1-D cousin of the z-order layout, x61)."""
    from video_stream_processing_spark.tables import load_table

    out = str(tmp_path / "ranged")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    (
        e.repartitionByRange(8, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    spans = []
    for f in _parquet_files(out):
        row = spark.read.parquet(f).agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).collect()[0]
        if row["lo"] is not None:
            spans.append((row["lo"], row["hi"]))
    spans.sort()
    assert len(spans) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # strictly disjoint ranges across files

    # and a point predicate on the sorted key reads only matching rows
    target = spans[2][0]
    got = spark.read.parquet(out).where(F.col("event_id") == target).count()
    assert got == 1
