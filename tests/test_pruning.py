"""Data-skipping evidence: partition pruning on the sink layout and
column pruning through the pandas-UDF boundary (SURVEY.md §4.2 — at
100 TB these two decide whether a query reads terabytes or gigabytes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_on_fact_layout(spark, sf_dir, tmp_path):
    """Write the detections-fact layout (stream_id/date/hour partitions)
    and prove a key-predicate scan prunes to one partition directory."""
    from video_stream_processing_spark.streaming.sinks import write_detections_fact
    from video_stream_processing_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000)
    batch = ev.select(
        (F.col("user_id") % 4).cast("string").alias("stream_id"),
        F.col("ts").alias("detection_time"),
        F.col("value").alias("confidence"),
    )
    out = str(tmp_path / "fact")
    write_detections_fact(out)(batch, 0)

    pruned = spark.read.parquet(out).where(F.col("stream_id") == "1")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    # the scan must not enumerate all 4 stream partitions
    n_all = spark.read.parquet(out).count()
    n_one = pruned.count()
    assert 0 < n_one < n_all


def test_column_pruning_through_pandas_udf(spark, sf_dir):
    """u01's scan must read ONLY (vec_id, embedding) — the UDF boundary
    does not defeat column pruning; `label` never leaves the parquet."""
    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()["u01_stub_inference"](spark, sf_dir)
    plan = _plan(df)
    scan = plan[plan.index("FileScan") :].splitlines()[0] if "FileScan" in plan else plan
    assert "embedding" in scan and "vec_id" in scan
    assert "label" not in scan, scan


def test_binary_column_never_crosses_shuffle(spark):
    """UDF-boundary discipline: the multimodal decode projects the binary
    payload away before anything downstream — the decoded metadata frame
    has no binary column left."""
    from video_stream_processing_spark.operators.multimodal import (
        fake_decode_meta,
        with_binary_payload,
    )

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    out = fake_decode_meta(with_binary_payload(docs).select("doc_id", "payload"))
    assert all(f.dataType.simpleString() != "binary" for f in out.schema.fields)


@pytest.mark.parametrize("qname", ["a01_scan_project_filter", "b37_hash_sample"])
def test_predicate_reaches_parquet_scan(spark, sf_dir, qname):
    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()[qname](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(p.strip() for p in pushed), plan


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a filter on the DIM side of a join must prune the
    partitioned fact's directories at runtime (the 100 TB star-join
    mechanism — the fact scan reads only the partitions the filtered
    dim keys select, without a literal fact predicate)."""
    from video_stream_processing_spark.tables import load_table

    fact_dir = str(tmp_path / "fact")
    e = load_table(spark, sf_dir, "events")
    e.withColumn("bucket", (F.col("user_id") % 10).cast("int")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    # dim filter on a NON-key column Catalyst cannot constant-fold back
    # onto the join key, so only runtime DPP can prune the fact side
    dim = spark.createDataFrame(
        [(b, f"t{b}") for b in range(10)], "bucket int, tag string"
    ).where(F.col("tag") == "t3")
    joined = fact.join(F.broadcast(dim), "bucket").groupBy("bucket").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and it actually executes to only bucket 3's rows
    rows = joined.collect()
    assert [r["bucket"] for r in rows] == [3]


import pytest as _pytest


@_pytest.mark.parametrize(
    "qname",
    [
        "x40_multimodal_real_roundtrip",
        "x43_jpeg_real_roundtrip",
        "x53_mjpeg_frame_split",
        "x54_wav_clip_features",
        "x55_wav_frame_energy",
        "x58_cdc_chunks",
        "x60_audio_resample",
        "x63_png_real_roundtrip",
        "x64_mp4_metadata_probe",
        "x65_webdataset_ingest",
    ],
)
def test_codec_paths_never_shuffle_binary(spark, sf_dir, qname):
    """Every codec/fan-out path is scan -> Arrow UDF chain: SCALE.md's
    'binary never crosses a shuffle' claim, pinned mechanically.

    r15: the claim is pinned as stated — no Exchange in the plan may
    OUTPUT a binary column. A metadata-only spread exchange (the
    scan-parallelism guard redistributing doc ids before the codec
    pass) is allowed: it moves fixed-width ids, never payloads, and is
    a no-op at real scale."""
    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()[qname](spark, sf_dir)

    def binary_exchanges(jnode, acc):
        name = jnode.nodeName()
        if name == "AdaptiveSparkPlan":
            kids = [jnode.inputPlan()]
        else:
            it = jnode.children().iterator()
            kids = []
            while it.hasNext():
                kids.append(it.next())
        if "Exchange" in name:
            out = jnode.output().iterator()
            while out.hasNext():
                attr = out.next()
                if attr.dataType().typeName() == "binary":
                    acc.append((name, attr.name()))
        for k in kids:
            binary_exchanges(k, acc)

    hits: list = []
    binary_exchanges(df._jdf.queryExecution().executedPlan(), hits)
    assert not hits, (qname, hits)


def test_dupgram_filter_is_zero_exchange(spark, sf_dir):
    """x108's scale claim — the whole Gopher dup-gram filter rides the
    document scan as per-row HOFs (no shuffle anywhere in the plan)."""
    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()["x108_dupgram_fraction"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    """x107's scale claim — the benchmark gram set reaches the train
    scan as a BROADCAST hash join (never a corpus-keyed shuffle join of
    train x bench)."""
    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()["x107_ngram_contamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
