"""Layer-B invariants not expressible in the DuckDB differential gate."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def qmap():
    from video_stream_processing_spark.plans.registry import query_map

    return query_map()


def test_approx_count_distinct_error_bound(spark, sf_dir, qmap):
    """b08 is rows-only (HLL sketch internals differ from DuckDB's);
    bound its relative error against the exact distinct counts (rsd=0.02
    => well under 10% at these cardinalities)."""
    approx = {
        r["o_orderpriority"]: r["approx_distinct_customers"]
        for r in qmap["b08_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["distinct_customers"]
        for r in qmap["b07_count_distinct"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) / max(e, 1) < 0.1, (k, approx[k], e)


def test_exact_segments_partition_frames_exactly_once(spark, sf_dir, qmap):
    """a08 (rows-only): every input frame lands in exactly one segment —
    sum(frame_count) == number of events per stream."""
    from video_stream_processing_spark.tables import load_table

    segs = qmap["a08_segment_windows_exact"](spark, sf_dir).collect()
    from collections import defaultdict

    per_stream = defaultdict(int)
    for r in segs:
        per_stream[r["stream_id"]] += r["frame_count"]
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {str(r["user_id"]): r["count"] for r in ev}
    assert per_stream == want


def test_nms_query_is_subset_of_inference(spark, sf_dir, qmap):
    """u02 (rows-only): NMS output must be a subset of u01's detections
    per vec (suppression only removes)."""
    u01 = qmap["u01_stub_inference"](spark, sf_dir)
    u02 = qmap["u02_nms"](spark, sf_dir)
    n_before = u01.count()
    n_after = u02.count()
    assert 0 < n_after <= n_before
    # all (vec_id, class) pairs surviving NMS existed before
    before = {(r["vec_id"], r["object_class"]) for r in u01.collect()}
    after = {(r["vec_id"], r["object_class"]) for r in u02.collect()}
    assert after <= before


def test_approx_percentile_error_bound(spark, sf_dir, qmap):
    """b44 (rows-only): approx medians within a few percent of b27's
    exact interpolated values."""
    approx = {
        r["l_returnflag"]: r["qty_median_approx"]
        for r in qmap["b44_approx_percentile"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["qty_median"]
        for r in qmap["b27_percentiles"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) / max(abs(e), 1e-9) < 0.1, (k, approx[k], e)
