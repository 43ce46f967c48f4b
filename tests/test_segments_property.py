"""Property-based tests for the exact segment recurrence (SURVEY.md §5.2):
the searchsorted skip-scan in operators/segments.py must agree with a
naive row-at-a-time reference model of the reference's buffer
(VideoSegmentBuffer add-then-check, trigger-inclusive) on arbitrary
timestamp sequences — and every frame lands in exactly one segment."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

DUR = 180_000


def naive_segments(ts_sorted: list[int], duration_ms: int = DUR) -> list[tuple[int, int, int]]:
    """Row-at-a-time reference model (mirrors VideoProcessFunction.java:87-100)."""
    out = []
    start = None
    buf = []
    for t in ts_sorted:
        if start is None:
            start, buf = t, [t]
            continue
        buf.append(t)
        if t - start >= duration_ms:
            out.append((min(buf), max(buf), len(buf)))
            start, buf = None, []
    if buf:
        out.append((min(buf), max(buf), len(buf)))
    return out


ts_lists = st.lists(
    st.integers(min_value=0, max_value=2_000_000), min_size=0, max_size=60
).map(sorted)


@settings(max_examples=300, deadline=None)
@given(ts_lists)
def test_skip_scan_matches_naive_model(ts):
    import numpy as np

    # the vectorized kernel, exactly as in segments.segment_windows_exact
    rows = []
    i, n = 0, len(ts)
    a = np.asarray(ts, dtype=np.int64)
    while i < n:
        j = int(np.searchsorted(a, a[i] + DUR, side="left"))
        if j < n:
            rows.append((i, j))
            i = j + 1
        else:
            rows.append((i, n - 1))
            break
    got = [(int(a[s]), int(a[e]), e - s + 1) for s, e in rows]
    assert got == naive_segments(list(ts))


@settings(max_examples=300, deadline=None)
@given(ts_lists)
def test_every_frame_in_exactly_one_segment(ts):
    segs = naive_segments(list(ts))
    assert sum(c for _, _, c in segs) == len(ts)
    # segments are disjoint and ordered
    for (s1, e1, _), (s2, e2, _) in zip(segs, segs[1:]):
        assert e1 <= s2


@pytest.mark.parametrize(
    "ts,expect",
    [
        ([], []),
        ([5], [(5, 5, 1)]),
        ([0, DUR], [(0, DUR, 2)]),  # trigger-inclusive close
        ([0, DUR - 1], [(0, DUR - 1, 2)]),  # tail flush, no trigger
        ([0, DUR, DUR + 1], [(0, DUR, 2), (DUR + 1, DUR + 1, 1)]),
    ],
)
def test_edge_cases(ts, expect):
    assert naive_segments(ts) == expect


def test_spark_operator_agrees_with_model(spark):
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.segments import segment_windows_exact

    ts = [0, 1_000, 179_999, 180_000, 180_001, 500_000, 900_001]
    df = spark.createDataFrame([("s", t) for t in ts], "stream_id string, ts_ms long").select(
        "stream_id", F.timestamp_millis("ts_ms").alias("ts")
    )
    got = sorted(
        (int(r["start_time"].timestamp() * 1000), int(r["end_time"].timestamp() * 1000), r["frame_count"])
        for r in segment_windows_exact(df, duration_ms=DUR).collect()
    )
    assert got == naive_segments(ts)
