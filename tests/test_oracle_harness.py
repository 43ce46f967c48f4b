"""Meta-tests of the differential harness itself: a gate that can never
fail is worthless, so prove compare_frames catches each mismatch class —
wrong values, missing rows, renamed columns, tz-aware leakage — and
accepts genuinely order-shuffled-but-equal results."""

from __future__ import annotations

import pandas as pd

from video_stream_processing_spark.oracle import compare_frames


def _pdf(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_accepts_equal_in_any_row_order():
    a = _pdf([(1, "x"), (2, "y")], ["k", "v"])
    b = _pdf([(2, "y"), (1, "x")], ["k", "v"])
    assert compare_frames("t", a, b).ok


def test_accepts_equal_in_any_column_order():
    a = _pdf([(1, "x")], ["k", "v"])
    b = _pdf([("x", 1)], ["v", "k"])
    assert compare_frames("t", a, b).ok


def test_rejects_wrong_value():
    a = _pdf([(1, "x")], ["k", "v"])
    b = _pdf([(1, "WRONG")], ["k", "v"])
    r = compare_frames("t", a, b)
    assert not r.ok and any("differing cells" in i for i in r.issues)


def test_rejects_row_count_mismatch():
    a = _pdf([(1,), (2,)], ["k"])
    b = _pdf([(1,)], ["k"])
    r = compare_frames("t", a, b)
    assert not r.ok and any("row count" in i for i in r.issues)


def test_rejects_column_rename():
    a = _pdf([(1,)], ["sum_qty"])
    b = _pdf([(1,)], ["sum(l_quantity)"])  # the classic alias bug
    r = compare_frames("t", a, b)
    assert not r.ok and any("column mismatch" in i for i in r.issues)


def test_rejects_tz_aware_timestamps():
    a = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]).tz_localize("UTC")})
    b = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"])})
    r = compare_frames("t", a, b)
    assert not r.ok and any("tz-aware" in i for i in r.issues)


def test_float_tolerance_is_tight():
    a = _pdf([(1.0,)], ["x"])
    ok = _pdf([(1.0 + 1e-12,)], ["x"])
    bad = _pdf([(1.0 + 1e-6,)], ["x"])
    assert compare_frames("t", a, ok).ok
    assert not compare_frames("t", a, bad).ok


def test_nan_equals_nan():
    a = _pdf([(float("nan"),)], ["x"])
    b = _pdf([(float("nan"),)], ["x"])
    assert compare_frames("t", a, b).ok


def test_run_all_flags_a_broken_query(spark, sf_dir):
    """End-to-end: a deliberately wrong oracle must FAIL through run_all
    (guards against the gate going trivially green)."""
    from video_stream_processing_spark.oracle import duckdb_connection, run_query_pair
    from video_stream_processing_spark.plans.registry import QuerySpec
    from video_stream_processing_spark.tables import load_table

    broken = QuerySpec(
        name="broken_on_purpose",
        fn=lambda s, d: load_table(s, d, "region").select("r_regionkey"),
        oracle="SELECT r_regionkey + 1 AS r_regionkey FROM region",  # off by one
    )
    con = duckdb_connection(sf_dir)
    assert not run_query_pair(spark, con, broken, sf_dir).ok
