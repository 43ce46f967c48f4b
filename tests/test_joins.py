"""As-of and range join operator semantics on constructed frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_picks_latest_at_or_before(spark):
    from video_stream_processing_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "e1"),  # after both orders -> o2
            (1, "2024-01-01 08:30:00", "e2"),  # between -> o1
            (1, "2024-01-01 07:00:00", "e3"),  # before all -> dropped (inner)
            (2, "2024-01-01 10:00:00", "e4"),  # no orders for key 2 -> dropped
            (1, "2024-01-01 09:00:00", "e5"),  # exactly at o2 -> o2 (<=)
        ],
        "k long, ts string, event string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "event")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", 101),
            (1, "2024-01-01 09:00:00", 102),
        ],
        "k long, t string, order_id long",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "order_id")

    out = {
        r["event"]: r["order_id"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="t", value_cols=("order_id",)
        ).collect()
    }
    assert out == {"e1": 102, "e2": 101, "e5": 102}


def test_asof_join_null_value_columns_keep_match(spark):
    """ADVICE r1: a matched right row whose FIRST value column is NULL
    must not drop the left row (match marker is the right ts, not a
    value column); the NULL value itself is skipped over by the
    ignoreNulls carry (documented)."""
    from video_stream_processing_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1")], "k long, ts string, event string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "event")
    right = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", None, 7.0), (1, "2024-01-01 09:00:00", None, 9.0)],
        "k long, t string, order_id long, amount double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "order_id", "amount")

    rows = asof_join(
        left, right, key="k", left_ts="ts", right_ts="t",
        value_cols=("order_id", "amount"),
    ).collect()
    assert len(rows) == 1  # matched despite order_id being NULL everywhere
    assert rows[0]["order_id"] is None
    assert rows[0]["amount"] == 9.0  # latest at-or-before


def test_range_join_output_has_no_duplicate_columns(spark):
    """ADVICE r1: output previously carried both sides' key (and ts when
    names collide) — selecting them by name raised ambiguity errors."""
    from video_stream_processing_spark.operators.joins import range_join_bucketed

    left = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", 1)], "k long, ts string, lid long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 05:30:00", 10)], "k long, ts string, rid long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "rid")

    out = range_join_bucketed(
        left, right, key="k", left_ts="ts", right_ts="ts", tolerance_ms=3_600_000
    )
    assert sorted(out.columns) == ["k", "lid", "rid", "right_ts", "ts"]
    # selecting every column by name must not be ambiguous
    got = out.select("k", "ts", "right_ts", "lid", "rid").collect()
    assert len(got) == 1 and got[0]["lid"] == 1 and got[0]["rid"] == 10


def test_range_join_bucketed_matches_naive(spark):
    from video_stream_processing_spark.operators.joins import range_join_bucketed

    # irregular points, including cross-bucket neighbours and exact-edge
    left = spark.createDataFrame(
        [(1, "2024-01-01 05:00:00", 1), (1, "2024-01-01 12:59:59", 2), (2, "2024-01-01 05:30:00", 3)],
        "k long, ts string, lid long",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "lid")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 04:10:00", 10),  # 50 min before l1 -> match
            (1, "2024-01-01 06:00:00", 11),  # exactly 1h after l1 -> match (<=)
            (1, "2024-01-01 11:59:58", 12),  # 1h 1s before l2 -> no
            (1, "2024-01-01 13:30:00", 13),  # 30 min after l2 -> match
            (2, "2024-01-01 05:30:00", 14),  # same instant, other key -> match k2
            (3, "2024-01-01 05:30:00", 15),  # different key -> never
        ],
        "k long, rts string, rid long",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "rid")

    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(
            left, right, key="k", left_ts="ts", right_ts="rts", tolerance_ms=3_600_000
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (
                F.abs(F.unix_millis(F.col("l.ts")) - F.unix_millis(F.col("r.rts")))
                <= 3_600_000
            ),
        )
        .collect()
    }
    assert got == naive
    assert got == {(1, 10), (1, 11), (2, 13), (3, 14)}
