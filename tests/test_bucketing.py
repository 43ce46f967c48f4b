"""Bucketed co-located join — the shuffle-elimination strategy for
repeated large-fact joins at 100 TB (SURVEY.md §4.2 scale posture;
the storage analog of the reference Doris table's
DISTRIBUTED BY HASH(stream_id) BUCKETS 3, reference README.md:96).

Writes orders/lineitem bucketed by the join key into a temp warehouse
and proves the bucket-aware join plans WITHOUT a shuffle Exchange on
either side, and that its result equals the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # warehouse.dir is a static conf; point just this database at tmp
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{wh}'")
    from video_stream_processing_spark.tables import load_table

    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bktest.orders_b")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bktest.lineitem_b")
    )
    yield "bktest.orders_b", "bktest.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def _join(spark, o_name, l_name):
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    df = _join(spark, o_name, l_name)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucket-aware join consumes the bucketed scans directly: exactly one
    # hash Exchange in the whole plan (the groupBy), not three
    # (groupBy + two join sides)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    from video_stream_processing_spark.tables import load_table

    got = {r["o_orderpriority"]: r["n"] for r in _join(spark, o_name, l_name).collect()}
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
