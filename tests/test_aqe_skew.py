"""AQE skew-join evidence: SCALE.md claims runtime skew splitting backs
the documented skew posture — this pins it. A planted hot key makes one
sort-merge partition dominate; with test-scaled thresholds AQE must mark
the join skew=true and split the straggler, with results identical to
the unsplit join."""

import pytest
from pyspark.sql import functions as F

_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_skew_join(spark, skew_conf):
    hot = spark.range(120_000).select(
        F.lit(0).alias("k"), F.col("id").alias("a"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    cold = spark.range(2_000).select(
        (F.col("id") % 64 + 1).alias("k"), F.col("id").alias("a"), F.lit("y").alias("pad")
    )
    left = hot.unionByName(cold)
    right = spark.range(256).select(
        (F.col("id") % 65).alias("k"), F.col("id").alias("b")
    )
    # global aggregate downstream: a groupBy on the join key would
    # REQUIRE the unsplit hash distribution and AQE would (correctly)
    # refuse to split the skewed partition to avoid an extra shuffle
    # the aggregate must CONSUME pad: otherwise column pruning drops it
    # before the exchange and the hot partition shrinks below threshold
    joined = left.join(right, "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("b").alias("sb"),
        F.sum(F.length("pad")).alias("pl"),
    )
    row = joined.collect()[0]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    # correctness under the split: recompute the join size directly
    from collections import Counter

    left_keys = Counter({0: 120_000})
    left_keys.update((i % 64) + 1 for i in range(2_000))
    right_keys = Counter(i % 65 for i in range(256))
    expect = sum(left_keys[k] * right_keys.get(k, 0) for k in left_keys)
    assert row["n"] == expect
