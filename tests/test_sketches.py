"""From-scratch sketches (operators/sketches.py) — CMS one-sided bound
and HLL merge semantics on planted corpora."""

from pyspark.sql import functions as F

from video_stream_processing_spark.operators.sketches import (
    cms_heavy_hitter_estimates,
    hll_distinct_by_group,
)


def test_cms_never_undercounts_and_is_exact_for_dominant_keys(spark):
    # 'alpha' appears 200x, others once: alpha's row must be >= 200,
    # and every overcount >= 0 (the CMS bound)
    rows = [(0, "alpha " * 200 + " ".join(f"w{i}" for i in range(300)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["tok"]: r for r in cms_heavy_hitter_estimates(docs, top_k=5).collect()}
    assert out["alpha"]["true_count"] == 200
    assert all(r["overcount"] >= 0 for r in out.values())
    assert out["alpha"]["cms_estimate"] >= 200


def test_hll_merge_equals_direct_global(spark):
    """The 'ALL' row built by register max must equal an HLL computed
    over the whole corpus directly (merge losslessness)."""
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(400)],
        "doc_id long, lang string",
    )
    out = {r["grp"]: r for r in hll_distinct_by_group(docs).collect()}
    direct = {
        r["grp"]: r
        for r in hll_distinct_by_group(
            docs.withColumn("lang", F.lit("ALL"))
        ).collect()
    }
    assert out["ALL"]["hll_estimate"] == direct["ALL"]["hll_estimate"]
    # estimate is in the right ballpark for m=64 (~13% std error)
    assert abs(out["ALL"]["rel_err"]) < 0.5
    assert out["en"]["n_exact"] == 200 and out["fr"]["n_exact"] == 200


def test_histogram_quantiles_within_grid_error(spark):
    """Estimates must land within one grid cell of the exact
    percentile (the sketch's documented bound)."""
    from video_stream_processing_spark.operators.sketches import (
        histogram_quantiles,
    )
    from video_stream_processing_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    est = {r["q"]: r["estimate"] for r in histogram_quantiles(events).collect()}
    exact = events.agg(
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0]["p"]
    cell = 1000.0 / 128
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(est[q] - ex) <= cell, (q, est[q], ex)


def test_cms_merge_equals_direct(spark):
    """Mergeability of the CMS grid: sketches built on two disjoint
    md5-split corpus shards, summed element-wise, must equal the grid
    built on the full corpus — counts are additive, so sharded or
    micro-batched sketching loses nothing."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.sketches import cms_grid
    from video_stream_processing_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    half = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int") % 2
    g1 = cms_grid(docs.where(half == 0))
    g2 = cms_grid(docs.where(half == 1))
    merged = (
        g1.unionAll(g2)
        .groupBy("seed", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_grid(docs)
    m = {(r["seed"], r["b"]): r["cnt"] for r in merged.collect()}
    d = {(r["seed"], r["b"]): r["cnt"] for r in direct.collect()}
    assert m == d and len(d) > 0
