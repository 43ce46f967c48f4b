"""Hybrid RRF fusion semantics (x133's operator core): rank-based
combination, both-legs dominance, absent-leg zero-sentinel."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rrf_both_legs_beat_single_leg_at_equal_rank(spark, tmp_path):
    """A doc ranked r in BOTH legs must out-score a doc ranked r in one
    leg — the defining property of RRF — and absent-leg ranks emit 0,
    never NULL."""
    from video_stream_processing_spark.plans.extensions import (
        _X133_RRF_K as K,
    )

    sleg = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rs int")
    dleg = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rd int")
    fused = sleg.join(dleg, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rs", F.lit(0)).cast("long").alias("sparse_rank"),
        F.coalesce("rd", F.lit(0)).cast("long").alias("dense_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(K) + F.col("rs")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(K) + F.col("rd")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    rows = {r["doc_id"]: r for r in fused.collect()}
    assert rows[1]["rrf"] > rows[2]["rrf"] and rows[1]["rrf"] > rows[3]["rrf"]
    assert rows[2]["dense_rank"] == 0 and rows[3]["sparse_rank"] == 0
    assert abs(rows[1]["rrf"] - round(2 / (K + 1), 6)) < 1e-12


def test_x133_fused_output_consistent_with_legs(spark):
    """End-to-end x133 on the sf0.001 fixture: every emitted doc carries
    at least one live leg rank, rrf equals the recomputed formula, and
    the output is ordered by (rrf DESC, doc_id)."""
    from video_stream_processing_spark.plans.extensions import (
        _X133_RRF_K as K,
        _X133_TOP as TOP,
        x133_hybrid_rrf_search,
    )

    out = x133_hybrid_rrf_search(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(out) <= 15
    keys = [(-r["rrf"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    for r in out:
        assert 0 <= r["sparse_rank"] <= TOP and 0 <= r["dense_rank"] <= TOP
        assert r["sparse_rank"] > 0 or r["dense_rank"] > 0
        want = round(
            (1.0 / (K + r["sparse_rank"]) if r["sparse_rank"] else 0.0)
            + (1.0 / (K + r["dense_rank"]) if r["dense_rank"] else 0.0),
            6,
        )
        assert abs(r["rrf"] - want) < 1e-9, r
