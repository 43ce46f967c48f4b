"""Adversarial bucket-skew hardening for MinHash LSH (VERDICT r3 item 5).

The exact per-bucket self-join is O(B^2) in bucket size B — correct
under the LSH collision model, but an adversarial corpus where a large
fraction of docs lands in ONE band bucket degenerates it. The
``neighbor_window`` mode bounds candidate generation to O(B*W) per
bucket (lead() over the bucket window, no join) while keeping true
near-dup clusters fully connected through consecutive-pair chaining.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_stream_processing_spark.operators.dedup import (
    minhash_lsh_neardups,
)

CLIQUE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill every single afternoon"
)


def _skewed_corpus(spark, n_clique=100, n_filler=400):
    """~20% of docs are byte-identical -> identical signatures -> ONE
    shared bucket in EVERY band (the worst case the LSH model excludes)."""
    rows = [(i, CLIQUE_TEXT) for i in range(n_clique)]
    for i in range(n_filler):
        rows.append(
            (
                n_clique + i,
                f"filler document number {i} carries unique content "
                f"alpha{i} beta{(i * 7) % 997} gamma{(i * 13) % 991} "
                f"delta{(i * 31) % 983} epsilon{(i * 43) % 977}",
            )
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the pair list (driver-side; test corpus only)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_neighbor_window_bounds_skewed_bucket(spark):
    n_clique, window = 100, 4
    docs = _skewed_corpus(spark, n_clique=n_clique)
    pairs = minhash_lsh_neardups(docs, neighbor_window=window).collect()

    # every emitted pair is a true near-dup inside the planted clique
    for r in pairs:
        assert r["doc_a"] < n_clique and r["doc_b"] < n_clique
        assert r["jaccard"] == pytest.approx(1.0)

    # candidate volume is O(B*W), not O(B^2): all 4 bands share one
    # ordering, so the distinct pair set is sum_{d=1..W} (B-d)
    expected = sum(n_clique - d for d in range(1, window + 1))
    assert len(pairs) == expected
    assert expected < (n_clique * (n_clique - 1)) // 2 // 10  # >10x reduction

    # chaining keeps the clique FULLY connected — one component, all docs
    comp = _components([(r["doc_a"], r["doc_b"]) for r in pairs])
    assert len(set(comp.values())) == 1
    assert len(comp) == n_clique


def test_neighbor_window_equals_exact_when_window_covers_bucket(spark):
    """With W >= max bucket size the bounded mode must reproduce the
    exact oracle-checked candidate semantics pair-for-pair."""
    docs = _skewed_corpus(spark, n_clique=12, n_filler=60)
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_neardups(docs).collect()
    }
    windowed = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_neardups(docs, neighbor_window=16).collect()
    }
    assert exact == windowed
    assert len(exact) == (12 * 11) // 2  # the full clique, nothing else


def test_filler_docs_produce_no_cross_pairs(spark):
    """Distinct-content docs must not collide: the skew cap shouldn't be
    masking a broken band construction."""
    docs = _skewed_corpus(spark, n_clique=0, n_filler=200)
    assert minhash_lsh_neardups(docs, neighbor_window=4).count() == 0
    assert minhash_lsh_neardups(docs).count() == 0


def test_incremental_lsh_equals_full_recompute_restriction(spark):
    """incremental_lsh_neardups(base, shard) must equal the full-corpus
    near-dup pair set RESTRICTED to pairs touching the shard, with
    vs_existing flagging the cross-membership pairs — the property that
    makes the stored-band-index ingest path safe to trust (a base-only
    dup pair must never appear; no shard-touching pair may be lost)."""
    from video_stream_processing_spark.operators.dedup import (
        incremental_lsh_neardups,
    )

    # Planted structure: dup cluster A spans base+shard, cluster B is
    # shard-only, cluster C is base-only (must NOT appear), plus filler.
    text_a = CLIQUE_TEXT
    text_b = (
        "pack my box with five dozen liquor jugs while the quick onyx "
        "goblin jumps over the lazy dwarf at midnight every day"
    )
    text_c = (
        "sphinx of black quartz judge my vow as the five boxing wizards "
        "jump quickly over the frozen river each winter morning"
    )
    rows = []
    rows += [(i, text_a) for i in (1, 2, 17)]        # A: base 1,2 / shard 17
    rows += [(i, text_b) for i in (27, 37)]          # B: shard-only
    rows += [(i, text_c) for i in (3, 4)]            # C: base-only
    for i in range(50):
        d = 100 + i * 10 + (i % 3)  # mix of shard (…7) and base ids
        rows.append(
            (
                d,
                f"filler document number {i} carries unique content "
                f"alpha{i} beta{(i * 7) % 997} gamma{(i * 13) % 991}",
            )
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shard = docs.where(F.col("doc_id") % 10 == 7)
    base = docs.where(F.col("doc_id") % 10 != 7)

    inc = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["vs_existing"])
        for r in incremental_lsh_neardups(base, shard).collect()
    }
    shard_ids = {r["doc_id"] for r in shard.select("doc_id").collect()}
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_neardups(docs).collect()
        if r["doc_a"] in shard_ids or r["doc_b"] in shard_ids
    }
    assert {k: v[0] for k, v in inc.items()} == full
    assert full  # the planted clusters actually produced shard pairs
    for (a, b), (_, vs_existing) in inc.items():
        assert vs_existing == ((a in shard_ids) != (b in shard_ids))
    # base-only cluster C never surfaces
    assert (3, 4) not in inc
    # r8 one-pass form (corpus= + shard_pred=, the x106 shape: one scan
    # builds one materialized band index) must be row-identical to the
    # generic two-input form
    one_pass = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["vs_existing"])
        for r in incremental_lsh_neardups(
            base, shard, corpus=docs, shard_pred=F.col("doc_id") % 10 == 7
        ).collect()
    }
    assert one_pass == inc
