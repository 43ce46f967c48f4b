"""Plan lint over EVERY declared query: no cartesian products or
nested-loop joins may appear outside the explicitly documented all-pairs
exactness baselines. This pins the 100 TB posture (SCALE.md) as a test —
a refactor that silently turns a bucketed join back into a cross join
fails here instead of shipping.
"""

from __future__ import annotations

import pytest

from video_stream_processing_spark.plans.registry import all_queries

# Documented all-pairs exactness baselines (SCALE.md, VERDICT r1): these
# broadcast a bounded query set, never corpus x corpus; their scale
# alternatives are x02/x07/x08/x18. x08 itself carries one broadcast
# nested loop by design: centroid ASSIGNMENT joins the corpus against the
# ~n_centroids broadcast side (argmin over a constant-size list) — linear
# in the corpus with a bounded inner side, the canonical IVF shape. x29
# (SemDeDup) reuses exactly that assignment pass; its near-dup check is a
# cluster equi-join, never corpus x corpus.
NESTED_LOOP_ALLOWED = {
    "x05_embedding_neardup",
    "x06_cosine_topk",
    "x08_ivf_ann_topk",
    "x09_quantized_cosine_topk",
    "x29_semantic_dedup",
    # same bounded query x centroid broadcast cross join as x08 (Q x
    # n_clusters rows, both tiny); the corpus side is a hash join
    "x41_ivf_multiprobe_topk",
    # trained IVF: Lloyd assignment + corpus assignment are corpus x
    # k-broadcast-centroid cross joins (linear, bounded inner side —
    # the canonical k-means/IVF shape); the search is an equi-join
    "x44_ivf_trained_topk",
    # random-projection shortlist: same bounded-query broadcast cross
    # join as x06 — the projection cuts the per-pair and scan cost 4x,
    # not the O(Q*N) pair count (documented in rp_ann_topk; compose
    # with IVF/LSH routing for the full 100 TB path)
    "x50_rp_ann_topk",
    # TPC-H Q22 shape: the positive-balance AVERAGE is a ONE-ROW
    # aggregate broadcast into the filter — a single-row build side is
    # the canonical physical plan for a scalar subquery (constant work
    # per probe row); the existence check is a hash anti join
    "b58_idle_high_balance_customers",
    # BM25: the corpus (avgdl, n_docs) pair is the same ONE-ROW scalar
    # broadcast; every other join is a keyed broadcast/hash join
    "x76_bm25_search",
    # hybrid RRF fusion: inherits x76's one-row (avgdl, n_docs) scalar
    # broadcast on the sparse leg and the dense leg's ONE-ROW query
    # vector broadcast (the x06 shape); the fusion join itself is a
    # 20-row-per-side full outer hash join
    "x133_hybrid_rrf_search",
    # recall report: the scalar n_queries count joins in as the same
    # ONE-ROW broadcast cross (b58/x76 class), plus the inherited
    # query x centroid broadcasts of its x44/x48/x50 legs; the hit
    # join against exact is an explicit broadcast hash join
    "x136_ann_recall_report",
    # planted-corpus recall report: x136's exact shape over the derived
    # corpus — same ONE-ROW scalar broadcast + inherited method-leg
    # broadcasts; the corpus derivation itself is projection + explode,
    # no join
    "x146_ann_recall_planted",
    # fuzzy dictionary match: the edit-distance predicate joins the
    # DISTINCT VOCABULARY against a broadcast ~6-term dictionary —
    # vocab x dict is the linear-with-bounded-inner-side shape (the
    # corpus-token stream itself never enters the nested loop)
    "x83_fuzzy_dict_match",
    # triangle count: the final result glues two ONE-ROW scalar
    # aggregates (edge count x triangle count); all graph joins are
    # keyed hash joins
    "x86_triangle_count",
    # mutual information: the corpus TOTAL is the same ONE-ROW scalar
    # broadcast onto the contingency frame; marginal joins are keyed
    "x94_mutual_information",
    # modularity: glues three ONE-ROW aggregates (edge count, within-
    # community count, sum of squared community degrees); label joins
    # are broadcast hash joins
    "x97_brand_modularity",
    # clustering coefficient: glues the ONE-ROW wedge total and the
    # ONE-ROW triangle count; graph joins are keyed
    "x99_clustering_coefficient",
    # LSH quality report: glues three ONE-ROW counts (exact, candidate,
    # hit); the pair pipelines themselves are keyed joins
    "x103_lsh_quality_report",
    # band sweep: same ONE-ROW-count glue per configuration
    "x104_lsh_band_sweep",
    # session PMI: the session TOTAL is a ONE-ROW scalar broadcast onto
    # the |types|^2-bounded pair frame; marginal joins are keyed
    "x105_session_type_pmi",
    # unigram LM: the corpus-total token count is a ONE-ROW scalar
    # broadcast onto the vocab frame (replaced the former global
    # window); the score join is a keyed broadcast hash join
    "x51_unigram_logprob",
    # ABC analysis: the total-revenue scalar is a ONE-ROW broadcast
    # onto the bucketed prefix-sum frame; the carry join is keyed
    "b71_abc_analysis",
    # bigram LM: the corpus-total token count is the same ONE-ROW
    # scalar broadcast onto the vocab frame as x51; the three count
    # joins back onto the pair stream are keyed broadcast hash joins
    "x110_bigram_lm_logprob",
    # DSIR: the bucket-stat TOTALS pair is the same ONE-ROW scalar
    # broadcast onto the 512-bucket model table as x51's vocab total
    "x116_dsir_weights",
    # composes x110 verbatim, inheriting its documented ONE-ROW
    # corpus-total scalar broadcast
    "x126_ccnet_perplexity_buckets",
}

# Queries whose plans contain a GLOBAL (partition-less) WindowExec — each
# one runs over a frame bounded by a DIMENSION, not by the corpus or fact
# table, so the single partition holds a small constant-ish row count at
# any data scale. Global windows over corpus-growing frames (the old x51
# vocab total, the pre-r6 b71 cumulative share) are banned: use scalar
# agg + broadcast crossJoin, or the x85/b71 range-partitioned prefix-sum
# carry (whose carry window is |buckets|-sized and lands here).
GLOBAL_WINDOW_ALLOWED = {
    "b71_abc_analysis",  # carry over |shuffle-partition| buckets
    "x31_url_domain_stats",  # over |domains|
    "x36_source_mixing",  # over |sources|
    "x52_temperature_mixing",  # over |sources|
    "x68_histogram_quantiles",  # over |bins|
    "x85_session_concurrency",  # carry over |hour buckets|
    "x91_psi_drift",  # over |bins|
    "x111_sequence_packing",  # carry over |shuffle-partition| buckets
    "x124_classifier_auc",  # over |4-dp score grid| (<= 10001 rows)
    # per-leg rank over <= 20 rows POST TakeOrderedAndProject — the
    # distributed top-N runs first, the global window only numbers the
    # bounded survivors
    "x133_hybrid_rrf_search",
}

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _window_arg_groups(argline: str) -> list[str]:
    """Top-level [...] groups of a formatted-plan Arguments line."""
    s = argline[len("Arguments: "):]
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(s[start + 1 : i])
    return out


def _has_global_window(plan: str) -> bool:
    """True if any WindowExec in the formatted plan has an EMPTY
    partition spec. Formatted Window arguments are
    [exprs], [partitionSpec], [orderSpec] with empty specs omitted:
    3 groups = partitioned+ordered; 2 groups is partitioned-unordered
    UNLESS the last group is an order spec (ASC/DESC markers), in
    which case the partition spec was the empty one; 1 group = both
    empty (global)."""
    import re as _re

    for block in plan.split("\n\n"):
        first = block.strip().split("\n")[0].strip()
        if not _re.match(r"\(\d+\) Window$", first):
            continue
        for line in block.split("\n"):
            if not line.startswith("Arguments:"):
                continue
            groups = _window_arg_groups(line)
            if len(groups) >= 3:
                continue
            if len(groups) == 1 or _re.search(r"\b(ASC|DESC) NULLS", groups[-1]):
                return True
    return False


@pytest.mark.slow
def test_no_unplanned_cartesian_or_nested_loop_joins(spark):
    cartesian, nested_loop, global_win, errors = [], [], [], []
    for name, spec in all_queries().items():
        try:
            plan = _formatted_plan(spec.fn(spark, SF_DIR))
        except Exception as e:  # a query failing to plan is its own bug
            errors.append((name, str(e).split("\n")[0][:120]))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_ALLOWED:
            nested_loop.append(name)
        if name not in GLOBAL_WINDOW_ALLOWED and _has_global_window(plan):
            global_win.append(name)
    assert not errors, errors
    assert not cartesian, f"cartesian products crept in: {cartesian}"
    assert not nested_loop, (
        f"nested-loop joins outside the documented baselines: {nested_loop}"
    )
    assert not global_win, (
        "global (partition-less) windows outside the documented "
        f"dimension-bounded set: {global_win}"
    )


# Per-table scan-multiplicity bounds. The round-6 audit found 8 queries
# re-deriving an expensive frame (bucket index, posting table, chunk
# table, cluster assignment, basket base) through multiple plan
# references — Spark reuses no exchange across a self-join's alias
# branches, so each reference re-ran the whole pipeline. Those now
# materialize once; this lint pins that a refactor cannot silently
# regrow the duplicated derivation. Tables scanned >= 3 times in one
# plan must be on this allowlist with a reason.
SCAN_MULTIPLICITY_ALLOWED = {
    # three-branch set algebra over two facts — each branch is a pruned
    # filtered scan (union/intersect/except legs), not a re-derivation
    "b16_set_ops": {"orders": 3, "events": 3},
    # the CDC change feed (update/insert/delete branches) is DERIVED
    # from the base table by construction — four pruned scans model
    # base + three feed branches
    "b48_merge_upsert": {"orders": 4},
    # funnel steps scan the pruned fact once per step (view/click/
    # purchase); step tables are checkpointed so the chain no longer
    # re-derives prior steps (was 6 scans)
    "b55_funnel_steps": {"events": 3},
    # ANN corpus + probe + query sides of one embeddings table — the
    # documented IVF shape (corpus assignment, probe selection, rerank)
    "x08_ivf_ann_topk": {"embeddings": 3},
    "x41_ivf_multiprobe_topk": {"embeddings": 3},
    # incremental refresh reads base bands, shard (checkpointed), the
    # union'd doc bodies for candidate verify, and lengths — each a
    # pruned scan; the minhash pipelines themselves run once per side
    "x106_incremental_lsh_refresh": {"documents": 4},
    # per-shard sketch branches (the mergeability demonstration IS four
    # independent shard scans)
    "x67_hll_distinct_merge": {"documents": 4},
    "x68_histogram_quantiles": {"events": 3},
    # composes the x32 split (2 scans) with the x02 LSH pipeline
    "x79_split_leakage_report": {"documents": 4},
    # part is a dimension table: brand lookup + two endpoint joins
    "x97_brand_modularity": {"part": 3},
    # gopher repetition: token posexplode branch + line-split branch +
    # the per-doc text-length join — three PRUNED projections of one
    # 2-column table, no derivation repeated
    "x122_gopher_repetition": {"documents": 3},
    # unigram tokenize: per-doc base projection + token explode branch
    # + distinct-token branch — three PRUNED (doc_id, text) scans; the
    # expensive Viterbi DP runs exactly once, on the distinct side
    # (r11: checkpointing the tokenized corpus instead would
    # materialize corpus-sized array rows to trade three cheap column
    # scans away — wrong at 100 TB)
    "x129_unigram_tokenize": {"documents": 3},
    # same tokenize machinery under the soft-EM vocab — same three
    # pruned scans, DP once on the distinct-token side
    "x132_unigram_soft_tokenize": {"documents": 3},
    # x129's three pruned scans plus the (doc_id, lang) label join —
    # four pruned projections, no derivation repeated
    "x134_tokenizer_fertility": {"documents": 4},
    # recall report composes THREE certified index pipelines (x44 IVF:
    # corpus+probe sides; x48 IVF-PQ: corpus+probe; x50 RP: corpus+query)
    # plus the scalar query count over one embeddings table; the exact
    # ground-truth side is checkpointed once. Each leg keeps its own
    # certified plan — collapsing them would change what x136 certifies
    "x136_ann_recall_report": {"embeddings": 7},
}


@pytest.mark.slow
def test_no_undeclared_scan_multiplicity(spark):
    """No table may be scanned 3+ times in one executed plan unless the
    allowlist documents why (branch modeling over pruned scans). Catches
    the repeated-derivation regression class fixed in round 6."""
    import re as _re
    from collections import Counter

    offenders, errors = [], []
    for name, spec in all_queries().items():
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            errors.append((name, str(e).split("\n")[0][:120]))
            continue
        counts = Counter(_re.findall(r"(\w+)\.parquet", plan))
        allowed = SCAN_MULTIPLICITY_ALLOWED.get(name, {})
        for table, k in counts.items():
            if k >= 3 and k > allowed.get(table, 2):
                offenders.append((name, table, k))
    assert not errors, errors
    assert not offenders, (
        "tables scanned 3+ times outside the documented branch shapes "
        f"(repeated derivation?): {offenders}"
    )
