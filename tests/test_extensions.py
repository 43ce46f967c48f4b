"""Unit tests for the M4 extension operators with PLANTED cases — the
synthetic corpus has no exact duplicates, so dedup recall is proven on
constructed frames here (the declared queries prove engine-vs-oracle
parity; these prove the semantics we claim).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup (7/9)
        (4, "totally different words nothing shared here at all"),
        (5, "one two three"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(planted_docs):
    from video_stream_processing_spark.operators.dedup import exact_dedup_groups

    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(planted_docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, keeper is min id
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_lsh_finds_planted_pairs(planted_docs):
    from video_stream_processing_spark.operators.dedup import minhash_lsh_neardups

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_neardups(planted_docs, threshold=0.7).collect()
    }
    # identical shingle sets ALWAYS collide in every band -> guaranteed hit
    assert pairs[(1, 2)] == 1.0
    # near-dup differing in the last token: 5 of 7 3-shingles shared
    # (shingle jaccard 0.7143) must survive the 0.7 gate, via both copies
    assert abs(pairs[(1, 3)] - 0.7143) < 1e-6
    assert abs(pairs[(2, 3)] - 0.7143) < 1e-6
    # disjoint docs never pair
    assert not any(4 in p or 5 in p for p in pairs)


def test_ngram_jaccard_exact(planted_docs):
    from video_stream_processing_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # docs 1/3 differ in the final token: 5 of the 6 3-gram shingles
    # shared, union 7 -> 5/7
    assert abs(pairs[(1, 3)] - round(5 / 7, 4)) < 1e-6
    assert (1, 4) not in pairs


def test_simhash_properties(spark):
    from video_stream_processing_spark.operators.text import simhash_udf

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # identical -> identical simhash
        (3, "delta gamma beta alpha"),  # order-insensitive (set semantics)
        (4, "completely different tokens entirely"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash_udf(F.col("text")).alias("sh")).collect()}
    assert len(out[1]) == 64 and set(out[1]) <= {"0", "1"}
    assert out[1] == out[2] == out[3]
    assert out[1] != out[4]
    assert out[5] == "0" * 64


def test_embedding_neardup_and_topk(spark):
    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        neardup_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0, 0.0], 0),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal
        (50, [1.0, 0.1, 0.0, 0.0], 0),  # query (50 % 50 == 0)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    nd = {(r["vec_a"], r["vec_b"]) for r in neardup_pairs(emb, threshold=0.95).collect()}
    assert (0, 1) in nd and (0, 2) not in nd

    topk = brute_force_topk(emb, k=2, query_modulus=50).collect()
    by_rank = {r["rank"]: r["vec_id"] for r in topk if r["query_id"] == 50}
    assert by_rank[1] in (0, 1) and by_rank[2] in (0, 1)  # both near vectors beat orthogonal


def test_semantic_dedup_nontransitive_chain(spark):
    """Pin the single-pass greedy semantics on a non-transitive chain:
    a~b and b~c but a!~c (2-D unit vectors at 0/60/120 degrees, cos 0.5
    within the pair, -0.5 across). c is dropped with dup_of=b even though
    b itself was dropped toward a — dup_of is an attribution hint, not a
    guaranteed keeper (see semantic_dedup docstring)."""
    import math

    from video_stream_processing_spark.operators.similarity import semantic_dedup

    def unit(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(0, unit(0), 0), (1, unit(60), 0), (2, unit(120), 0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.4).collect()}
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    # the chain case: dropped, attributed to 1 (itself dropped), not to 0
    assert not out[2]["keep"] and out[2]["dup_of"] == 1


def test_lsh_bucket_recall_identical_vectors(spark):
    from video_stream_processing_spark.operators.similarity import lsh_topk

    # identical vectors share every hyperplane sign -> same bucket -> found
    rows = [(0, [0.5] * 8, 0), (1, [0.5] * 8, 0), (2, [-0.5] * 8, 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = [r for r in lsh_topk(emb, k=3, query_modulus=50).collect() if r["query_id"] == 0]
    found = {r["vec_id"] for r in out}
    assert 1 in found


def test_multimodal_decode_schema_and_values(spark):
    from video_stream_processing_spark.operators.multimodal import (
        fake_decode_meta,
        with_binary_payload,
    )

    df = spark.createDataFrame([(1, "Hello"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in fake_decode_meta(
        with_binary_payload(df).select("doc_id", "payload")
    ).collect()}
    assert out[1]["n_bytes"] == 5
    assert out[1]["width"] == 5 % 640 + 16
    assert out[1]["height"] == ord("H") + 16
    assert out[1]["channels"] == 3 and out[1]["format"] == "fake-jpeg"
    assert out[2]["n_bytes"] == 0 and out[2]["height"] == 16


def test_frame_sample(spark):
    from video_stream_processing_spark.operators.multimodal import frame_sample

    rows = [(1, f"2024-01-01 00:{m:02d}:00") for m in range(25)]
    df = spark.createDataFrame(rows, "stream_id long, ts string").select(
        "stream_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = frame_sample(df, every_n=10).collect()
    assert len(out) == 3  # rows 1, 11, 21
    # every_n=1 must degrade to the identity (ADVICE r1: rn % 1 == 1 was
    # never true and returned an empty frame)
    assert len(frame_sample(df, every_n=1).collect()) == 25


def test_pii_scrub_removes_every_planted_marker(spark, sf_dir):
    from video_stream_processing_spark.plans.registry import query_map

    rows = query_map()["x24_pii_scrub"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        s = r["scrubbed"]
        assert "<EMAIL>" in s and "<URL>" in s and "<PHONE>" in s
        assert "@example.com" not in s and "https://" not in s
        assert r["bytes_removed"] > 0


def test_repetition_ratio_bounds_and_planted_loop(spark, sf_dir):
    from video_stream_processing_spark.plans.registry import query_map

    rows = query_map()["x25_repetition_ratio"](spark, sf_dir).collect()
    assert rows
    assert all(0 < r["rep_ratio"] <= 1.0 for r in rows)
    assert all(r["top_count"] <= r["n_bigrams"] for r in rows)

    # planted: a degenerate loop doc scores ~1, diverse text scores low
    from video_stream_processing_spark.operators.text import shingles

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    grams = docs.select("doc_id", F.explode(shingles("text", 2)).alias("g"))
    freq = grams.groupBy("doc_id", "g").count()
    agg = {
        r["doc_id"]: (r["mx"], r["n"])
        for r in freq.groupBy("doc_id")
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
        .collect()
    }
    assert agg[1] == (5, 5)  # "spam spam" x5 -> ratio 1.0
    assert agg[2] == (1, 5)  # all distinct -> ratio 0.2


def test_dedup_clusters_planted_chain(spark):
    from video_stream_processing_spark.operators.dedup import dedup_clusters

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # chain 1-2-3, pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_long_chain_converges(spark):
    from video_stream_processing_spark.operators.dedup import dedup_clusters

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(nodes, pairs).collect()}
    assert all(c == 0 for c in got.values())


def test_multitable_lsh_recall_dominates_single(spark, sf_dir):
    """OR-amplification: 4-table LSH candidates are a superset of any
    single table's bucket, so measured recall vs brute-force ground
    truth must be >= the single-table query's recall."""
    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        lsh_multitable_topk,
        lsh_topk,
    )
    from video_stream_processing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    truth = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, k=3).collect()
    }
    single = {
        (r["query_id"], r["vec_id"]) for r in lsh_topk(emb, k=3).collect()
    }
    multi = {
        (r["query_id"], r["vec_id"])
        for r in lsh_multitable_topk(emb, k=3).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_single
    assert recall_multi > 0


def test_ann_recall_floor(spark):
    """Recall GATE, not report (VERDICT r1 item 6): the corpus and the
    md5-salted hyperplanes/centroids are deterministic, so recall@3 at
    sf0.01 is an exact constant — measured 0.0667 (single-table LSH),
    0.30 (4-table OR), 0.30 (IVF probe-1) on sf0.01's near-isotropic
    random vectors (low by construction of the data; ANN_RECALL.md).
    Floors sit just below so any hashing/bucketing regression fails
    instead of silently shipping."""
    sf_dir = "/root/testdata/sf0.01"
    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_multitable_topk,
        lsh_topk,
    )
    from video_stream_processing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = 3

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=k))
    assert truth, "ground truth must be non-empty"
    recall = {
        "lsh_single": len(pairs(lsh_topk(emb, k=k)) & truth) / len(truth),
        "lsh_multi": len(pairs(lsh_multitable_topk(emb, k=k)) & truth) / len(truth),
        "ivf_probe1": len(
            pairs(ivf_topk(emb, k=k).select("query_id", "vec_id")) & truth
        )
        / len(truth),
    }
    assert recall["lsh_single"] >= 0.05, recall
    assert recall["lsh_multi"] >= 0.25, recall
    assert recall["ivf_probe1"] >= 0.25, recall


def test_ann_recall_on_planted_neighbor_clusters(spark):
    """Recall on a corpus where recall is MEANINGFUL (VERDICT r3 item 6):
    the sf* embeddings are near-isotropic random vectors, so their
    absolute recall numbers say nothing. Here 10 well-separated clusters
    each plant 5 true neighbors at cosine >= 0.9 around a query vector
    (cross-cluster cosine ~0.25, background uniform noise), so top-3
    ground truth IS the planted structure. The 4-table OR-amplified
    index must recover >= 0.9 of it and dominate the single-table query,
    which measurably misses (sign flips near bucket boundaries)."""
    import numpy as np

    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        lsh_multitable_topk,
        lsh_topk,
    )

    rng = np.random.RandomState(7)  # deterministic corpus -> exact assertion
    dim, n_clusters, n_neighbors, n_background, eps = 16, 10, 5, 200, 0.1
    rows = []
    for c in range(n_clusters):
        center = rng.uniform(-1, 1, dim)
        center /= np.linalg.norm(center)
        rows.append((c * 1000, [float(x) for x in center]))  # query: id % 1000 == 0
        for m in range(1, n_neighbors + 1):
            v = center + rng.uniform(-1, 1, dim) * eps
            assert float(v @ center / np.linalg.norm(v)) >= 0.9  # planted contract
            rows.append((c * 1000 + m, [float(x) for x in v]))
    for i in range(n_background):
        rows.append((10_000 + i * 7 + 1, [float(x) for x in rng.uniform(-1, 1, dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=3, query_modulus=1000))
    assert len(truth) == n_clusters * 3
    recall_single = len(pairs(lsh_topk(emb, k=3, query_modulus=1000)) & truth) / len(truth)
    recall_multi = (
        len(pairs(lsh_multitable_topk(emb, k=3, query_modulus=1000)) & truth) / len(truth)
    )
    assert recall_multi >= 0.9, (recall_multi, recall_single)
    assert recall_multi >= recall_single
    # the single-table index must measurably miss here, or the corpus is
    # too easy to distinguish OR-amplification from plain bucketing
    assert recall_single <= 0.8, recall_single


def test_ivf_multiprobe_recall_dominates_probe1(spark, sf_dir):
    """Probe-2 scans a superset of probe-1's inverted lists, so its
    recall vs brute-force truth must dominate (the recall/cost knob
    working as designed)."""
    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_topk_multiprobe,
    )
    from video_stream_processing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=3))
    r1 = len(pairs(ivf_topk(emb, k=3).select("query_id", "vec_id")) & truth) / len(truth)
    r2 = len(pairs(ivf_topk_multiprobe(emb, k=3, n_probes=2)) & truth) / len(truth)
    assert r2 >= r1
    assert r2 > 0


def test_capped_multitable_bounds_hot_bucket(spark):
    """Adversarial-skew cap for the ANN bucket join (VERDICT r4 item 4,
    the x39 argument applied to x18): plant a hot bucket — many
    near-identical vectors hash to the SAME bucket in every table — and
    check (a) the capped candidate volume per query is bounded by
    n_tables * bucket_cap instead of the hot-bucket size, and (b) on a
    benign corpus where no bucket exceeds the cap, the capped query is
    pair-for-pair identical to the exact x18 semantics."""
    import numpy as np

    from video_stream_processing_spark.operators.similarity import (
        lsh_multitable_topk,
        lsh_multitable_topk_capped,
    )

    rng = np.random.RandomState(11)
    dim, n_hot, n_filler, cap = 16, 200, 100, 8
    base = rng.uniform(-1, 1, dim)
    rows = []
    for i in range(n_hot):  # tiny jitter: same sign pattern -> same buckets
        v = base + rng.uniform(-1, 1, dim) * 1e-4
        rows.append((i, [float(x) for x in v]))
    for i in range(n_filler):
        rows.append((n_hot + i, [float(x) for x in rng.uniform(-1, 1, dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # query 0 sits inside the hot bucket (vec_id 0 % 200 == 0)
    capped = lsh_multitable_topk_capped(
        emb, k=250, query_modulus=200, bucket_cap=cap
    ).collect()
    exact = lsh_multitable_topk(emb, k=250, query_modulus=200).collect()
    n_capped = sum(1 for r in capped if r["query_id"] == 0)
    n_exact = sum(1 for r in exact if r["query_id"] == 0)
    # exact: the whole hot clique competes; capped: <= 4 tables * cap
    assert n_exact >= n_hot - 1
    assert 0 < n_capped <= 4 * cap
    # the survivors are still the true near-neighbors (same clique)
    assert all(r["vec_id"] < n_hot for r in capped if r["query_id"] == 0)

    # benign corpus: no bucket over the cap -> capped == exact
    benign = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, dim)]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    res_exact = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in lsh_multitable_topk(benign, k=3, query_modulus=40).collect()
    }
    res_capped = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in lsh_multitable_topk_capped(
            benign, k=3, query_modulus=40, bucket_cap=120
        ).collect()
    }
    assert res_exact == res_capped


def test_trained_ivf_recall_on_planted_clusters(spark):
    """Trained (k-means) IVF must recover the planted neighbor structure
    at least as well as the label-derived index (VERDICT r4 item 3's
    acceptance bar). Same 10-cluster corpus as the multitable-LSH gate,
    plus labels: planted rows carry their true cluster, background noise
    carries arbitrary labels (i % 10) — exactly the label pollution a
    real corpus would show, which the label-derived centroids inherit
    and the trained ones do not. Measured: trained recall@3 = 1.000 vs
    label-derived probe-2 = 0.800 (deterministic corpus, exact)."""
    import numpy as np

    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_multiprobe,
        ivf_topk_trained,
    )

    rng = np.random.RandomState(7)
    dim, n_clusters, n_neighbors, n_background, eps = 16, 10, 5, 200, 0.1
    rows = []
    for c in range(n_clusters):
        center = rng.uniform(-1, 1, dim)
        center /= np.linalg.norm(center)
        rows.append((c * 1000, c, [float(x) for x in center]))
        for m in range(1, n_neighbors + 1):
            v = center + rng.uniform(-1, 1, dim) * eps
            rows.append((c * 1000 + m, c, [float(x) for x in v]))
    for i in range(n_background):
        rows.append((10_000 + i * 7 + 1, i % 10, [float(x) for x in rng.uniform(-1, 1, dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=3, query_modulus=1000))
    assert len(truth) == n_clusters * 3
    r_label = (
        len(pairs(ivf_topk_multiprobe(emb, k=3, n_probes=2, query_modulus=1000)) & truth)
        / len(truth)
    )
    r_trained = (
        len(
            pairs(
                ivf_topk_trained(
                    emb, k=3, n_probes=2, n_clusters=10, n_iters=2, query_modulus=1000
                )
            )
            & truth
        )
        / len(truth)
    )
    assert r_trained >= 0.9, (r_trained, r_label)
    assert r_trained >= r_label, (r_trained, r_label)


def test_decontaminate_planted_overlap(spark):
    from video_stream_processing_spark.operators.dedup import decontaminate_pairs

    # bench doc 100 shares a 6-token run (4 distinct 3-gram shingles)
    # with train doc 1; train doc 2 shares nothing.
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta unrelated tail words")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta epsilon zeta suffix"),
            (2, "totally different content nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    rows = decontaminate_pairs(train, bench, min_shared=4).collect()
    assert [(r["doc_id"], r["bench_id"], r["shared"]) for r in rows] == [(1, 100, 4)]
    r = rows[0]
    # train doc 1 has 7 distinct shingles -> ratio 4/7
    assert r["overlap_ratio"] == round(4 / 7, 4)
    # below threshold -> no rows
    assert decontaminate_pairs(train, bench, min_shared=5).count() == 0


def test_doc_chunking_covers_and_overlaps(spark, sf_dir):
    from video_stream_processing_spark.plans.registry import query_map

    out = query_map()["x27_doc_chunking"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        # contiguous chunk ids from 0
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        # every chunk <= 40 tokens; all but the last exactly 40
        assert all(c["n_tokens"] <= 40 for c in chunks)
        assert all(c["n_tokens"] == 40 for c in chunks[:-1])
        # stride-30 overlap: chunk i starts where token i*30 starts
        n_total = 30 * (len(chunks) - 1) + chunks[-1]["n_tokens"]
        assert n_total >= len(chunks)  # sanity: total grows with chunks


def test_batch_packing_budget_invariant(spark, sf_dir):
    from video_stream_processing_spark.plans.registry import query_map

    rows = query_map()["x28_batch_packing"](spark, sf_dir).collect()
    assert len(rows) > 0
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["bucket"], r["shard"], r["batch_id"]), []).append(r)
    for (_, _, batch_id), docs in groups.items():
        total = sum(r["tokens"] for r in docs)
        # a batch only exceeds the budget by (at most) its final doc:
        # floor(cum_before / budget) admits a doc while cum_before < budget
        assert total - max(r["tokens"] for r in docs) < 2048
        assert batch_id >= 0


def _planted_cluster_corpus(spark, with_labels=False):
    """The deterministic 10-cluster planted-neighbor corpus shared by the
    ANN recall gates (see test_ann_recall_on_planted_neighbor_clusters)."""
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
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), n_clusters


def test_lit_double_array_bit_exact(spark):
    """_lit_double_array (ONE parsed SQL literal, round-6 speedup for
    k-means/PQ training) must reproduce the exact bits of the unrolled
    F.array(F.lit(...)) form for adversarial doubles — shortest-repr
    round-trip through Spark's parser is lossless."""
    import math
    import struct

    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.similarity import _lit_double_array

    vals = [
        0.1,
        -0.30000000000000004,
        1e-300,
        -1e300,
        5e-324,  # smallest subnormal
        1.7976931348623157e308,  # largest finite
        0.0,
        -0.0,
        math.pi,
        2 / 3,
    ]
    df = spark.range(1)
    got = df.select(_lit_double_array(vals).alias("x")).first()["x"]
    ref = df.select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("x")
    ).first()["x"]
    bits = lambda xs: [struct.pack("<d", v) for v in xs]
    assert bits(got) == bits(vals) == bits(ref)
    assert df.select(_lit_double_array([]).alias("x")).first()["x"] == []


def test_sql_builders_match_column_twins(spark):
    """The generated-SQL expression builders (round-6 speedup: one
    F.expr parse instead of per-node py4j construction) must be exact
    semantic twins of the Column helpers they textually mirror — same
    fold order, same casts, same NULL behavior — on adversarial doubles
    and a zero vector (try_divide -> NULL path)."""
    import struct

    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.similarity import (
        _sql_arr,
        _sql_cosine,
        _sql_dot,
        _sql_l2norm,
        _sql_l2sq,
        _sql_sub,
        cosine,
        dot,
        l2_norm,
    )

    vecs = [
        ([0.1, -0.30000000000000004, 1e-150, 2 / 3], [1e150, -0.1, 0.7, 5e-324]),
        ([0.0, 0.0, 0.0, 0.0], [1.0, 2.0, 3.0, 4.0]),  # zero-norm -> NULL cosine
        ([-1.5, 2.25, -3.125, 4.0625], [0.25, -0.5, 0.75, -1.0]),
    ]
    df = spark.createDataFrame([(list(a),) for a, _ in vecs], "a array<double>")
    for i, (a, b) in enumerate(vecs):
        lit_b = F.expr(_sql_arr(b))
        got = (
            df.select(
                F.expr(_sql_dot("a", _sql_arr(b))).alias("d"),
                F.expr(_sql_l2norm("a")).alias("n"),
                F.expr(_sql_cosine("a", _sql_arr(b))).alias("c"),
                F.expr(_sql_l2sq(_sql_sub("a", 0, 2), b[:2])).alias("q"),
            )
            .collect()[i]
        )
        ref = (
            df.select(
                dot(F.col("a"), lit_b).alias("d"),
                l2_norm(F.col("a")).alias("n"),
                cosine(F.col("a"), lit_b).alias("c"),
                F.aggregate(
                    F.zip_with(
                        F.slice("a", 1, 2),
                        F.expr(_sql_arr(b[:2])),
                        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("q"),
            )
            .collect()[i]
        )
        pack = lambda v: None if v is None else struct.pack("<d", v)
        for f in ("d", "n", "c", "q"):
            assert pack(got[f]) == pack(ref[f]), (i, f, got[f], ref[f])


def test_pq_codebooks_shape_and_determinism(spark):
    """PQ training returns M codebooks of K sub_dim-vectors and is
    bit-deterministic across invocations (required for the oracle
    replay)."""
    from video_stream_processing_spark.operators.similarity import pq_codebooks

    emb, _ = _planted_cluster_corpus(spark)
    books1 = pq_codebooks(emb, m_sub=4, k_codes=8, n_iters=1)
    books2 = pq_codebooks(emb, m_sub=4, k_codes=8, n_iters=1)
    assert len(books1) == 4
    assert all(len(b) == 8 for b in books1)
    assert all(len(c) == 4 for b in books1 for c in b)  # dim 16 / M 4
    assert books1 == books2


def test_ivfpq_recall_on_planted_clusters(spark):
    """IVF-PQ must recover the planted top-3 structure through BOTH
    approximations (coarse routing AND the 4-subspace ADC shortlist):
    the exact rerank can only return what the PQ shortlist admits, so
    high recall here certifies the quantizer preserves neighborhood
    order on a corpus where that order is meaningful. Measured: 1.000
    on the deterministic planted corpus (exact assertion gated >= 0.9,
    same bar as the multitable-LSH and trained-IVF gates)."""
    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    emb, n_clusters = _planted_cluster_corpus(spark)

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=3, query_modulus=1000))
    assert len(truth) == n_clusters * 3
    got = pairs(
        ivfpq_topk(
            emb,
            k=3,
            n_probes=2,
            n_clusters=10,
            n_iters=2,
            m_sub=4,
            k_codes=8,
            pq_iters=1,
            rerank=20,
            query_modulus=1000,
        )
    )
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_bloom_decontaminate_matches_exact_and_prunes(spark, sf_dir):
    """The Bloom prefilter must be SOUND (bit-identical result to the
    broadcast-exact operator — no true match can be pruned, because a
    real match hits every hash position by construction) and must
    actually PRUNE (some corpus shingles fail the bitset gate, or the
    prefilter is dead weight). Plan shape: the exact join is sort-merge
    (the large-bench regime), gated by broadcast left-semi joins."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.dedup import (
        decontaminate_pairs,
        decontaminate_pairs_bloom,
    )
    from video_stream_processing_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 10 == 3)
    train = docs.where(F.col("doc_id") % 10 != 3)

    exact = decontaminate_pairs(train, bench, min_shared=4)
    bloom = decontaminate_pairs_bloom(train, bench, min_shared=4)
    key = lambda r: (r["doc_id"], r["bench_id"], r["shared"], r["overlap_ratio"])
    assert sorted(map(key, bloom.collect())) == sorted(map(key, exact.collect()))

    plan = bloom._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan  # the exact join shuffles both sides
    assert plan.count("LeftSemi") >= 2  # both bitset gates present

    # a tiny-bitset variant must prune: with n_bits=8 nearly everything
    # collides, so compare survivor counts at the real width instead —
    # count corpus shingles entering the exact join with and without the gate
    from video_stream_processing_spark.operators.text import shingles

    t_sh = train.select(
        F.explode(F.array_distinct(shingles("text", 3))).alias("s")
    ).select(F.md5("s").alias("w"))
    n_all = t_sh.count()
    b_bits = (
        bench.select(F.explode(F.array_distinct(shingles("text", 3))).alias("s"))
        .select(F.pmod(F.xxhash64(F.md5("s"), F.lit(0)), F.lit(1 << 17)).alias("p"))
        .distinct()
    )
    survivors = t_sh.join(
        F.broadcast(b_bits),
        F.pmod(F.xxhash64(F.col("w"), F.lit(0)), F.lit(1 << 17)) == b_bits.p,
        "left_semi",
    ).count()
    assert survivors < n_all, (survivors, n_all)


def test_rp_projection_full_rank_and_recall(spark):
    """The +/-1 sign matrix must not be degenerate (full column rank —
    a separable/parity formula collapses columns and was rejected in
    design), and the projected-space shortlist must recover the planted
    top-3 structure through the rerank. Measured: recall 1.000 on the
    deterministic planted corpus (gated >= 0.9, same bar as the other
    ANN indexes)."""
    import numpy as np

    from video_stream_processing_spark.operators.similarity import (
        brute_force_topk,
        rp_ann_topk,
    )

    # numeric rank check of the formula itself (mirrors rp_project's sign)
    def sign(i, j):
        return 1.0 if ((i * i * 3 + j * j * 7 + i * j * 5 + i * 11 + j * 13) % 103) < 51 else -1.0

    R = np.array([[sign(i, j) for j in range(16)] for i in range(64)])
    assert np.linalg.matrix_rank(R) == 16
    off = R.T @ R - np.diag(np.diag(R.T @ R))
    assert np.abs(off).max() <= 24  # near-orthogonal columns (diag = 64)

    emb, n_clusters = _planted_cluster_corpus(spark)

    def pairs(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = pairs(brute_force_topk(emb, k=3, query_modulus=1000))
    got = pairs(rp_ann_topk(emb, k=3, out_dim=8, shortlist=20, query_modulus=1000))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_mjpeg_split_truncation_and_corruption(spark):
    """EOI-split contract: a truncated trailing frame (no EOI) is
    dropped; a frame with corrupted interior still splits correctly
    (stuffing keeps FF D9 unique) and decodes to null stats, matching
    the null-on-failure contract."""
    import numpy as np

    from video_stream_processing_spark.functions.jpegcodec import encode_jpeg
    from video_stream_processing_spark.operators.multimodal import mjpeg_frames_stats

    f0 = encode_jpeg(np.full((9, 11, 3), 40, np.uint8))
    f1 = encode_jpeg(np.full((12, 8, 3), 100, np.uint8))
    corrupt = bytearray(f1)
    corrupt[2:6] = b"\x00\x00\x00\x00"  # destroy the first marker segment
    assert b"\xff\xd9" not in bytes(corrupt[:-2])  # still exactly one EOI
    truncated = f0[:-2]  # strip EOI -> not a complete frame
    blob = f0 + bytes(corrupt) + truncated
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    rows = sorted(mjpeg_frames_stats(df).collect(), key=lambda r: r["frame_id"])
    assert len(rows) == 2  # truncated tail dropped
    assert (rows[0]["width"], rows[0]["height"]) == (11, 9)
    assert rows[0]["px_min"] == rows[0]["px_max"] == 40
    assert rows[1]["width"] is None and rows[1]["px_min"] is None


def test_ivfpq_encoded_index_partition_pruning(spark, sf_dir, tmp_path):
    """The 100 TB IVF-PQ deployment shape: encode ONCE at ingest, store
    the index as (vec_id, cid, codes) partitioned BY cid, and let the
    probe filter prune entire inverted-list partitions at the SCAN —
    queries touch probed lists' files only, never the corpus. Proves:
    (a) the persisted index round-trips the literal-projection encoding,
    (b) a probe filter on the stored index shows cid partition pruning
    in the physical plan, (c) ivfpq_search over the STORED index equals
    ivfpq_topk's live result exactly."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_search,
        kmeans_centroids,
        pq_codebooks,
    )
    from video_stream_processing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, n_clusters=8, n_iters=2)
    books = pq_codebooks(emb, m_sub=4, k_codes=8, n_iters=1)

    idx_path = str(tmp_path / "ivfpq_index")
    ivfpq_encode(emb, cents, books).write.partitionBy("cid").parquet(idx_path)
    stored = spark.read.parquet(idx_path)

    assert stored.count() == emb.count()  # (a) round trip

    probed = stored.where(F.col("cid").isin([0, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cid" in part_filters  # (b) pruning reaches the scan
    assert 0 < probed.count() < stored.count()

    key = lambda r: (r["query_id"], r["vec_id"], r["rank"])
    # live search over the same trained artifacts (no retraining — the
    # claim under test is stored-vs-live ENCODING, and x48's oracle
    # already certifies the trained end-to-end pipeline)
    live = sorted(
        map(
            key,
            ivfpq_search(
                ivfpq_encode(emb, cents, books), emb, cents, books, k=3, n_probes=2
            ).collect(),
        )
    )
    from_store = sorted(
        map(key, ivfpq_search(stored, emb, cents, books, k=3, n_probes=2).collect())
    )
    assert len(live) > 0 and from_store == live  # (c)


def test_incremental_refresh_equals_recompute(spark, sf_dir):
    """The merged partials must equal a direct full aggregate — the
    property that makes incremental refresh safe to trust."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.tables import load_table

    merged = {
        r["event_type"]: r.asDict()
        for r in query_map()["x71_incremental_agg_refresh"](spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    full = {
        r["event_type"]: r.asDict()
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .collect()
    }
    assert set(merged) == set(full)
    for k in full:
        for f in ("n_events", "value_sum", "min_value", "max_value"):
            assert merged[k][f] == full[k][f], (k, f)


def test_sequence_packing_matches_sequential_replay(spark, sf_dir):
    """x111's distributed two-level prefix sum equals a driver-side
    sequential replay of concatenate-then-chunk packing."""
    from video_stream_processing_spark.operators.text import word_count
    from video_stream_processing_spark.plans.extensions import PACK_CAPACITY
    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", word_count("text").alias("wc"))
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    expected: dict = {}
    for r in docs:
        shard = cum // PACK_CAPACITY
        e = expected.setdefault(shard, [0, 0, r["doc_id"], r["doc_id"]])
        e[0] += 1
        e[1] += r["wc"]
        e[3] = r["doc_id"]
        cum += r["wc"]
    got = {
        r["shard_id"]: [r["n_docs"], r["shard_tokens"], r["first_doc"], r["last_doc"]]
        for r in query_map()["x111_sequence_packing"](spark, sf_dir).collect()
    }
    assert got == expected
    # manifest covers every doc exactly once
    assert sum(e[0] for e in expected.values()) == len(docs)


def test_source_quality_prune_budget_and_threshold(spark, sf_dir):
    """x112 keeps at most ceil(frac*n) docs per source, and n_kept is
    EXACTLY the count of docs at or above the reported threshold (the
    all-or-nothing tie-group rule)."""
    import math

    from video_stream_processing_spark.plans.extensions import PRUNE_KEEP_FRAC
    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.tables import load_table

    qm = query_map()
    rep = {
        r["source"]: r
        for r in qm["x112_source_quality_prune"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    x11 = qm["x11_quality_score"](spark, sf_dir)
    per_src: dict = {}
    for r in docs.select("doc_id", "source").join(x11, "doc_id").collect():
        per_src.setdefault(r["source"], []).append(r["quality"])
    assert set(rep) == set(per_src)
    for src, arr in per_src.items():
        row = rep[src]
        budget = math.ceil(PRUNE_KEEP_FRAC * len(arr))
        assert row["n_docs"] == len(arr)
        assert row["n_kept"] <= budget
        if row["quality_threshold"] is not None:
            kept = [q for q in arr if q >= row["quality_threshold"]]
            assert len(kept) == row["n_kept"]
            # tie rule: admitting the next-lower score group would overflow
            below = sorted({q for q in arr if q < row["quality_threshold"]}, reverse=True)
            if below:
                next_group = [q for q in arr if q == below[0]]
                assert len(kept) + len(next_group) > budget
        else:
            assert row["n_kept"] == 0


def test_source_quality_prune_overflowing_tie_group_keeps_nothing(spark, tmp_path):
    """A source whose TOP score group alone overflows the budget keeps
    zero docs (NULL threshold) — the documented all-or-nothing edge."""
    from video_stream_processing_spark.plans.registry import query_map

    rows = [(i, "same text every time", "en", "s0", 1) for i in range(4)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    rep = query_map()["x112_source_quality_prune"](spark, d).collect()
    assert len(rep) == 1
    r = rep[0]
    # budget = ceil(0.3*4) = 2 < the 4-doc identical-score group
    assert r["n_docs"] == 4 and r["n_kept"] == 0
    assert r["quality_threshold"] is None and r["kept_frac"] == 0.0


def test_source_overlap_matrix_planted_pair(spark, tmp_path):
    """x113 on a planted corpus: two sources share exactly one 5-gram
    (the common sentence), a third source shares nothing and must be
    absent from the matrix."""
    from video_stream_processing_spark.plans.registry import query_map

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "sA", 1),
        (2, "alpha beta gamma delta epsilon omega", "en", "sB", 1),
        (3, "one two three four five six", "en", "sC", 1),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = query_map()["x113_source_overlap_matrix"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # shared gram: "alpha beta gamma delta epsilon"; each source has 2
    # distinct 5-grams -> jaccard = 1 / (2 + 2 - 1)
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    assert r["shared_grams"] == 1
    assert abs(r["jaccard"] - 1 / 3) < 1e-6


def test_embedding_quantization_planted(spark):
    """x123: exact INT8 round-trip on representable lanes, correct
    saturation accounting, zero-vector and non-finite guards."""
    from video_stream_processing_spark.operators.similarity import (
        embedding_quantization,
    )

    rows = [
        (1, [127.0, -127.0, 63.5, 0.0]),   # scale 1.0; 63.5 -> 64
        (2, [0.0, 0.0, 0.0]),               # zero vector
        (3, [1.0, float("nan")]),           # skipped (non-finite lane)
        (4, [0.005, -0.0025, 0.01]),        # small-range vector
        (5, [1.0, float("inf")]),           # ADVICE r9: inf must be skipped
        (6, [float("-inf"), 2.0]),          #   ... both signs
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_quantization(df).collect()}
    # vec 3 (NaN) and vecs 5/6 (+-inf -> scale=inf, NaN q/err garbage)
    # are dropped by the validity gate
    assert set(out) == {1, 2, 4}
    r1 = out[1]
    assert r1["scale"] == 1.0 and r1["n_saturated"] == 2
    # only the 63.5 lane reconstructs inexactly: floor(63.5+0.5)=64
    assert r1["max_abs_err"] == 0.5 and r1["l2_err"] == 0.5
    r2 = out[2]
    assert r2["scale"] == 0.0 and r2["l2_err"] == 0.0 and r2["n_saturated"] == 0
    r4 = out[4]
    assert r4["n_saturated"] >= 1  # the max lane always saturates at 127
    assert r4["max_abs_err"] <= r4["scale"] / 2 + 1e-12  # half-ulp bound


def test_embedding_quantization_property(spark):
    """x123 invariants on random vectors: reconstruction error is within
    half a quantization step on every lane (no saturation beyond the max
    lane is possible under symmetric max-scaling), and the max lane
    always reconstructs exactly (q = +-127)."""
    import numpy as np

    from video_stream_processing_spark.operators.similarity import (
        embedding_quantization,
    )

    rng = np.random.default_rng(23)
    rows = [
        (i, (rng.standard_normal(16) * rng.uniform(0.01, 100)).astype(float).tolist())
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_quantization(df).collect()}
    assert set(out) == set(range(25))
    for i, emb in rows:
        r = out[i]
        v = np.asarray(emb, dtype=np.float32).astype(np.float64)
        scale = float(np.abs(v).max()) / 127.0
        # per-lane error bound: half a step (+ rounding of the report)
        assert r["max_abs_err"] <= scale / 2 + 1e-6, i
        # the max-|v| lane lands exactly on +-127 -> saturated count >= 1
        assert r["n_saturated"] >= 1, i
        # L2 error bounded by sqrt(dim) * step/2
        assert r["l2_err"] <= (16 ** 0.5) * scale / 2 + 1e-6, i


def test_x146_planted_recall_gates(spark):
    """The declared planted-corpus recall query (x146) must show >= 0.9
    recall@3 for every tuned method — the meaningful measurement that
    x136's isotropic corpus cannot provide (ANN_RECALL.md)."""
    from video_stream_processing_spark.plans.registry import query_map

    rows = query_map()["x146_ann_recall_planted"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {r["method"] for r in rows} == {
        "ivf_trained_k8_probe2",
        "ivfpq_m4k8_rerank20",
        "rp16_shortlist20",
    }
    for r in rows:
        assert r["recall_at_3"] >= 0.9, (r["method"], r["recall_at_3"])
        assert r["n_returned"] == 3 * r["n_queries"]


def test_text_fingerprint_quality_legs(spark, sf_dir):
    """x149's quality numbers as a GATE: exact-class recall must be 1.0
    by construction (byte-identical text -> identical SimHash ->
    guaranteed band collision), the false-positive leg must be empty
    (md5 token synth produces no structural radius-3 collisions), and
    the jitter leg must detect at least one planted single-token edit
    (a zero would mean the banded join or the SimHash kernel broke
    rather than 'jitter moved')."""
    from video_stream_processing_spark.plans.registry import query_map

    rows = {
        r["class"]: r
        for r in query_map()["x149_text_fingerprint_quality"](spark, sf_dir).collect()
    }
    assert rows["exact"]["n_truth"] > 0
    assert rows["exact"]["n_detected"] == rows["exact"]["n_truth"]
    assert rows["exact"]["recall"] == 1.0
    assert rows["other"]["n_detected"] == 0
    assert rows["jitter"]["n_truth"] > 0
    assert 0 < rows["jitter"]["n_detected"] <= rows["jitter"]["n_truth"]
