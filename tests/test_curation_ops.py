"""Planted-case tests for the round-2 curation operators (x29-x34):
semantic dedup, token entropy, and the rule-based filter chain. The
declared queries prove engine-vs-oracle parity on the synthetic corpus;
these prove the claimed semantics on constructed inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    # label 0: v1 and v2 are semantic near-dups (cos ~ 0.99995); v4 is in
    # the same cluster but dissimilar (cos ~ 0.2 to both). label 1: v3.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.2, -0.97], 0),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_semantic_dedup_drops_only_near_dup(planted_embeddings):
    from video_stream_processing_spark.operators.similarity import semantic_dedup

    out = {r["vec_id"]: r for r in semantic_dedup(planted_embeddings, 0.4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert out[3]["keep"] and out[4]["keep"]
    # only the higher-id member of the near-dup pair is dropped, and it
    # points back at its keeper
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    # v1/v2/v4 share a cluster; v3 sits alone in the other one
    assert out[1]["cluster"] == out[2]["cluster"] == out[4]["cluster"]
    assert out[3]["cluster"] != out[1]["cluster"]


def test_semantic_dedup_transitive_chain_keeps_min_id(spark):
    # a ~ b ~ c all mutually similar: greedy lower-id rule keeps only a
    from video_stream_processing_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(10, [1.0, 0.0], 0), (11, [0.999, 0.02], 0), (12, [0.998, 0.03], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r for r in semantic_dedup(emb, 0.9).collect()}
    assert out[10]["keep"]
    assert not out[11]["keep"] and out[11]["dup_of"] == 10
    assert not out[12]["keep"] and out[12]["dup_of"] == 10


def _entropy_rows(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # reuse the query body's math directly (inline to avoid sf_dir)
    from video_stream_processing_spark.operators.text import tokens_col

    tok = docs.select("doc_id", F.explode(tokens_col()).alias("w"))
    freq = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("clnc"),
    )
    res = agg.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log(F.col("n_tokens").cast("double")) - F.col("clnc") / F.col("n_tokens"), 4
        ).alias("entropy"),
    )
    return {r["doc_id"]: r for r in res.collect()}


def test_token_entropy_known_values(spark):
    out = _entropy_rows(spark, ["a a b b", "a b c d", "a"])
    # uniform over 2 symbols -> ln 2; uniform over 4 -> ln 4; constant -> 0
    assert out[0]["entropy"] == pytest.approx(round(math.log(2), 4), abs=1e-9)
    assert out[1]["entropy"] == pytest.approx(round(math.log(4), 4), abs=1e-9)
    assert out[2]["entropy"] == 0.0
    assert out[0]["n_tokens"] == 4


def test_filter_chain_rules(spark, tmp_path):
    # run the declared query against a tiny parquet corpus so every rule
    # fires at least once in each direction
    good = "the " + " ".join(f"word{i}" for i in range(39))  # 40 words, diverse
    short = "tiny doc only"  # fails word-count floor
    repetitive = "the " + " ".join(["same"] * 59)  # 60 words, diversity 2/60
    rows = [(0, good), (1, short), (2, repetitive)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    from video_stream_processing_spark.plans.registry import query_map

    out = {
        r["doc_id"]: r
        for r in query_map()["x34_filter_chain"](spark, str(tmp_path)).collect()
    }
    assert out[0]["kept"]
    assert not out[1]["kept"] and not out[1]["ok_nwords"]
    assert not out[2]["kept"] and not out[2]["ok_diversity"]
    # the audit columns carry the reason, not just the verdict: the short
    # doc passes diversity/word-length while failing length + stopword
    assert out[1]["ok_diversity"] and out[1]["ok_wordlen"]


def test_corpus_split_is_deterministic_and_total(spark):
    from video_stream_processing_spark.plans.registry import query_map

    q = query_map()["x32_corpus_split"]
    a = sorted((r["doc_id"], r["split"]) for r in q(spark, "/root/testdata/sf0.001").collect())
    b = sorted((r["doc_id"], r["split"]) for r in q(spark, "/root/testdata/sf0.001").collect())
    assert a == b  # pure function of doc_id
    assert {s for _, s in a} <= {"train", "val", "test"}
    # hash banding should produce a dominant train split
    n = len(a)
    assert sum(1 for _, s in a if s == "train") > 0.6 * n


def test_doc_chunking_invariants(spark, tmp_path):
    # windows of 40 with stride 30: full coverage, 10-token interior
    # overlap, no chunk exceeds the window — checked for lengths around
    # every boundary (<C, ==C, C+1, multi-window)
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in (10, 40, 41, 100)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    from video_stream_processing_spark.plans.registry import query_map

    out = query_map()["x27_doc_chunking"](spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {n for n in by_doc} == {10, 40, 41, 100}
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            toks = r["chunk_text"].split()
            assert r["n_tokens"] == len(toks) <= 40
            start = r["chunk_id"] * 30
            assert toks == [f"t{i}" for i in range(start, start + len(toks))]
            covered.update(range(start, start + len(toks)))
        assert covered == set(range(n))  # every token lands in >= 1 chunk
    assert len(by_doc[10]) == 1 and len(by_doc[40]) == 1
    assert len(by_doc[41]) == 2 and len(by_doc[100]) == 3


def test_repeated_passages_planted_recovery(spark):
    """x114's operator recovers planted verbatim passages EXACTLY: right
    pair, right 0-based offsets, right maximal length — and only them."""
    from video_stream_processing_spark.operators.dedup import repeated_passages

    passage = " ".join(f"shared{i}" for i in range(20))  # 20-token passage
    filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        # doc 1: passage at token offset 5; doc 2: same passage at offset 3
        (1, filler("a", 5) + " " + passage + " " + filler("b", 6)),
        (2, filler("c", 3) + " " + passage + " " + filler("d", 8)),
        # doc 3: an UNRELATED doc with no 15-gram overlap
        (3, filler("e", 40)),
        # docs 4/5: exact duplicates — one island spanning the whole doc
        (4, filler("f", 30)),
        (5, filler("f", 30)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): (r["start_a"], r["start_b"], r["match_len"])
        for r in repeated_passages(docs, gram_len=15, max_gram_docs=8).collect()
    }
    assert out == {
        (1, 2): (5, 3, 20),   # maximal run = the full 20-token passage
        (4, 5): (0, 0, 30),   # exact dup = whole-doc island
    }


def test_repeated_passages_boilerplate_cap(spark):
    """A gram present in more docs than the cap is dropped (boilerplate
    guard) — without the cap this corpus would fan out quadratically."""
    from video_stream_processing_spark.operators.dedup import repeated_passages

    boiler = " ".join(f"tpl{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(i, f"unique{i}x unique{i}y " + boiler) for i in range(10)],
        "doc_id long, text string",
    )
    # 10 docs share the gram; cap 8 -> dropped entirely
    assert repeated_passages(docs, gram_len=15, max_gram_docs=8).count() == 0
    # raising the cap reinstates all 45 pairs
    assert repeated_passages(docs, gram_len=15, max_gram_docs=16).count() == 45


def test_dsir_weights_planted_domains(spark):
    """x116's operator: docs built from target-domain vocabulary score
    positive log-weights, off-domain docs negative, and the weight is a
    monotone signal of domain resemblance on a mixed doc."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.text import dsir_weights

    tgt_text = "alpha beta gamma delta epsilon zeta eta theta"
    off_text = "uno dos tres cuatro cinco seis siete ocho"
    rows = (
        [(i, tgt_text, "en") for i in range(6)]
        + [(10 + i, off_text, "es") for i in range(6)]
        + [(20, tgt_text, "es")]                      # target-looking raw doc
        + [(21, tgt_text + " " + off_text, "es")]     # mixed doc
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # n_buckets=64: with the production 512 the add-1 smoothing mass
    # (B added to each denominator) swamps a 14-doc corpus and every
    # weight goes negative; the planted signal needs buckets ~ data size
    out = {
        r["doc_id"]: r
        for r in dsir_weights(docs, F.col("lang") == "en", n_buckets=64).collect()
    }
    assert len(out) == len(rows)
    # every doc written in the target vocabulary scores positive —
    # including the raw-corpus doc 20 (that's the selection effect)
    for i in list(range(6)) + [20]:
        assert out[i]["log_weight"] > 0, i
        assert out[i]["selected"]
    # off-domain docs score negative
    for i in range(10, 16):
        assert out[i]["log_weight"] < 0, i
        assert not out[i]["selected"]
    # the mixed doc sits strictly between the pure docs' weights
    assert out[10 + 0]["log_weight"] < out[21]["log_weight"] < out[20]["log_weight"]
    # feature accounting: unigrams + bigrams of an 8-token doc = 8 + 7
    assert out[0]["n_feats"] == 15


def test_winnowing_offset_robust_and_sparse(spark):
    """x117's operator: the winnowing guarantee — docs sharing a run of
    >= w+k-1 tokens share a fingerprint at ANY offset alignment — plus
    the ~2/(w+1) density bound that makes it cheaper than stride-1
    anchors."""
    from video_stream_processing_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_match_pairs,
    )

    passage = " ".join(f"shared{i}" for i in range(12))  # > w+k-1 = 6 tokens
    filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (1, filler("a", 1) + " " + passage + " " + filler("b", 9)),
            (2, filler("c", 6) + " " + passage + " " + filler("d", 2)),  # offset differs by 5
            (3, filler("e", 30)),  # unrelated
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnowing_match_pairs(docs, min_shared=1).collect()
    }
    assert set(pairs) == {(1, 2)}  # found despite misaligned offsets; doc 3 clean
    assert pairs[(1, 2)] >= 2  # a 12-token run spans several windows
    # density: a doc with n grams selects at most ~2n/(w+1) + 1 fingerprints
    n_fp = winnowing_fingerprints(docs.where("doc_id = 3")).count()
    n_grams = 30 - 2  # 28 trigram shingles
    assert 1 <= n_fp <= (2 * n_grams) // 5 + 2


def test_gopher_rules_planted(spark):
    """x118's operator: each Gopher rule fires on a doc constructed to
    violate exactly it."""
    from video_stream_processing_spark.operators.text import gopher_rules

    good = "the quick brown fox jumps with vigor and grace over that lazy " \
           "hound of mine " * 5  # 70 words, stopwords present, mean len ~4
    rows = [
        (1, good),                                            # passes all
        (2, "short doc with the and of that"),                # < 50 words
        (3, ("a " * 70).strip()),                             # mean len 1 < 3
        (4, " ".join(["12345"] * 30 + ["the of and with that have be to"] * 5)),  # frac_alpha
        (5, ("zz " * 70).strip()),                            # 0 stopwords
        (6, good + " " + "#" * 20),                           # symbol ratio > 0.1
    ]
    out = {r["doc_id"]: r for r in gopher_rules(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["n_words"] < 50
    assert not out[3]["keep"] and out[3]["mean_word_len"] < 3
    assert not out[4]["keep"] and out[4]["frac_alpha_words"] < 0.8
    assert not out[5]["keep"] and out[5]["n_stopwords"] == 0
    assert not out[6]["keep"] and out[6]["symbol_ratio"] > 0.1


def test_quality_classifier_planted_separable(spark):
    """x119's operator: on a lexically separable corpus (curated docs
    drawn from one vocabulary, junk from another), the NB-init +
    gradient-refined classifier ranks every curated doc above every
    junk doc, and the per-source selection budget recovers exactly the
    curated slice. The model never sees the label rule directly — only
    hashed presence features."""
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.text import quality_classifier

    good = "alpha beta gamma delta epsilon zeta"
    junk = "uno dos tres cuatro cinco seis"
    rows = (
        [(i, good + f" filler{i % 3}", "srcA") for i in range(5)]
        + [(10 + i, junk + f" filler{i % 3}", "srcA") for i in range(15)]
        + [(30 + i, good, "srcB") for i in range(3)]
        + [(40 + i, junk, "srcB") for i in range(9)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    curated = F.array_contains(F.split(F.trim(F.col("text")), r"\s+"), "alpha")
    out = {
        r["doc_id"]: r
        for r in quality_classifier(docs, curated, select_frac=0.25).collect()
    }
    assert len(out) == len(rows)
    good_ids = set(range(5)) | {30, 31, 32}
    # perfect separation: min curated score > max junk score
    min_good = min(out[i]["score"] for i in good_ids)
    max_junk = max(out[i]["score"] for i in out if i not in good_ids)
    assert min_good > max_junk
    # the 25% budget per source selects exactly the curated docs:
    # ceil(0.25*20)=5 of srcA, ceil(0.25*12)=3 of srcB
    kept = {i for i in out if out[i]["keep"]}
    assert kept == good_ids
    for i in good_ids:
        assert out[i]["is_curated"]


def test_nb_langid_planted_multilingual(spark):
    """x120's operator: on a corpus with genuinely distinct character
    distributions per language, the trained trigram NB model identifies
    every doc — including docs shorter/longer than the training mix —
    and the prior breaks ties toward the majority class on empty-signal
    input."""
    from video_stream_processing_spark.operators.text import nb_langid

    # two invented scripts: "aa" language (vowel-heavy) and "zz"
    # language (z/y-heavy); trigram distributions are disjoint
    aa = ["baba abab aaba", "abba baab abaa", "aaab baaa abab", "ab"]
    zz = ["zyzy yzyz zzyz", "zyyz yzzy zyzz", "zzzy yzzz zyzy"]
    rows = [(i, t, "aa") for i, t in enumerate(aa)] + [
        (10 + i, t, "zz") for i, t in enumerate(zz)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_langid(docs, n_buckets=64).collect()}
    assert len(out) == len(rows)
    for i in range(4):
        assert out[i]["predicted_lang"] == "aa", (i, out[i])
        assert out[i]["is_match"]
    for i in range(10, 13):
        assert out[i]["predicted_lang"] == "zz", (i, out[i])
        assert out[i]["is_match"]
    # log-likelihoods are negative and finite
    for r in out.values():
        assert r["top_logprob"] < 0


def test_apply_passage_dedup_round_trip(spark):
    """x121's operator: the cut corpus keeps the FIRST occurrence of
    every planted passage intact, removes every later occurrence
    (including overlap-merged and whole-doc spans), and leaves
    untouched docs byte-identical after token reassembly."""
    from video_stream_processing_spark.operators.dedup import apply_passage_dedup

    passage = " ".join(f"shared{i}" for i in range(20))
    filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (1, filler("a", 5) + " " + passage + " " + filler("b", 6)),
        (2, filler("c", 3) + " " + passage + " " + filler("d", 8)),
        (3, filler("e", 40)),
        (4, filler("f", 30)),
        (5, filler("f", 30)),  # exact dup of doc 4 -> fully cut
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in apply_passage_dedup(docs, gram_len=15).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # first occurrences and unrelated docs untouched
    for d, txt in [(1, rows[0][1]), (3, rows[2][1]), (4, rows[3][1])]:
        assert out[d]["n_removed"] == 0
        assert out[d]["cut_text"] == txt
    # doc 2 loses exactly the 20-token passage, keeping its flanks
    assert out[2]["n_removed"] == 20
    assert out[2]["cut_text"] == filler("c", 3) + " " + filler("d", 8)
    # doc 5 is an exact duplicate -> everything removed
    assert out[5]["n_removed"] == 30 and out[5]["cut_text"] == ""
    # token accounting: removed + kept == original everywhere
    for r in out.values():
        kept = len(r["cut_text"].split()) if r["cut_text"] else 0
        assert kept + r["n_removed"] == r["n_tokens"]


def test_gopher_repetition_planted(spark):
    """x122's operator: each repetition rule fires on a doc constructed
    to violate exactly it, and a clean doc passes every rule."""
    from video_stream_processing_spark.operators.text import gopher_repetition

    clean = " ".join(f"w{i}" for i in range(40))
    # one 2-gram covering most characters
    top2 = " ".join(["alpha beta"] * 12) + " tail"
    # a long 5-gram repeated twice in 20 tokens
    run5 = " ".join(f"r{i}" for i in range(5))
    dup5 = run5 + " mid1 mid2 mid3 " + run5 + " end1 end2"
    # duplicate lines
    dup_lines = "\n".join(["same line of text"] * 4 + ["unique tail"])
    rows = [(1, clean), (2, top2), (3, dup5), (4, dup_lines)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}

    assert out[1]["keep"]
    assert out[1]["dup_line_frac"] == 0.0 and out[1]["top_2gram_char_frac"] < 0.2

    assert not out[2]["keep"]
    assert out[2]["top_2gram_char_frac"] > 0.2  # "alpha beta" dominates

    assert not out[3]["keep"]
    assert out[3]["dup_5gram_char_frac"] > 0.15
    # the planted 5-gram also makes 2 duplicate 5-gram occurrences only
    assert out[3]["dup_line_frac"] == 0.0

    assert not out[4]["keep"]
    assert out[4]["dup_line_frac"] == 0.6  # 3 of 5 lines are repeats of one
    assert out[4]["dup_line_char_frac"] > 0.2


def test_classifier_auc_exact_values(spark):
    """x124's metric kernel: AUC on hand-computable score/label sets,
    including the tie half-credit correction."""
    from video_stream_processing_spark.operators.text import classifier_auc

    # perfect separation -> AUC 1; anti-separation -> 0; ties -> 0.5 credit
    perfect = spark.createDataFrame(
        [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)],
        "is_curated boolean, score double",
    )
    r = classifier_auc(perfect).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"], r["gini"]) == (2, 2, 1.0, 1.0)

    inverted = spark.createDataFrame(
        [(False, 0.9), (True, 0.1)], "is_curated boolean, score double"
    )
    assert classifier_auc(inverted).collect()[0]["auc"] == 0.0

    # one tied pair at 0.5: U = 1*1 (pos 0.9 > neg 0.2) + 0.5 (tie)
    # + 1 (pos 0.5 > neg 0.2) + 0 (pos 0.5 < neg 0.9)... recompute:
    # pos = {0.9, 0.5}, neg = {0.5, 0.2}: pairs (0.9,0.5)=1 (0.9,0.2)=1
    # (0.5,0.5)=0.5 (0.5,0.2)=1 -> U=3.5 / 4 = 0.875
    tied = spark.createDataFrame(
        [(True, 0.9), (True, 0.5), (False, 0.5), (False, 0.2)],
        "is_curated boolean, score double",
    )
    assert classifier_auc(tied).collect()[0]["auc"] == 0.875


def test_round6_away_matches_duckdb_round():
    """ADVICE r9 (low): the classifier's gradient step must round
    half-AWAY-from-zero (DuckDB's round() rule), not Python's
    half-to-even — pinned against DuckDB itself on boundary values."""
    import duckdb

    from video_stream_processing_spark.operators.text import _round6_away

    cases = [0.0000005, -0.0000005, 0.0000015, -0.0000015, 1.2345675,
             -1.2345675, 0.1234565, 2.5e-7, 0.0, 1.0, -3.9999995]
    con = duckdb.connect()
    for x in cases:
        (want,) = con.execute(f"SELECT round({x!r}::DOUBLE, 6)").fetchone()
        assert _round6_away(x) == want, (x, _round6_away(x), want)
    # and the specific divergence from Python round(): ties go away
    # from zero, not to the even grid point
    assert _round6_away(0.0000015) == 2e-6
