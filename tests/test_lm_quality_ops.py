"""Planted-fixture semantics for the round-6 text-quality additions —
oracle parity (test_oracle_parity) proves engine agreement; these prove
the OPERATORS mean what their docstrings claim, against plain-python
references on corpora built to exercise each branch.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from video_stream_processing_spark.plans.registry import all_queries


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _run(spark, name, docs, tmp_path):
    """Write a documents.parquet fixture and run a registered query on it."""
    d = str(tmp_path / "sf")
    docs.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return all_queries()[name].fn(spark, d)


# ---------------------------------------------------------------- x108


def test_dupgram_fraction_plain_python_reference(spark, tmp_path):
    texts = [
        "a b c d e f g h i j",          # all 2-grams/3-grams distinct
        "a b a b a b a b a b",          # maximally repetitive
        "x y z x y z q w e r",          # partial repetition
    ]
    out = {
        r["doc_id"]: r
        for r in _run(spark, "x108_dupgram_fraction", _docs_df(spark, texts), tmp_path).collect()
    }

    def ref(text, n):
        toks = text.split()
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return len(grams), len(set(grams))

    for i, t in enumerate(texts):
        t2, d2 = ref(t, 2)
        t3, d3 = ref(t, 3)
        r = out[i]
        assert (r["n_2grams"], r["n_distinct_2"]) == (t2, d2)
        assert (r["n_3grams"], r["n_distinct_3"]) == (t3, d3)
        assert r["dup_frac_2"] == pytest.approx(1 - d2 / t2, abs=1e-6)
        assert r["kept"] == ((1 - d2 / t2) <= 0.20 and (1 - d3 / t3) <= 0.18)

    # the planted extremes land on the right side of the filter
    assert out[0]["kept"] is True
    assert out[1]["kept"] is False


# ---------------------------------------------------------------- x107


def test_ngram_contamination_flags_planted_inclusion(spark, sf_dir):
    """Build the split exactly as x107/x32 do, plant a train doc that
    contains a test doc's first 5 tokens verbatim, and check it is
    flagged while a vocabulary-disjoint train doc is not."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    test_text = (
        docs.select("doc_id", "text", split.alias("s"))
        .where(F.col("s") == "test")
        .orderBy("doc_id")
        .first()["text"]
    )
    planted_gram = " ".join(test_text.split()[:5])

    # find ids that land in the train band so the planted rows join the
    # report (md5 banding is over doc_id, so we probe)
    train_ids = [
        r["doc_id"]
        for r in docs.select("doc_id", split.alias("s"))
        .where(F.col("s") == "train")
        .orderBy("doc_id")
        .limit(2)
        .collect()
    ]
    clean = "zzqa zzqb zzqc zzqd zzqe zzqf zzqg zzqh zzqi zzqj"
    extra = spark.createDataFrame(
        [
            (int(train_ids[0]) + 1_000_000, planted_gram + " " + clean, "en", "src0", 1),
            (int(train_ids[1]) + 1_000_000, clean, "en", "src0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # re-derive the split for the synthetic ids; keep only ones that band
    # to train (adjust by probing — at least one of +1M offsets will)
    extra_train = extra.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc", True
        ).otherwise(False).alias("is_train"),
        "text",
    ).collect()

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.unionByName(extra).coalesce(2).write.mode("overwrite").parquet(
            td + "/documents.parquet"
        )
        rep = {
            r["doc_id"]: r
            for r in all_queries()["x107_ngram_contamination"].fn(spark, td).collect()
        }

    for row in extra_train:
        if not row["is_train"]:
            continue  # banded to val/test; nothing to assert for it
        r = rep[row["doc_id"]]
        if row["text"].startswith(planted_gram):
            assert r["contaminated"] is True
            assert r["n_hits"] >= 1
        else:
            assert r["contaminated"] is False
            assert r["n_hits"] == 0


# ---------------------------------------------------------------- x110


def test_bigram_lm_scores_match_plain_python(spark, tmp_path):
    texts = [
        "the cat sat on the mat",
        "the cat ran to the mat",
        "dogs bark dogs bark dogs",
    ]
    out = {
        r["doc_id"]: r
        for r in _run(spark, "x110_bigram_lm_logprob", _docs_df(spark, texts), tmp_path).collect()
    }

    # plain-python reference of the interpolated model
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for t in texts:
        toks = t.split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    nt = sum(uni.values())

    for i, t in enumerate(texts):
        toks = t.split()
        lps = [
            math.log(0.7 * bi[(a, b)] / ctx[a] + 0.3 * uni[b] / nt)
            for a, b in zip(toks, toks[1:])
        ]
        assert out[i]["n_bigrams"] == len(lps)
        assert out[i]["avg_logprob"] == pytest.approx(sum(lps) / len(lps), abs=1e-4)

    # a repeated, predictable doc scores higher than novel-transition docs
    assert out[2]["avg_logprob"] > min(out[0]["avg_logprob"], out[1]["avg_logprob"])
