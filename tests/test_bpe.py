"""BPE trainer/apply (operators/bpe.py) — fold semantics, deterministic
tie-breaks, and training on a planted corpus with hand-computable merges."""

import pytest
from pyspark.sql import functions as F

from video_stream_processing_spark.operators.bpe import (
    apply_merge,
    apply_merges,
    bpe_piece_counts,
    train_bpe_merges,
)


def _apply(spark, tok, merges):
    df = spark.createDataFrame([(tok,)], "tok string")
    out = df.select(apply_merges(F.split("tok", ""), merges).alias("s")).collect()
    return out[0]["s"]


def test_fold_is_leftmost_nonoverlapping(spark):
    # BPE's greedy rule on overlapping occurrences: "aaa" + (a,a) -> [aa, a]
    assert _apply(spark, "aaa", [("a", "a", "aa")]) == ["aa", "a"]
    assert _apply(spark, "aaaa", [("a", "a", "aa")]) == ["aa", "aa"]
    assert _apply(spark, "abab", [("a", "b", "ab")]) == ["ab", "ab"]


def test_merges_apply_in_training_order(spark):
    # (a,b)->ab then (ab,c)->abc builds the longer piece only via order
    merges = [("a", "b", "ab"), ("ab", "c", "abc")]
    assert _apply(spark, "abc", merges) == ["abc"]
    assert _apply(spark, "cab", merges) == ["c", "ab"]
    # single merged symbol never re-splits
    assert _apply(spark, "ab", merges) == ["ab"]


def test_single_char_token_passthrough(spark):
    assert _apply(spark, "x", [("a", "b", "ab")]) == ["x"]


def test_training_on_planted_corpus(spark):
    # corpus (all docs in sample: mod 1): "ababa" x2, "bb" -> pair counts
    # round 1: (a,b)=4, (b,a)=4, (b,b)=1 -> tie-break left ASC picks (a,b)
    docs = spark.createDataFrame(
        [(0, "ababa ababa"), (1, "bb")], "doc_id long, text string"
    )
    merges = train_bpe_merges(docs, n_merges=2, sample_mod=1, sample_rem=0)
    assert merges[0][:3] == ("a", "b", "ab")
    assert merges[0][3] == 4
    # after merge 1: "ababa" -> [ab, ab, a]; pairs (ab,ab)=2, (ab,a)=2, (b,b)=1
    # tie-break picks (ab,a)? 'ab' < 'ab' equal left, then right: 'a' < 'ab'
    assert merges[1][:3] == ("ab", "a", "aba")
    assert merges[1][3] == 2


def test_piece_counts_no_shuffle_plan(spark):
    docs = spark.createDataFrame(
        [(0, "abab xy"), (1, ""), (2, "a")], "doc_id long, text string"
    )
    out = bpe_piece_counts(docs, [("a", "b", "ab")])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_tokens"] == 2 and rows[0]["n_pieces"] == 2 + 2
    assert rows[1]["n_tokens"] == 0 and rows[1]["n_pieces"] == 0
    assert rows[2]["n_tokens"] == 1 and rows[2]["n_pieces"] == 1
    # the 100 TB claim: apply is scan -> project, zero exchanges
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_degenerate_corpus_stops_early(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    merges = train_bpe_merges(docs, n_merges=3, sample_mod=1, sample_rem=0)
    assert merges == []  # only single-char tokens: no pairs anywhere


@pytest.mark.parametrize("tok,expected", [("hello", ["h", "e", "ll", "o"])])
def test_mid_word_merge(spark, tok, expected):
    assert _apply(spark, tok, [("l", "l", "ll")]) == expected


def _py_bpe_apply(tok: str, merges: list[tuple[str, str, str]]) -> list[str]:
    """Reference implementation: leftmost non-overlapping merge passes."""
    syms = list(tok)
    for left, right, merged in merges:
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = merged
            else:
                out.append(s)
        syms = out
    return syms


def test_fold_matches_reference_on_random_inputs(spark):
    """Catalyst fold == the plain-python reference over random tokens and
    random (chained) merge tables — including merges whose left side is
    itself a merged symbol."""
    import random

    rng = random.Random(42)
    merges = [("a", "b", "ab"), ("ab", "a", "aba"), ("c", "c", "cc")]
    toks = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["s"]
        for r in df.select(
            "tok", apply_merges(F.split("tok", ""), merges, guard=F.col("tok")).alias("s")
        ).collect()
    }
    for t in toks:
        assert got[t] == _py_bpe_apply(t, merges), t


# --------------------------------------------------------------------------
# r8: decode + encode∘decode identity (hypothesis property)
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@st.composite
def _merge_chain(draw):
    """Realistic BPE merge chains: each merge's sides are drawn from the
    symbol pool built so far (so later merges can consume earlier merged
    symbols, the case that breaks naive implementations)."""
    pool = ["a", "b", "c"]
    merges = []
    for _ in range(draw(st.integers(0, 4))):
        left = draw(st.sampled_from(pool))
        right = draw(st.sampled_from(pool))
        merged = left + right
        merges.append((left, right, merged))
        pool.append(merged)
    return merges


@settings(max_examples=15, deadline=None)
@given(
    merges=_merge_chain(),
    toks=st.lists(st.text(alphabet="abc", min_size=1, max_size=10), min_size=1, max_size=8),
)
def test_bpe_roundtrip_identity_property(spark, merges, toks):
    """encode∘decode = identity for ANY merge chain and token set, on
    both the python reference and the Catalyst fold — and the two
    encoders agree piece-for-piece (x115's per-engine audit, proven
    generatively)."""
    from video_stream_processing_spark.operators.bpe import bpe_decode

    for t in toks:
        assert "".join(_py_bpe_apply(t, merges)) == t
    df = spark.createDataFrame([(t,) for t in set(toks)], "tok string")
    rows = df.select(
        "tok",
        apply_merges(F.split("tok", ""), merges, guard=F.col("tok")).alias("pieces"),
        bpe_decode(
            apply_merges(F.split("tok", ""), merges, guard=F.col("tok"))
        ).alias("decoded"),
    ).collect()
    for r in rows:
        assert r["pieces"] == _py_bpe_apply(r["tok"], merges)
        assert r["decoded"] == r["tok"]
