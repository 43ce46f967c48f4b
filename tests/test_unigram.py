"""Unigram-LM (SentencePiece-style) tokenizer: Viterbi DP semantics,
planted-corpus training outcomes, unk fallback, and encode∘decode
identity (operators/unigram.py; x128/x129 are the registered queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_stream_processing_spark.operators.unigram import (
    train_unigram,
    unigram_tokenize,
    viterbi_best,
)


def _vm(d):
    items = []
    for k in sorted(d):
        items += [F.lit(k), F.lit(d[k])]
    return F.create_map(*items)


def test_viterbi_picks_maximum_likelihood_segmentation(spark):
    # 'a|bc' (-0.8) beats 'ab|c' (-1.3) and 'a|b|c' (-2.4)
    vm = _vm({"a": -0.5, "b": -1.0, "c": -0.9, "ab": -0.4, "bc": -0.3})
    df = spark.createDataFrame([("abc",), ("abcab",)], "tok string")
    got = {
        r["tok"]: (r["b"]["s"], r["b"]["g"])
        for r in df.select("tok", viterbi_best(F.col("tok"), vm).alias("b")).collect()
    }
    assert got["abc"] == (-0.8, "a|bc")
    assert got["abcab"][1] == "a|bc|ab"


def test_viterbi_tie_breaks_to_lex_smallest_path(spark):
    # both segmentations of 'ab' score -1.0; the tie rule keeps the
    # lexicographically smallest PATH STRING — '|' (0x7C) sorts after
    # every [a-z] char, so the single-piece 'ab' beats 'a|b' (fewer
    # pieces win boundary ties; same rule in the DuckDB oracle)
    vm = _vm({"a": -0.5, "b": -0.5, "ab": -1.0})
    df = spark.createDataFrame([("ab",)], "tok string")
    row = df.select(viterbi_best(F.col("tok"), vm).alias("b")).collect()[0]
    assert row["b"]["g"] == "ab" and row["b"]["s"] == -1.0


def test_viterbi_unreachable_token_returns_sentinel(spark):
    vm = _vm({"a": -0.5})
    df = spark.createDataFrame([("az",)], "tok string")
    row = df.select(viterbi_best(F.col("tok"), vm).alias("b")).collect()[0]
    assert row["b"]["s"] <= -1e17 and row["b"]["g"] == ""


def test_viterbi_empty_token_returns_sentinel(spark):
    # sequence(1, 0) DESCENDS in Spark; the n>=1 guard must keep an
    # empty token on the sentinel path instead of folding [1, 0]
    vm = _vm({"a": -0.5})
    df = spark.createDataFrame([("",), ("a",)], "tok string")
    got = {
        r["tok"]: (r["b"]["s"], r["b"]["g"])
        for r in df.select("tok", viterbi_best(F.col("tok"), vm).alias("b")).collect()
    }
    assert got[""][0] <= -1e17 and got[""][1] == ""
    assert got["a"] == (-0.5, "a")


def test_train_learns_planted_frequent_piece(spark):
    # corpus dominated by the word 'banana' -> 'an'/'na'/'ana'-family
    # substrings dominate the seed counts and survive EM + the prune at
    # the top of the multi-char vocab
    rows = [(i, "banana banana banana bandana cabana") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_unigram(docs)
    pieces = [p for p, _, _ in vocab]
    multi = [p for p in pieces if len(p) > 1]
    assert multi, "no multi-char pieces survived"
    assert any(p in ("an", "na", "ana", "ban") for p in multi[:3])
    # all chars of the sample are present (never pruned)
    for ch in set("".join("banana bandana cabana".split())):
        assert ch in pieces, ch
    # vocab is emitted in (cnt DESC, piece ASC) rank order
    keys = [(-c, p) for p, c, _ in vocab]
    assert keys == sorted(keys)


def test_tokenize_compresses_and_roundtrips(spark):
    rows = [(i, "banana banana bandana cabana banana") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {p: lp for p, _, lp in train_unigram(docs)}
    out = unigram_tokenize(docs, vocab).collect()
    for r in out:
        assert r["n_mismatch"] == 0  # encode∘decode identity everywhere
        assert r["n_unk"] == 0  # sample chars cover the corpus
        assert 0 < r["n_pieces"] < 6 * 5  # fewer pieces than chars: learned
        assert r["n_tokens"] == 5


def test_tokenize_unk_fallback_counts_chars(spark):
    # doc_id 1 is NOT in the doc_id%5==0 training sample; its 'qqq' word
    # contains a char the sample never sees -> unk, char-length fallback
    rows = [(0, "banana banana banana"), (1, "banana qqq banana")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {p: lp for p, _, lp in train_unigram(docs)}
    assert "q" not in vocab
    out = {r["doc_id"]: r for r in unigram_tokenize(docs, vocab).collect()}
    assert out[0]["n_unk"] == 0 and out[0]["n_mismatch"] == 0
    assert out[1]["n_unk"] == 1
    # the unk word contributes length('qqq') = 3 fallback pieces
    banana_pieces = out[0]["n_pieces"] // 3
    assert out[1]["n_pieces"] == 2 * banana_pieces + 3


def test_viterbi_matches_bruteforce_enumeration(spark):
    """The DP must equal global argmax over ALL segmentations under the
    documented ordering (score DESC, then path-string ASC) — checked
    against a python enumeration on ~60 random (vocab, token) cases in
    one Spark job. Guards the fold's tie rule and window bounds."""
    import random

    rng = random.Random(0)
    alphabet = "abc"
    cases = []
    for i in range(60):
        tok = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        # random vocab: all chars (reachability) + random 2-3 substrings
        vocab = {ch: round(rng.uniform(-3, -0.5), 6) for ch in alphabet}
        for _ in range(rng.randint(0, 6)):
            ln = rng.randint(2, 3)
            if len(tok) >= ln:
                j = rng.randint(0, len(tok) - ln)
                vocab[tok[j : j + ln]] = round(rng.uniform(-3, -0.5), 6)
        cases.append((i, tok, vocab))

    def brute(tok, vocab):
        best = None  # (score, seg)
        def rec(pos, score, seg):
            nonlocal best
            if pos == len(tok):
                key = (-score, seg)
                if best is None or key < best:
                    best = key
                return
            for ln in (1, 2, 3):
                piece = tok[pos : pos + ln]
                if pos + ln <= len(tok) and piece in vocab:
                    rec(pos + ln, score + vocab[piece],
                        piece if not seg else seg + "|" + piece)
        rec(0, 0.0, "")
        return (-best[0], best[1])

    df = spark.createDataFrame([(i, tok) for i, tok, _ in cases], "i int, tok string")
    out = {}
    # one select with a per-case literal map each (bounded vocab per case)
    import pyspark.sql.functions as SF
    cols = []
    for i, tok, vocab in cases:
        cols.append(
            SF.when(SF.col("i") == i, viterbi_best(SF.col("tok"), _vm(vocab))).alias(f"b{i}")
        )
    rows = df.select("i", "tok", *cols).collect()
    for r in rows:
        b = r[f"b{r['i']}"]
        out[r["i"]] = (b["s"], b["g"])
    for i, tok, vocab in cases:
        exp_s, exp_g = brute(tok, vocab)
        got_s, got_g = out[i]
        assert got_g == exp_g, (i, tok, vocab, got_g, exp_g)
        assert abs(got_s - exp_s) < 1e-12, (i, tok, got_s, exp_s)


def test_fb_expected_counts_match_bruteforce(spark):
    """fb_expected_scaled must equal the enumeration-exact posterior
    expectations: sum over ALL segmentations of (weight/Z) * piece
    multiplicity, to within 1 micro-unit of rounding."""
    from collections import defaultdict

    from video_stream_processing_spark.operators.unigram import (
        _prob_map,
        fb_expected_scaled,
    )

    p = {"b": 0.05, "a": 0.2, "n": 0.1, "an": 0.15, "na": 0.12, "ana": 0.08, "ban": 0.06}

    def brute(tok, L=3):
        segs = []

        def rec(pos, pieces, w):
            if pos == len(tok):
                segs.append((pieces[:], w))
                return
            for ln in range(1, L + 1):
                pc = tok[pos : pos + ln]
                if pos + ln <= len(tok) and pc in p:
                    pieces.append(pc)
                    rec(pos + ln, pieces, w * p[pc])
                    pieces.pop()

        rec(0, [], 1.0)
        z = sum(w for _, w in segs)
        e = defaultdict(float)
        for pieces, w in segs:
            for pc in pieces:
                e[pc] += w / z
        return dict(e)

    toks = ["banana", "ab", "nanananan", "b", "anananana"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    rows = df.select(
        "tok", fb_expected_scaled(F.col("tok"), _prob_map(p)).alias("e")
    ).collect()
    for r in rows:
        exp = brute(r["tok"])
        got = {x["pc"]: x["sc"] for x in r["e"]}
        assert set(got) == set(exp), r["tok"]
        for pc, ev in exp.items():
            assert abs(got[pc] - round(ev * 1e6)) <= 1, (r["tok"], pc, got[pc], ev)


def test_soft_em_learns_planted_piece_with_fractional_mass(spark):
    """Soft EM spreads expectation over ALL segmentations: on a corpus
    dominated by 'banana' the an/na family keeps fractional mass (the
    Viterbi trainer gives the winner everything), and the vocab table
    is rank-consistent."""
    from video_stream_processing_spark.operators.unigram import train_unigram_soft

    rows = [(i, "banana banana banana bandana cabana") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_unigram_soft(docs)
    by_piece = {p: (m, pv) for p, m, pv in vocab}
    multi = [p for p, _, _ in vocab if len(p) > 1]
    assert multi and any(p in ("an", "na", "ana", "ban") for p in multi[:3])
    # fractional expectations: at least one multi-char piece has a
    # micro-count that is NOT a whole-count multiple (soft assignment)
    assert any(m % 1_000_000 != 0 for p, m, _ in vocab if len(p) > 1 and m > 0)
    # probabilities sum to ~1 over the emitted vocab
    assert abs(sum(pv for _, _, pv in vocab) - 1.0) < 1e-9
    keys = [(-m, p) for p, m, _ in vocab]
    assert keys == sorted(keys)
