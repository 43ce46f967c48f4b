"""Streaming twin of the curation pipeline: the batch rules and
normalization (shared expressions, operators/text.py) applied on a
document stream, with exact dedup as dropDuplicatesWithinWatermark — so
junk is filtered, duplicates within the watermark are dropped exactly
once, and the dedup state provably EXPIRES (a re-arrival after the
watermark passes is re-emitted, which is the bounded-state contract).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

BASE = 1_700_000_000_000  # ms

GOOD = "the " + " ".join(f"word{i}" for i in range(39))  # passes every rule
SHORT = "tiny doc only"  # fails the word-count floor


def _write(spark, d, rows, mode):
    (
        spark.createDataFrame(rows, "doc_id long, ts_ms long, text string")
        .select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text")
        .coalesce(1)
        .write.mode(mode)
        .parquet(d)
    )


@pytest.mark.slow
def test_curation_stream_filters_dedups_and_expires_state(spark, tmp_path):
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    d = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")

    # batch 1: a good doc, an exact duplicate (punctuation variant that
    # normalizes to the same text), and a junk doc
    _write(
        spark,
        d,
        [(1, BASE, GOOD), (2, BASE + 1_000, GOOD + "!!"), (3, BASE + 2_000, SHORT)],
        "overwrite",
    )
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        curation_stream(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("curation")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM curation").collect()
        assert [r["doc_id"] for r in rows] == [1]  # junk dropped, dup dropped
        assert rows[0]["n_tokens"] == 40

        # batch 2: the same content arrives again while the dedup state is
        # still live (watermark has not passed BASE + 10 min) -> dropped
        _write(spark, d, [(4, BASE + 30 * 60_000, GOOD)], "append")
        q.processAllAvailable()
        q.processAllAvailable()
        assert [r["doc_id"] for r in spark.sql("SELECT * FROM curation").collect()] == [1]

        # batch 3: after batch 2 the watermark advanced to +20 min, past the
        # hash's expiry (BASE + 10 min) -> state evicted -> re-emitted
        _write(spark, d, [(5, BASE + 31 * 60_000, GOOD)], "append")
        q.processAllAvailable()
        q.processAllAvailable()
        ids = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM curation").collect())
        assert ids == [1, 5]
    finally:
        q.stop()


@pytest.mark.slow
def test_incremental_dedup_stream_replay_emits_once(spark, tmp_path):
    """Streaming twin of x42 (VERDICT r4 item 6): an arriving shard is
    anti-joined against the existing corpus's hash set, deduped within
    the stream, and landed through the idempotent sink — so (a) docs
    already in the corpus never emit, (b) a shard replayed within the
    watermark emits exactly once, and (c) a re-delivered micro-batch
    overwrites its own partition instead of duplicating."""
    from video_stream_processing_spark.streaming.pipeline import (
        incremental_dedup_stream,
    )
    from video_stream_processing_spark.streaming.sinks import write_docs_idempotent

    corpus = spark.createDataFrame(
        [(100, "existing corpus document body one"), (101, "existing corpus document body two")],
        "doc_id long, text string",
    )

    d = str(tmp_path / "shards")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "landed")
    # shard 1: one genuinely new doc, one already-in-corpus doc
    _write(
        spark,
        d,
        [(1, BASE, "a brand new never seen document"), (2, BASE + 1_000, "existing corpus document body one")],
        "overwrite",
    )
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        incremental_dedup_stream(stream, corpus, watermark="10 minutes")
        .writeStream.foreachBatch(write_docs_idempotent(out))
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # shard 2: REPLAY of shard 1's new doc (same content, inside the
        # watermark) plus another new doc
        _write(
            spark,
            d,
            [(3, BASE + 2_000, "a brand new never seen document"), (4, BASE + 3_000, "a second new document arrives")],
            "append",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    landed = spark.read.parquet(out)
    ids = sorted(r["doc_id"] for r in landed.collect())
    assert ids == [1, 4]  # corpus dup (2) and replayed content (3) dropped

    # sink re-delivery: rewriting the SAME batch id must not duplicate.
    # Materialize the replay rows first — a lazy plan over `out` would
    # re-read the files the first sink call just overwrote.
    sink = write_docs_idempotent(out)
    doc4_rows = landed.where(F.col("doc_id") == 4).collect()
    batch4 = int(doc4_rows[0]["__batch_id"])
    replay_df = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["text_hash"]) for r in doc4_rows],
        "doc_id long, ts timestamp, text_hash string",
    )
    sink(replay_df, batch4)
    sink(replay_df, batch4)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 4]


def test_decontaminate_stream_flags_overlap(spark, tmp_path):
    """Ingest-time decontamination: an arriving doc sharing >= min_shared
    distinct 3-gram shingles with a bench doc is flagged with the exact
    overlap count; clean docs pass silently. Stateless stream-static
    broadcast — restart-safe with no state directory."""
    from video_stream_processing_spark.streaming.pipeline import decontaminate_stream

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean_text = "one two three four five six seven eight nine ten"
    # 8 tokens shared with bench -> 6 shared trigram shingles
    contaminated = "alpha beta gamma delta epsilon zeta eta theta XX YY"
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    d = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    _write(
        spark,
        d,
        [(1, BASE, contaminated), (2, BASE + 1_000, clean_text)],
        "overwrite",
    )
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        decontaminate_stream(stream, bench, k=3, min_shared=5)
        .writeStream.format("memory")
        .queryName("decont")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM decont").collect()
        assert [(r["doc_id"], r["bench_id"], r["shared"]) for r in rows] == [(1, 100, 6)]
    finally:
        q.stop()


@pytest.mark.slow
def test_lsh_index_refresh_stream(spark, tmp_path):
    """Streaming twin of x106: the foreachBatch LSH-index sink, fed the
    corpus across TWO micro-batches, must emit exactly the full-corpus
    minhash near-dup pair set (each pair surfacing when its later
    member arrives, with vs_existing marking cross-batch pairs), and a
    replayed batch must land idempotently."""
    from video_stream_processing_spark.operators.dedup import minhash_lsh_neardups
    from video_stream_processing_spark.streaming.sinks import lsh_index_refresh_sink

    text_a = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill every single afternoon"
    )
    text_b = (
        "pack my box with five dozen liquor jugs while the quick onyx "
        "goblin jumps over the lazy dwarf at midnight every day"
    )
    text_c = (
        "sphinx of black quartz judge my vow as the five boxing wizards "
        "jump quickly over the frozen river each winter morning"
    )

    def filler(i):
        return (
            f"filler document number {i} carries unique content "
            f"alpha{i} beta{(i * 7) % 997} gamma{(i * 13) % 991}"
        )

    batch0 = [(1, BASE, text_a), (2, BASE + 1_000, text_a), (3, BASE + 2_000, text_c)]
    batch0 += [(100 + i, BASE + 3_000 + i, filler(i)) for i in range(10)]
    batch1 = [
        (17, BASE + 60_000, text_a),
        (27, BASE + 61_000, text_b),
        (37, BASE + 62_000, text_b),
        (4, BASE + 63_000, text_c),
    ]
    batch1 += [(200 + i, BASE + 64_000 + i, filler(10 + i)) for i in range(10)]

    d = str(tmp_path / "docs-src")
    index_dir = str(tmp_path / "band-index")
    docs_dir = str(tmp_path / "docs-landed")
    pairs_dir = str(tmp_path / "pairs")
    sink = lsh_index_refresh_sink(index_dir, docs_dir, pairs_dir)

    _write(spark, d, batch0, "overwrite")
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        stream.select("doc_id", "text")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, d, batch1, "append")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["vs_existing"], r["__batch_id"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    all_rows = [(i, t) for i, _, t in batch0 + batch1]
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_neardups(
            spark.createDataFrame(all_rows, "doc_id long, text string")
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == full
    assert (1, 2) in got and not got[(1, 2)][1]  # within batch 0
    assert (27, 37) in got and not got[(27, 37)][1]  # within batch 1
    assert got[(3, 4)][1] and got[(1, 17)][1]  # cross-batch pairs
    batch_of = {k: v[2] for k, v in got.items()}
    assert batch_of[(1, 2)] == 0 and batch_of[(3, 4)] == 1

    # replay of the LAST batch (failure between sink-write and checkpoint
    # commit): identical pair set, no duplicates, no self-cross pairs
    last_bid = max(v[2] for v in got.values())
    replay_df = (
        spark.read.parquet(docs_dir)
        .where(F.col("__batch_id") == last_bid)
        .select("doc_id", "text")
    )
    sink(replay_df, last_bid)
    again = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert again == full


@pytest.mark.slow
def test_curation_stream_gopher_dsir_twins_match_batch(spark, tmp_path):
    """Round-9 twins: the gopher_keep flag and the DSIR log-weight that
    curation_stream emits per doc are EQUAL to the batch x118/x116
    outputs on the same corpus — the model is fit offline
    (dsir_fit_log_ratios) and scored statelessly in-stream."""
    from video_stream_processing_spark.operators.text import (
        dsir_fit_log_ratios,
        dsir_weights,
        gopher_rules,
        quality_classifier,
        quality_classifier_fit,
    )
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    gopher_good = (
        "the be to of and that have with "
        + " ".join(f"word{i}" for i in range(52))
    )  # 60 words, >=2 stopwords, mean len in band -> gopher keep
    gopher_bad = "the " + " ".join(f"tok{i}" for i in range(39))  # 1 stopword
    rows = [
        (1, BASE, gopher_good),
        (2, BASE + 1_000, gopher_bad),
        (3, BASE + 2_000, gopher_good + " extra trailing words here now"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, ts_ms long, text string").select(
        "doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text"
    )
    model = dsir_fit_log_ratios(batch, F.col("doc_id") <= 1)
    qc_batch = batch.withColumn("source", F.lit("s"))
    qc_pred = F.col("doc_id") <= 1
    qc_model = quality_classifier_fit(qc_batch, qc_pred)
    b_qc = {
        r["doc_id"]: r["score"]
        for r in quality_classifier(qc_batch, qc_pred).collect()
    }
    b_gopher = {r["doc_id"]: r["keep"] for r in gopher_rules(batch).collect()}
    b_dsir = {
        r["doc_id"]: (r["log_weight"], r["selected"])
        for r in dsir_weights(batch, F.col("doc_id") <= 1).collect()
    }

    d = str(tmp_path / "docs")
    _write(spark, d, rows, "overwrite")
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        curation_stream(stream, watermark="10 minutes", dsir_model=model,
                        qc_model=qc_model)
        .writeStream.format("memory")
        .queryName("curation_twins")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM curation_twins").collect()}
    finally:
        q.stop()
    assert set(got) == {1, 2, 3}  # all pass the curation filter, none dup
    # planted gopher outcome: good docs keep, the 1-stopword doc fails
    assert got[1]["gopher_keep"] and got[3]["gopher_keep"]
    assert not got[2]["gopher_keep"]
    for i in (1, 2, 3):
        assert got[i]["gopher_keep"] == b_gopher[i], i
        assert got[i]["dsir_log_weight"] == b_dsir[i][0], i
        assert got[i]["dsir_selected"] == b_dsir[i][1], i
    # the fixed-model stream scores rank the fit's target slice (and its
    # vocabulary twin, doc 3) above the off-vocabulary doc; absolute
    # positivity needs buckets ~ corpus size (see the x116 planted test —
    # 512-bucket smoothing swamps a 3-doc fit, by design)
    assert got[1]["dsir_log_weight"] > got[2]["dsir_log_weight"]
    assert got[3]["dsir_log_weight"] > got[2]["dsir_log_weight"]
    # x119 twin: the stream's qc_score equals the batch query's score
    # column doc-for-doc (identical quality_score_col expression)
    for i in (1, 2, 3):
        assert got[i]["qc_score"] == b_qc[i], i
    assert got[1]["qc_score"] > got[2]["qc_score"]  # target-slice doc ranks higher


@pytest.mark.slow
def test_curation_stream_langid_twin_matches_batch(spark, tmp_path):
    """Round-11 twin (VERDICT r10 task 3): the stream's predicted_lang
    under a FIXED nb_langid_fit model equals the batch x120 query's
    prediction doc-for-doc — same literal log-prob arrays, scored
    statelessly per row — including across a micro-batch boundary."""
    from video_stream_processing_spark.operators.text import (
        nb_langid,
        nb_langid_fit,
    )
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    # two planted "languages" with disjoint trigram profiles; every doc
    # passes the curation filter (>= 40 words, clean ascii)
    en = "the quick brown fox and the lazy dog " + " ".join(
        f"word{i}" for i in range(40)
    )
    # "the" twice so the zz docs pass the stopword curation rule; the
    # trigram mass stays overwhelmingly zq/zx so langid still separates
    zz = "the zqx vzq the xqz zzv qzz " + " ".join(f"zq{i}x" for i in range(40))
    rows1 = [(1, BASE, en, "en"), (2, BASE + 1_000, zz, "zz")]
    rows2 = [(3, BASE + 2_000, en + " tail", "en"), (4, BASE + 3_000, zz + " zqt", "zz")]
    all_rows = rows1 + rows2
    batch = spark.createDataFrame(
        all_rows, "doc_id long, ts_ms long, text string, lang string"
    ).select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text", "lang")

    model = nb_langid_fit(batch)
    b_pred = {
        r["doc_id"]: r["predicted_lang"] for r in nb_langid(batch).collect()
    }
    assert b_pred == {1: "en", 2: "zz", 3: "en", 4: "zz"}  # planted separation

    def _w(rows, mode):
        (
            spark.createDataFrame(rows, "doc_id long, ts_ms long, text string, lang string")
            .select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text")
            .coalesce(1)
            .write.mode(mode)
            .parquet(str(tmp_path / "docs"))
        )

    _w(rows1, "overwrite")
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        str(tmp_path / "docs")
    )
    q = (
        curation_stream(stream, watermark="10 minutes", langid_model=model)
        .writeStream.format("memory")
        .queryName("langid_twin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _w(rows2, "append")  # second micro-batch crosses a batch boundary
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["predicted_lang"]
            for r in spark.sql("SELECT * FROM langid_twin").collect()
        }
    finally:
        q.stop()
    assert got == b_pred  # stream == batch, label-for-label


@pytest.mark.slow
def test_curation_stream_html_extracts_before_filters(spark, tmp_path):
    """Round-11 (VERDICT r10 task 3 rider): with html_col set, the
    stream runs x127's extractor FIRST — boilerplate nav/promo never
    reaches the dedup hash or token count, and the emitted text_hash
    equals md5(normalize(main_text)) computed in batch over the same
    markup (shared main_text_col expression)."""
    from video_stream_processing_spark.operators.html import (
        main_text_col,
        synth_markup_col,
    )
    from video_stream_processing_spark.operators.text import normalize_col
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    body = "the " + " ".join(f"word{i}" for i in range(45))
    rows = [(6, BASE, body), (7, BASE + 1_000, body + " more trailing words")]
    base_df = spark.createDataFrame(rows, "doc_id long, ts_ms long, text string")
    marked = base_df.select(
        "doc_id",
        F.timestamp_millis("ts_ms").alias("ts"),
        synth_markup_col().alias("html"),
    )
    # batch expectation: extract -> normalize -> md5, via the same exprs
    expect = {
        r["doc_id"]: (r["h"], r["main_text"])
        for r in marked.select(
            "doc_id",
            main_text_col("html").alias("main_text"),
        )
        .select(
            "doc_id",
            "main_text",
            F.md5(normalize_col("main_text")).alias("h"),
        )
        .collect()
    }
    for doc_id, (_, mt) in expect.items():
        assert body in mt, doc_id  # the real paragraph survives
        assert "Buy now" not in mt and "Home" not in mt  # boilerplate gone

    d = str(tmp_path / "markup")
    marked.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema("doc_id long, ts timestamp, html string").parquet(d)
    q = (
        curation_stream(stream, watermark="10 minutes", html_col="html")
        .writeStream.format("memory")
        .queryName("html_twin")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM html_twin").collect()}
    finally:
        q.stop()
    assert set(got) == {6, 7}
    for doc_id in (6, 7):
        assert got[doc_id]["text_hash"] == expect[doc_id][0], doc_id


@pytest.mark.slow
def test_curation_stream_unigram_pieces_twin_matches_batch(spark, tmp_path):
    """x129 twin: the stream's n_pieces under a FIXED x128-trained
    vocab equals the batch unigram_tokenize count doc-for-doc (shared
    unigram_pieces_col expression)."""
    from video_stream_processing_spark.operators.unigram import (
        train_unigram,
        unigram_tokenize,
    )
    from video_stream_processing_spark.streaming.pipeline import curation_stream

    body = "the banana bandana cabana " + " ".join(f"word{i}" for i in range(40))
    rows = [(1, BASE, body), (2, BASE + 1_000, body + " banana banana")]
    batch = spark.createDataFrame(rows, "doc_id long, ts_ms long, text string").select(
        "doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text"
    )
    vocab = {p: lp for p, _, lp in train_unigram(batch, sample_mod=1)}
    b_pieces = {
        r["doc_id"]: r["n_pieces"] for r in unigram_tokenize(batch, vocab).collect()
    }

    d = str(tmp_path / "docs")
    _write(spark, d, rows, "overwrite")
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        curation_stream(stream, watermark="10 minutes", unigram_vocab=vocab)
        .writeStream.format("memory")
        .queryName("unigram_twin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["n_pieces"]
            for r in spark.sql("SELECT * FROM unigram_twin").collect()
        }
    finally:
        q.stop()
    assert got == b_pieces


@pytest.mark.slow
def test_fertility_stream_twin_matches_batch_across_microbatches(spark, tmp_path):
    """x134 twin: per-window fertility accumulated across TWO separate
    micro-batches equals the batch aggregate over the same rows (shared
    unigram_pieces_col / TOKEN_RE expressions; integer sums, so the
    cross-micro-batch accumulation cannot drift)."""
    from video_stream_processing_spark.operators.bpe import _word_tokens
    from video_stream_processing_spark.operators.unigram import (
        train_unigram,
        unigram_pieces_col,
    )
    from video_stream_processing_spark.streaming.pipeline import fertility_stream

    body = "the banana bandana cabana " + " ".join(f"word{i}" for i in range(30))
    # two event-time windows; rows 3/4 arrive in a LATER micro-batch
    rows1 = [(1, BASE, body), (2, BASE + 1_000, body + " banana")]
    rows2 = [(3, BASE + 2_000, body + " cabana cabana"), (4, BASE + 400_000, body)]
    batch_all = spark.createDataFrame(
        rows1 + rows2, "doc_id long, ts_ms long, text string"
    ).select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "text")
    vocab = {p: lp for p, _, lp in train_unigram(batch_all, sample_mod=1)}
    expected = {
        r["window_start"]: (r["n_docs"], r["n_words"], r["n_pieces"], r["fertility"])
        for r in batch_all.select(
            "ts",
            F.size(_word_tokens("text")).cast("long").alias("n_tokens"),
            unigram_pieces_col(vocab, "text").alias("n_pieces"),
        )
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.round(
                F.sum("n_pieces").cast("double") / F.sum("n_tokens").cast("double"), 4
            ).alias("fertility"),
        )
        .select(F.col("w.start").alias("window_start"), "n_docs", "n_words", "n_pieces", "fertility")
        .collect()
    }
    assert len(expected) == 2  # the fixture really spans two windows

    d = str(tmp_path / "docs")
    _write(spark, d, rows1, "overwrite")
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    q = (
        fertility_stream(stream, vocab, watermark="10 minutes", window="5 minutes")
        .writeStream.format("memory")
        .queryName("fertility_twin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, d, rows2, "append")  # second micro-batch
        q.processAllAvailable()
        got = {
            r["window_start"]: (r["n_docs"], r["n_words"], r["n_pieces"], r["fertility"])
            for r in spark.sql("SELECT * FROM fertility_twin").collect()
        }
    finally:
        q.stop()
    assert got == expected
