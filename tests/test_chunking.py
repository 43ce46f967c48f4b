"""CDC chunker (operators/chunking.py) — the property that justifies
content-defined over fixed-size chunking: boundaries re-synchronize
after an edit, so distant unchanged regions keep their chunk hashes."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from video_stream_processing_spark.operators.chunking import (
    MODULUS,
    _boundaries,
    cdc_chunks,
)


def _chunks_of(text: str) -> list[str]:
    cp = np.fromiter((ord(c) for c in text), dtype=np.int64, count=len(text))
    b = _boundaries(cp)
    starts = np.flatnonzero(np.concatenate(([True], b[:-1])))
    ends = np.append(starts[1:], len(text))
    return [text[s:e] for s, e in zip(starts, ends)]


def test_chunks_reassemble_exactly():
    text = "the quick brown fox jumps over the lazy dog " * 20
    assert "".join(_chunks_of(text)) == text


def test_insertion_resynchronizes():
    """Editing the head of a long text must leave the tail's chunks
    identical — the CDC guarantee fixed-size chunking lacks."""
    rng = np.random.default_rng(7)
    base = "".join(chr(rng.integers(97, 123)) for _ in range(4000))
    edited = "INSERTED-PREFIX-" + base
    c1, c2 = _chunks_of(base), _chunks_of(edited)
    # all boundaries depend on only 4 trailing chars, so after the edit
    # region the chunk streams must converge; require most tail chunks
    # shared (identity of content => identity of hash)
    shared = set(c1) & set(c2)
    assert len(shared) >= 0.8 * len(c1)
    # and specifically the LAST chunks are identical
    assert c1[-5:] == c2[-5:]


def test_expected_chunk_length_near_modulus():
    rng = np.random.default_rng(11)
    text = "".join(chr(rng.integers(97, 123)) for _ in range(20000))
    chunks = _chunks_of(text)
    mean = len(text) / len(chunks)
    assert MODULUS / 2 < mean < MODULUS * 2


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), min_size=1, max_size=500))
def test_partition_property(text):
    chunks = _chunks_of(text)
    assert "".join(chunks) == text
    assert all(len(c) > 0 for c in chunks)


def test_spark_chunker_matches_local(spark):
    docs = spark.createDataFrame(
        [(0, "abcdef " * 50), (1, ""), (2, None), (3, "xyz")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # empty/null -> no chunks
    local = _chunks_of("abcdef " * 50)
    got = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["chunk_len"] for r in got] == [len(c) for c in local]
    import hashlib

    assert [r["chunk_md5"] for r in got] == [
        hashlib.md5(c.encode()).hexdigest() for c in local
    ]


def test_streaming_chunk_ingest_dedup(spark, tmp_path):
    """Storage-ingest dedup as a stream: chunk each arriving doc and
    drop chunk hashes already seen within the watermark — a replayed
    near-identical doc (shifted offsets) contributes ONLY its genuinely
    new chunks, the CDC property end to end under Structured Streaming."""
    from datetime import datetime, timedelta

    from video_stream_processing_spark.operators.chunking import cdc_chunks

    rng = np.random.default_rng(3)
    base = "".join(chr(rng.integers(97, 123)) for _ in range(3000))
    edited = "PREFIX-EDIT " + base  # same tail chunks, new head chunk(s)
    t0 = datetime(2024, 1, 1)
    d = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [(0, t0, base)], "doc_id long, ts timestamp, text string"
    ).write.mode("overwrite").parquet(d + "/b1")
    spark.createDataFrame(
        [(1, t0 + timedelta(minutes=1), edited)],
        "doc_id long, ts timestamp, text string",
    ).write.mode("overwrite").parquet(d + "/b2")

    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(d + "/b*")
    unique = (
        cdc_chunks(stream, ts_col="ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["chunk_md5"])
    )
    q = (
        unique.writeStream.format("memory")
        .queryName("chunkstream")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM chunkstream").collect()
    finally:
        q.stop()

    batch_base = {r["chunk_md5"] for r in cdc_chunks(
        spark.createDataFrame([(0, base)], "doc_id long, text string")).collect()}
    batch_edit = {r["chunk_md5"] for r in cdc_chunks(
        spark.createDataFrame([(1, edited)], "doc_id long, text string")).collect()}
    emitted = {r["chunk_md5"] for r in rows}
    # everything emitted, exactly once, and doc 1 contributed only its novel chunks
    assert emitted == batch_base | batch_edit
    assert len(rows) == len(emitted)
    doc1_rows = [r for r in rows if r["doc_id"] == 1]
    assert {r["chunk_md5"] for r in doc1_rows} == batch_edit - batch_base
    assert 0 < len(doc1_rows) < len(batch_edit)  # most chunks deduped away


def test_megabyte_document_is_bounded(spark):
    """A single huge row chunks vectorized without group materialization
    concerns — ~16k chunks from one 1 MB doc, contents reassembling."""
    rng = np.random.default_rng(5)
    big = "".join(chr(c) for c in rng.integers(97, 123, size=1_000_000))
    df = spark.createDataFrame([(0, big)], "doc_id long, text string")
    out = cdc_chunks(df)
    from pyspark.sql import functions as F

    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("chunk_len").alias("total")
    ).collect()[0]
    assert agg["total"] == len(big)
    assert agg["n"] > 5_000  # boundaries actually fired
