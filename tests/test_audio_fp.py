"""Audio fingerprint near-dup (x139 building blocks): afp64 properties
and the planted-copy guarantee through the real WAV codec."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from video_stream_processing_spark.functions.wavcodec import decode_wav, encode_wav
from video_stream_processing_spark.operators.audio import afp64, audio_fingerprints
from video_stream_processing_spark.operators.dedup import banded_hamming_pairs


def _clip(seed: int, n: int = 136) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-2000, 2001, size=(n, 1)).astype(np.int64)


def test_afp64_is_64_bits_and_codec_stable():
    c = _clip(0)
    sig = afp64(c)
    assert len(sig) == 64 and set(sig) <= {"0", "1"}
    # encode -> decode round trip must not change the fingerprint
    dec, rate = decode_wav(encode_wav(c, sample_rate=8000))
    assert afp64(dec) == sig


def test_afp64_short_clip_returns_none():
    assert afp64(_clip(1, n=100)) is None


def test_afp64_sparse_jitter_flips_few_bits():
    c = _clip(2)
    j = c.copy()
    j[::13, 0] += 2
    ham = sum(a != b for a, b in zip(afp64(c), afp64(j)))
    assert ham <= 3


def test_planted_audio_copy_found_distinct_not(spark):
    base = _clip(10)
    jit = base.copy()
    jit[::13, 0] += 1
    other = _clip(99)
    rows = [
        (0, bytearray(encode_wav(base, sample_rate=8000))),
        (1, bytearray(encode_wav(jit, sample_rate=8000))),
        (2, bytearray(encode_wav(other, sample_rate=8000))),
        (3, bytearray(b"RIFF junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = audio_fingerprints(df)
    got = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert got[3] is None  # decode-or-null
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in banded_hamming_pairs(sig.where(F.col("sig").isNotNull())).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs


import pytest


@pytest.mark.slow
def test_audio_neardup_stream_suppresses_jittered_copy_vs_index(spark, tmp_path):
    """Streaming NEAR-dup ingest gate for audio, stream==batch pinned
    across a micro-batch boundary: an amplitude-jittered (Hamming <= 3)
    copy of an indexed clip is suppressed by the stream-static band
    join in EITHER micro-batch; a distinct clip passes; an exact
    in-stream replay in a later micro-batch is suppressed by the
    watermark-bounded exact gate; undecodable bytes drop."""
    from video_stream_processing_spark.streaming.pipeline import (
        audio_neardup_dedup_stream,
    )

    BASE = 1_700_000_000_000
    clip_a, clip_b, clip_c = _clip(50), _clip(51), _clip(52)

    def jit(c: np.ndarray, step: int) -> np.ndarray:
        j = c.copy()
        j[::13, 0] += step
        return j

    index_sig = spark.createDataFrame(
        [(100, afp64(clip_a))], "doc_id long, sig string"
    )
    batch1 = [
        (1, BASE, bytearray(encode_wav(jit(clip_a, 1), sample_rate=8000))),
        (2, BASE + 1_000, bytearray(encode_wav(clip_b, sample_rate=8000))),
    ]
    batch2 = [
        (3, BASE + 2_000, bytearray(encode_wav(jit(clip_a, 2), sample_rate=8000))),
        (4, BASE + 3_000, bytearray(encode_wav(clip_b, sample_rate=8000))),
        (5, BASE + 4_000, bytearray(encode_wav(clip_c, sample_rate=8000))),
        (6, BASE + 5_000, bytearray(b"RIFF junk")),
    ]

    def _w(rows, mode):
        (
            spark.createDataFrame(rows, "doc_id long, ts_ms long, payload binary")
            .select("doc_id", F.timestamp_millis("ts_ms").alias("ts"), "payload")
            .coalesce(1)
            .write.mode(mode)
            .parquet(str(tmp_path / "clips"))
        )

    _w(batch1, "overwrite")
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, payload binary"
    ).parquet(str(tmp_path / "clips"))
    q = (
        audio_neardup_dedup_stream(stream, index_sig, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("audio_neardup")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _w(batch2, "append")
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.sql("SELECT * FROM audio_neardup").collect()
        )
    finally:
        q.stop()

    # batch reference: same semantics brute-forced over the arrivals
    idx_sigs = [afp64(clip_a)]
    seen, expected = set(), []
    for doc_id, _, payload in batch1 + batch2:
        decoded = decode_wav(bytes(payload))
        if decoded is None:
            continue
        s = afp64(decoded[0])
        if s is None:
            continue
        if any(sum(a != b for a, b in zip(s, t)) <= 3 for t in idx_sigs):
            continue
        if s in seen:
            continue
        seen.add(s)
        expected.append(doc_id)
    assert expected == [2, 5]  # fixture sanity
    assert got == expected
