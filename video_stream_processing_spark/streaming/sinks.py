"""Streaming sinks — foreachBatch fan-out mirroring the reference's two
sink paths (SURVEY.md §2.1 #3-#5, §3.3):

- detections fact -> partitioned parquet table (the Doris Stream-Load
  analog: DorisSinkBuilder.java:25-95 buffers NDJSON on a 5 s flush;
  our analog is the micro-batch commit of a partitioned columnar table,
  exactly-once via the checkpoint + deterministic batch paths);
- segments -> object storage layout `videos/{stream}/{yyyyMMdd/HH}/
  {stream}_{startMs}.mp4` (MinIOVideoSink.java:50-59 / OSSVideoSink
  key format), with the ffmpeg encode behind a pluggable
  ``SegmentEncoder`` (FFmpegUtils.java:137-189 shells out to ffmpeg;
  correctness tests use the no-op encoder, SURVEY.md §3.3).

Both sinks are plain functions over (batch_df, batch_id) so they are
unit-testable without a streaming query.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_detections_fact(out_dir: str):
    """foreachBatch sink: append micro-batch to a parquet fact table
    partitioned by (stream_id, date_key, hour_key) — the layout the
    Doris DDL encodes with DISTRIBUTED BY HASH(stream_id) + bitmap
    indexes (reference README.md:94-104), expressed as partition pruning."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("date_key", F.date_format("detection_time", "yyyyMMdd"))
            .withColumn("hour_key", F.date_format("detection_time", "HH"))
            .write.partitionBy("stream_id", "date_key", "hour_key")
            .mode("append")
            .parquet(out_dir)
        )

    return sink


def write_detections_fact_idempotent(out_dir: str):
    """Exactly-once variant of the fact sink: every micro-batch writes to
    a batch-id-keyed partition directory with OVERWRITE semantics, so a
    batch replayed after a failure between sink-write and checkpoint
    commit lands in the same place instead of appending duplicates —
    idempotent-sink + checkpoint = end-to-end exactly-once (the
    reference's Doris stream-load relies on Doris label dedup for the
    same guarantee; DorisSinkBuilder retry config :64).

    Readers use ``out_dir`` as a normal parquet table; `__batch_id` is
    just another partition column (prune or drop it)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("date_key", F.date_format("detection_time", "yyyyMMdd"))
            .withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id", "stream_id", "date_key")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return sink


def write_docs_idempotent(out_dir: str):
    """Generic idempotent foreachBatch sink for document-shaped streams
    (the incremental-dedup twin's landing table): every micro-batch
    overwrites its own batch-id-keyed partition, so a replay after a
    failure between sink-write and checkpoint commit lands in the same
    place instead of appending duplicates. Same exactly-once mechanism
    as write_detections_fact_idempotent, schema-agnostic."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return sink


def lsh_index_refresh_sink(
    index_dir: str,
    docs_dir: str,
    pairs_dir: str,
    text_col: str = "text",
    threshold: float | None = None,
):
    """foreachBatch sink — the STREAMING twin of x106
    (operators/dedup.py:incremental_lsh_neardups): maintains a stored
    LSH band index across micro-batches and emits, per batch, the
    near-dup pairs that batch INTRODUCES (vs all earlier batches, and
    within itself).

    Per micro-batch (docs with (doc_id, ``text_col``)):
    1. land the batch's docs at ``docs_dir`` (batch-id partition,
       dynamic overwrite — replay lands in place);
    2. minhash+band ONLY the batch's docs; candidates = batch bands
       equi-joined against the STORED index's earlier-batch partitions
       (``__batch_id < batch_id`` — partition-pruned, and the guard that
       makes a replayed batch skip its own already-written bands), plus
       the in-batch bucket self-join;
    3. exact-Jaccard verification joins candidate doc ids back to the
       landed docs table (bodies re-read for CANDIDATES only — keyed
       join, never a corpus re-hash);
    4. append the batch's bands to the index and the verified pairs to
       ``pairs_dir``, both batch-id-keyed dynamic overwrite, so
       replay after a failure between sink-write and checkpoint commit
       is idempotent end-to-end.

    The union of all batches' emitted pairs equals the FULL-corpus
    ``minhash_lsh_neardups`` pair set over the streamed docs (each pair
    surfaces exactly when its later member arrives) — pinned by
    tests/test_curation_stream.py::test_lsh_index_refresh_stream."""
    from video_stream_processing_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        SHINGLE_K,
        _band_buckets,
        _bucket_join,
        _exact_jaccard_on_candidates,
        _minhash_wide,
    )

    thr = JACCARD_THRESHOLD if threshold is None else threshold

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # scoped checkpoint release: each micro-batch creates eager
        # localCheckpoints (batch docs, band table, candidate verify)
        # whose blocks the async ContextCleaner frees too slowly — a
        # long-running stream would accumulate one block set per batch.
        # Snapshot the persistent ids on entry and unpersist only what
        # this batch created once its writes are committed.
        from video_stream_processing_spark.session import (
            release_since,
            snapshot_persistent_ids,
        )

        pre_ids = snapshot_persistent_ids(spark)
        batch_df = batch_df.localCheckpoint(eager=True)
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(docs_dir)
        )
        bands = _band_buckets(_minhash_wide(batch_df, text_col)).localCheckpoint(
            eager=True
        )
        in_batch = _bucket_join(bands).withColumn("vs_existing", F.lit(False))
        try:
            prior = spark.read.parquet(index_dir).where(F.col("__batch_id") < batch_id)
        except Exception:  # first batch: no index yet
            prior = None
        if prior is not None:
            cross = (
                bands.alias("s")
                .join(prior.alias("b"), ["band_id", "band_key"])
                .select(
                    F.least(F.col("s.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                    F.greatest(F.col("s.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                )
                .distinct()
                .withColumn("vs_existing", F.lit(True))
            )
            cand = cross.unionByName(in_batch)
        else:
            cand = in_batch
        (
            bands.withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(index_dir)
        )
        all_docs = spark.read.parquet(docs_dir).where(F.col("__batch_id") <= batch_id)
        # candidates-only verify (shared batch helper): shingle ONLY docs
        # in a candidate pair — the previous inline form tokenized the
        # WHOLE landed corpus once per join branch every micro-batch,
        # exactly the corpus re-hash the docstring forbids
        pairs = _exact_jaccard_on_candidates(
            cand, all_docs, text_col, SHINGLE_K, thr
        ).select("doc_a", "doc_b", "jaccard", "vs_existing")
        (
            pairs.withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(pairs_dir)
        )
        # collect_gc=False: no full driver GC on the micro-batch critical
        # path — the unpersist walk alone frees the executor blocks
        release_since(spark, pre_ids, collect_gc=False)

    return sink


def write_detections_ndjson(out_dir: str):
    """foreachBatch sink emitting the reference's LITERAL wire format:
    one JSON object per line (`format=json` + `read_json_by_line=true`
    Stream-Load properties, DorisSinkBuilder.java:62-65; the hand-built
    JSON shape of convertToJson :100-124 with detection_time rendered
    `yyyy-MM-dd HH:mm:ss`)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cols = [c for c in batch_df.columns if c != "detection_time"]
        (
            batch_df.select(
                F.to_json(
                    F.struct(
                        F.date_format("detection_time", "yyyy-MM-dd HH:mm:ss").alias(
                            "detection_time"
                        ),
                        *cols,
                    )
                ).alias("value")
            )
            .write.mode("append")
            .text(out_dir)
        )

    return sink


def object_key(stream_id: str, start_ms: int, date_part: str) -> str:
    """`videos/{stream}/{yyyyMMdd/HH}/{stream}_{startMs}.mp4`
    (MinIOVideoSink.java:50-59)."""
    return f"videos/{stream_id}/{date_part}/{stream_id}_{start_ms}.mp4"


class SegmentEncoder:
    """Pluggable encode step (the one stage with no Spark-native
    expression — SURVEY.md §3.3). Implementations run on executors
    inside foreachBatch."""

    def encode(self, stream_id: str, start_ms: int, frame_count: int) -> tuple[str, int]:
        """Returns (local_path, file_size). Overridden by real encoders."""
        raise NotImplementedError


class NoopEncoder(SegmentEncoder):
    """Correctness-test encoder: no ffmpeg, deterministic fake size."""

    def encode(self, stream_id: str, start_ms: int, frame_count: int) -> tuple[str, int]:
        return (f"/tmp/{stream_id}_{start_ms}.mp4", frame_count * 1024)


class FFmpegEncoder(SegmentEncoder):
    """Real path: dump frames, shell out exactly like FFmpegUtils.java:164-167
    (`ffmpeg -framerate 25 -i frame_%05d.jpg -c:v libx264 -pix_fmt yuv420p
    -b:v 2048k out.mp4 -y`), stat the file, clean up.

    ``frame_pattern`` defaults to the reference's jpg sequence; tests feed
    numpy-written BMPs (no image lib needed) via ``frame_%05d.bmp`` —
    same command shape, codec-agnostic input demuxer. Exercised by
    tests/test_ffmpeg_encoder.py (skips where ffmpeg is absent)."""

    def __init__(
        self,
        workdir: str = "/tmp/vsp-segments",
        bitrate: str = "2048k",
        fps: int = 25,
        frame_pattern: str = "frame_%05d.jpg",
    ):
        self.workdir, self.bitrate, self.fps = workdir, bitrate, fps
        self.frame_pattern = frame_pattern

    def encode(self, stream_id: str, start_ms: int, frame_count: int) -> tuple[str, int]:
        out = os.path.join(self.workdir, f"{stream_id}_{start_ms}.mp4")
        cmd = [
            "ffmpeg", "-framerate", str(self.fps),
            "-i", os.path.join(self.workdir, self.frame_pattern),
            "-c:v", "libx264", "-pix_fmt", "yuv420p", "-b:v", self.bitrate, out, "-y",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return out, os.path.getsize(out)


def write_segments(out_dir: str, encoder: SegmentEncoder | None = None, idempotent: bool = False):
    """foreachBatch sink for segment metadata: derive the object key,
    run the (pluggable) encoder per segment via a mapInPandas pass, and
    land the `segments` metadata table (SURVEY.md §1.4).

    ``idempotent=True`` writes each micro-batch into a batch-id-keyed
    partition with dynamic OVERWRITE (mirroring
    write_detections_fact_idempotent): a batch replayed after a failure
    between sink-write and checkpoint commit lands in the same partition
    instead of appending duplicate segment rows (and the object keys it
    derives are themselves deterministic in (stream, start_ms), so the
    re-encoded object upload overwrites rather than duplicates —
    exactly the replay behavior of the reference's keyed MinIO put,
    MinIOVideoSink.java:50-76)."""
    encoder = encoder or NoopEncoder()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        def encode_rows(batches):
            for pdf in batches:
                paths, sizes = [], []
                for r in pdf.itertuples():
                    start_ms = int(pd.Timestamp(r.start_time).value // 1_000_000)
                    p, s = encoder.encode(str(r.stream_id), start_ms, int(r.frame_count))
                    paths.append(p)
                    sizes.append(s)
                pdf = pdf.copy()
                pdf["local_file_path"] = paths
                pdf["file_size"] = sizes
                yield pdf

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in batch_df.schema.fields
        ) + ", local_file_path string, file_size long"
        encoded = batch_df.mapInPandas(encode_rows, schema=schema)
        with_key = encoded.withColumn(
            "object_key",
            F.concat(
                F.lit("videos/"), F.col("stream_id"), F.lit("/"),
                F.date_format("start_time", "yyyyMMdd/HH"), F.lit("/"),
                F.col("stream_id"), F.lit("_"),
                F.unix_millis(F.col("start_time")).cast("string"), F.lit(".mp4"),
            ),
        )
        if idempotent:
            (
                with_key.withColumn("__batch_id", F.lit(batch_id))
                .write.partitionBy("__batch_id", "stream_id")
                .mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(out_dir)
            )
        else:
            with_key.write.mode("append").parquet(out_dir)

    return sink


def write_segments_idempotent(out_dir: str, encoder: SegmentEncoder | None = None):
    """Exactly-once segments sink (batch-id dynamic-overwrite partitions)."""
    return write_segments(out_dir, encoder, idempotent=True)
