"""Segment windows — the reference's per-key 3-minute frame buffering that
emits one VideoSegment per window (VideoSegmentBuffer.java:38-105, driven
by VideoProcessFunction.java:87-100; duration default 180000 ms,
application.properties:34).

Two semantics (SURVEY.md §2.6(c)):

- ``segment_windows_aligned``: idiomatic Spark — epoch-aligned tumbling
  windows via ``F.window``; a pure groupBy aggregation with map-side
  partial aggregation, oracle-checkable. This is the declared-query form
  and the scalable default (no per-key sequential state).
- ``segment_windows_exact`` (operators/segments_exact.py semantics inside
  streaming/stateful.py for the stream case): first-arrival-aligned and
  trigger-inclusive like the reference — window start = first buffered
  frame's ts; a frame arriving >= duration after the start CLOSES the
  window and is included in it. Sequential per key => applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEGMENT_MS = 180_000  # video.segment.duration (application.properties:34)


def segment_windows_aligned(
    frames: DataFrame,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    duration_ms: int = DEFAULT_SEGMENT_MS,
    size_col: str | None = None,
) -> DataFrame:
    """Epoch-aligned tumbling-window segment aggregation.

    Emits the VideoSegment shape (SURVEY.md §1.4 `segments`): start/end of
    observed frames, frame_count, duration, and (if ``size_col`` given)
    the byte size the ffmpeg stage would consume.
    """
    win = F.window(F.col(ts_col), f"{duration_ms // 1000} seconds")
    aggs = [
        F.count(F.lit(1)).alias("frame_count"),
        F.min(ts_col).alias("start_time"),
        F.max(ts_col).alias("end_time"),
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))).alias("duration_ms"),
    ]
    out_cols = ["frame_count", "start_time", "end_time", "duration_ms"]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("file_size"))
        out_cols.append("file_size")
    return (
        frames.groupBy(F.col(key_col), win.alias("w"))
        .agg(*aggs)
        .select(F.col(key_col), F.col("w.start").alias("window_start"), *out_cols)
    )


def segment_windows_exact(
    frames: DataFrame,
    key_col: str = "stream_id",
    ts_col: str = "ts",
    duration_ms: int = DEFAULT_SEGMENT_MS,
) -> DataFrame:
    """Exact reference semantics, batch form.

    Window start = first frame's payload ts; a frame with
    ts - start >= duration closes the segment and is INCLUDED in it
    (add-then-check, VideoProcessFunction.java:88-91); the next segment
    starts at the next frame. The final partial buffer IS emitted here
    (batch flushes the tail; the reference's streaming job loses it —
    SURVEY.md §2.6(g), documented deviation).

    Sequential recurrence per key => applyInPandas (Arrow-batched); one
    shuffle on the key, state bounded by one key's frames per task.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} string, start_time timestamp, end_time timestamp, "
        "frame_count int, duration_ms long"
    )

    def bufferize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
        # Skip-scan with searchsorted: O(n_segments log n) instead of a
        # per-row Python loop. Trigger index = first j with
        # ts[j] >= ts[start] + duration (strictly > start since dur > 0);
        # the trigger frame CLOSES the segment and is included in it.
        rows = []
        i, n = 0, len(ts_ms)
        while i < n:
            j = int(np.searchsorted(ts_ms, ts_ms[i] + duration_ms, side="left"))
            if j < n:
                rows.append((i, j))
                i = j + 1
            else:
                rows.append((i, n - 1))  # tail buffer, flushed in batch
                break
        if not rows:
            return pd.DataFrame(
                columns=[key_col, "start_time", "end_time", "frame_count", "duration_ms"]
            )
        s_idx = np.fromiter((s for s, _ in rows), dtype=np.int64)
        e_idx = np.fromiter((e for _, e in rows), dtype=np.int64)
        ts_vals = pdf[ts_col].to_numpy()
        return pd.DataFrame(
            {
                key_col: str(key[0]),
                "start_time": ts_vals[s_idx],
                "end_time": ts_vals[e_idx],
                "frame_count": (e_idx - s_idx + 1).astype("int32"),
                "duration_ms": ts_ms[e_idx] - ts_ms[s_idx],
            }
        )

    return frames.groupBy(key_col).applyInPandas(bufferize, schema=out_schema)
