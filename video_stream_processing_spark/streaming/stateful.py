"""Stateful streaming operators — exact reference semantics in
Structured Streaming via ``applyInPandasWithState``.

Two stateful pieces mirror the reference's KeyedProcessFunction
(/root/reference/src/main/java/com/video/streaming/function/
VideoProcessFunction.java):

- keyframe gate: per-key (lastKeyFrameTime, previousSignal) state
  (KeyFrameExtractor.java:53-82), intent semantics per key — NOT the
  reference's per-subtask shared state bug (SURVEY.md §2.6(b));
- segment buffer: first-arrival-aligned, trigger-INCLUSIVE 3-minute
  windows (VideoSegmentBuffer.java:38-105, add-then-check order at
  VideoProcessFunction.java:88-91), with an event-time timeout flushing
  the tail buffer — fixing the reference's tail-data loss (§2.6(g)).

State is (start_ms, count, min_ts, max_ts [, last_kf_ms, prev_signal])
tuples — O(1) per key, NOT the buffered frame list the reference
snapshots; Structured Streaming's state store checkpoints it correctly
by construction (the reference's restore path is dead code, §2.6(d)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEGMENT_STATE_SCHEMA = "start_ms long, frame_count long, min_ms long, max_ms long"
SEGMENT_OUT_SCHEMA = (
    "stream_id string, start_time timestamp, end_time timestamp, "
    "frame_count int, duration_ms long, closed_by string"
)

KEYFRAME_STATE_SCHEMA = "last_kf_ms long, prev_signal double"
KEYFRAME_OUT_SCHEMA = "stream_id string, ts timestamp, scene_signal double, is_keyframe boolean"


def segment_stateful_fn(duration_ms: int = 180_000, watermark_close: bool = True):
    """Returns the applyInPandasWithState function for exact segments.

    Trigger-inclusive close: the frame that is >= duration past the
    buffer start CLOSES the segment and is counted inside it; the next
    segment starts at the NEXT frame (VideoProcessFunction.java:87-100).
    Event-time timeout emits the tail segment when the watermark passes.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ms, cnt, mn, mx = state.get
                state.remove()
                yield _segment_row(stream_id, mn, mx, cnt, "timeout")
            return

        if state.exists:
            start_ms, cnt, mn, mx = state.get
        else:
            start_ms, cnt, mn, mx = None, 0, None, None

        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        for t in ts_ms:
            if start_ms is None:
                start_ms, cnt, mn, mx = t, 1, t, t
                continue
            cnt += 1
            mn, mx = min(mn, t), max(mx, t)
            if t - start_ms >= duration_ms:  # add-then-check, inclusive
                out.append((stream_id, mn, mx, cnt, "size"))
                start_ms, cnt, mn, mx = None, 0, None, None

        if start_ms is not None:
            state.update((start_ms, cnt, mn, mx))
            if watermark_close:
                # flush the tail once the watermark passes start+duration
                state.setTimeoutTimestamp(start_ms + duration_ms)
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(
                [
                    {
                        "stream_id": s,
                        "start_time": pd.Timestamp(mn_, unit="ms"),
                        "end_time": pd.Timestamp(mx_, unit="ms"),
                        "frame_count": int(c),
                        "duration_ms": int(mx_ - mn_),
                        "closed_by": why,
                    }
                    for (s, mn_, mx_, c, why) in out
                ]
            )

    return fn


def _segment_row(stream_id, mn, mx, cnt, why) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "stream_id": stream_id,
                "start_time": pd.Timestamp(mn, unit="ms"),
                "end_time": pd.Timestamp(mx, unit="ms"),
                "frame_count": int(cnt),
                "duration_ms": int(mx - mn),
                "closed_by": why,
            }
        ]
    )


def keyframe_stateful_fn(min_interval_ms: int = 5_000, scene_threshold: float = 0.3):
    """Per-key keyframe gate with true keyed state (the reference's
    INTENT; its implementation shares state across keys per subtask —
    documented deviation, SURVEY.md §2.6(b)).

    Keep a frame iff (a) >= min_interval since last keyframe, or (b)
    |signal - prev_signal| > threshold (scene change). First frame of a
    key is always a keyframe (no previous state)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout registered
            return
        last_kf_ms, prev_signal = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts", kind="mergesort")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        signals = rows["scene_signal"].tolist()
        flags = []
        for t, sig in zip(ts_ms, signals):
            interval_ok = last_kf_ms is None or (t - last_kf_ms) >= min_interval_ms
            scene_change = prev_signal is not None and abs(sig - prev_signal) > scene_threshold
            is_kf = bool(interval_ok or scene_change)
            if is_kf:
                last_kf_ms = t
            prev_signal = sig
            flags.append(is_kf)
        state.update((last_kf_ms, float(prev_signal) if prev_signal is not None else None))
        out = rows[["ts", "scene_signal"]].copy()
        out.insert(0, "stream_id", stream_id)
        out["is_keyframe"] = flags
        yield out

    return fn


KEYFRAME_BYTES_STATE_SCHEMA = "last_kf_ms long, prev_hist array<double>"
KEYFRAME_BYTES_OUT_SCHEMA = (
    "stream_id string, ts timestamp, scene_sim double, is_keyframe boolean"
)


def keyframe_bytes_stateful_fn(
    min_interval_ms: int = 5_000,
    scene_threshold: float = 0.3,
    histogram: str = "bytes",
):
    """Binary-driven keyframe gate: per-key state carries the PREVIOUS
    frame's histogram (the reference's ``previousFrame`` field,
    KeyFrameExtractor.java:31,81) plus lastKeyFrameTime. Semantics match
    operators/scene.py (interval rule first; scene rule when similarity
    < 1 - threshold; undecodable frames assume similarity 1.0).
    ``histogram`` mirrors with_scene_similarity: 'bytes' (raw payload)
    or 'decoded' (luminance of the decoded image — required for
    entropy-coded wire formats like the reference's JPEG)."""
    import numpy as np

    from video_stream_processing_spark.operators.scene import N_BINS

    cut = 1.0 - scene_threshold

    if histogram == "bytes":

        def _hist(b):
            if b is None or len(b) == 0:
                return None
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            return np.bincount(arr, minlength=N_BINS) / float(len(arr))

    else:

        def _hist(b):
            from video_stream_processing_spark.functions.imagecodec import (
                decode_image_bgr,
            )

            img = decode_image_bgr(bytes(b)) if b is not None and len(b) else None
            if img is None:
                return None
            lum = (
                77 * img[:, :, 2].astype(np.uint32)
                + 150 * img[:, :, 1].astype(np.uint32)
                + 29 * img[:, :, 0].astype(np.uint32)
            ) >> 8
            return np.bincount(lum.ravel(), minlength=N_BINS) / float(lum.size)

    def _corr(h1, h2) -> float:
        if h1 is None or h2 is None:
            return 1.0  # decode failure -> assume similar (:94,107)
        d1, d2 = h1 - h1.mean(), h2 - h2.mean()
        den = float(np.sqrt((d1 * d1).sum() * (d2 * d2).sum()))
        if den <= 0.0:
            return 1.0 if np.array_equal(h1, h2) else 0.0
        return float((d1 * d2).sum() / den)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout registered
            return
        if state.exists:
            last_kf_ms, prev_hist_list = state.get
            prev_hist = None if prev_hist_list is None else np.asarray(prev_hist_list)
            has_prev = True
        else:
            last_kf_ms, prev_hist, has_prev = None, None, False
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts", kind="mergesort")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        sims, flags = [], []
        for t, payload in zip(ts_ms, rows["frame_data"]):
            h = _hist(payload)
            sim = _corr(h, prev_hist) if has_prev else None
            keep = False
            if last_kf_ms is None or t - last_kf_ms >= min_interval_ms:
                keep = True
            elif sim is not None and sim < cut:
                keep = True
            if keep:
                last_kf_ms = t
            prev_hist, has_prev = h, True
            sims.append(sim)
            flags.append(keep)
        state.update(
            (last_kf_ms, None if prev_hist is None else [float(x) for x in prev_hist])
        )
        out = rows[["ts"]].copy()
        out.insert(0, "stream_id", stream_id)
        out["scene_sim"] = pd.Series(sims, index=out.index, dtype="float64")
        out["is_keyframe"] = flags
        yield out

    return fn


def keyframes_from_bytes_stream(
    frames: DataFrame,
    min_interval_ms: int = 5_000,
    scene_threshold: float = 0.3,
    watermark: str | None = "10 minutes",
    histogram: str = "bytes",
) -> DataFrame:
    """Streaming binary-driven gate. Input needs (stream_id, ts,
    frame_data BINARY); emits keyframe flags + the computed similarity.
    ``watermark=None`` inherits the upstream watermark — required when
    this gate is chained AFTER another stateful operator (redefining a
    watermark downstream is disallowed in Spark's multi-stateful
    model; the flagship graph chains it after the near-dup gate)."""
    if watermark is not None:
        frames = frames.withWatermark("ts", watermark)
    return (
        frames
        .groupBy("stream_id")
        .applyInPandasWithState(
            keyframe_bytes_stateful_fn(min_interval_ms, scene_threshold, histogram),
            outputStructType=KEYFRAME_BYTES_OUT_SCHEMA,
            stateStructType=KEYFRAME_BYTES_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def exact_segments_stream(
    frames: DataFrame,
    duration_ms: int = 180_000,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame -> exact segments. Input needs (stream_id, ts).
    ``watermark=None`` inherits the upstream watermark (see
    keyframes_from_bytes_stream)."""
    if watermark is not None:
        frames = frames.withWatermark("ts", watermark)
    return (
        frames
        .groupBy("stream_id")
        .applyInPandasWithState(
            segment_stateful_fn(duration_ms),
            outputStructType=SEGMENT_OUT_SCHEMA,
            stateStructType=SEGMENT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def keyframes_stream(
    frames: DataFrame,
    min_interval_ms: int = 5_000,
    scene_threshold: float = 0.3,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame -> keyframe-flagged frames."""
    return (
        frames.withWatermark("ts", watermark)
        .groupBy("stream_id")
        .applyInPandasWithState(
            keyframe_stateful_fn(min_interval_ms, scene_threshold),
            outputStructType=KEYFRAME_OUT_SCHEMA,
            stateStructType=KEYFRAME_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_STATE_SCHEMA = "t_view long, t_click long, done boolean"
FUNNEL_OUT_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp, t_purchase timestamp"
)


def funnel_stateful_fn(within_ms: int = 172_800_000):
    """Streaming ordered-funnel state machine (the CEP pattern-match the
    reference's Flink lineage is known for, over b55's exact semantics):
    per-user state is three scalars — first 'view' time, first
    qualifying 'click' time, and a done flag — advanced in event-time
    order. A conversion emits exactly when the first 'purchase' lands
    within ``within_ms`` of the click that itself landed within
    ``within_ms`` of the first view; on in-order arrival this equals
    batch b55's converted rows row-for-row
    (tests/test_streaming_funnel.py). State is O(1) per user and
    expires by event-time timeout 2x``within_ms`` after the funnel's
    last step, so abandoned funnels don't accumulate."""

    within_us = within_ms * 1_000  # state runs in MICROSECONDS: the
    # event timestamps carry us precision and the batch twin (b55)
    # compares at full precision, so ms truncation would flip boundary
    # comparisons and shift emitted times.

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        t_view, t_click, done = state.get if state.exists else (-1, -1, False)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts", kind="mergesort"
        )
        ts_us = (rows["ts"].astype("int64") // 1_000).tolist()
        kinds = rows["event_type"].tolist()
        out = []
        for t, kind in zip(ts_us, kinds):
            if done:
                break
            if kind == "view" and t_view < 0:
                t_view = t
            elif (
                kind == "click"
                and t_view >= 0
                and t_click < 0
                and t_view < t <= t_view + within_us
            ):
                t_click = t
            elif (
                kind == "purchase"
                and t_click >= 0
                and t_click < t <= t_click + within_us
            ):
                out.append((user_id, t_view, t_click, t))
                done = True
        state.update((t_view, t_click, done))
        anchor = max(t_click, t_view, max(ts_us, default=0))
        # timeout API takes epoch MILLISECONDS
        state.setTimeoutTimestamp((anchor + 2 * within_us) // 1_000)
        if out:
            yield pd.DataFrame(
                [
                    {
                        "user_id": int(u),
                        "t_view": pd.Timestamp(v, unit="us"),
                        "t_click": pd.Timestamp(c, unit="us"),
                        "t_purchase": pd.Timestamp(p, unit="us"),
                    }
                    for (u, v, c, p) in out
                ]
            )

    return fn


def funnel_stream(
    events: DataFrame, within_ms: int = 172_800_000, watermark: str = "30 minutes"
) -> DataFrame:
    """view -> click -> purchase conversions over a user event stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            funnel_stateful_fn(within_ms=within_ms),
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


ANOMALY_STATE_SCHEMA = "vals array<double>"
ANOMALY_OUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, zscore double"
)


def anomaly_stateful_fn(
    window: int = 49, warmup: int = 20, threshold: float = 2.5
):
    """Streaming twin of x73's rolling z-score anomaly detector: per
    user, keep the last ``window`` values as state (bounded — 49
    doubles/key), score each arriving value against the CURRENT buffer
    (trailing, self-excluded, sample stddev), emit rows whose rounded
    |z| exceeds the threshold once ``warmup`` history exists. On
    in-order arrival this equals the batch window query row-for-row
    (tests/test_streaming_anomaly.py), including across micro-batch
    splits — the buffer carries over in the state store."""
    import math

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout registered
            return
        (vals,) = state.get if state.exists else ([],)
        vals = list(vals)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out = []
        for ts, event_id, v in zip(rows["ts"], rows["event_id"], rows["value"]):
            n = len(vals)
            if n >= warmup:
                mu = sum(vals) / n
                var = sum((x - mu) ** 2 for x in vals) / (n - 1)
                sigma = math.sqrt(var)
                if sigma > 0:
                    z = round((v - mu) / sigma, 3)
                    if abs(z) > threshold:
                        out.append((user_id, int(event_id), ts, round(v, 4), z))
            vals.append(float(v))
            if len(vals) > window:
                vals.pop(0)
        state.update((vals,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts", "value", "zscore"]
            )

    return fn


def anomaly_stream(
    events: DataFrame,
    window: int = 49,
    warmup: int = 20,
    threshold: float = 2.5,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Rolling z-score anomalies over a keyed event stream (x73's
    streaming twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            anomaly_stateful_fn(window=window, warmup=warmup, threshold=threshold),
            outputStructType=ANOMALY_OUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Inter-arrival gap stream (x90's streaming twin)
# ---------------------------------------------------------------------------

GAP_STATE_SCHEMA = "last_ms long"
GAP_OUT_SCHEMA = "user_id long, event_id long, event_type string, log2_bucket int"


def gap_stateful_fn():
    """Streaming twin of x90's inter-arrival histogram input: per user,
    carry only the last event's epoch-ms (ONE long of state per key),
    emit each arriving event's gap bucket floor(log2(gap_ms + 1)) —
    computed with integer bit_length, the same arithmetic as the batch
    query's binary-repr length. On in-order arrival the emitted
    (user, event, bucket) rows equal the batch lag-window rows across
    micro-batch boundaries (the last-ms carries in the state store)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout registered
            return
        (last_ms,) = state.get if state.exists else (None,)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out = []
        for ts, event_id, etype in zip(rows["ts"], rows["event_id"], rows["event_type"]):
            ms = int(pd.Timestamp(ts).value // 1_000_000)
            if last_ms is not None:
                gap = ms - last_ms
                if gap < 0:
                    # Cross-batch late arrival (ms earlier than the carried
                    # last_ms despite the watermark): Python bit_length on a
                    # negative int uses |x|, which would emit a nonsense
                    # bucket the batch lag-window twin can never produce.
                    # Drop the row instead — the batch query, which sorts
                    # globally per key, never sees a negative gap; dropping
                    # keeps the streaming output a subset of batch output
                    # rather than a divergent superset.
                    continue
                bucket = (gap + 1).bit_length() - 1
                out.append((user_id, int(event_id), etype, bucket))
            last_ms = ms
        state.update((last_ms,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "event_type", "log2_bucket"]
            )

    return fn


def gap_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Per-event inter-arrival gap buckets over a keyed stream — the
    stateful input feed of x90's histogram (aggregate the output by
    (event_type, log2_bucket) downstream for the running histogram)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            gap_stateful_fn(),
            outputStructType=GAP_OUT_SCHEMA,
            stateStructType=GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState twin (Spark 4's successor stateful API — r9)
# ---------------------------------------------------------------------------


def exact_segments_stream_tws(
    frames: DataFrame,
    duration_ms: int = 180_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The SAME exact reference segment semantics
    (first-arrival-aligned, trigger-inclusive, add-then-check —
    VideoSegmentBuffer.java:38-105 / VideoProcessFunction.java:87-100,
    event-time timer flushing the tail) on ``transformWithStateInPandas``
    — Spark 4's successor to applyInPandasWithState (typed per-key value
    state + explicit timers instead of a single state tuple + timeout
    conf). Output-equality with the applyInPandasWithState form AND the
    batch-exact operator is pinned in tests/test_streaming.py — SKIPPED
    in this container because TWS ships worker-side state as protobuf
    messages and the `protobuf` package is not installed (the same
    environment-bound posture as onnxruntime/Kafka: the code path is
    real, the dependency is the gap).

    Input needs (stream_id, ts); emits the SEGMENT_OUT_SCHEMA rows."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SegmentProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._buf = handle.getValueState("buf", SEGMENT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (stream_id,) = key
            if self._buf.exists():
                start_ms, cnt, mn, mx = self._buf.get()
            else:
                start_ms, cnt, mn, mx = None, 0, None, None
            out = []
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values("ts", kind="mergesort")
            for t in (pdf["ts"].astype("int64") // 1_000_000).tolist():
                if start_ms is None:
                    start_ms, cnt, mn, mx = t, 1, t, t
                    continue
                cnt += 1
                mn, mx = min(mn, t), max(mx, t)
                if t - start_ms >= duration_ms:  # add-then-check, inclusive
                    out.append((stream_id, mn, mx, cnt, "size"))
                    start_ms, cnt, mn, mx = None, 0, None, None
            for tm in self._handle.listTimers():
                self._handle.deleteTimer(tm)
            if start_ms is not None:
                self._buf.update((start_ms, cnt, mn, mx))
                self._handle.registerTimer(start_ms + duration_ms)
            else:
                self._buf.clear()
            if out:
                yield pd.concat(
                    [_segment_row(s, mn_, mx_, c, why) for (s, mn_, mx_, c, why) in out],
                    ignore_index=True,
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (stream_id,) = key
            if self._buf.exists():
                start_ms, cnt, mn, mx = self._buf.get()
                self._buf.clear()
                yield _segment_row(stream_id, mn, mx, cnt, "timeout")

        def close(self) -> None:
            pass

    return (
        frames.withWatermark("ts", watermark)
        .groupBy("stream_id")
        .transformWithStateInPandas(
            statefulProcessor=SegmentProcessor(),
            outputStructType=SEGMENT_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
