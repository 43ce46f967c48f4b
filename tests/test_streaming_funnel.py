"""Streaming funnel (CEP-style state machine) — on in-order arrival it
must equal batch b55's converted rows exactly, including microsecond
timestamps; state must survive micro-batch splits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _batch_converted(spark):
    from video_stream_processing_spark.plans.registry import query_map

    b55 = query_map()["b55_funnel_steps"](spark, SF)
    return {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in b55.where("converted").collect()
    }


@pytest.mark.slow
def test_funnel_stream_matches_batch(spark, tmp_path):
    from video_stream_processing_spark.streaming.stateful import funnel_stream
    from video_stream_processing_spark.tables import load_table

    d = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    events = load_table(spark, SF, "events").select("user_id", "event_type", "ts")
    # two in-order batches so the state machine provably crosses a
    # micro-batch boundary mid-funnel
    cut = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    events.where(F.unix_micros("ts") <= cut).write.mode("overwrite").parquet(d + "/b1")
    events.where(F.unix_micros("ts") > cut).write.mode("overwrite").parquet(d + "/b2")

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/b*")
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
            for r in spark.sql("SELECT * FROM funnel").collect()
        }
    finally:
        q.stop()

    assert streamed == _batch_converted(spark)
    assert len(streamed) > 0  # the fixture actually converts someone


@pytest.mark.slow
def test_funnel_state_survives_restart(spark, tmp_path):
    """Kill the query between micro-batches; the restarted query must
    resume the per-user state machines from the checkpoint and produce
    exactly the batch result — no lost or duplicated conversions."""
    from video_stream_processing_spark.streaming.stateful import funnel_stream
    from video_stream_processing_spark.tables import load_table

    d = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    events = load_table(spark, SF, "events").select("user_id", "event_type", "ts")
    # cut at the latest converted user's CLICK: that user's purchase can
    # only arrive after the restart, so the crash provably bisects a funnel
    expected = _batch_converted(spark)
    cut = max(int(c.timestamp() * 1_000_000) for _, c, _ in expected.values())
    events.where(F.unix_micros("ts") <= cut).write.mode("overwrite").parquet(d + "/b1")

    schema = "user_id long, event_type string, ts timestamp"

    out = str(tmp_path / "out")  # file sink: the recoverable kind

    def start():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d + "/b*")
        return (
            funnel_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # "crash" after the first half

    first_half = spark.read.parquet(out).count()
    events.where(F.unix_micros("ts") > cut).write.mode("overwrite").parquet(d + "/b2")
    q = start()
    try:
        q.processAllAvailable()
        streamed = {
            r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
            for r in spark.read.parquet(out).collect()
        }
    finally:
        q.stop()

    assert streamed == expected
    # the restart actually mattered: some conversions completed only
    # with second-half events
    assert first_half < len(expected)


class _FakeState:
    """Minimal GroupState stand-in for driving funnel_stateful_fn
    directly (batch-boundary semantics without a streaming runtime)."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, _ms):
        pass


def _py_funnel(events, within_us):
    """Reference: first view; first click in (view, view+w]; first
    purchase in (click, click+w]."""
    t_view = t_click = None
    for t, kind in events:
        if kind == "view" and t_view is None:
            t_view = t
        elif kind == "click" and t_view is not None and t_click is None and t_view < t <= t_view + within_us:
            t_click = t
        elif kind == "purchase" and t_click is not None and t_click < t <= t_click + within_us:
            return (t_view, t_click, t)
    return None


def test_funnel_fn_matches_reference_on_random_sequences():
    """Drive the state machine through random in-order event sequences
    split at random micro-batch boundaries; conversions must equal the
    single-pass python reference regardless of the split points."""
    import random

    import pandas as pd

    from video_stream_processing_spark.streaming import stateful as st_mod

    rng = random.Random(7)
    for trial in range(80):
        n = rng.randint(1, 30)
        ts = sorted(rng.sample(range(1, 10_000), n))
        kinds = [rng.choice(["view", "click", "purchase", "error"]) for _ in range(n)]
        events = list(zip([t * 1_000_000 for t in ts], kinds))  # us spacing
        within = rng.choice([500_000, 2_000_000, 5_000_000_000]) # us
        fn = st_mod.funnel_stateful_fn(within_ms=within // 1_000)
        state = _FakeState()
        emitted = []
        i = 0
        while i < len(events):
            j = rng.randint(i + 1, len(events))
            chunk = events[i:j]
            pdf = pd.DataFrame(
                {
                    "user_id": 1,
                    "event_type": [k for _, k in chunk],
                    # ns resolution: what Arrow hands the real UDF
                    "ts": pd.Series(
                        [t * 1_000 for t, _ in chunk], dtype="int64"
                    ).astype("datetime64[ns]"),
                }
            )
            for out in fn((1,), iter([pdf]), state):
                emitted.extend(
                    (
                        int(r.t_view.timestamp() * 1e6),
                        int(r.t_click.timestamp() * 1e6),
                        int(r.t_purchase.timestamp() * 1e6),
                    )
                    for r in out.itertuples()
                )
            i = j
        expect = _py_funnel(events, within)
        got = emitted[0] if emitted else None
        assert got == expect, (trial, events, within, got, expect)
        assert len(emitted) <= 1
