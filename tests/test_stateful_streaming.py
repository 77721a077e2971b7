"""applyInPandasWithState conversation summarizer test."""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_data_quality_spark import synth
from dp_data_quality_spark.config import FilterConfig
from dp_data_quality_spark.streaming.stateful import conversation_state_stream
from dp_data_quality_spark.streaming.stream_filter import score_stream


def test_conversation_state_stream(spark, tmp_path):
    inp = str(tmp_path / "input")
    df = synth.strip_truth(synth.transcripts(spark, 25, seed=13))
    df.write.mode("overwrite").parquet(inp)
    truth = {
        r.conv_id: (r.n, r.mx)
        for r in df.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    scored = score_stream(stream, spark, FilterConfig(), n_buckets=4)
    summaries = conversation_state_stream(scored)

    out = str(tmp_path / "out")
    q = (
        summaries.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    # a conversation may emit once per micro-batch it appears in; the
    # running state is monotone, so the max-n_turns row is the final one
    got = {}
    for r in rows:
        if r.conv_id not in got or r.n_turns > got[r.conv_id].n_turns:
            got[r.conv_id] = r
    assert set(got) == set(truth)
    for conv_id, (n, mx) in truth.items():
        r = got[conv_id]
        assert r.n_turns == n
        assert r.max_turn_idx == mx
        assert 0.0 <= r.keep_ratio <= 1.0
        assert r.n_kept <= r.n_turns


def test_conversation_event_time_close(spark, tmp_path):
    # EVENT-TIME session GC: the close fires when the WATERMARK passes
    # (last event ts + gap) — driven by event timestamps in the data,
    # not wall-clock, so a backfill replays identically.  Advancing the
    # watermark requires new data: a second batch with a much later
    # timestamp closes the first batch's conversations.
    import time

    import pytest

    from dp_data_quality_spark.streaming.stateful import (
        conversation_state_stream,
    )

    inp = str(tmp_path / "inp")
    base = "2024-01-01 00:00:"
    (spark.createDataFrame(
        [("a1", 0, True, base + "00"), ("a1", 1, False, base + "05"),
         ("a2", 0, True, base + "03")],
        "conv_id string, turn_idx int, keep boolean, ts string",
    ).write.mode("append").parquet(inp))

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    # gap 10s of EVENT time; zero watermark delay
    summaries = conversation_state_stream(
        stream, event_time_col="ts", close_after_event_ms=10_000
    )

    out = str(tmp_path / "out")
    q = (
        summaries.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )

    def rows_now():
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    def wait_for(pred, deadline_s=90):
        end = time.time() + deadline_s
        while time.time() < end:
            rows = rows_now()
            if pred(rows):
                return rows
            time.sleep(0.5)
        raise AssertionError(f"condition not met; rows={rows_now()}")

    try:
        q.processAllAvailable()
        # nothing closed yet: the watermark has not passed any timeout
        assert not any(r.closed for r in rows_now())
        # wall-clock alone must NOT close an event-time session
        time.sleep(2)
        assert not any(r.closed for r in rows_now())

        # a later event (00:01:00) pushes the watermark past
        # a1's last ts (00:00:05) + 10s and a2's (00:00:03) + 10s
        (spark.createDataFrame(
            [("a9", 0, True, "2024-01-01 00:01:00")],
            "conv_id string, turn_idx int, keep boolean, ts string",
        ).write.mode("append").parquet(inp))
        rows = wait_for(
            lambda rs: {r.conv_id for r in rs if r.closed} >= {"a1", "a2"}
        )
        closed = {r.conv_id: r for r in rows if r.closed}
        assert closed["a1"].n_turns == 2 and closed["a1"].n_kept == 1
        assert closed["a2"].n_turns == 1
        # a9 is still open (watermark hasn't passed its ts + gap)
        assert "a9" not in closed
    finally:
        q.stop()

    # the two GC modes are mutually exclusive
    with pytest.raises(ValueError, match="mutually exclusive"):
        conversation_state_stream(
            stream, close_after_ms=1000,
            event_time_col="ts", close_after_event_ms=1000,
        )
    with pytest.raises(ValueError, match="set together"):
        conversation_state_stream(stream, event_time_col="ts")


def test_conversation_timeout_closes_state(spark, tmp_path):
    # processing-time session GC: a conversation with no new turns for
    # close_after_ms emits a final closed=True row and frees its state.
    #
    # NOTE: with ProcessingTimeTimeout the engine keeps scheduling
    # batches to fire pending timeouts, so `processAllAvailable()` never
    # observes "no new data" and would block forever — the sink is
    # POLLED with a deadline instead.
    import time

    inp = str(tmp_path / "inp")
    (spark.createDataFrame(
        [("a1", 0, True), ("a1", 1, False), ("a2", 0, True)],
        "conv_id string, turn_idx int, keep boolean",
    ).write.mode("append").parquet(inp))

    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    summaries = conversation_state_stream(stream, close_after_ms=700)

    out = str(tmp_path / "out")
    q = (
        summaries.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )

    def rows_now():
        try:
            return spark.read.parquet(out).collect()
        except Exception:
            return []

    def wait_for(pred, deadline_s=90):
        end = time.time() + deadline_s
        while time.time() < end:
            rows = rows_now()
            if pred(rows):
                return rows
            time.sleep(0.5)
        raise AssertionError(f"condition not met; rows={rows_now()}")

    try:
        # both conversations go quiet → timeout fires → closed rows
        rows = wait_for(
            lambda rs: {r.conv_id for r in rs if r.closed} >= {"a1", "a2"}
        )
        closed = {r.conv_id: r for r in rows if r.closed}
        assert closed["a1"].n_turns == 2 and closed["a1"].n_kept == 1
        assert closed["a2"].n_turns == 1
        # a late conversation starts fresh (state was freed, not frozen)
        (spark.createDataFrame(
            [("b1", 0, True)], "conv_id string, turn_idx int, keep boolean",
        ).write.mode("append").parquet(inp))
        rows = wait_for(
            lambda rs: any(r.conv_id == "b1" and not r.closed for r in rs)
        )
        b1 = [r for r in rows if r.conv_id == "b1" and not r.closed][0]
        assert b1.n_turns == 1 and b1.n_kept == 1
    finally:
        q.stop()
