"""Custom stateful streaming operator: per-conversation running quality
state via ``applyInPandasWithState``.

Tracks, per ``conv_id``, the running turn count, kept-turn count and
max ``turn_idx`` across micro-batches — the streaming analogue of the
batch pipeline's per-bucket lineage, at conversation granularity.  The
state store holds four longs per conversation (bounded, scales with
|active conversations|, not turns); each micro-batch a conversation
appears in emits its refreshed summary row (monotone running state, so
the latest row per conversation is the current truth).

Session GC — two modes, because without GC |all conversations ever|
state accumulates for the stream's lifetime, which is the thing that
kills long-running 10¹²-turn streams:

- **processing-time** (``close_after_ms``): a conversation with no new
  turns for this much WALL-CLOCK time emits one final ``closed=True``
  row and its state is removed.  Simple, but replays differently on
  backfill: a historical re-run sees all data arrive "at once", so
  sessions that closed in production may never close (or close at
  different points) when reprocessed.
- **event-time** (``event_time_col`` + ``close_after_event_ms``): the
  close fires when the WATERMARK passes (last event time in the
  conversation + gap) — the same late-data semantics as the windowed
  aggregations in ``stream_filter``, and deterministic under backfill:
  replaying the same events always closes the same sessions at the
  same event-time points regardless of arrival speed.

Arrow-batched group apply: each group's batch arrives as pandas frames,
state round-trips through the Spark state store — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_kept", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
    T.StructField("max_ts", T.LongType()),  # epoch-ms; -1 in non-event modes
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_kept", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
    T.StructField("keep_ratio", T.DoubleType()),
    T.StructField("closed", T.BooleanType()),
])


def _make_update(close_after_ms: int | None, event_gap_ms: int | None):
    uses_timeout = close_after_ms is not None or event_gap_ms is not None

    def _update_conversation(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key

        def row(n_turns, n_kept, max_idx, closed):
            return pd.DataFrame({
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_kept": [n_kept],
                "max_turn_idx": [max_idx],
                "keep_ratio": [n_kept / n_turns if n_turns else 0.0],
                "closed": [closed],
            })

        if uses_timeout and state.hasTimedOut:
            # conversation went quiet: emit the final summary, free state
            n_turns, n_kept, max_idx, _ = state.get
            state.remove()
            yield row(n_turns, n_kept, max_idx, True)
            return

        n_turns, n_kept, max_idx, max_ts = (
            state.get if state.exists else (0, 0, -1, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_kept += int(pdf["keep"].sum())
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
                if event_gap_ms is not None:
                    batch_ts = int(pdf["__ts"].max().value // 1_000_000)
                    max_ts = max(max_ts, batch_ts)
        state.update((n_turns, n_kept, max_idx, max_ts))
        if event_gap_ms is not None:
            # close when the watermark passes last-event + gap; Spark
            # rejects timestamps at/behind the current watermark (a group
            # fed only late data), so clamp just past it — the session
            # then closes at the next watermark advance
            target = max_ts + event_gap_ms
            state.setTimeoutTimestamp(
                max(target, state.getCurrentWatermarkMs() + 1)
            )
        elif close_after_ms is not None:
            state.setTimeoutDuration(close_after_ms)
        yield row(n_turns, n_kept, max_idx, False)

    return _update_conversation


def conversation_state_stream(
    scored_stream: DataFrame,
    close_after_ms: int | None = None,
    event_time_col: str | None = None,
    close_after_event_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Attach the stateful per-conversation summarizer to a scored stream
    (needs conv_id, turn_idx, keep columns).

    ``close_after_ms``: PROCESSING-TIME session GC — a conversation with
    no new turns for this much wall-clock time emits one final
    ``closed=True`` row and its state is removed (bounding the store to
    ACTIVE conversations).

    ``event_time_col`` + ``close_after_event_ms``: EVENT-TIME session GC
    — the close fires when the stream's watermark (managed here via
    ``withWatermark(event_time_col, watermark_delay)``) passes the
    conversation's last event time + gap.  Deterministic under backfill
    / replay, matching the watermark semantics of the rest of the
    streaming surface.  The two modes are mutually exclusive; neither
    keeps state forever (small/finite streams, tests).

    Caveat (processing-time mode): with a wall-clock timeout configured
    the micro-batch engine keeps scheduling (empty) batches to evaluate
    pending timeouts, so ``query.processAllAvailable()`` never observes
    a quiesced stream — poll the sink or use ``awaitTermination`` with a
    timeout instead.  Event-time timeouts only fire on watermark
    advances (data-driven), so they don't have this pathology, but the
    closing batch runs AFTER the batch that advanced the watermark."""
    if close_after_ms is not None and event_time_col is not None:
        raise ValueError(
            "close_after_ms and event_time_col are mutually exclusive"
        )
    if (event_time_col is None) != (close_after_event_ms is None):
        raise ValueError(
            "event_time_col and close_after_event_ms must be set together"
        )

    if event_time_col is not None:
        src = scored_stream.select(
            "conv_id", "turn_idx", "keep",
            F.col(event_time_col).cast("timestamp").alias("__ts"),
        ).withWatermark("__ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
        gap = close_after_event_ms
    else:
        src = scored_stream.select("conv_id", "turn_idx", "keep")
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout
            if close_after_ms is not None
            else GroupStateTimeout.NoTimeout
        )
        gap = None
    return src.groupBy("conv_id").applyInPandasWithState(
        _make_update(close_after_ms, gap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
