"""Custom stateful streaming operator: per-conversation running quality
state via ``applyInPandasWithState``.

Tracks, per ``conv_id``, the running turn count, kept-turn count and
max ``turn_idx`` across micro-batches — the streaming analogue of the
batch pipeline's per-bucket lineage, at conversation granularity.  The
state store holds three longs per conversation (bounded, scales with
|active conversations|, not turns); each micro-batch a conversation
appears in emits its refreshed summary row (monotone running state, so
the latest row per conversation is the current truth).

Session GC: with ``close_after_ms`` set, a processing-time timeout
fires for conversations that go quiet; the operator emits one final
``closed=True`` row and REMOVES the state, so the store tracks only
conversations active within the timeout horizon — without it,
|all conversations ever| state accumulates for the stream's lifetime,
which is the thing that kills long-running 10¹²-turn streams.

Arrow-batched group apply: each group's batch arrives as pandas frames,
state round-trips through the Spark state store — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_kept", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_kept", T.LongType()),
    T.StructField("max_turn_idx", T.LongType()),
    T.StructField("keep_ratio", T.DoubleType()),
    T.StructField("closed", T.BooleanType()),
])


def _make_update(close_after_ms: int | None):
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

        if close_after_ms is not None and state.hasTimedOut:
            # conversation went quiet: emit the final summary, free state
            n_turns, n_kept, max_idx = state.get
            state.remove()
            yield row(n_turns, n_kept, max_idx, True)
            return

        n_turns, n_kept, max_idx = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            n_turns += len(pdf)
            n_kept += int(pdf["keep"].sum())
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_kept, max_idx))
        if close_after_ms is not None:
            state.setTimeoutDuration(close_after_ms)
        yield row(n_turns, n_kept, max_idx, False)

    return _update_conversation


def conversation_state_stream(
    scored_stream: DataFrame, close_after_ms: int | None = None
) -> DataFrame:
    """Attach the stateful per-conversation summarizer to a scored stream
    (needs conv_id, turn_idx, keep columns).

    ``close_after_ms``: processing-time session GC — a conversation with
    no new turns for this long emits one final ``closed=True`` row and
    its state is removed (bounding the store to ACTIVE conversations).
    None keeps state forever (small/finite streams, tests).

    Caveat: with a timeout configured the micro-batch engine keeps
    scheduling (empty) batches to evaluate pending timeouts, so
    ``query.processAllAvailable()`` never observes a quiesced stream —
    poll the sink or use ``awaitTermination`` with a timeout instead."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if close_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        scored_stream.select("conv_id", "turn_idx", "keep")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(close_after_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
