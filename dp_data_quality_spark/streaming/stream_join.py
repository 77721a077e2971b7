"""Stream-stream interval join with watermark-bounded state.

The canonical Structured Streaming two-stream join: left events matched
to right events of the same key within a trailing time window
(e.g. purchases attributed to clicks in the last N minutes).  Both
sides carry watermarks and the join condition bounds event time on both
ends, so the state store provably evicts rows older than
``lookback + watermark`` — without the time bounds a stream-stream join
must keep EVERY past row forever, which is the classic unbounded-state
mistake at 10¹²-event scale.

Append-mode inner join: results emit as soon as both sides arrive;
watermark-late rows are dropped by the engine (the documented
trade-off vs waiting forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 600,
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join ``left`` rows to same-``key`` ``right`` rows whose
    timestamp falls in ``[left_ts - lookback, left_ts]``.

    Returns all left columns plus the right columns prefixed with
    ``right_prefix`` (key excluded).  Works identically on batch
    DataFrames (same API, no watermark state) — one code path to test
    the join logic hermetically."""
    streaming = left.isStreaming
    l = left.withWatermark(left_ts, watermark) if streaming else left
    r = right.withWatermark(right_ts, watermark) if streaming else right
    r = r.select(
        F.col(key).alias("__rk"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != key
        ],
    )
    rts = f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col(rts) <= F.col(left_ts))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
    )
    return l.join(r, cond, "inner").drop("__rk")
