"""Time-series operators: as-of join.

Spark has no ASOF JOIN operator (pandas ``merge_asof`` / kdb ``aj``
semantics: for every left row, the most recent right row at-or-before
its timestamp, per key).  A range-join formulation explodes into an
inequality join (BroadcastNestedLoopJoin or O(n·m) candidates); the
scalable composition used here is UNION + WINDOW:

  1. tag left rows ``is_left=1`` and right rows ``is_left=0``, union
     them with the right payload columns null on the left side;
  2. one window per key ordered by (ts, is_left, tie) carries the
     last non-null payload STRUCT forward (``last(..., ignorenulls=True)``
     over UNBOUNDED PRECEDING..CURRENT ROW) — one struct per right row,
     so every output field comes from the SAME matched right row even
     when some of its payload fields are NULL;
  3. keep the left rows, unpack the struct.

Cost: ONE shuffle on the join key (the window partition), no row
explosion, no inequality join — at 10⁹ rows this is a sort within each
key partition, exactly what a dedicated ASOF operator would do.
Right rows at the SAME timestamp as a left row match (at-or-before
semantics): ``is_left`` sorts right(0) before left(1); ties among
right rows resolve to the greatest ``tie_col`` (deterministic, mirrored
in the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload: list[str],
    tie_col: str,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the right payload nearest
    its ``ts_col`` per ``on`` key (null when none exists — left-outer
    semantics).

    ``direction="backward"`` (default, pandas merge_asof parity): the
    LATEST right row at-or-before the left timestamp; equal-timestamp
    ties resolve to the GREATEST ``tie_col``.  ``"forward"``: the
    EARLIEST right row at-or-after; ties resolve to the SMALLEST
    ``tie_col``.  Both are the same union + carry-forward window, with
    the traversal order reversed for forward.

    ``payload``: right columns to carry (emitted as ``{prefix}{col}``).
    ``tie_col``: right column breaking equal-timestamp ties — required
    so results are deterministic in both engines.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Pack ALL payload columns into ONE struct per right row: the window
    # then carries matched-row snapshots atomically — a NULL field in the
    # nearest right row stays NULL instead of back-filling from an older
    # row (pandas merge_asof returns the matched row verbatim).
    r = right.select(
        *on,
        ts_col,
        F.lit(0).alias("__is_left"),
        F.col(tie_col).alias("__tie"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__payload"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("__is_left").asc(), F.col("__tie").asc()]
    else:
        # traverse from the future backwards; right rows still sort
        # before the left row at equal timestamps (at-or-after matches),
        # and the carried value ends up the earliest/smallest-tie match
        order = [F.col(ts_col).desc(), F.col("__is_left").asc(), F.col("__tie").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__f"),
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__f.{c}").alias(f"{prefix}{c}") for c in payload
    ]
    return filled.filter(F.col("__is_left") == 1).select(*out_cols)


# Oracle note: the DuckDB twin of a specific as-of query should mirror
# THIS union + window construction (see __spark_entry__
# SQL_EVENTS_ASOF_CLICKS) rather than DuckDB's native ASOF JOIN, whose
# equal-timestamp tie semantics differ.  The twin may carry columns
# individually (per-column last_value IGNORE NULLS) ONLY when every
# payload field is non-null on the right side — otherwise it must pack a
# struct like the engine does (atomic matched-row snapshot).
