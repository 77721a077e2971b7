"""Greedy sequence packing: conversations → budget-bounded training
examples.

The last step of a training-data pipeline turns cleaned transcripts
into examples that fit a context window: walk each conversation in
turn order, accumulate token counts, and cut a new chunk whenever the
next turn would overflow the budget (a single over-budget turn gets a
chunk of its own rather than being dropped or split mid-turn).

The greedy cut is *irreducibly sequential per conversation* — chunk k's
boundary depends on every turn before it — so this is one of the few
operators here that earns the ``applyInPandas`` escape hatch.  The
split keeps Python minimal and the heavy lifting JVM-side:

- token counts come from the codegen ``word_count`` kernel BEFORE the
  shuffle (whole-stage codegen, shares its DuckDB oracle twin);
- ``applyInPandas`` groups on ``conv_id`` — ONE hash Exchange, same
  key the pipeline already buckets by — and the Python side loops only
  over an int array of per-turn token counts, then emits finished
  chunk rows (conv, chunk, n_turns, n_tokens, packed text), so there
  is no second shuffle and no post-aggregation;
- state per group is O(turns in one conversation); mega-threads bound
  group size exactly as in the scoring pipeline (salting does not
  apply — packing is a per-conversation total order — so the skew
  ceiling is the largest single conversation, which the pipeline's
  lineage metrics surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import word_count


def pack_conversations(
    df: DataFrame,
    budget: int = 2048,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Pack each conversation's turns into consecutive chunks of at
    most ``budget`` tokens (whitespace-word tokens, the engine's
    ``word_count`` kernel).  Returns one row per chunk:
    ``(conv_id, chunk_id, n_turns, n_tokens, text)`` with turns joined
    by ``sep`` in turn order.  A turn larger than the budget occupies
    its own chunk, over budget, rather than being truncated: packing
    never edits text, only groups it.
    """
    src = df.select(
        F.col(conv_col).cast("string").alias("conv_id"),
        F.col(idx_col).alias("__idx"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        F.coalesce(word_count(F.col(text_col)), F.lit(0))
        .cast("int").alias("__tok"),
    )

    schema = (
        "conv_id string, chunk_id int, n_turns int, n_tokens int, text string"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__idx", kind="mergesort")
        toks = pdf["__tok"].to_numpy()
        chunk = [0] * len(toks)
        cur, fill = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if fill > 0 and fill + t > budget:
                cur, fill = cur + 1, t
            else:
                fill += t
            chunk[i] = cur
        pdf = pdf.assign(__chunk=chunk)
        g = pdf.groupby("__chunk", sort=True)
        out = pd.DataFrame(
            {
                "conv_id": g["conv_id"].first(),
                "chunk_id": g["__chunk"].first().astype("int32"),
                "n_turns": g.size().astype("int32"),
                "n_tokens": g["__tok"].sum().astype("int32"),
                "text": g["__text"].agg(sep.join),
            }
        )
        return out.reset_index(drop=True)

    return src.groupBy("conv_id").applyInPandas(pack, schema)
