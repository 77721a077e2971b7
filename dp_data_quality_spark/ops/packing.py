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
- the Python stage is ``mapInPandas`` over ``repartition(conv_id)`` +
  ``sortWithinPartitions(conv_id, idx)`` — ONE hash Exchange, same key
  the pipeline already buckets by.  ``groupBy().applyInPandas`` would
  express the same thing but pays a pandas-DataFrame + Arrow round
  trip PER CONVERSATION (measured: a do-nothing applyInPandas over
  1,500 conversations costs 8 s at sf0.1 — more than the whole
  operator); mapInPandas processes whole Arrow batches, so per-call
  overhead amortizes over thousands of turns.  Conversations are
  contiguous within a sorted partition, and a conversation that
  straddles an Arrow batch boundary is carried into the next batch
  before its chunks are emitted;
- the Python side loops only over the int token-count array (the cut
  decision), then emits finished chunk rows (conv, chunk, n_turns,
  n_tokens, packed text) via one vectorized pandas groupby per batch —
  no second shuffle, no post-aggregation;
- state per batch is O(batch + largest straddling conversation);
  mega-threads bound the carry exactly as they bound any
  per-conversation total order (salting cannot apply), and the
  pipeline's lineage metrics surface them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

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

    def pack_block(pdf):
        """Chunk-assign a block of whole, sorted conversations."""
        import numpy as np
        import pandas as pd

        conv = pdf["conv_id"].to_numpy()
        toks = pdf["__tok"].to_numpy()
        chunk = np.zeros(len(toks), dtype="int32")
        cur, fill, prev = 0, 0, None
        for i in range(len(toks)):
            if conv[i] != prev:
                cur, fill, prev = 0, 0, conv[i]
            t = int(toks[i])
            if fill > 0 and fill + t > budget:
                cur, fill = cur + 1, t
            else:
                fill += t
            chunk[i] = cur
        pdf = pdf.assign(__chunk=chunk)
        g = pdf.groupby(["conv_id", "__chunk"], sort=False)
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].first(),
                "chunk_id": g["__chunk"].first().astype("int32"),
                "n_turns": g.size().astype("int32"),
                "n_tokens": g["__tok"].sum().astype("int32"),
                "text": g["__text"].agg(sep.join),
            }
        ).reset_index(drop=True)

    def pack_iter(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # the last conversation may continue in the next batch —
            # hold it back; everything before it is complete
            last = pdf["conv_id"].iloc[-1] if len(pdf) else None
            mask = pdf["conv_id"] == last
            carry = pdf[mask]
            body = pdf[~mask]
            if len(body):
                yield pack_block(body)
        if carry is not None and len(carry):
            yield pack_block(carry)

    part = src.repartition("conv_id").sortWithinPartitions("conv_id", "__idx")
    return part.mapInPandas(pack_iter, schema)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str = "conv_id",
    mode: str = "overwrite",
) -> DataFrame:
    """Export training examples as deterministic JSONL shards:
    ``{path}/shard=K/*.json`` with one JSON object per line — the
    standard handoff format for a tokenizer/training pipeline.

    Shard assignment is ``pmod(xxhash64(shard_key), n_shards)`` — a pure
    function of the key, so reruns and different cluster sizes produce
    the SAME shard membership (the property that makes downstream
    resume/caching safe), and everything packed from one conversation
    lands in one shard.  The same salted-hash family the pipeline
    buckets by, so mega-conversations are already bounded upstream.

    Scale: one Exchange on the shard id; each task writes exactly one
    shard directory (no small-file explosion — the same
    one-directory-per-task layout as the pipeline sink).  Returns the
    per-shard manifest (shard, n_rows) read back from THIS RUN's
    committed files — counts reflect what this run put on disk, not a
    recompute: under ``mode='append'`` pre-existing files are excluded
    by a before/after file-listing diff, and the read-back uses the
    input DataFrame's explicit schema so an empty input yields an empty
    manifest instead of a schema-inference failure.
    """
    spark = df.sparkSession

    def _list_files(p: str) -> set[str]:
        jp = spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jp):
            return set()
        out, it = set(), fs.listFiles(jp, True)
        while it.hasNext():
            f = it.next().getPath().toString()
            if "/shard=" in f and not f.endswith("_SUCCESS"):
                out.add(f)
        return out

    before = _list_files(path) if mode == "append" else set()
    sharded = df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards)).cast("int"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .mode(mode)
        .json(path)
    )
    new_files = sorted(_list_files(path) - before)
    # explicit schema: no inference ⇒ empty input / empty file set is fine;
    # shard comes back via partition discovery (basePath)
    read_schema = T.StructType(
        list(df.schema) + [T.StructField("shard", T.IntegerType())]
    )
    if not new_files:
        return spark.createDataFrame([], "shard int, n_rows long")
    written = (
        spark.read.option("basePath", path).schema(read_schema).json(new_files)
    )
    return written.groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))
