"""End-to-end quality-filter pipeline over transcript tables.

One wide ``select`` computes EVERYTHING per turn — contract-derived
checks, heuristics (pure Column exprs), langid + perplexity (one fused
Arrow pandas UDF, one text transfer), scrubbed text, drop reasons — so
the source is scanned exactly once (vs the reference's O(columns×rules)
jobs, quality_report.py:143-145,265-271).

Scale design:
- conversations are hash-bucketed (``pmod(xxhash64(conv_id), n_buckets)``)
  — the resume/commit unit and the write partition; scoring itself is
  narrow (no shuffle), so mega-thread skew only bounds local sort work.
- stable output ordering via ``sortWithinPartitions(conv_id, turn_idx)``
  — deterministic files, no global window (the reference's single-task
  ROW_ID shuffle, validation_rulebook.py:102-103, is gone).
- checkpoint-resume: each completed bucket appends a lineage row to the
  metrics table; a rerun anti-joins completed buckets (broadcast — the
  bucket list is tiny) and dynamic partition overwrite keeps data writes
  idempotent if a run dies between data and metrics commits.
- single-pass sink: the scored stream is written once, partitioned by
  (keep, bucket) — kept data and per-row drop lineage in one job — and
  per-bucket metrics aggregate from the committed columnar output, so
  the expensive scoring projection never runs twice and nothing wide is
  persisted.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import FilterConfig
from .functions import heuristics as H
from .functions.perplexity import make_scorer_udf
from .functions.scrub import scrub_text

METRICS_SCHEMA = T.StructType([
    T.StructField("partition_key", T.StringType()),
    T.StructField("snapshot_id", T.StringType()),
    T.StructField("rows_in", T.LongType()),
    T.StructField("rows_kept", T.LongType()),
    T.StructField("rows_dropped", T.LongType()),
    T.StructField("rule_hits", T.MapType(T.StringType(), T.LongType())),
    T.StructField("status", T.StringType()),
    T.StructField("run_id", T.StringType()),
    T.StructField("completed_at", T.TimestampType()),
])

NULL_REASON = "null_text"
LANG_REASON = "lang_mismatch"
PPL_REASON = "high_perplexity"


def score_turns(
    df: DataFrame,
    spark: SparkSession,
    cfg: FilterConfig | None = None,
    text_col: str = "text",
    ppl_table=None,
) -> DataFrame:
    """Add lang, lang_conf, ppl, heuristic columns, drop_reasons, keep and
    scrubbed_text in a single pass.  ``ppl_table`` swaps the hermetic
    import-time perplexity model for a corpus-trained one (numpy array
    from ``functions.perplexity.train_table_distributed``)."""
    cfg = cfg or FilterConfig()
    scorer = make_scorer_udf(spark, ppl_table=ppl_table)

    # UDF first, heuristics second: every non-UDF column is buffered
    # JVM-side while batches round-trip through Python, so the Arrow
    # stage should see the narrowest possible row (original columns
    # only, none of the derived heuristic columns).
    score_input = (
        F.substring(F.col(text_col), 1, cfg.score_prefix_chars)
        if cfg.score_prefix_chars
        else F.col(text_col)
    )
    df = df.withColumn("__score", scorer(score_input)).select(
        "*",
        F.col("__score.lang").alias("lang"),
        F.col("__score.lang_conf").alias("lang_conf"),
        F.col("__score.ppl").alias("ppl"),
        F.col("__score.n_words").alias("n_words"),
        F.col("__score.repetition_ratio").alias("repetition_ratio"),
    ).drop("__score")
    df = H.add_heuristic_columns(df, text_col, cfg, include_word_stats=False)

    text = F.col(text_col)
    lang_ok = F.col("lang").isin(*cfg.expected_langs) & (
        F.col("lang_conf") >= cfg.lang_conf_min
    )
    reason_exprs = [
        F.when(text.isNull(), F.lit(NULL_REASON)),
        F.when(text.isNotNull() & ~lang_ok, F.lit(LANG_REASON)),
        F.when(text.isNotNull() & (F.col("ppl") > cfg.ppl_max), F.lit(PPL_REASON)),
    ]
    for reason, fail in H.heuristic_drop_reasons(cfg):
        reason_exprs.append(F.when(text.isNotNull() & fail, F.lit(reason)))

    df = df.withColumn("drop_reasons", F.array_compact(F.array(*reason_exprs)))
    df = df.withColumn("keep", F.size("drop_reasons") == 0)
    scrubbed = scrub_text(text, cfg.toxicity_lexicon if cfg.scrub_pii else ())
    df = df.withColumn("scrubbed_text", F.when(F.col("keep"), scrubbed))
    return df


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


def snapshot_fingerprint(df: DataFrame, explicit: str | None = None) -> str:
    """Stand-in for an Iceberg snapshot ID: stable hash of the input file
    list (empty for in-memory inputs)."""
    if explicit:
        return explicit
    files = sorted(df.inputFiles())
    return hashlib.md5("\n".join(files).encode()).hexdigest()[:16]


@dataclass
class PipelineResult:
    kept_path: str
    metrics_path: str
    buckets_processed: int
    buckets_skipped: int


def read_completed_buckets(spark: SparkSession, metrics_path: str) -> DataFrame | None:
    try:
        m = spark.read.parquet(metrics_path)
    except Exception:
        return None
    return (
        m.filter(F.col("status") == "completed")
        .select(F.col("partition_key").cast("int").alias("bucket"))
        .distinct()
    )


def run_pipeline(
    spark: SparkSession,
    input_df: DataFrame,
    output_dir: str,
    cfg: FilterConfig | None = None,
    n_buckets: int = 32,
    run_id: str = "run-0",
    resume: bool = True,
    snapshot_id: str | None = None,
    ppl_table=None,
) -> PipelineResult:
    """Score + filter + scrub ``input_df`` (input_hint schema), writing:

    - ``{output_dir}/scored``  — ONE pass, partitioned by (keep, bucket):
      ``keep=1`` subtree = kept turns with scrubbed_text (the filtered
      table, sorted by (conv_id, turn_idx) within files); ``keep=0``
      subtree = per-row drop lineage (keys + reasons, no text payload).
    - ``{output_dir}/metrics`` — one lineage row per completed bucket,
      aggregated from the already-written columnar output (a pruned
      3-column scan), NOT from a cached recompute.

    Single-pass design: the expensive scoring projection (pandas-UDF
    langid/ppl + scrub) runs exactly once, streaming into the
    partitioned write — no ``persist`` of wide rows, no second scoring
    pass for metrics.  Metrics commit strictly after data commit, so a
    crash between the two leaves re-doable (never half-counted) buckets.
    """
    cfg = cfg or FilterConfig()
    out = Path(output_dir)
    scored_path = str(out / "scored")
    kept_path = scored_path + "/keep=1"
    metrics_path = str(out / "metrics")
    snap = snapshot_fingerprint(input_df, snapshot_id)

    df = with_bucket(input_df, n_buckets)

    skipped = 0
    done_buckets: list[int] = []
    if resume:
        done = read_completed_buckets(spark, metrics_path)
        if done is not None:
            done_buckets = [r.bucket for r in done.collect()]
            skipped = len(done_buckets)
            if skipped:
                df = df.join(F.broadcast(done), on="bucket", how="left_anti")

    # Nothing to do (fresh empty input, or every bucket already completed):
    # bail before the write — an empty partitioned write commits no part
    # files, and the metrics read below would fail schema inference.
    if df.isEmpty():
        return PipelineResult(kept_path, metrics_path, 0, skipped)

    # Repartition on the bucket key BEFORE scoring: (a) scoring parallelism
    # no longer depends on input file layout (a compact parquet would
    # otherwise serialize the pandas-UDF stage onto 1-2 scan partitions);
    # (b) data arrives at the sink already partitioned by bucket, so the
    # write needs no second shuffle.
    df = df.repartition(n_buckets, "bucket")

    scored = score_turns(df, spark, cfg, ppl_table=ppl_table)

    if cfg.conv_min_keep_frac > 0:
        # Conversation-level demotion costs exactly ONE extra shuffle,
        # and the window itself adds none: the scalar-pandas-UDF scoring
        # stage does not propagate its child's output partitioning
        # (EvalPythonExec reports unknown — measured: any
        # distribution-requiring op after a pandas UDF re-shuffles even
        # on the identical key), so the bucket partitioning must be
        # re-established here anyway.  The explicit repartition both
        # restores the one-directory-per-task sink layout AND satisfies
        # the rollup window's (bucket, conv_id) clustered distribution
        # by the subset rule — bucket is a pure function of conv_id —
        # so the window runs with an in-partition sort only
        # (plan-asserted in tests).  scrubbed_text is re-nulled for
        # demoted turns so the keep=0 lineage subtree stays
        # payload-free.
        from dp_data_quality_spark.ops.convstats import rollup_keep_by_conversation

        scored = rollup_keep_by_conversation(
            scored.repartition(n_buckets, "bucket"),
            cfg.conv_min_keep_frac,
            bucket_col="bucket",
        ).withColumn(
            "scrubbed_text", F.when(F.col("keep"), F.col("scrubbed_text"))
        )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # AQE partition coalescing can fold the 64-bucket shuffle into a
    # handful of post-shuffle partitions at small scale, serializing the
    # pandas-UDF scoring stage (observed 2-3× wall-time regressions on
    # local[32]).  The bucket count IS the intended parallelism unit here;
    # at 100 TB each bucket far exceeds the advisory size and coalescing
    # would be a no-op anyway — disable it for this job.
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    out_cols = [
        F.col("keep").cast("int").alias("keep"),  # int: partition-col type survives re-read
        "bucket", "conv_id", "turn_idx", "role", "tool", "ts",
        "lang", "lang_conf", "ppl", "scrubbed_text", "drop_reasons",
    ]
    try:
        (
            scored.select(*out_cols)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.partitionBy("keep", "bucket")
            .mode("overwrite")
            .parquet(scored_path)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)

    # lineage metrics from the committed output: pruned columnar scan of
    # (keep, bucket, drop_reasons) only — the text columns are never read.
    written = spark.read.parquet(scored_path)
    if done_buckets:
        written = written.filter(~F.col("bucket").isin(done_buckets))
    base = written.groupBy("bucket").agg(
        F.count("*").alias("rows_in"),
        F.sum(F.col("keep")).alias("rows_kept"),
    )
    hits = (
        written.select("bucket", F.explode("drop_reasons").alias("reason"))
        .groupBy("bucket", "reason")
        .count()
        .groupBy("bucket")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("reason", "count"))).alias("rule_hits"))
    )
    metrics = (
        base.join(hits, on="bucket", how="left")
        .select(
            F.col("bucket").cast("string").alias("partition_key"),
            F.lit(snap).alias("snapshot_id"),
            F.col("rows_in"),
            F.col("rows_kept"),
            (F.col("rows_in") - F.col("rows_kept")).alias("rows_dropped"),
            F.coalesce(
                "rule_hits",
                F.create_map().cast("map<string,bigint>"),
            ).alias("rule_hits"),
            F.lit("completed").alias("status"),
            F.lit(run_id).alias("run_id"),
            F.current_timestamp().alias("completed_at"),
        )
    )
    buckets = metrics.count()
    if buckets:
        metrics.write.mode("append").parquet(metrics_path)
    return PipelineResult(kept_path, metrics_path, buckets, skipped)
