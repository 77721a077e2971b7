"""End-to-end pipeline tests: golden-label fidelity vs the pure-Python
oracle (keep/drop F1 and byte-identical scrub), synthesis determinism,
checkpoint-resume, and stable output ordering under input perturbation.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dp_data_quality_spark import synth
from dp_data_quality_spark.config import FilterConfig
from dp_data_quality_spark.pipeline import run_pipeline, score_turns, with_bucket

from .oracle_util import decide_oracle, f1

CFG = FilterConfig()
N_CONVS = 120
SEED = 42


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth.strip_truth(synth.transcripts(spark, N_CONVS, seed=SEED)).cache()


def test_synth_deterministic(spark):
    a = synth.transcripts(spark, 50, seed=7).orderBy("conv_id", "turn_idx").collect()
    b = synth.transcripts(spark, 50, seed=7).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    c = synth.transcripts(spark, 50, seed=8).orderBy("conv_id", "turn_idx").collect()
    assert a != c


def test_synth_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    types = {f.name: f.dataType.simpleString() for f in transcripts.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"


def test_keep_drop_and_scrub_match_oracle(spark, transcripts):
    scored = score_turns(transcripts, spark, CFG)
    rows = scored.select("conv_id", "turn_idx", "text", "keep",
                         "drop_reasons", "scrubbed_text").collect()
    assert len(rows) > 500

    tp = fp = fn = 0
    mismatched_scrubs = []
    reason_mismatches = []
    for r in rows:
        keep_o, reasons_o, scrub_o = decide_oracle(r.text, CFG)
        if r.keep and keep_o:
            tp += 1
        elif r.keep and not keep_o:
            fp += 1
        elif keep_o and not r.keep:
            fn += 1
        if keep_o and r.keep and r.scrubbed_text != scrub_o:
            mismatched_scrubs.append((r.text, r.scrubbed_text, scrub_o))
        if sorted(r.drop_reasons) != sorted(reasons_o):
            reason_mismatches.append((r.text, r.drop_reasons, reasons_o))

    score = f1(tp, fp, fn)
    assert score >= 0.99, f"keep/drop F1={score} (tp={tp} fp={fp} fn={fn})"
    assert not mismatched_scrubs, mismatched_scrubs[:3]
    assert not reason_mismatches, reason_mismatches[:3]


def test_pipeline_writes_and_lineage(spark, transcripts, tmp_path):
    res = run_pipeline(spark, transcripts, str(tmp_path / "out"),
                       cfg=CFG, n_buckets=8, run_id="r1")
    kept = spark.read.parquet(res.kept_path)
    metrics = spark.read.parquet(res.metrics_path)

    assert res.buckets_processed == metrics.count() > 0
    total_in = metrics.agg(F.sum("rows_in")).first()[0]
    total_kept = metrics.agg(F.sum("rows_kept")).first()[0]
    assert total_in == transcripts.count()          # lineage covers every row
    assert total_kept == kept.count()
    assert metrics.filter("rows_in != rows_kept + rows_dropped").count() == 0
    # every metrics row carries the snapshot fingerprint + completion status
    assert metrics.filter("status != 'completed'").count() == 0
    hit_maps = metrics.select("rule_hits").collect()
    all_reasons = {k for r in hit_maps for k in (r.rule_hits or {})}
    assert "lang_mismatch" in all_reasons
    assert "null_text" in all_reasons


def test_pipeline_resume_skips_completed(spark, transcripts, tmp_path):
    out = str(tmp_path / "out")
    full = run_pipeline(spark, transcripts, out, cfg=CFG, n_buckets=8, run_id="r1")
    kept_full = spark.read.parquet(full.kept_path)
    baseline = sorted(map(tuple, kept_full.select("conv_id", "turn_idx").collect()))

    # simulate a crash after 3 buckets: keep only 3 metrics rows
    metrics = spark.read.parquet(full.metrics_path)
    partial = metrics.limit(3).cache()
    partial.count()
    import shutil

    shutil.rmtree(full.metrics_path)
    partial.write.mode("overwrite").parquet(full.metrics_path)

    res2 = run_pipeline(spark, transcripts, out, cfg=CFG, n_buckets=8, run_id="r2")
    assert res2.buckets_skipped == 3
    assert res2.buckets_processed == full.buckets_processed - 3

    kept2 = spark.read.parquet(res2.kept_path)
    assert sorted(map(tuple, kept2.select("conv_id", "turn_idx").collect())) == baseline
    # no bucket processed twice
    m2 = spark.read.parquet(res2.metrics_path)
    assert m2.groupBy("partition_key").count().filter("count > 1").count() == 0


def test_stable_ordering_under_input_shuffle(spark, transcripts, tmp_path):
    shuffled = transcripts.orderBy(F.rand(seed=1)).repartition(7)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    run_pipeline(spark, transcripts, out_a, cfg=CFG, n_buckets=4, run_id="ra")
    run_pipeline(spark, shuffled, out_b, cfg=CFG, n_buckets=4, run_id="rb")

    a = spark.read.parquet(out_a + "/scored/keep=1")
    b = spark.read.parquet(out_b + "/scored/keep=1")
    cols = ["conv_id", "turn_idx", "scrubbed_text"]
    pa = a.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    pb = b.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(pa, pb)
    # within each bucket file set, rows are already (conv_id, turn_idx) sorted
    one = a.filter("bucket = 0").select("conv_id", "turn_idx").toPandas()
    assert list(one.itertuples(index=False)) == sorted(one.itertuples(index=False))


def test_skew_mega_thread_completes(spark, tmp_path):
    df = synth.strip_truth(
        synth.transcripts(spark, 40, seed=3, mega_threads=1, mega_turns=20_000)
    )
    res = run_pipeline(spark, df, str(tmp_path / "out"), cfg=CFG,
                       n_buckets=8, run_id="skew")
    metrics = spark.read.parquet(res.metrics_path)
    assert metrics.agg(F.sum("rows_in")).first()[0] == df.count()


def test_intent_level_f1(spark):
    """Keep/drop vs the synthesizer's planted intent (the `_kind` truth
    column): clean/pii/toxic turns keep (PII+toxicity are scrubbed, not
    dropped); every planted defect kind drops.  BASELINE target ≥ 0.99."""
    df = synth.transcripts(spark, 400, seed=42)
    scored = score_turns(df, spark, CFG)
    keep_kinds = {"clean_en", "pii", "toxic"}
    rows = scored.select("_kind", "keep").groupBy("_kind", "keep").count().collect()
    tp = fp = fn = 0
    for r in rows:
        if r._kind in keep_kinds:
            if r.keep:
                tp += r["count"]
            else:
                fn += r["count"]
        elif r.keep:
            fp += r["count"]
    score = f1(tp, fp, fn)
    assert score >= 0.995, f"intent F1={score} (tp={tp} fp={fp} fn={fn})"


def test_crash_between_data_and_metrics_is_idempotent(spark, transcripts, tmp_path):
    """Worst-case crash window: all data partitions written, metrics
    commit never happened.  A rerun must reprocess (no completed buckets
    recorded) and converge to the same final tables — dynamic partition
    overwrite makes the data write idempotent."""
    import shutil

    out = str(tmp_path / "out")
    full = run_pipeline(spark, transcripts, out, cfg=CFG, n_buckets=8, run_id="r1")
    baseline = sorted(map(tuple, spark.read.parquet(full.kept_path)
                          .select("conv_id", "turn_idx").collect()))
    shutil.rmtree(full.metrics_path)  # simulate dying before metrics commit

    res2 = run_pipeline(spark, transcripts, out, cfg=CFG, n_buckets=8, run_id="r2")
    assert res2.buckets_skipped == 0
    assert res2.buckets_processed == full.buckets_processed
    kept2 = sorted(map(tuple, spark.read.parquet(res2.kept_path)
                       .select("conv_id", "turn_idx").collect()))
    assert kept2 == baseline
    m = spark.read.parquet(res2.metrics_path)
    assert m.groupBy("partition_key").count().filter("count > 1").count() == 0


def test_empty_input_returns_clean_result(spark, transcripts, tmp_path):
    # a fresh run over zero rows must not attempt the metrics read
    # (no part files are committed -> schema inference would fail)
    empty = transcripts.filter(F.lit(False))
    res = run_pipeline(spark, empty, str(tmp_path / "out"), n_buckets=4, run_id="r0")
    assert res.buckets_processed == 0
    assert res.buckets_skipped == 0


def test_transcripts_pipeline_pinned(spark):
    # the driver oracle for transcripts_pipeline is a pinned VALUES table
    # (the seeded synthetic input makes the output a constant); recompute
    # it here so any scoring-semantics drift fails CI before the driver
    # ever compares against a stale pin.
    import __spark_entry__ as E

    got = sorted(
        ((r.reason, r["count"]) for r in
         E.q_transcripts_pipeline(spark, "unused").collect()),
        key=lambda t: (t[0] is None, t[0] or ""),
    )
    assert got == sorted(
        E.TRANSCRIPTS_PIPELINE_PINNED, key=lambda t: (t[0] is None, t[0] or "")
    )


def test_conversation_rollup_demotes_whole_conversations(spark, transcripts, tmp_path):
    cfg = FilterConfig(conv_min_keep_frac=0.6)
    res = run_pipeline(spark, transcripts, str(tmp_path / "roll"),
                       cfg=cfg, n_buckets=8, run_id="r")
    scored = spark.read.parquet(str(tmp_path / "roll" / "scored"))

    # per conversation, either every turn survived the rollup intact or
    # the whole conversation was demoted; demoted kept-turns carry the
    # rollup reason
    frac = scored.groupBy("conv_id").agg(
        F.avg(F.col("keep")).alias("kept_frac"),
        F.sum(F.array_contains("drop_reasons", "conv_low_keep_frac")
              .cast("int")).alias("n_rollup_reason"),
    ).collect()
    demoted = {r.conv_id for r in frac if r.n_rollup_reason > 0}
    for r in frac:
        if r.conv_id in demoted:
            assert r.kept_frac == 0.0, r  # demotion is all-or-nothing
        # conversations at/above the threshold never carry the reason
    # cross-check against the default run: every demoted conversation
    # had keep_frac < 0.6 there, every untouched one >= 0.6
    base = run_pipeline(spark, transcripts, str(tmp_path / "base"),
                        cfg=CFG, n_buckets=8, run_id="b")
    base_frac = {
        r.conv_id: r.f
        for r in spark.read.parquet(str(tmp_path / "base" / "scored"))
        .groupBy("conv_id").agg(F.avg(F.col("keep")).alias("f")).collect()
    }
    assert demoted, "fixture should contain at least one low-quality conversation"
    for cid, f_ in base_frac.items():
        assert (cid in demoted) == (0 < f_ < 0.6), (cid, f_)


def test_conversation_rollup_window_rides_bucket_partitioning(spark, transcripts):
    # subset rule: a window over (bucket, conv_id) on a DataFrame
    # repartitioned by bucket alone must add NO Exchange (bucket is a
    # pure function of conv_id)
    from dp_data_quality_spark.ops.convstats import rollup_keep_by_conversation

    df = (with_bucket(transcripts, 8)
          .withColumn("keep", F.length("text") > 5)
          .withColumn("drop_reasons", F.array().cast("array<string>"))
          .repartition(8, "bucket"))
    rolled = rollup_keep_by_conversation(df, 0.6, bucket_col="bucket")
    plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # only the repartition itself


def test_conversation_rollup_costs_exactly_one_extra_exchange(spark, transcripts):
    # through the full scoring stage: the scalar-pandas-UDF projection
    # does not propagate partitioning, so the rollup re-establishes the
    # bucket partitioning once — and the window adds nothing on top
    from dp_data_quality_spark.ops.convstats import rollup_keep_by_conversation

    def plan_for(rollup: bool):
        df = with_bucket(transcripts, 8).repartition(8, "bucket")
        scored = score_turns(df, spark, CFG)
        if rollup:
            scored = rollup_keep_by_conversation(
                scored.repartition(8, "bucket"), 0.6, bucket_col="bucket")
        return scored._jdf.queryExecution().executedPlan().toString()

    assert plan_for(True).count("Exchange") == plan_for(False).count("Exchange") + 1
