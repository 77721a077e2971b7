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
