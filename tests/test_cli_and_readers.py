"""CLI entry point + format-sniffed reader tests."""

from __future__ import annotations

import json

import pytest

from dp_data_quality_spark import synth
from dp_data_quality_spark.sources.readers import read_any


@pytest.fixture(scope="module")
def tiny_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "input")
    synth.strip_truth(synth.transcripts(spark, 30, seed=2)).write.parquet(path)
    return path


def test_cli_filter(spark, tiny_parquet, tmp_path, monkeypatch, capsys):
    # run main() in-process (get_spark reuses the session fixture's JVM)
    from dp_data_quality_spark.__main__ import main

    out = str(tmp_path / "out")
    rc = main(["filter", "--input", tiny_parquet, "--output", out,
               "--n-buckets", "4", "--run-id", "t1"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["buckets_processed"] > 0
    assert spark.read.parquet(payload["metrics_path"]).count() == payload["buckets_processed"]


def test_cli_report(spark, tiny_parquet, tmp_path, capsys):
    from dp_data_quality_spark.__main__ import main
    from dp_data_quality_spark.config import ColumnSpec, RulesConfig

    rules = tmp_path / "rules.json"
    RulesConfig(columns=[
        ColumnSpec("conv_id", data_type="string", length_total=16),
        ColumnSpec("turn_idx", data_type="integer"),
        ColumnSpec("text", data_type="string", length_total=100),
    ]).to_json(rules)
    out = str(tmp_path / "report")
    rc = main(["report", "--input", tiny_parquet, "--output", out,
               "--rules-config", str(rules), "--table-name", "transcripts",
               "--key-cols", "conv_id,turn_idx"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["report_rows"] > 0  # planted nulls/PII guarantee hits


def test_read_any_csv_json(spark, tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = read_any(spark, str(csv))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}

    jsn = tmp_path / "t.json"
    jsn.write_text('{"k": 1, "nested": {"v": "a"}}\n{"k": 2, "nested": {"v": "b"}}\n')
    dj = read_any(spark, str(jsn))
    assert dj.count() == 2
    assert "nested_v" in dj.columns  # flattened

    with pytest.raises(ValueError):
        read_any(spark, "file.xyz")
