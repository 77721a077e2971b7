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


def test_rules_config_from_reference_csv(tmp_path):
    from dp_data_quality_spark.config import RulesConfig

    csv = tmp_path / "meta.csv"
    csv.write_text(
        "Attribute_Name,Data_Type,Nullable,Data_Structure,Lookup_Table_Name,"
        "Enhance_Table_Name,IS_PCI,IS_PII,IS_CPNI,Description,Data_Type_Length_Total\n"
        "user.id,integer,N,,,,N,Y,N,user key,10\n"
        "email,varchar,Y,,,,N,Y,N,,254.0\n"
        "weird_col,frobnicate,Y,,,,N,N,N,,\n"
        ",string,Y,,,,N,N,N,skipped blank name,\n"
    )
    cfg = RulesConfig.from_reference_csv(csv)
    by_name = {c.attribute_name: c for c in cfg.columns}
    assert set(by_name) == {"user_id", "email", "weird_col"}  # '.'→'_', blank dropped
    assert by_name["user_id"].data_type == "integer"
    assert by_name["user_id"].length_total == 10
    assert by_name["user_id"].is_pii and not by_name["user_id"].nullable
    assert by_name["email"].length_total == 254          # float-formatted length
    assert by_name["weird_col"].data_type is None        # unknown type → skipped


def test_cli_report_no_issues_marker(spark, tmp_path, capsys):
    import json as _json

    from dp_data_quality_spark.__main__ import main
    from dp_data_quality_spark.config import ColumnSpec, RulesConfig

    clean = str(tmp_path / "clean.parquet")
    spark.createDataFrame([("k1", "1"), ("k2", "2")], ["k", "num_col"]) \
        .write.parquet(clean)
    rules = tmp_path / "rules.json"
    RulesConfig(columns=[
        ColumnSpec("k", data_type="string"),
        ColumnSpec("num_col", data_type="integer"),
    ]).to_json(rules)
    out = str(tmp_path / "report")
    rc = main(["report", "--input", clean, "--output", out,
               "--rules-config", str(rules), "--table-name", "clean_t",
               "--key-cols", "k"])
    assert rc == 0
    payload = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["report_rows"] == 0
    # reference parity (quality_report.py:220-227): clean table -> a
    # human-readable no-issues artifact
    marker = payload["no_issues_marker"]
    assert marker and marker.endswith("_NO_ISSUES.txt")
    text = open(marker).read()
    assert "clean_t" in text and "does not have any data quality issues" in text
