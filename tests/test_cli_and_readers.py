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


def test_read_orc_roundtrip(spark, tmp_path):
    """ORC round-trip through the sniffed dispatch: write a small table
    as ORC, read it back via read_any, values and schema survive."""
    src = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", -2.0), (3, None, 0.0)],
        "id long, s string, v double",
    )
    path = str(tmp_path / "t.orc")
    src.write.mode("overwrite").orc(path)
    df = read_any(spark, path)
    assert df.columns == ["id", "s", "v"]
    assert sorted((r.id, r.s, r.v) for r in df.collect()) == [
        (1, "x", 1.5), (2, "y", -2.0), (3, None, 0.0)]


def test_read_orc_pushdown_plan(spark, tmp_path):
    """Filters and projections reach the ORC scan — PushedFilters is
    populated and the read schema is pruned to the selected column."""
    spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(100)],
        "id long, s string, v double",
    ).write.mode("overwrite").orc(str(tmp_path / "p.orc"))
    from dp_data_quality_spark.sources.readers import read_orc

    q = read_orc(spark, str(tmp_path / "p.orc")).filter("id > 90").select("s")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(id)" in plan
    assert "struct<id:bigint,s:string>" in plan.replace(" ", "") or "ReadSchema" in plan
    assert q.count() == 9


def test_read_avro_clear_error_when_package_absent(spark, tmp_path):
    """Without spark-avro on the classpath, read_avro raises the
    documented NotImplementedError (not an opaque Java stack)."""
    from dp_data_quality_spark.sources.readers import read_avro

    try:
        df = read_avro(spark, str(tmp_path / "missing.avro"))
        df.count()  # pragma: no cover — only if avro IS on the classpath
    except NotImplementedError as e:
        assert "spark-avro" in str(e)
    except Exception:
        # avro source present but file missing — also acceptable
        pass


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


def _write_min_xlsx(path, sheet_name="DPI-1"):
    """Hand-rolled OOXML workbook: 4 title rows, header on spreadsheet
    row 5 (pandas header=4), two metadata rows; mixes shared strings,
    inline strings and numbers; sparse cells."""
    import zipfile

    ss = ["Attribute_Name", "Data_Type", "Nullable", "IS_PII",
          "Data_Type_Length_Total", "cust.name", "varchar", "Y",
          "cust.age", "integer"]
    sst = "".join(f"<si><t>{s}</t></si>" for s in ss)
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>Data Product Metadata</t></is></c></row>
<row r="5"><c r="A5" t="s"><v>0</v></c><c r="B5" t="s"><v>1</v></c><c r="C5" t="s"><v>2</v></c><c r="D5" t="s"><v>3</v></c><c r="E5" t="s"><v>4</v></c></row>
<row r="6"><c r="A6" t="s"><v>5</v></c><c r="B6" t="s"><v>6</v></c><c r="C6" t="s"><v>7</v></c><c r="D6" t="s"><v>7</v></c><c r="E6"><v>40</v></c></row>
<row r="7"><c r="A7" t="s"><v>8</v></c><c r="B7" t="s"><v>9</v></c></row>
</sheetData></worksheet>"""
    workbook = f"""<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""
    sstxml = f"""<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">{sst}</sst>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sstxml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def test_rules_config_from_xlsx_direct(tmp_path):
    # direct XLSX metadata read (read_data.py:123-137 semantics: sheet
    # DPI-1, header=4, '.'->'_' attribute normalization) — stdlib only
    from dp_data_quality_spark.config import RulesConfig

    p = str(tmp_path / "meta.xlsx")
    _write_min_xlsx(p)
    cfg = RulesConfig.from_reference_xlsx(p)
    assert cfg.attribute_names() == ["cust_name", "cust_age"]
    name = cfg.spec_for("CUST_NAME")
    assert name.data_type == "varchar" and name.nullable and name.is_pii
    assert name.length_total == 40
    age = cfg.spec_for("cust_age")
    assert age.data_type == "integer" and not age.nullable and not age.is_pii
