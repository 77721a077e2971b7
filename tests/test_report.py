"""Tests for the distributed quality report (plans/report.py) — same
row-granular attribution as the reference's quality_report.py:229-273,
assembled in one distributed pass."""

from __future__ import annotations

from dp_data_quality_spark.config import ColumnSpec, RulesConfig
from dp_data_quality_spark.plans.report import REPORT_COLUMNS, build_quality_report


def _config():
    return RulesConfig(columns=[
        ColumnSpec("num_col", "integer"),
        ColumnSpec("ip_col", "ipv4"),
        ColumnSpec("name", "varchar", length_total=5),
        ColumnSpec("ghost_col", "string"),   # not in data → rule 2
    ])


def _data(spark):
    rows = [
        # key, num_col, ip_col, name, free_text
        ("k1", "42", "1.2.3.4", "bob", "hello"),
        ("k2", "not-int", "999.1.1.1", "toolongname", "alice@example.com"),
        ("k3", None, "10.0.0.1", "eve", "hello"),
        ("k4", "42", "1.2.3.4", "bob", "hello"),  # duplicate of k1 content
    ]
    return spark.createDataFrame(rows, ["k", "num_col", "ip_col", "name", "free_text"])


def test_report_schema_and_hits(spark):
    report = build_quality_report(
        _data(spark), _config(), table_name="t", key_cols=["k"]
    )
    assert report.columns == ["DQ_REPORT_ID"] + REPORT_COLUMNS
    rows = report.collect()
    hits = {(r.VALIDATION_ID, r.COLUMN_NAME, r.PRIMARY_KEY_VALUE) for r in rows}

    assert (2, "GHOST_COL", None) in hits            # metadata col missing from data
    assert (1, "K", None) in hits                    # data col not governed
    assert (1, "FREE_TEXT", None) in hits
    assert (3, "NUM_COL", "k3") in hits              # null value
    assert (5, "NUM_COL", "k2") in hits              # not integer
    assert (12, "IP_COL", "k2") in hits              # not ipv4
    assert (11, "NAME", "k2") in hits                # varchar too long
    assert (16, "FREE_TEXT", "k2") in hits           # PII email
    assert (17, None, "k4") in hits                  # duplicate row (non-first)
    assert (17, None, "k1") not in hits              # first copy kept
    # clean cells produce no report rows
    assert (5, "NUM_COL", "k1") not in hits
    assert (12, "IP_COL", "k1") not in hits


def test_report_validation_messages(spark):
    report = build_quality_report(
        _data(spark), _config(), table_name="t", key_cols=["k"]
    )
    msgs = {r.VALIDATION_ID: (r.VALIDATION_CATEGORY, r.VALIDATION_MESSAGE)
            for r in report.collect()}
    assert msgs[3] == ("Generic Validation", "Null value")
    assert msgs[5] == ("Datatype Specific", "Expected integer datatype")
    assert msgs[16] == ("Sensitive Validation", "Encountered sensitive information")
    assert msgs[17] == ("Generic Validation", "Duplicate row")


def test_report_clean_table_is_empty(spark):
    df = spark.createDataFrame([("k1", "1"), ("k2", "2")], ["k", "num_col"])
    config = RulesConfig(columns=[ColumnSpec("k", "string"), ColumnSpec("num_col", "integer")])
    report = build_quality_report(df, config, table_name="t", key_cols=["k"])
    assert report.count() == 0


def test_report_id_surrogate(spark):
    # DQ_REPORT_ID matches the reference's np.arange(1, len+1) surrogate
    # (quality_report.py:207-208): dense 1-based ints over a deterministic
    # total order, identical across reruns.
    report = build_quality_report(
        _data(spark), _config(), table_name="t", key_cols=["k"]
    )
    ids = sorted(r.DQ_REPORT_ID for r in report.collect())
    assert ids == list(range(1, len(ids) + 1))
    again = build_quality_report(
        _data(spark), _config(), table_name="t", key_cols=["k"]
    )
    key = lambda rows: {r.DQ_REPORT_ID: (r.VALIDATION_ID, r.COLUMN_NAME,
                                         r.PRIMARY_KEY_VALUE) for r in rows}
    assert key(report.collect()) == key(again.collect())
    # opt-out path for huge reports
    no_id = build_quality_report(
        _data(spark), _config(), table_name="t", key_cols=["k"],
        include_report_id=False,
    )
    assert no_id.columns == REPORT_COLUMNS


def test_report_synthetic_row_id(spark):
    # no natural key → global-window ROW_ID fallback (parity mode)
    df = spark.createDataFrame([("a",), (None,)], ["c"])
    config = RulesConfig(columns=[ColumnSpec("c", "string")])
    report = build_quality_report(df, config, table_name="t", key_cols=None)
    rows = [r for r in report.collect() if r.VALIDATION_ID == 3]
    assert len(rows) == 1 and rows[0].PRIMARY_KEY_VALUE == "2"
