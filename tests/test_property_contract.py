"""Hypothesis property test: the 11 datatype/PII contract predicates
must agree with their DuckDB oracle twins for ARBITRARY strings — the
generative, shrinking complement to the seeded 600-string fuzz in
test_fuzz_contract_oracle.py.  Strategies mix plain printable ASCII
with structured near-valid shapes (numeric-ish, IP-ish, timestamp-ish)
where the two regex dialects and cast semantics are most likely to
drift.  Each example is ONE batched Spark job + one DuckDB query."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as E
from dp_data_quality_spark.rules import contract as C
from dp_data_quality_spark.rules import regexes as rx

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=16
)
NUMERICISH = st.from_regex(
    r"[+-]?[0-9]{0,10}(\.[0-9]{0,6})?([eE][+-]?[0-9]{0,3})?", fullmatch=True
)
IPISH = st.from_regex(r"[0-9]{1,4}(\.[0-9]{1,4}){3}", fullmatch=True)
TSISH = st.from_regex(
    r"[0-9]{2,4}[-/][0-9]{1,2}[-/][0-9]{1,4}"
    r"( [0-9]{1,2}:[0-9]{2}:[0-9]{2}(,[0-9]{1,3})?)?",
    fullmatch=True,
)
VEC = st.one_of(ASCII, NUMERICISH, IPISH, TSISH)


def _compare(spark, vecs: list[str]) -> list[tuple]:
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "idx int, value string"
    )
    c = F.col("value")
    sdf = df.select(
        "idx",
        C.numeric_fail(c).alias("numeric_fail"),
        C.integer_fail(c).alias("integer_fail"),
        C.short_fail(c).alias("short_fail"),
        C.long_fail(c).alias("long_fail"),
        C.float_fail(c).alias("float_fail"),
        C.double_fail(c).alias("double_fail"),
        C.ipv4_fail(c).alias("ipv4_fail"),
        C.ipv6_fail(c).alias("ipv6_fail"),
        C.epoch_fail(c).alias("epoch_fail"),
        C.timestamp_fail(c).alias("timestamp_fail"),
        C.pii_fail(c).alias("pii_fail"),
    ).toPandas().set_index("idx").sort_index()

    rows = ", ".join(
        f"({i}, '" + v.replace("'", "''") + "')" for i, v in enumerate(vecs)
    )
    FB, DB = C.FLOAT_BOUNDS, C.DOUBLE_BOUNDS
    sql = f"""
SELECT idx,
       {E._sql_numeric_fail('value')} AS numeric_fail,
       {E._sql_integral_fail('value', -2147483648, 2147483647)} AS integer_fail,
       {E._sql_integral_fail('value', -32768, 32767)} AS short_fail,
       {E._sql_integral_fail('value', -9223372036854775808, 9223372036854775807)} AS long_fail,
       {E._sql_fractional_fail('value', 'FLOAT', FB[0], FB[1], FB[2], FB[3])} AS float_fail,
       {E._sql_fractional_fail('value', 'DOUBLE', DB[0], DB[1], DB[2], DB[3])} AS double_fail,
       {E._sql_nn('value', 'NOT ' + E._sql_rlike('value', rx.IPV4_RE2))} AS ipv4_fail,
       {E._sql_nn('value', 'NOT ' + E._sql_rlike('value', rx.IPV6_RE2))} AS ipv6_fail,
       {E._sql_epoch_fail('value')} AS epoch_fail,
       {E._sql_nn('value', f"NOT ({E._sql_rlike('value', rx.TIMESTAMP_YMD_RE2)} OR {E._sql_rlike('value', rx.TIMESTAMP_DMY_RE2)})")} AS timestamp_fail,
       {E._sql_pii_fail('value')} AS pii_fail
FROM (VALUES {rows}) t(idx, value)
"""
    con = duckdb.connect()
    odf = con.sql(sql).df().set_index("idx").sort_index()
    con.close()
    mism = []
    for i in sdf.index:
        for col in sdf.columns:
            if bool(sdf.at[i, col]) != bool(odf.at[i, col]):
                mism.append((vecs[i], col, bool(sdf.at[i, col]), bool(odf.at[i, col])))
    return mism


@settings(max_examples=6, deadline=None)
@given(st.lists(VEC, min_size=1, max_size=40))
def test_contract_predicates_match_oracle_for_arbitrary_strings(spark, vecs):
    assert _compare(spark, vecs) == []
