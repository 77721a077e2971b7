"""Fuzz the contract rules against the DuckDB oracle emulation.

The driver's correctness gate compares the Spark contract expressions
to hand-built DuckDB SQL twins (`__spark_entry__`).  The golden vectors
pin known quirks; this test hammers the emulation with 600 seeded
adversarial strings (numeric-ish shapes, signs, dots, exponents,
IP-ish, timestamp-ish, unicode digits, whitespace) so any regex-dialect
or cast-semantics drift between the engines fails loudly.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from dp_data_quality_spark.rules import contract as C

_CHARSETS = [
    "0123456789",
    "0123456789.+-eE",
    "0123456789.: /-,",
    "0123456789abcdef:",
    string.ascii_letters + " @.-",
    "٠١٢٣٤٥0123. ",  # arabic-indic digits
    " .+-",
]


def _vectors() -> list[str | None]:
    rng = random.Random(20260817)
    out: list[str | None] = [None, "", " ", "\t"]
    for cs in _CHARSETS:
        for _ in range(85):
            n = rng.randint(1, 14)
            out.append("".join(rng.choice(cs) for _ in range(n)))
    return out


@pytest.mark.parametrize("chunk", [0, 1])
def test_fuzz_contract_rules_match_oracle(spark, chunk):
    vecs = _vectors()
    half = len(vecs) // 2
    vecs = vecs[:half] if chunk == 0 else vecs[half:]
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
        f"({i}, " + ("NULL" if v is None else "'" + v.replace("'", "''") + "'") + ")"
        for i, v in enumerate(vecs)
    )
    FB, DB = C.FLOAT_BOUNDS, C.DOUBLE_BOUNDS
    from dp_data_quality_spark.rules import regexes as rx

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

    mismatches = []
    for i in sdf.index:
        for col in sdf.columns:
            sv, ov = bool(sdf.at[i, col]), bool(odf.at[i, col])
            if sv != ov:
                mismatches.append((vecs[i], col, sv, ov))
    assert not mismatches, mismatches[:10]


def test_fuzz_scrub_byte_identity(spark):
    """Scrub chain byte-identity across regex engines: Spark (Java) vs
    DuckDB (RE2) on adversarial PII-adjacent strings."""
    from dp_data_quality_spark.config import FilterConfig
    from dp_data_quality_spark.functions.scrub import scrub_text
    from dp_data_quality_spark.rules import regexes as rx

    rng = random.Random(77)
    frags = [
        "bob@x.io", "a.b-c@mail.example.org", "@@", "a@b", "a@b.co",
        "303-555-1234", "(720) 555-9876", "+1 415-555-2468", "212.555.1357",
        "123-45-6789", "12-345-6789", "1234-56-789",
        "192.168.1.100", "8.8.8.8", "999.1.1.1", "1.2.3.4.5", "10.0.42.7",
        "frakking", "FRAKKING", "frakkingly", "gorram", "smeghead",
        "x", "7", ".", "-", " ", "",
    ]
    texts = []
    for _ in range(300):
        n = rng.randint(1, 6)
        texts.append(" ".join(rng.choice(frags) for _ in range(n)))

    lex = FilterConfig().toxicity_lexicon
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "idx int, text string")
    got = {
        r.idx: r.s
        for r in df.select("idx", scrub_text(F.col("text"), lex).alias("s")).collect()
    }

    steps = [
        (rx.SCRUB_EMAIL, "<EMAIL>"),
        (rx.SCRUB_SSN, "<SSN>"),
        (rx.SCRUB_PHONE, "<PHONE>"),
        (rx.SCRUB_IPV4, "<IP>"),
    ]
    expr = "text"
    for pattern, token in steps:
        expr = f"regexp_replace({expr}, '{pattern.replace(chr(39), chr(39)*2)}', '{token}', 'g')"
    lex_alt = "|".join(lex)
    expr = f"regexp_replace({expr}, '(?i)\\b({lex_alt})\\b', '<TOX>', 'g')"
    rows = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in enumerate(texts)
    )
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT idx, {expr} AS s FROM (VALUES {rows}) t(idx, text)"
        ).fetchall()
    }
    con.close()
    diffs = [(texts[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not diffs, diffs[:5]
