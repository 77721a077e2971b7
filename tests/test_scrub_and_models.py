"""Unit tests for the scrub chain (byte-exact golden strings), the langid
scorer and the perplexity scorer."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dp_data_quality_spark.config import FilterConfig
from dp_data_quality_spark.functions.langid import _TABLE as LT
from dp_data_quality_spark.functions.langid import make_langid_udf, score_batch
from dp_data_quality_spark.functions.perplexity import (
    PPL_UNSCORABLE,
    _TABLE as PT,
    make_ppl_udf,
    ppl_batch,
)
from dp_data_quality_spark.functions.scrub import scrub_text

LEX = FilterConfig().toxicity_lexicon

GOLDEN_SCRUBS = [
    ("mail alice.smith@example.com now", "mail <EMAIL> now"),
    ("call 303-555-1234 today", "call <PHONE> today"),
    ("call (720) 555-9876 today", "call <PHONE> today"),
    ("call +1 415-555-2468 today", "call <PHONE> today"),
    ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
    ("host 192.168.1.100 down", "host <IP> down"),
    ("ipv4 8.8.8.8.", "ipv4 <IP>."),
    ("you frakking fool", "you <TOX> fool"),
    ("you FRAKKING fool", "you <TOX> fool"),          # case-insensitive
    ("Frakkingly fine", "Frakkingly fine"),           # word boundary respected
    ("two bob-jones@mail.example.org and 10.0.42.7", "two <EMAIL> and <IP>"),
    # SSN scrubbed before the phone pattern could partially eat it
    ("123-45-6789", "<SSN>"),
    ("no pii here", "no pii here"),
    ("", ""),
]


def test_scrub_golden_bytes(spark):
    df = spark.createDataFrame([(t,) for t, _ in GOLDEN_SCRUBS], ["text"])
    out = df.select(scrub_text(F.col("text"), LEX).alias("s")).collect()
    got = [r.s for r in out]
    want = [w for _, w in GOLDEN_SCRUBS]
    assert got == want


def test_scrub_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(scrub_text(F.col("text"), LEX).alias("s")).first().s is None


def test_langid_discriminates():
    out = score_batch(pd.Series([
        "the quick brown fox jumps over the lazy dog near the quiet valley",
        "le renard brun saute par dessus la vallée tranquille du matin",
        "der schnelle braune fuchs springt über das stille tal am morgen",
        "el zorro marrón salta sobre el valle tranquilo de la mañana",
    ]), LT)
    assert list(out.lang) == ["en", "fr", "de", "es"]
    assert (out.lang_conf > 0.9).all()


def test_langid_und_for_tiny_or_null():
    out = score_batch(pd.Series(["", None, "ab"]), LT)
    assert list(out.lang) == ["und"] * 3
    assert (out.lang_conf == 0.0).all()


def test_ppl_ordering():
    ppl = ppl_batch(pd.Series([
        "the quick brown fox jumps over the lazy dog",   # fluent in-domain
        "@#$%^&*! @#$%^&*! zzqx jkwv",                    # gibberish
        "",                                               # unscorable
    ]), PT)
    assert ppl[0] < ppl[1]
    assert ppl[2] == PPL_UNSCORABLE


def test_udfs_run_in_spark(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",), (None,)], ["text"]
    )
    lang_udf = make_langid_udf(spark)
    ppl_udf = make_ppl_udf(spark)
    rows = df.select(
        lang_udf("text").alias("l"), ppl_udf("text").alias("p")
    ).collect()
    assert rows[0].l.lang == "en" and rows[0].p < PPL_UNSCORABLE
    assert rows[1].l.lang == "und" and rows[1].p == PPL_UNSCORABLE
