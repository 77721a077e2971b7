"""Hypothesis property tests for the in-engine LM family (ops/lm.py)
and BPE (ops/bpe.py): for ARBITRARY ASCII text (including the Java-\\s
whitespace edge cases that motivated test_property_textstats), the
engine must agree exactly with pure-Python references that mirror the
Java/RE2 semantics (trim strips 0x20 only; \\s is the ASCII class).

Each hypothesis example runs ONE batched Spark job over the whole
generated corpus, never a job per string."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dp_data_quality_spark.ops import bpe, lm

ALPHABET = st.characters(min_codepoint=32, max_codepoint=126)
TEXTS = st.lists(
    st.text(alphabet=st.one_of(ALPHABET, st.sampled_from("\t\n\x0b\f\r")),
            max_size=50),
    min_size=1,
    max_size=25,
)

JAVA_WS = " \t\n\x0b\f\r"


def _words_py(s):
    if s is None:
        return []
    t = re.sub(f"[{JAVA_WS}]+", " ", s.strip(" ").lower())
    return [w for w in t.split(" ") if w]


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_fluency_property(spark, texts):
    rows = list(enumerate(texts))
    cnt, tot, vocab = Counter(), Counter(), set()
    for _, t in rows:
        ws = _words_py(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            cnt[(a, b)] += 1
            tot[a] += 1
    v = len(vocab)
    ref = {}
    for did, t in rows:
        ws = _words_py(t)
        trans = list(zip(ws, ws[1:]))
        if not trans:
            continue
        s = sum(
            (lm.SCALE * (tot.get(a, 0) + v)) // (cnt.get((a, b), 0) + 1)
            for a, b in trans
        )
        ref[did] = (s, len(trans))

    df = spark.createDataFrame(rows, "doc_id int, text string")
    counts, totals, vdf = lm.train_word_lm(df)
    assert lm.get_vocab_size(vdf) == v
    got = {
        r["doc_id"]: (r["inv_sum"], r["n_trans"])
        for r in lm.fluency_scores(df, counts, totals, v).collect()
    }
    assert got == ref


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**13),
                min_size=1, max_size=200))
def test_qlog2_property(spark, vals):
    import pytest

    duckdb = pytest.importorskip("duckdb")

    ref = {m: lm.qlog2_py(m) for m in vals}
    df = spark.createDataFrame([(v,) for v in set(vals)], "m long")
    got = {
        r["m"]: r["q"]
        for r in df.select("m", F.expr(lm.qlog2_spark("m")).alias("q")).collect()
    }
    assert got == {m: q for m, q in ref.items()}
    con = duckdb.connect()
    got_duck = dict(
        con.sql(
            f"SELECT m, {lm.qlog2_duckdb('m')} "
            f"FROM (SELECT unnest({sorted(set(vals))}) AS m)"
        ).fetchall()
    )
    assert got_duck == ref


@settings(max_examples=3, deadline=None)
@given(TEXTS)
def test_bpe_property(spark, texts):
    # ONE pure-Python BPE reference for the whole suite
    from tests.test_bpe import _py_bpe

    rows = list(enumerate(texts))
    wc = Counter()
    for _, t in rows:
        wc.update(_words_py(t))
    ref, _tok = _py_bpe(wc, 4)
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert bpe.train_bpe(df, 4) == ref


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab c"), min_size=0, max_size=30).map("".join),
        min_size=1,
        max_size=12,
    )
)
def test_duplicated_spans_property(spark, texts):
    """Gaps-and-islands span merging under a tiny alphabet (duplicates
    are dense, so island boundaries — adjacent, overlapping, exactly
    k-apart — are all exercised) must match the pure-Python
    sliding-window reference."""
    from dp_data_quality_spark.ops import dedup as D

    K = 3
    rows = list(enumerate(texts))
    gram_count = Counter()
    words_by_doc = {}
    for did, t in rows:
        ws = _words_py(t)
        words_by_doc[did] = ws
        for p in range(len(ws) - K + 1):
            gram_count[tuple(ws[p : p + K])] += 1
    ref = set()
    for did, _ in rows:
        ws = words_by_doc[did]
        hits = [
            p
            for p in range(len(ws) - K + 1)
            if gram_count[tuple(ws[p : p + K])] >= 2
        ]
        spans = []
        for p in hits:
            if spans and p - spans[-1][1] <= K:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        ref |= {(did, s, e - s + K) for s, e in spans}

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in D.duplicated_spans(df, k=K).collect()
    }
    assert got == ref
