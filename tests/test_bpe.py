"""In-engine BPE tokenizer training (ops/bpe.py), pinned against an
obviously-correct pure-Python reference: identical merge lists
(including the deterministic (count DESC, a, b) tie-break), identical
per-document token counts, at any partitioning, with early stop when
the corpus runs out of repeated pairs."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dp_data_quality_spark.ops import bpe

DOCS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "the lowly newt knew the low new"),
    (4, "wider wide widest low"),
    (5, None),
    (6, ""),
    (7, "a"),
]


def _toks(t):
    if not t:
        return []
    return [w for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]


def _py_bpe(word_counts, n_merges, min_count=2):
    tok = {w: ([*w[:-1]] + [w[-1] + bpe.EOW]) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in word_counts.items():
            t = tok[w]
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((a, b))
        for w, t in tok.items():
            out = []
            for x in t:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            tok[w] = out
    return merges, tok


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _reference(n_merges):
    wc = Counter()
    for _, t in DOCS:
        wc.update(_toks(t))
    merges, tok = _py_bpe(wc, n_merges)
    counts = {}
    for did, t in DOCS:
        ws = _toks(t)
        if not ws:
            continue
        counts[did] = (sum(len(tok[w]) for w in ws), len(ws))
    return merges, counts


def test_bpe_merges_and_counts_match_reference(spark, docs_df):
    ref_merges, ref_counts = _reference(12)
    merges = bpe.train_bpe(docs_df, 12)
    assert merges == ref_merges
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe.bpe_token_counts(docs_df, merges).collect()
    }
    assert got == ref_counts  # null/empty docs emit no row


def test_bpe_partitioning_invariant(spark, docs_df):
    """Merge selection is an exact integer argmax with a total-order
    tie-break — repartitioning must not change the trained tokenizer."""
    base = bpe.train_bpe(docs_df, 6)
    assert bpe.train_bpe(docs_df.repartition(5), 6) == base


def test_bpe_early_stop(spark):
    """A corpus with no pair reaching min_count stops immediately; a
    tiny one stops when pairs are exhausted."""
    df = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "gh ij kl")], "doc_id int, text string"
    )
    assert bpe.train_bpe(df, 5) == []  # every pair occurs once < min_count=2
    df2 = spark.createDataFrame([(1, "aa aa aa")], "doc_id int, text string")
    merges = bpe.train_bpe(df2, 10)
    ref_merges, _ = (lambda wc: _py_bpe(wc, 10))(Counter({"aa": 3}))
    assert merges == ref_merges
    assert len(merges) < 10  # exhausted, not count-limited


def test_bpe_merge_fold_is_nonoverlapping(spark):
    """'aaaa' under merge (a,a) folds to [aa, aa] left-to-right, and a
    second merge (aa,aa) to [aaaa] — the canonical application order."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "tokens array<string>")
    one = df.select(bpe._apply_merge(F.col("tokens"), "a", "a").alias("t"))
    assert one.collect()[0]["t"] == ["aa", "aa"]
    two = one.select(bpe._apply_merge(F.col("t"), "aa", "aa").alias("t"))
    assert two.collect()[0]["t"] == ["aaaa"]
