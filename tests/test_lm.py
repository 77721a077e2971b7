"""In-engine LM: word-bigram train/score (ops/lm.py) and the
distributed hashed byte-4-gram perplexity-table training
(functions/perplexity.py:train_table_distributed).

The reference has no LM (its fluency notion is the rule battery); these
gates pin the engine's two LM paths against obviously-correct
references: a pure-Python model for the word-level path and the
single-process numpy training for the hashed path."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pytest

from dp_data_quality_spark.functions import ngram
from dp_data_quality_spark.functions import perplexity as P
from dp_data_quality_spark.ops import lm

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "  The  CAT sat "),          # normalize parity: case + whitespace
    (4, "solo"),                      # < 2 words → no score row
    (5, None),                        # null text → no score row
    (6, "the dog sat on the mat"),
    (7, ""),                          # empty text → no score row
    (8, "zzz unseen words entirely"),  # hits the smoothing floor
]


def _toks(t):
    if not t:
        return []
    return [w for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]


def _reference_scores(rows, scale=lm.SCALE):
    cnt, tot, vocab = Counter(), Counter(), set()
    for _, t in rows:
        ws = _toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            cnt[(a, b)] += 1
            tot[a] += 1
    v = len(vocab)
    out = {}
    for did, t in rows:
        ws = _toks(t)
        trans = list(zip(ws, ws[1:]))
        if not trans:
            continue
        s = sum(
            (scale * (tot.get(a, 0) + v)) // (cnt.get((a, b), 0) + 1)
            for a, b in trans
        )
        out[did] = (s, len(trans))
    return out, v


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_fluency_matches_pure_python(spark, docs_df):
    counts, totals, vocab = lm.train_word_lm(docs_df)
    v = lm.get_vocab_size(vocab)
    ref, v_ref = _reference_scores(DOCS)
    assert v == v_ref
    got = {
        r["doc_id"]: (r["inv_sum"], r["n_trans"])
        for r in lm.fluency_scores(docs_df, counts, totals, v).collect()
    }
    assert got == ref  # short/null/empty docs emit no row


def test_fluency_partitioning_invariant(spark, docs_df):
    """Integer sums are order-independent: any repartitioning yields the
    identical result (the no-float-summation-hazard claim)."""
    counts, totals, vocab = lm.train_word_lm(docs_df)
    v = lm.get_vocab_size(vocab)
    base = sorted(
        map(tuple, lm.fluency_scores(docs_df, counts, totals, v).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            lm.fluency_scores(
                docs_df.repartition(7), counts, totals, v, broadcast_model=False
            ).collect(),
        )
    )
    assert base == shuffled


def test_fluency_duckdb_twin(spark, docs_df):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.sql("CREATE TABLE docs(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    oracle = sorted(
        con.sql(
            lm.sql_fluency_scores("SELECT doc_id, text FROM docs")
        ).fetchall()
    )
    counts, totals, vocab = lm.train_word_lm(docs_df)
    v = lm.get_vocab_size(vocab)
    got = sorted(map(tuple, lm.fluency_scores(docs_df, counts, totals, v).collect()))
    assert got == oracle

    top = sorted(
        con.sql(lm.sql_top_bigrams("SELECT doc_id, text FROM docs", 5)).fetchall()
    )
    engine_top = sorted(
        map(
            tuple,
            counts.join(totals, "prefix")
            .orderBy(counts.cnt.desc(), counts.prefix.asc(), counts.token.asc())
            .limit(5)
            .select("prefix", "token", "cnt", "prefix_cnt")
            .collect(),
        )
    )
    assert engine_top == top


def test_unseen_text_scores_worse(spark, docs_df):
    """A doc of entirely-unseen transitions must score strictly higher
    (less fluent) per transition than an in-distribution doc."""
    counts, totals, vocab = lm.train_word_lm(docs_df)
    v = lm.get_vocab_size(vocab)
    got = {
        r["doc_id"]: r["inv_sum"] / r["n_trans"]
        for r in lm.fluency_scores(docs_df, counts, totals, v).collect()
    }
    assert got[8] > got[1]


# --- distributed hashed-4-gram table training ------------------------------


def test_train_table_distributed_matches_local(spark):
    """Distributed training is bit-identical to single-process numpy
    counting over the same rows, regardless of partitioning."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        None,
        "",
        "short",
        "sphinx of black quartz judge my vow " * 3,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    buf, _off, _len = ngram.encode_batch(texts)
    local_counts = ngram.bucket_counts(buf, P.NGRAM)
    expected = P.table_from_counts(local_counts)

    for parts in (1, 5):
        got = P.train_table_distributed(df.repartition(parts))
        assert got.dtype == np.float32
        assert np.array_equal(got, expected)


def test_trained_table_drives_scorer(spark):
    """score_turns accepts a corpus-trained ppl table: in-domain text
    scores lower perplexity under a model trained on it than under the
    hermetic import-time model trained on unrelated vocabulary."""
    from dp_data_quality_spark.pipeline import score_turns

    corpus = ["alpha beta gamma delta epsilon zeta " * 4] * 8
    cdf = spark.createDataFrame([(t,) for t in corpus], "text string")
    table = P.train_table_distributed(cdf)

    turns = spark.createDataFrame(
        [("c1", 0, "user", "alpha beta gamma delta epsilon zeta", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    ppl_trained = score_turns(turns, spark, ppl_table=table).collect()[0]["ppl"]
    ppl_default = score_turns(turns, spark).collect()[0]["ppl"]
    assert ppl_trained < ppl_default


# --- quantized log2 + log-domain scorers ------------------------------------

IMP_TGT = [
    (10, "the cat sat quietly"),
    (11, "the dog ran in the park"),
    (12, "a cat and a dog"),
]
NB_LABELED = [
    (1, "the cat sat on the mat", 1),
    (2, "buy cheap pills now now now", 0),
    (3, "the dog ran in the park", 1),
    (4, "zz qq xx", 0),
    (6, "the cat and the dog played in the park", 1),
]


def test_qlog2_cross_engine_parity(spark):
    """The shared quantized log2 must be bit-identical in pure Python,
    Spark SQL, and DuckDB — including powers of two and their
    neighbours, where ilog2 steps."""
    duckdb = pytest.importorskip("duckdb")
    vals = sorted(
        {1, 2, 3}
        | {2**k + d for k in range(1, 45) for d in (-1, 0, 1)}
        | {10**k for k in range(13)}
    )
    ref = {m: lm.qlog2_py(m) for m in vals}

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "m long")
    got_spark = {
        r["m"]: r["q"]
        for r in df.select("m", F.expr(lm.qlog2_spark("m")).alias("q")).collect()
    }
    assert got_spark == ref

    con = duckdb.connect()
    got_duck = dict(
        con.sql(
            f"SELECT m, {lm.qlog2_duckdb('m')} FROM (SELECT unnest({vals}) AS m)"
        ).fetchall()
    )
    assert got_duck == ref

    # regression: an all-small value list types as INT32 in DuckDB —
    # the fragment must widen internally, not overflow at m ≥ 2²³
    small = [2**23, 2**23 + 1, 2**30]
    got_small = dict(
        con.sql(
            f"SELECT m, {lm.qlog2_duckdb('m')} FROM (SELECT unnest({small}) AS m)"
        ).fetchall()
    )
    assert got_small == {m: lm.qlog2_py(m) for m in small}


def _qref(m):
    return lm.qlog2_py(m)


def test_importance_scores_match_reference_and_twin(spark, docs_df):
    duckdb = pytest.importorskip("duckdb")
    tgt_df = spark.createDataFrame(IMP_TGT, "doc_id int, text string")

    rc, tc = Counter(), Counter()
    for _, t in DOCS:
        rc.update(_toks(t))
    for _, t in IMP_TGT:
        tc.update(_toks(t))
    v_ref = len(set(rc) | set(tc))
    tt_ref, tr_ref = sum(tc.values()), sum(rc.values())
    ref = {}
    for did, t in DOCS:
        ws = _toks(t)
        if not ws:
            continue
        s = sum(
            _qref(tc.get(w, 0) + 1) - _qref(rc.get(w, 0) + 1)
            + _qref(tr_ref + v_ref) - _qref(tt_ref + v_ref)
            for w in ws
        )
        ref[did] = (s, len(ws))

    v, tt, tr = lm.importance_stats(docs_df, tgt_df)
    assert (v, tt, tr) == (v_ref, tt_ref, tr_ref)
    got = {
        r["doc_id"]: (r["ilr_sum"], r["n_tokens"])
        for r in lm.importance_scores(docs_df, tgt_df, v, tt, tr).collect()
    }
    assert got == ref

    con = duckdb.connect()
    con.sql("CREATE TABLE raw(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", DOCS)
    con.sql("CREATE TABLE tgt(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", IMP_TGT)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            lm.sql_importance_scores(
                "SELECT doc_id, text FROM raw", "SELECT doc_id, text FROM tgt"
            )
        ).fetchall()
    }
    assert duck == ref


def test_nb_scores_match_reference_twin_and_separate(spark, docs_df):
    duckdb = pytest.importorskip("duckdb")
    lab_df = spark.createDataFrame(NB_LABELED, "doc_id int, text string, label int")

    c1, c0 = Counter(), Counter()
    n1 = n0 = 0
    for _, t, l in NB_LABELED:
        (c1 if l == 1 else c0).update(_toks(t))
        n1, n0 = n1 + (l == 1), n0 + (l == 0)
    v_ref = len(set(c1) | set(c0))
    t1, t0 = sum(c1.values()), sum(c0.values())
    ref = {}
    for did, t in DOCS:
        ws = _toks(t)
        if not ws:
            continue
        s = (
            _qref(max(n1, 1)) - _qref(max(n0, 1))
            + sum(_qref(c1.get(w, 0) + 1) - _qref(c0.get(w, 0) + 1) for w in ws)
            + len(ws) * (_qref(t0 + v_ref) - _qref(t1 + v_ref))
        )
        ref[did] = (s, len(ws))

    v = lm.nb_vocab_size(lab_df)
    assert v == v_ref
    got = {
        r["doc_id"]: (r["llr_sum"], r["n_tokens"])
        for r in lm.nb_scores(docs_df, lab_df, v).collect()
    }
    assert got == ref

    con = duckdb.connect()
    con.sql("CREATE TABLE raw(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", DOCS)
    con.sql("CREATE TABLE lab(doc_id INT, text VARCHAR, label INT)")
    con.executemany("INSERT INTO lab VALUES (?, ?, ?)", NB_LABELED)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            lm.sql_nb_scores(
                "SELECT doc_id, text FROM raw",
                "SELECT doc_id, text, label FROM lab",
            )
        ).fetchall()
    }
    assert duck == ref

    # the classifier must reproduce its training labels when scoring
    # the training texts themselves (they dominate their unigram stats)
    train_docs = spark.createDataFrame(
        [(d, t) for d, t, _ in NB_LABELED], "doc_id int, text string"
    )
    signs = {
        r["doc_id"]: r["llr_sum"] > 0
        for r in lm.nb_scores(train_docs, lab_df, v).collect()
    }
    for did, _, l in NB_LABELED:
        assert signs[did] == (l == 1), (did, signs)


def test_nb_distills_pipeline_labels(spark):
    """Classifier distillation — the 100 TB play this classifier exists
    for: label turns with the full rule battery once, train the cheap
    NB on half, and it must reproduce the pipeline's keep/drop on the
    held-out half well above the majority-class baseline (measured
    ~0.90 vs ~0.79 at this scale; pinned with slack)."""
    from pyspark.sql import functions as F

    from dp_data_quality_spark import synth
    from dp_data_quality_spark.pipeline import score_turns

    turns = synth.strip_truth(synth.transcripts(spark, 200, seed=7))
    scored = (
        score_turns(turns, spark)
        .select(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
                "doc_id"
            ),
            "text",
            F.col("keep").cast("int").alias("label"),
        )
        .where(F.col("text").isNotNull())
    )
    scored.cache()
    h = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    train, hold = scored.where(h == 0), scored.where(h == 1)
    v = lm.nb_vocab_size(train)
    pred = lm.nb_scores(hold.select("doc_id", "text"), train, v)
    agg = (
        pred.join(hold.select("doc_id", "label"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                ((F.col("llr_sum") > 0).cast("int") == F.col("label")).cast("int")
            ).alias("agree"),
            F.sum("label").alias("pos"),
        )
        .collect()[0]
    )
    scored.unpersist()
    acc = agg["agree"] / agg["n"]
    baseline = max(agg["pos"] / agg["n"], 1 - agg["pos"] / agg["n"])
    assert acc >= 0.85, (acc, baseline)
    assert acc > baseline + 0.05, (acc, baseline)


def test_degenerate_corpora_do_not_crash(spark):
    """Token-less corpora must score neutrally, not crash qlog2's
    negative-shift path (the smoothing denominators are floored at 1)."""
    empty = spark.createDataFrame([(1, None), (2, "")], "doc_id int, text string")
    v, tt, tr = lm.importance_stats(empty, empty)
    assert (v, tt, tr) == (0, 0, 0)
    assert lm.importance_scores(empty, empty, v, tt, tr).count() == 0

    lab = spark.createDataFrame(
        [(1, None, 1), (2, "", 0)], "doc_id int, text string, label int"
    )
    docs = spark.createDataFrame([(3, "some words here")], "doc_id int, text string")
    out = lm.nb_scores(docs, lab, lm.nb_vocab_size(lab)).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 3


def test_trigram_lm_matches_reference_and_twin(spark, docs_df):
    """Order generalization: the n=3 model (2-word prefixes) matches a
    pure-Python reference and the DuckDB twin — pinning that prefix
    construction, counting and scoring all respect the order."""
    duckdb = pytest.importorskip("duckdb")
    N = 3
    cnt, tot, vocab = Counter(), Counter(), set()
    for _, t in DOCS:
        ws = _toks(t)
        vocab.update(ws)
        for i in range(len(ws) - N + 1):
            p = " ".join(ws[i : i + N - 1])
            cnt[(p, ws[i + N - 1])] += 1
            tot[p] += 1
    v = len(vocab)
    ref = {}
    for did, t in DOCS:
        ws = _toks(t)
        if len(ws) < N:
            continue
        s = 0
        for i in range(len(ws) - N + 1):
            p = " ".join(ws[i : i + N - 1])
            s += (lm.SCALE * (tot.get(p, 0) + v)) // (
                cnt.get((p, ws[i + N - 1]), 0) + 1
            )
        ref[did] = (s, len(ws) - N + 1)

    counts, totals, vdf = lm.train_word_lm(docs_df, n=N)
    got = {
        r["doc_id"]: (r["inv_sum"], r["n_trans"])
        for r in lm.fluency_scores(
            docs_df, counts, totals, v, n=N
        ).collect()
    }
    assert got == ref

    con = duckdb.connect()
    con.sql("CREATE TABLE docs(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            lm.sql_fluency_scores("SELECT doc_id, text FROM docs", n=N)
        ).fetchall()
    }
    assert duck == ref
