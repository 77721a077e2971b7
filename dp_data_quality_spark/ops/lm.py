"""In-engine word-level n-gram language model: train conditional counts
from a corpus, score document fluency with them — both integer-exact.

This is the oracle-gated sibling of the hashed byte-4-gram perplexity
model (functions/perplexity.py): where that model is broadcast as a
numpy table and scored inside an Arrow batch (the 100 TB hot path),
this one lives entirely in the declarative plan — train = two
aggregations, score = two model joins — so DuckDB can replay every
step bit-for-bit and the driver's hash gate covers the whole
train→score story from raw text.

Arithmetic is deliberately integer-only.  Add-1-smoothed transition
probability p = (cnt + 1) / (prefix_cnt + V) is never materialized as a
float; the fluency score is the summed integer *inverse* probability

    contrib = (SCALE * (prefix_cnt + V)) div (cnt + 1)        -- BIGINT

so no log/exp enters the plan (ln differs across engines in the last
ulp; integer div does not) and the per-doc SUM is order-independent.
Lower score ⇒ the document's transitions are better explained by the
corpus model ⇒ more fluent.  At SCALE = 10⁶ the per-term product stays
≤ 10⁶·(corpus_tokens + V), inside int64 up to ~10¹² training tokens —
the stated design scale; beyond that, lower SCALE one decade per decade.

Scale shape: training shuffles the token stream once (map-side
combinable groupBy on (prefix, token)); the totals and vocab
aggregations run over the already-reduced model table.  Scoring joins
the exploded transition stream against the model twice ((prefix,token)
then prefix); the model is corpus-vocabulary-sized, so both joins
broadcast when it fits (``broadcast_model=True``, default) and degrade
to ordinary shuffle joins when a giant vocabulary doesn't.  Train and
score are separate calls so a real deployment persists the two model
DataFrames (parquet) between them — scoring then scans the corpus
exactly once; the oracle-gated panel composes them in one plan, which
re-derives the token stream per model branch at sf-test scale only.

Reference parity: the reference has no LM (its fluency notion is the
rule battery, /root/reference/dp_data_quality/validation_rulebook.py);
this operator family extends the quality-filter story the way the
north rule's KenLM-style gate requires, with training now derived from
the data instead of shipped with the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text
from .textstats import sql_words as _sql_words

SCALE = 1_000_000


def word_transitions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """(doc_id, prefix, token) — every in-order word n-gram of the
    normalized text split as ((n−1)-word prefix, next word), with
    multiplicity kept (unlike the dedup shingles, which are per-doc
    DISTINCT).  ``n=2`` is the bigram default; higher orders
    space-join the prefix words.  posexplode + windowed lead stays in
    whole-stage codegen; HOF lambdas are interpreted per element
    (measured in ops/dedup.py:_exploded_shingles)."""
    if n < 2:
        raise ValueError("word_transitions needs n >= 2")
    words = F.split(normalize_text(F.col(text_col)), " ")
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word").alias("w0")] + [
        F.lead("word", j).over(win).alias(f"w{j}") for j in range(1, n)
    ]
    return (
        w.select("doc_id", *parts)
        .filter(F.col(f"w{n - 1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"w{j}") for j in range(n - 1)]).alias(
                "prefix"
            ),
            F.col(f"w{n - 1}").alias("token"),
        )
    )


def train_word_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 2,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a word n-gram conditional-count model over a corpus
    (``n=2`` bigram default; prefix = the n−1 preceding words).

    Returns (counts, totals, vocab):
      counts — (prefix, token, cnt)        one row per seen n-gram
      totals — (prefix, prefix_cnt)        outgoing mass per prefix
      vocab  — 1-row (v)                   distinct words in the corpus

    totals and vocab are derived from the reduced counts table / the
    token stream respectively — the corpus itself is shuffled exactly
    once (the counts groupBy, map-side combinable)."""
    trans = word_transitions(df, id_col, text_col, n=n)
    counts = trans.groupBy("prefix", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("prefix").agg(F.sum("cnt").alias("prefix_cnt"))
    words = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).filter(F.length("word") > 0)
    vocab = words.agg(F.countDistinct("word").cast("long").alias("v"))
    return counts, totals, vocab


def fluency_scores(
    df: DataFrame,
    counts: DataFrame,
    totals: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = SCALE,
    broadcast_model: bool = True,
    n: int = 2,
) -> DataFrame:
    """Per-document integer fluency score against a trained model
    (``n`` must match the model's training order).

    Output (doc_id, inv_sum, n_trans): inv_sum = Σ over the doc's word
    transitions of (scale·(prefix_cnt + V)) div (cnt + 1) — the summed
    scaled inverse of the add-1-smoothed transition probability — and
    n_trans the transition count.  Docs with < n words emit no row.
    Unseen n-grams hit cnt = 0; unseen prefixes hit prefix_cnt = 0 (the
    uniform 1/V smoothing floor).  All BIGINT, so parity with the
    DuckDB twin is exact."""
    trans = word_transitions(df, id_col, text_col, n=n)
    c = counts.select("prefix", "token", "cnt")
    t = totals.select("prefix", "prefix_cnt")
    if broadcast_model:
        c, t = F.broadcast(c), F.broadcast(t)
    return (
        trans.join(c, ["prefix", "token"], "left")
        .join(t, ["prefix"], "left")
        .select(
            "doc_id",
            F.expr(
                f"CAST({int(scale)} AS BIGINT) * "
                f"(COALESCE(prefix_cnt, CAST(0 AS BIGINT)) + CAST({int(vocab_size)} AS BIGINT))"
            ).alias("__num"),
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("long") + F.lit(1)).alias("__den"),
        )
        .select("doc_id", F.expr("__num div __den").alias("__contrib"))
        .groupBy("doc_id")
        .agg(
            F.sum("__contrib").cast("long").alias("inv_sum"),
            F.count(F.lit(1)).cast("long").alias("n_trans"),
        )
    )


def get_vocab_size(vocab: DataFrame) -> int:
    """Collect the 1-row vocab aggregate (bounded driver data — the
    same pattern as the k-means centroid collect)."""
    return int(vocab.collect()[0]["v"])


# --- integer-exact quantized log2 ------------------------------------------
# Log-domain scoring (importance weights, classifier posteriors) needs a
# log both engines compute IDENTICALLY.  ln/log2 on doubles can differ
# in the last ulp between the JVM and libm, so instead:
#
#     qlog2(m) = S·ilog2(m) + (m·S) div 2^ilog2(m) − S,   S = 256
#
# ilog2 = bit-length − 1, computed exactly from the binary-string length
# (`conv(m,10,2)` / `format('{:b}',m)`).  This is S·log2(m) with the
# mantissa linearly interpolated between powers of two — monotone,
# ≤ 0.09-bit bias vs true log2, pure BIGINT ops, bit-identical across
# engines (pytest-pinned).  Safe for m up to ~2^55/S (10¹³ at S=256).

QLOG_SCALE = 256


def qlog2_py(m: int, scale: int = QLOG_SCALE) -> int:
    """Pure-Python reference of the shared quantized log2."""
    k = m.bit_length() - 1
    return scale * k + (m * scale) // (1 << k) - scale


def qlog2_spark(col_sql: str, scale: int = QLOG_SCALE) -> str:
    """Spark SQL fragment: quantized log2 of a positive integer expr.
    The operand is widened to BIGINT inside the fragment — a 32-bit
    input would otherwise overflow the mantissa product at m ≥ 2²³
    (hypothesis-caught)."""
    k = f"(length(conv({col_sql}, 10, 2)) - 1)"
    return (
        f"CAST({scale} * {k} + (CAST(({col_sql}) AS BIGINT) * {scale}) div "
        f"shiftleft(CAST(1 AS BIGINT), {k}) - {scale} AS BIGINT)"
    )


def qlog2_duckdb(col_sql: str, scale: int = QLOG_SCALE) -> str:
    """DuckDB fragment computing the identical value (operand widened
    to BIGINT for the same 32-bit-overflow reason)."""
    k = f"(length(format('{{:b}}', {col_sql})) - 1)"
    return (
        f"CAST({scale} * {k} + (CAST(({col_sql}) AS BIGINT) * {scale}) // "
        f"(CAST(1 AS BIGINT) << {k}) - {scale} AS BIGINT)"
    )


# --- unigram models ---------------------------------------------------------


def unigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt) unigram counts — one map-side-combinable shuffle of
    the token stream."""
    return (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    ).filter(F.length("word") > 0)


def importance_scores(
    raw: DataFrame,
    target: DataFrame,
    vocab_size: int,
    target_total: int,
    raw_total: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """DSIR-style data-selection importance weights: per raw document,
    the quantized log-likelihood ratio of its unigrams under a TARGET
    (in-domain) corpus model vs the RAW corpus model —

        ilr_sum = Σ_w [qlog2(cnt_t(w)+1) − qlog2(T_t+V)]
                      − [qlog2(cnt_r(w)+1) − qlog2(T_r+V)]

    (add-1 smoothing; V = union vocabulary, T = corpus token totals —
    scalars collected once, model-sized).  Docs scoring high look more
    like the target domain than the raw average — the published DSIR
    recipe's estimator with hashed features replaced by raw unigrams so
    DuckDB can replay it exactly; production resampling would add
    seeded Gumbel noise on top of ilr_sum, which changes ranks, not
    these gated sums.  Output (doc_id, ilr_sum, n_tokens); token-less
    docs emit no row.  Plan: token stream left-joins two broadcastable
    unigram models; one groupBy — the fluency_scores shape."""
    tw = _doc_words(raw, id_col, text_col)
    t_counts = unigram_counts(target, id_col, text_col).withColumnRenamed(
        "cnt", "cnt_t"
    )
    r_counts = unigram_counts(raw, id_col, text_col).withColumnRenamed(
        "cnt", "cnt_r"
    )
    if broadcast_model:
        t_counts, r_counts = F.broadcast(t_counts), F.broadcast(r_counts)
    # floor at 1: degenerate token-less corpora must score neutrally,
    # not crash qlog2's negative-shift path
    const = (
        qlog2_py(max(int(raw_total) + int(vocab_size), 1))
        - qlog2_py(max(int(target_total) + int(vocab_size), 1))
    )
    contrib = (
        f"{qlog2_spark('COALESCE(cnt_t, CAST(0 AS BIGINT)) + 1')} - "
        f"{qlog2_spark('COALESCE(cnt_r, CAST(0 AS BIGINT)) + 1')} + "
        f"CAST({const} AS BIGINT)"
    )
    return (
        tw.join(t_counts, "word", "left")
        .join(r_counts, "word", "left")
        .select("doc_id", F.expr(contrib).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("ilr_sum"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


def nb_scores(
    docs: DataFrame,
    labeled: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    broadcast_model: bool = True,
) -> DataFrame:
    """In-engine Naive-Bayes quality classifier — the trained-classifier
    stage of a web-scale filter (the fastText-classifier analog of the
    CCNet/GPT-3 pipelines), distilled from whatever produced ``label``
    (the pipeline's heuristic keep/drop in the pytest; any SQL-derivable
    label in the oracle query).

    Train: per-class unigram counts over ``labeled`` (label ∈ {0,1}) —
    one combinable shuffle.  Score: per document the quantized
    log-posterior ratio

        llr_sum = [qlog2(n₁) − qlog2(n₀)]                       (prior)
                + Σ_w [qlog2(c₁(w)+1) − qlog2(C₁+V)]
                     − [qlog2(c₀(w)+1) − qlog2(C₀+V)]

    with add-1 smoothing — llr_sum > 0 ⇒ class 1 (keep).  All BIGINT;
    order-independent; DuckDB-replayable.  Output (doc_id, llr_sum,
    n_tokens).  Composition of :func:`nb_train` (the labeled corpus is
    tokenized and shuffled exactly ONCE) and :func:`nb_score`."""
    model, prior, per_tok = nb_train(
        labeled, id_col=id_col, text_col=text_col, label_col=label_col,
        vocab_size=int(vocab_size),
    )
    return nb_score(
        docs, model, prior, per_tok,
        id_col=id_col, text_col=text_col, broadcast_model=broadcast_model,
    )


def nb_train(
    labeled: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    vocab_size: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Train the NB model: returns (model, prior, per_tok) where model
    is the localCheckpointed (word, c1, c0) table and the two ints fold
    the class priors and smoothing denominators (qlog2-quantized).
    ``vocab_size`` defaults to the model's row count (= distinct words
    of the labeled corpus).  The labeled corpus is tokenized and
    shuffled exactly once; priors read the doc-level label column
    without tokenizing."""
    lw = _doc_words(labeled, id_col, text_col).join(
        labeled.select(
            F.col(id_col).alias("doc_id"), F.col(label_col).alias("__lbl")
        ),
        "doc_id",
    )
    model = lw.groupBy("word").agg(
        F.sum(F.when(F.col("__lbl") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("__lbl") == 0, 1).otherwise(0)).cast("long").alias("c0"),
    ).localCheckpoint()  # train once: totals + score join reuse this
    # bounded scalar collects: class priors + token totals (model-sized)
    agg = labeled.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).cast("long").alias("n0"),
    ).collect()[0]
    tot = model.agg(
        F.sum("c1").cast("long").alias("t1"), F.sum("c0").cast("long").alias("t0")
    ).collect()[0]
    v = int(vocab_size) if vocab_size is not None else model.count()
    prior = qlog2_py(max(int(agg["n1"] or 0), 1)) - qlog2_py(max(int(agg["n0"] or 0), 1))
    # the smoothing denominators are per-token terms: Σ_w −qlog2(C₁+V)
    # +qlog2(C₀+V) = n_tokens · per_tok; floor at 1 so a token-less
    # class scores neutrally instead of crashing qlog2
    per_tok = qlog2_py(max(int(tot["t0"] or 0) + v, 1)) - qlog2_py(
        max(int(tot["t1"] or 0) + v, 1)
    )
    return model, prior, per_tok


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    prior: int,
    per_tok: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against a trained (or loaded) NB model — the
    ingest-time half: the model may come straight from :func:`nb_train`
    or from parquet via :func:`load_nb_model` (the streaming gate's
    path).  One broadcast join + one groupBy."""
    if broadcast_model:
        model = F.broadcast(model)
    contrib = (
        f"{qlog2_spark('COALESCE(c1, CAST(0 AS BIGINT)) + 1')} - "
        f"{qlog2_spark('COALESCE(c0, CAST(0 AS BIGINT)) + 1')}"
    )
    return (
        _doc_words(docs, id_col, text_col)
        .join(model.select("word", "c1", "c0"), "word", "left")
        .select("doc_id", F.expr(contrib).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("__s"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id",
            (
                F.col("__s")
                + F.lit(int(prior))
                + F.col("n_tokens") * F.lit(int(per_tok))
            ).cast("long").alias("llr_sum"),
            "n_tokens",
        )
    )


def save_nb_model(
    model: DataFrame, prior: int, per_tok: int, path: str
) -> None:
    """Persist a trained NB model: (word, c1, c0) parquet plus a 1-row
    consts table — the offline-train half of the ingest-time gate."""
    model.select("word", "c1", "c0").write.mode("overwrite").parquet(
        f"{path}/model"
    )
    spark = model.sparkSession
    spark.createDataFrame(
        [(int(prior), int(per_tok))], "prior long, per_tok long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/consts")


def load_nb_model(spark, path: str) -> tuple[DataFrame, int, int]:
    """(model, prior, per_tok) back from :func:`save_nb_model`."""
    model = spark.read.parquet(f"{path}/model")
    row = spark.read.parquet(f"{path}/consts").collect()[0]
    return model, int(row["prior"]), int(row["per_tok"])


# --- DuckDB oracle twins ---------------------------------------------------
# Every engine step replayed in ANSI-ish SQL: same normalize, same
# tokenize, same integer arithmetic.  ``corpus_sql`` must select
# (doc_id, text).

def sql_lm_core(corpus_sql: str, n: int = 2) -> str:
    """Shared CTE block: corpus → words → trans → counts/totals/vocab
    (``n`` = model order; prefix = the n−1 preceding words, matching
    ``word_transitions``)."""
    series = f"generate_series(1, greatest(len(w) - {n - 1}, 0))"
    prefix = " || ' ' || ".join(f"w[i + {j}]" for j in range(n - 1))
    return f"""
corpus AS ({corpus_sql}),
words AS (
  SELECT doc_id, {_sql_words('text')} AS w
  FROM corpus
),
trans AS (
  SELECT doc_id,
         unnest(list_transform({series}, i -> {prefix})) AS prefix,
         unnest(list_transform({series}, i -> w[i + {n - 1}])) AS token
  FROM words
),
counts AS (
  SELECT prefix, token, CAST(count(*) AS BIGINT) AS cnt
  FROM trans GROUP BY 1, 2
),
totals AS (
  SELECT prefix, CAST(sum(cnt) AS BIGINT) AS prefix_cnt
  FROM counts GROUP BY 1
),
vocab AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
  FROM (SELECT unnest(w) AS word FROM words)
)"""


def sql_fluency_scores(corpus_sql: str, scale: int = SCALE, n: int = 2) -> str:
    """(doc_id, inv_sum, n_trans) — the DuckDB replay of
    ``fluency_scores`` with the model trained on the same corpus."""
    return f"""
WITH {sql_lm_core(corpus_sql, n=n)}
SELECT t.doc_id,
       CAST(SUM((CAST({int(scale)} AS BIGINT) * (COALESCE(tt.prefix_cnt, 0) + v.v))
                // (COALESCE(c.cnt, 0) + 1)) AS BIGINT) AS inv_sum,
       CAST(COUNT(*) AS BIGINT) AS n_trans
FROM trans t
LEFT JOIN counts c USING (prefix, token)
LEFT JOIN totals tt USING (prefix)
CROSS JOIN vocab v
GROUP BY 1
"""


def importance_stats(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int, int, int]:
    """(V, target_total, raw_total) for ``importance_scores`` — V is the
    UNION vocabulary of both corpora.  ONE job, one scan of each corpus:
    the token streams union with a corpus tag and reduce to a single
    3-value row."""
    rw = _doc_words(raw, id_col, text_col).select(
        "word", F.lit(0).alias("is_t")
    )
    tw = _doc_words(target, id_col, text_col).select(
        "word", F.lit(1).alias("is_t")
    )
    row = (
        rw.unionByName(tw)
        .agg(
            F.countDistinct("word").cast("long").alias("v"),
            F.sum("is_t").cast("long").alias("tt"),
            (F.count(F.lit(1)) - F.sum("is_t")).cast("long").alias("tr"),
        )
        .collect()[0]
    )
    # SUM over an empty token stream is NULL — degenerate corpora are 0
    return int(row["v"] or 0), int(row["tt"] or 0), int(row["tr"] or 0)


def nb_vocab_size(
    labeled: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> int:
    """V for ``nb_scores`` — distinct words of the labeled corpus."""
    return int(
        _doc_words(labeled, id_col, text_col)
        .agg(F.countDistinct("word").cast("long").alias("v"))
        .collect()[0]["v"]
    )


# the canonical tokenize fragment, shared with the textstats oracles
_SQL_WORDS = (
    "SELECT doc_id, unnest(" + _sql_words("text") + ") AS word FROM {src}"
)


def sql_importance_scores(raw_sql: str, target_sql: str) -> str:
    """DuckDB replay of ``importance_scores`` with stats derived from
    the same two corpora."""
    q = qlog2_duckdb
    return f"""
WITH rawc AS ({raw_sql}),
tgtc AS ({target_sql}),
rw AS ({_SQL_WORDS.format(src='rawc')}),
tw AS ({_SQL_WORDS.format(src='tgtc')}),
rcnt AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt_r FROM rw GROUP BY 1),
tcnt AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt_t FROM tw GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
          FROM (SELECT word FROM rw UNION ALL SELECT word FROM tw)),
tots AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tw) AS tt,
                (SELECT CAST(count(*) AS BIGINT) FROM rw) AS tr),
base AS (
  SELECT rw.doc_id,
         CAST(SUM({q('COALESCE(cnt_t, 0) + 1')} - {q('COALESCE(cnt_r, 0) + 1')}) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM rw LEFT JOIN tcnt USING (word) LEFT JOIN rcnt USING (word)
  GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.s + b.n_tokens * ({q('greatest(tr + v, 1)')} - {q('greatest(tt + v, 1)')}) AS BIGINT) AS ilr_sum,
       b.n_tokens
FROM base b CROSS JOIN vocab CROSS JOIN tots
"""


def sql_nb_scores(docs_sql: str, labeled_sql: str) -> str:
    """DuckDB replay of ``nb_scores``; ``labeled_sql`` must select
    (doc_id, text, label) with label ∈ {0,1}."""
    q = qlog2_duckdb
    return f"""
WITH nb_docs AS ({docs_sql}),
nb_lab AS ({labeled_sql}),
dw AS ({_SQL_WORDS.format(src='nb_docs')}),
lw AS (
  SELECT w.doc_id, w.word, nb_lab.label
  FROM ({_SQL_WORDS.format(src='nb_lab')}) w JOIN nb_lab USING (doc_id)
),
model AS (
  SELECT word,
         CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
  FROM lw GROUP BY 1
),
pri AS (
  SELECT CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
  FROM nb_lab
),
tot AS (SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS t1,
               CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS t0 FROM model),
vocab AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM lw),
base AS (
  SELECT dw.doc_id,
         CAST(SUM({q('COALESCE(c1, 0) + 1')} - {q('COALESCE(c0, 0) + 1')}) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM dw LEFT JOIN model USING (word)
  GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.s + ({q('greatest(n1, 1)')} - {q('greatest(n0, 1)')})
            + b.n_tokens * ({q('greatest(t0 + v, 1)')} - {q('greatest(t1 + v, 1)')}) AS BIGINT) AS llr_sum,
       b.n_tokens
FROM base b CROSS JOIN pri CROSS JOIN tot CROSS JOIN vocab
"""


def sql_top_bigrams(corpus_sql: str, k: int) -> str:
    """Top-``k`` trained conditional counts (prefix, token, cnt,
    prefix_cnt), deterministically ordered (cnt DESC, prefix, token)."""
    return f"""
WITH {sql_lm_core(corpus_sql)},
ranked AS (
  SELECT c.prefix, c.token, c.cnt, tt.prefix_cnt,
         row_number() OVER (ORDER BY c.cnt DESC, c.prefix ASC, c.token ASC) AS rnk
  FROM counts c JOIN totals tt USING (prefix)
)
SELECT prefix, token, cnt, prefix_cnt FROM ranked WHERE rnk <= {int(k)}
"""
