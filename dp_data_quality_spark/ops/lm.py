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

SCALE = 1_000_000


def word_transitions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, prefix, token) — every adjacent word pair of the
    normalized text, multiplicity kept (unlike the dedup shingles,
    which are per-doc DISTINCT).  posexplode + windowed lead stays in
    whole-stage codegen; HOF lambdas are interpreted per element
    (measured in ops/dedup.py:_exploded_shingles)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        w.select(
            "doc_id",
            F.col("word").alias("prefix"),
            F.lead("word", 1).over(win).alias("token"),
        )
        .filter(F.col("token").isNotNull())
    )


def train_word_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a word-bigram conditional-count model over a corpus.

    Returns (counts, totals, vocab):
      counts — (prefix, token, cnt)        one row per seen bigram
      totals — (prefix, prefix_cnt)        outgoing mass per prefix
      vocab  — 1-row (v)                   distinct words in the corpus

    totals and vocab are derived from the reduced counts table / the
    token stream respectively — the corpus itself is shuffled exactly
    once (the counts groupBy, map-side combinable)."""
    trans = word_transitions(df, id_col, text_col)
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
) -> DataFrame:
    """Per-document integer fluency score against a trained model.

    Output (doc_id, inv_sum, n_trans): inv_sum = Σ over the doc's word
    transitions of (scale·(prefix_cnt + V)) div (cnt + 1) — the summed
    scaled inverse of the add-1-smoothed transition probability — and
    n_trans the transition count.  Docs with < 2 words emit no row.
    Unseen bigrams hit cnt = 0; unseen prefixes hit prefix_cnt = 0 (the
    uniform 1/V smoothing floor).  All BIGINT, so parity with the
    DuckDB twin is exact."""
    trans = word_transitions(df, id_col, text_col)
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


# --- DuckDB oracle twins ---------------------------------------------------
# Every engine step replayed in ANSI-ish SQL: same normalize, same
# tokenize, same integer arithmetic.  ``corpus_sql`` must select
# (doc_id, text).

_SQL_NORMALIZE = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"


def sql_lm_core(corpus_sql: str) -> str:
    """Shared CTE block: corpus → words → trans → counts/totals/vocab."""
    norm = _SQL_NORMALIZE.format(c="text")
    series = "generate_series(1, greatest(len(w) - 1, 0))"
    return f"""
corpus AS ({corpus_sql}),
words AS (
  SELECT doc_id,
         list_filter(string_split({norm}, ' '), x -> len(x) > 0) AS w
  FROM corpus
),
trans AS (
  SELECT doc_id,
         unnest(list_transform({series}, i -> w[i])) AS prefix,
         unnest(list_transform({series}, i -> w[i + 1])) AS token
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


def sql_fluency_scores(corpus_sql: str, scale: int = SCALE) -> str:
    """(doc_id, inv_sum, n_trans) — the DuckDB replay of
    ``fluency_scores`` with the model trained on the same corpus."""
    return f"""
WITH {sql_lm_core(corpus_sql)}
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
