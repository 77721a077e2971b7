"""In-engine BPE tokenizer training — the tokenizer-prep stage of an
LLM data pipeline (the sibling of ops/textstats.py:vocab_coverage,
which only measures coverage of a given vocab).

Classic byte-pair-encoding over the word-frequency table: the corpus is
shuffled exactly ONCE (groupBy(word) → (word, cnt)); every merge
iteration after that runs on the model-sized word table, never the
corpus — the same scale split k-means uses (one bounded job per
iteration, a 1-row argmax collect each).  Words start as character
sequences with the final character carrying an end-of-word marker;
each iteration counts adjacent token pairs weighted by word frequency,
picks the most frequent pair (ties broken (count DESC, a ASC, b ASC) —
deterministic), and folds the merge into every word's token array with
a codegen'd `aggregate` lambda (left-to-right, non-overlapping — the
canonical BPE application order).  `localCheckpoint` per iteration
truncates the growing lineage (the ops/graph.py pattern).

The training loop is inherently iterative-argmax, which SQL cannot
replay (the same class as k-means would be without its unrolled-CTE
trick, but here each layer needs a scalar-subquery argmax AND a
list-fold — not practically expressible), so the gate is a pure-Python
reference implementation pinned by pytest: identical merge lists,
identical per-document token counts, at any partitioning.

Reference parity: the reference has no tokenizer
(/root/reference/dp_data_quality/ is a validation engine); this is a
training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .lm import unigram_counts

EOW = "▁"  # end-of-word marker appended to a word's last character


def word_frequency_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt) — the ONE corpus-scale shuffle of BPE training
    (the same tokenize-and-count kernel the LM family uses)."""
    return unigram_counts(df, id_col, text_col)


def _char_tokens_expr():
    """Column expr splitting ``word`` into single characters, the last
    one suffixed with the end-of-word marker — BPE's most subtle
    invariant, defined exactly once (training and encoding both use
    this)."""
    return F.expr(
        "transform(sequence(1, length(word)), i -> "
        "IF(i = length(word), concat(substring(word, i, 1), '" + EOW + "'), "
        "substring(word, i, 1)))"
    )


def _initial_tokens(wf: DataFrame) -> DataFrame:
    """(word, tokens, cnt) with the shared character split."""
    return wf.select("word", _char_tokens_expr().alias("tokens"), "cnt")


def _pair_counts(tok: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(tokens) - 1), i -> "
        "struct(element_at(tokens, i) AS a, element_at(tokens, i + 1) AS b))"
    )
    return (
        tok.filter(F.size("tokens") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("total"))
    )


def _apply_merge(tokens_col, a: str, b: str):
    """Fold the merge (a, b) → a+b into a token array, left-to-right and
    non-overlapping (a fresh merge result never immediately re-merges as
    the left half of the next pair) — the canonical BPE application."""
    merged = a + b
    return F.aggregate(
        tokens_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges; returns the ordered merge list.
    Stops early when the best remaining pair occurs < ``min_count``
    times.  Driver data per iteration: ONE (a, b, total) row."""
    tok = _initial_tokens(word_frequency_table(df, id_col, text_col))
    tok = tok.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best = (
            _pair_counts(tok)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["total"]) < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        tok = tok.withColumn("tokens", _apply_merge(F.col("tokens"), a, b))
        tok = tok.localCheckpoint()  # truncate lineage, k-means-style
    return merges


def apply_merges(tokens_col, merges: list[tuple[str, str]]):
    """Column expression applying an ordered merge list to a character
    token array (training-order application, the standard encoder)."""
    out = tokens_col
    for a, b in merges:
        out = _apply_merge(out, a, b)
    return out


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_words) — per-document token budget under
    the trained tokenizer.  The merge list is applied ONCE to the
    corpus's distinct-word table (model-sized), which then broadcasts
    into a join against the per-doc word stream — the corpus text is
    never re-folded per occurrence."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    ).filter(F.length("word") > 0)
    vocab = (
        words.select("word")
        .distinct()
        .select(
            "word",
            F.size(apply_merges(_char_tokens_expr(), merges))
            .cast("long")
            .alias("n_tok"),
        )
    )
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
