"""Text analysis operators: token counting, quality scoring, language
heuristics, document fingerprinting.

Everything is a pure Column expression (whole-stage codegen, no UDFs);
every function has an exact ANSI-SQL twin for the correctness oracle.
At 100 TB these are narrow map-side transforms — no shuffle at all
unless the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalize_text
from .hashing import h60

# BPE-ish tokenization: letter runs | digit runs | single non-space symbol
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny fixed stopword sets for the n-gram/stopword langid heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "que", "pour", "dans", "est"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "für", "auf", "ein"),
    "es": ("el", "la", "los", "de", "y", "que", "por", "para", "con", "es"),
}
LANG_ORDER = tuple(sorted(STOPWORDS))  # deterministic tie-break order


def words(c: Column) -> Column:
    w = F.split(normalize_text(c), " ")
    return F.filter(w, lambda x: F.length(x) > 0)


# --- words-array-based variants (compute the split ONCE per row) ---------
# The scalar helpers below re-derive the word array from text for API
# convenience; in a wide per-document stats projection that is 6-8
# redundant splits per row.  `add_text_stats` materializes the array in
# one projection and feeds these *_w variants.

def stopword_hits_w(w: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(x) for x in STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(sw, x)))


def lang_guess_w(w: Column) -> Column:
    best = None
    for lang in LANG_ORDER:
        h = stopword_hits_w(w, lang)
        if best is None:
            best = F.struct(h.alias("h"), F.lit(lang).alias("lang"))
        else:
            best = F.when(
                h > best["h"], F.struct(h.alias("h"), F.lit(lang).alias("lang"))
            ).otherwise(best)
    return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))


def mean_word_len_w(w: Column) -> Column:
    n = F.size(w)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n == 0, 0.0).otherwise(total / n.cast("double"))


def stopword_ratio_w(w: Column, lang: str = "en") -> Column:
    n = F.size(w)
    return F.when(n == 0, 0.0).otherwise(stopword_hits_w(w, lang) / n.cast("double"))


def quality_score_w(c: Column, w: Column) -> Column:
    mwl = mean_word_len_w(w)
    s = (
        0.4 * alpha_ratio(c)
        + 0.3 * stopword_ratio_w(w)
        + 0.2 * (1.0 - digit_ratio(c))
        + 0.1 * F.when((mwl >= 3) & (mwl <= 10), 1.0).otherwise(0.0)
    )
    return F.round(s, 6)


def add_text_stats(df, text_col: str = "text", out_prefix: str = ""):
    """One projection computing every per-document text statistic with a
    single word-split.  Column values are identical to the scalar
    helpers (same expressions over the same array)."""
    t = F.col(text_col)
    df = df.withColumn("__w", words(t))
    w = F.col("__w")
    p = out_prefix
    return df.select(
        "*",
        F.length(t).alias(f"{p}n_chars_m"),
        F.size(w).alias(f"{p}n_words"),
        token_count(t).alias(f"{p}n_tokens"),
        F.round(alpha_ratio(t), 6).alias(f"{p}alpha_ratio"),
        F.round(digit_ratio(t), 6).alias(f"{p}digit_ratio"),
        F.round(stopword_ratio_w(w), 6).alias(f"{p}stopword_ratio"),
        F.round(mean_word_len_w(w), 6).alias(f"{p}mean_word_len"),
        quality_score_w(t, w).alias(f"{p}quality_score"),
        lang_guess_w(w).alias(f"{p}lang_guess"),
        fingerprint_hex(t).alias(f"{p}fingerprint"),
    ).drop("__w")


def token_count(c: Column) -> Column:
    """BPE-ish token count via regexp extraction."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0))


def word_count(c: Column) -> Column:
    return F.size(words(c))


def stopword_hits(c: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(c), lambda x: F.array_contains(sw, x)))


def lang_guess(c: Column) -> Column:
    """argmax over per-language stopword hit counts; ties → first language
    in sorted order; zero hits everywhere → 'und'."""
    hits = {lang: stopword_hits(c, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        h = hits[lang]
        if best is None:
            best = F.struct(h.alias("h"), F.lit(lang).alias("lang"))
        else:
            best = F.when(h > best["h"], F.struct(h.alias("h"), F.lit(lang).alias("lang"))).otherwise(best)
    return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))


def alpha_ratio(c: Column) -> Column:
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return F.when(F.coalesce(n, F.lit(0)) == 0, 0.0).otherwise(alpha / n.cast("double"))


def digit_ratio(c: Column) -> Column:
    n = F.length(c)
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    return F.when(F.coalesce(n, F.lit(0)) == 0, 0.0).otherwise(digits / n.cast("double"))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    n = word_count(c)
    return F.when(n == 0, 0.0).otherwise(stopword_hits(c, lang) / n.cast("double"))


def mean_word_len(c: Column) -> Column:
    w = words(c)
    n = F.size(w)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n == 0, 0.0).otherwise(total / n.cast("double"))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality score: rewards alphabetic, stopword-bearing,
    medium-word-length text; penalizes digit soup.  Weights are part of
    the operator contract (mirrored in the oracle)."""
    s = (
        0.4 * alpha_ratio(c)
        + 0.3 * stopword_ratio(c)
        + 0.2 * (1.0 - digit_ratio(c))
        + 0.1 * F.when((mean_word_len(c) >= 3) & (mean_word_len(c) <= 10), 1.0).otherwise(0.0)
    )
    return F.round(s, 6)


def fingerprint(c: Column) -> Column:
    """64-bit-ish (60-bit) content fingerprint of normalized text."""
    return h60(normalize_text(c))


def fingerprint_hex(c: Column) -> Column:
    return F.md5(normalize_text(c))


# --- oracle SQL fragments -------------------------------------------------
SQL_NORMALIZE = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"
SQL_WORDS = (
    "list_filter(string_split(" + SQL_NORMALIZE + ", ' '), x -> len(x) > 0)"
)


def sql_words(c: str) -> str:
    return SQL_WORDS.format(c=c)


def sql_token_count(c: str) -> str:
    return f"len(regexp_extract_all({c}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


def sql_stopword_hits(c: str, lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return f"len(list_filter({sql_words(c)}, x -> list_contains({lst}, x)))"


def sql_lang_guess(c: str) -> str:
    hits = {lang: sql_stopword_hits(c, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        h = hits[lang]
        if best is None:
            best = f"struct_pack(h := {h}, lang := '{lang}')"
        else:
            best = (
                f"(CASE WHEN {h} > struct_extract({best}, 'h') "
                f"THEN struct_pack(h := {h}, lang := '{lang}') ELSE {best} END)"
            )
    return (
        f"(CASE WHEN struct_extract({best}, 'h') > 0 "
        f"THEN struct_extract({best}, 'lang') ELSE 'und' END)"
    )


def sql_alpha_ratio(c: str) -> str:
    return (
        f"(CASE WHEN coalesce(length({c}), 0) = 0 THEN 0.0 ELSE "
        f"length(regexp_replace({c}, '[^A-Za-z]', '', 'g')) / CAST(length({c}) AS DOUBLE) END)"
    )


def sql_digit_ratio(c: str) -> str:
    return (
        f"(CASE WHEN coalesce(length({c}), 0) = 0 THEN 0.0 ELSE "
        f"length(regexp_replace({c}, '[^0-9]', '', 'g')) / CAST(length({c}) AS DOUBLE) END)"
    )


def sql_word_count(c: str) -> str:
    return f"len({sql_words(c)})"


def sql_stopword_ratio(c: str, lang: str = "en") -> str:
    return (
        f"(CASE WHEN {sql_word_count(c)} = 0 THEN 0.0 ELSE "
        f"{sql_stopword_hits(c, lang)} / CAST({sql_word_count(c)} AS DOUBLE) END)"
    )


def sql_mean_word_len(c: str) -> str:
    total = f"list_sum(list_transform({sql_words(c)}, x -> len(x)))"
    return (
        f"(CASE WHEN {sql_word_count(c)} = 0 THEN 0.0 ELSE "
        f"coalesce({total}, 0) / CAST({sql_word_count(c)} AS DOUBLE) END)"
    )


def sql_quality_score(c: str) -> str:
    mwl = sql_mean_word_len(c)
    return (
        f"round(0.4 * {sql_alpha_ratio(c)} + 0.3 * {sql_stopword_ratio(c)} "
        f"+ 0.2 * (1.0 - {sql_digit_ratio(c)}) "
        f"+ 0.1 * (CASE WHEN {mwl} >= 3 AND {mwl} <= 10 THEN 1.0 ELSE 0.0 END), 6)"
    )


def sql_fingerprint(c: str) -> str:
    from .hashing import sql_h60

    return sql_h60(SQL_NORMALIZE.format(c=c))


def sql_fingerprint_hex(c: str) -> str:
    return f"md5({SQL_NORMALIZE.format(c=c)})"
