"""Deterministic, distributed transcript synthesis.

Generates the Iceberg-shaped ``transcripts`` table
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp — BASELINE.json input_hint) entirely with Column
expressions over ``spark.range``: every value is a pure function of
(conv_id, turn_idx, seed) via xxhash64, so any scale factor regenerates
bit-identically with NO driver-side loops and no RNG state — a 10⁷-turn
bench input materializes in parallel across all cores.

Hidden ``_kind`` / ``_lang`` truth columns ride along for the golden
oracle; the pipeline never reads them.

Mega-thread skew is planted deliberately (first ``mega_threads``
conversations get ``mega_turns`` turns) to exercise the pipeline's salted
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- language vocabularies (synthetic but trigram-discriminative) --------
LANG_VOCAB: dict[str, list[str]] = {
    "en": (
        "the quick brown fox jumps over lazy dog while morning sunlight "
        "spreads across quiet valley and birds begin their daily song with "
        "remarkable enthusiasm because nature always finds beautiful ways "
        "to remind people about simple things that matter most during busy "
        "seasons of working thinking reading writing learning teaching "
        "question answer system model data table query filter happy"
    ).split(),
    "fr": (
        "le renard brun rapide saute par dessus chien paresseux pendant que "
        "la lumière du matin s'étend sur vallée tranquille et les oiseaux "
        "commencent leur chanson quotidienne avec enthousiasme remarquable "
        "parce que nature trouve toujours belles façons de rappeler aux gens "
        "choses simples qui comptent beaucoup pendant saisons occupées "
        "travailler penser lire écrire apprendre enseigner question réponse"
    ).split(),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während das "
        "morgenlicht sich über das stille tal ausbreitet und die vögel ihr "
        "tägliches lied mit bemerkenswerter begeisterung beginnen weil die "
        "natur immer schöne wege findet um menschen an einfache dinge zu "
        "erinnern die während geschäftiger jahreszeiten wichtig sind "
        "arbeiten denken lesen schreiben lernen lehren frage antwort"
    ).split(),
    "es": (
        "el zorro marrón rápido salta sobre perro perezoso mientras la luz "
        "de mañana se extiende por valle tranquilo y los pájaros comienzan "
        "su canción diaria con entusiasmo notable porque la naturaleza "
        "siempre encuentra hermosas maneras de recordar a la gente cosas "
        "sencillas que importan mucho durante temporadas ocupadas trabajar "
        "pensar leer escribir aprender enseñar pregunta respuesta"
    ).split(),
}

PII_EMAILS = ["alice.smith@example.com", "bob-jones@mail.example.org",
              "carol_w@corp.example.net", "dave99@test.example.io"]
PII_PHONES = ["303-555-1234", "(720) 555-9876", "+1 415-555-2468", "212.555.1357"]
PII_SSNS = ["123-45-6789", "987-65-4321", "555-12-3456"]
PII_IPS = ["192.168.1.100", "10.0.42.7", "172.16.254.3", "8.8.8.8"]
TOX_WORDS = ["frakking", "dagnabbit", "gorram", "smeghead"]
BOILERPLATE = ["Click here to unsubscribe", "Terms and conditions apply",
               "All rights reserved", "Lorem ipsum dolor"]
TOOLS = ["search", "calculator", "browser", "python", "sql"]

KIND_WEIGHTS = {  # out of 200 — documents the planted mix
    "clean_en": 134, "non_en": 16, "pii": 10, "toxic": 4, "boilerplate": 8,
    "repetition": 8, "symbol": 6, "too_short": 4, "too_long": 2,
    "empty": 4, "null": 4,
}


def _h(*cols: Column | str | int, seed: int) -> Column:
    """Deterministic 64-bit hash of the arguments + seed."""
    lits = [c if isinstance(c, Column) else F.lit(c) for c in cols]
    return F.xxhash64(*lits, F.lit(seed))


def _pick(arr: list[str], h: Column) -> Column:
    """Deterministically pick one element of a literal array."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def _sentence(lang: str, cid: Column, tidx: Column, seed: int, salt: str = "w") -> Column:
    """5-20 deterministic vocab words joined by spaces."""
    vocab = LANG_VOCAB[lang]
    n_w = (F.pmod(_h(salt + "n", cid, tidx, seed=seed), F.lit(16)) + 5).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_w - 1),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in vocab]),
            (F.pmod(_h(salt, cid, tidx, i, seed=seed), F.lit(len(vocab))) + 1).cast("int"),
        ),
    )
    return F.concat(F.array_join(words, " "), F.lit("."))


def transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    mega_threads: int = 0,
    mega_turns: int = 10_000,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame. ~11 avg turns/conversation
    (95% 2-20 turns, 5% 20-200) plus optional planted mega-threads."""
    conv = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    cid = F.col("id")
    hc = _h("conv", cid, seed=seed)
    u = F.pmod(hc, F.lit(1000))
    n_turns = (
        F.when(cid < mega_threads, F.lit(mega_turns))
        .when(u < 950, (F.pmod(_h("nt", cid, seed=seed), F.lit(19)) + 2))
        .otherwise((F.pmod(_h("nt2", cid, seed=seed), F.lit(181)) + 20))
    ).cast("int")

    df = conv.select(
        F.format_string("conv_%08d", cid).alias("conv_id"),
        cid.alias("__cid"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    cid = F.col("__cid")
    tidx = F.col("turn_idx")
    h = _h("t", cid, tidx, seed=seed)
    kind_u = F.pmod(h, F.lit(200))

    # cumulative kind thresholds from KIND_WEIGHTS
    bounds = []
    acc = 0
    for k, w in KIND_WEIGHTS.items():
        acc += w
        bounds.append((k, acc))
    assert acc == 200

    kind = F.lit(None).cast("string")
    expr = None
    for k, b in bounds:
        cond = kind_u < b
        expr = F.when(cond, F.lit(k)) if expr is None else expr.when(cond, F.lit(k))
    kind = expr

    en_sent = _sentence("en", cid, tidx, seed)
    non_en_lang = _pick(["fr", "de", "es"], _h("lang", cid, tidx, seed=seed))
    fr_sent = _sentence("fr", cid, tidx, seed)
    de_sent = _sentence("de", cid, tidx, seed)
    es_sent = _sentence("es", cid, tidx, seed)
    non_en_sent = (
        F.when(non_en_lang == "fr", fr_sent)
        .when(non_en_lang == "de", de_sent)
        .otherwise(es_sent)
    )

    pii_kind = F.pmod(_h("pk", cid, tidx, seed=seed), F.lit(4))
    pii_bit = (
        F.when(pii_kind == 0, F.concat(F.lit("Contact me at "), _pick(PII_EMAILS, _h("pe", cid, tidx, seed=seed))))
        .when(pii_kind == 1, F.concat(F.lit("Call "), _pick(PII_PHONES, _h("pp", cid, tidx, seed=seed))))
        .when(pii_kind == 2, F.concat(F.lit("SSN is "), _pick(PII_SSNS, _h("ps", cid, tidx, seed=seed))))
        .otherwise(F.concat(F.lit("Server at "), _pick(PII_IPS, _h("pi", cid, tidx, seed=seed))))
    )

    rep_word = _pick(LANG_VOCAB["en"], _h("rw", cid, tidx, seed=seed))
    n_rep = (F.pmod(_h("rn", cid, tidx, seed=seed), F.lit(20)) + 12).cast("int")

    text = (
        F.when(kind == "clean_en", en_sent)
        .when(kind == "non_en", non_en_sent)
        .when(kind == "pii", F.concat(en_sent, F.lit(" "), pii_bit))
        .when(kind == "toxic", F.concat(en_sent, F.lit(" you "),
                                        _pick(TOX_WORDS, _h("tx", cid, tidx, seed=seed)),
                                        F.lit(" fool.")))
        .when(kind == "boilerplate", F.concat(_pick(BOILERPLATE, _h("bp", cid, tidx, seed=seed)),
                                              F.lit(" "), en_sent))
        .when(kind == "repetition", F.array_join(F.array_repeat(rep_word, n_rep), " "))
        .when(kind == "symbol", F.concat(F.repeat(F.lit("@#$%^&*! "), 8), F.lit("??")))
        .when(kind == "too_short", _pick(["ok", "k", "hm", ".."], _h("sh", cid, tidx, seed=seed)))
        .when(kind == "too_long", F.repeat(F.lit("spam data "), 2100))
        .when(kind == "empty", F.lit(""))
        .otherwise(F.lit(None).cast("string"))
    )

    role = (
        F.when(tidx == 0, F.lit("system"))
        .when(F.pmod(_h("role", cid, tidx, seed=seed), F.lit(12)) == 0, F.lit("tool"))
        .when(tidx % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(role == "tool", _pick(TOOLS, _h("tool", cid, tidx, seed=seed))).otherwise(
        F.lit(None).cast("string")
    )
    ts = F.timestamp_seconds(
        F.lit(1_700_000_000) + cid * 3600 + tidx * 7 + F.pmod(h, F.lit(5))
    )

    lang_truth = (
        F.when(kind == "non_en", non_en_lang)
        .when(kind.isin("clean_en", "pii", "toxic", "boilerplate"), F.lit("en"))
        .otherwise(F.lit("und"))
    )

    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        kind.alias("_kind"),
        lang_truth.alias("_lang"),
    )


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def strip_truth(df: DataFrame) -> DataFrame:
    """Drop the hidden oracle columns → the exact input_hint schema."""
    return df.select(*TRANSCRIPT_COLUMNS)
