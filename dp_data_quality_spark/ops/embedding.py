"""In-engine text embeddings: hashed n-gram feature projection.

The similarity/ANN family (:mod:`.similarity`, :mod:`.ann_index`,
:mod:`.clustering`) consumes an ``embedding`` column; this module is
the stage that PRODUCES one from raw text, so the whole similarity
story runs end-to-end inside the engine instead of assuming vectors
were computed elsewhere.  The method is the classic hashing trick
(feature hashing, Weinberger et al. 2009): each document's distinct
word n-gram shingles are hashed into a fixed ``dim``-bucket space with
a ±1 sign hash, and the embedding is the per-bucket signed count —
a sparse bag-of-n-grams projected to a dense fixed-width vector, no
vocabulary to build, no model to train, fully deterministic.

Engine portability: the shingle set is the SAME distinct word-3-gram
set every dedup operator uses (:func:`.dedup._exploded_shingles`), the
bucket/sign hash rides the md5-derived :func:`.hashing.h32` (bucket =
``h % dim``, sign = bit ``log2(dim)`` of ``h``), and every component is
an INTEGER sum of ±1 — so a DuckDB oracle reproduces the vectors
bit-for-bit and every downstream cosine (float32→float64 promotion,
left-associative) stays oracle-exact too.

Scale shape (the 100-TB question): embedding is logically a per-row
map, and this plan keeps it one shuffle away from that — the shingle
explode is narrow, the per-(doc, bucket) partial sums combine map-side
(a task reduces its shingle stream to ≤ dim rows per doc before the
exchange), and the final per-doc assembly groups ``≤ dim`` small ints
per doc.  No Python in the path: everything is codegen'd Spark SQL
(the fused-UDF alternative was rejected because a third — Python —
implementation of normalize/shingle/hash would have to agree with both
engines character-for-character; staying on the one proven shingle
pipeline makes parity structural).  Per the SimHash formulation note
(:func:`.dedup.simhash`), the per-bucket sums deliberately go through
a (doc_id, bucket) groupBy rather than ``dim`` conditional sums in one
aggregate — the wide-aggregate variant exceeds JIT-able codegen size.

Reference scope note: the reference (dp-data-quality) has no embedding
stage at all — this is part of the beyond-reference training-data
surface (SURVEY.md §2 extension), feeding ANN/near-dup from
``documents.text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _exploded_shingles
from .hashing import h32, sql_h32

EMBED_DIM = 64  # matches similarity.EMB_DIM so the ANN family plugs in


def _check_dim(dim: int) -> int:
    if dim & (dim - 1) or dim <= 0:
        raise ValueError(f"dim must be a power of two, got {dim}")
    return dim.bit_length() - 1  # log2(dim) — the sign-bit position


def hashed_ngram_embeddings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """(doc_id, embedding array<long>) — signed hashed-n-gram counts.

    Docs with no shingles (< ``n`` words after normalization) are
    absent, the same convention as ``minhash_signatures``.  Component
    values are exact integers (sums of ±1 over the doc's distinct
    shingles), so parquet round-trips and oracle comparison are exact.
    """
    sign_bit = _check_dim(dim)
    sh = _exploded_shingles(df, id_col, text_col, n)
    feat = sh.select(
        "doc_id",
        (h32(F.col("shingle")) % dim).cast("int").alias("j"),
        F.when(
            F.shiftright(h32(F.col("shingle")), sign_bit).bitwiseAND(1) == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).cast("long").alias("s"),
    )
    # two-level aggregation (see module docstring): partial sums combine
    # map-side; the assembly groups ≤ dim ints per doc
    per_dim = feat.groupBy("doc_id", "j").agg(F.sum("s").alias("v"))
    return (
        per_dim.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("j", "v"))).alias("m"))
        .select(
            "doc_id",
            F.array(*[
                F.coalesce(F.element_at("m", F.lit(j)), F.lit(0).cast("long"))
                for j in range(dim)
            ]).alias("embedding"),
        )
    )


# --- oracle SQL (DuckDB) ---------------------------------------------------

def sql_hashed_ngram_embeddings(
    shingles_cte: str, n: int = 3, dim: int = EMBED_DIM
) -> str:
    """DuckDB twin over an exploded-shingles CTE body (columns
    ``doc_id, shingle``, per-doc distinct): same h32, same bucket/sign
    arithmetic, components cast back to BIGINT (DuckDB sums to
    HUGEINT).  Returns SQL producing (doc_id, embedding BIGINT[])."""
    sign_bit = _check_dim(dim)
    x = sql_h32("shingle")
    comps = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN j = {j} THEN s END), 0) AS BIGINT)"
        for j in range(dim)
    )
    return f"""
SELECT doc_id, [{comps}] AS embedding
FROM (
  SELECT doc_id, ({x}) % {dim} AS j,
         CASE WHEN (({x}) >> {sign_bit}) & 1 = 0 THEN 1 ELSE -1 END AS s
  FROM ({shingles_cte})
)
GROUP BY doc_id
"""
