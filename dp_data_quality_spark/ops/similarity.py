"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, one narrow pass computing
  dot/norms with ``zip_with`` + ``aggregate`` (sequential left fold →
  deterministic, oracle-reproducible), ``row_number`` per query for
  top-k. At 100 TB the corpus never shuffles: queries are broadcast,
  the scan is embarrassingly parallel, and only k rows per query
  survive to the (tiny) final sort.

- **LSH-bucketed ANN** — random-hyperplane signatures: 8 fixed
  hyperplanes → 8 sign bits → 256 buckets; candidates share the
  query's bucket, so the expensive cosine runs on ~1/256 of the
  corpus per query. The scale path when the query set is large enough
  that broadcast brute force stops being free. Hyperplanes are fixed
  literals (generated once from a seeded RNG at module import), so the
  SQL oracle reproduces the exact same buckets.

All arithmetic is float32 → float64 promotion with left-associative
summation in BOTH engines, so results are bit-identical pre-rounding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64
N_PLANES = 8

# Fixed random hyperplanes, rounded to 4 decimals, embedded as literals
# in both the Spark plan and the oracle SQL (same Python objects).
_rng = np.random.default_rng(20240817)
HYPERPLANES: list[list[float]] = [
    [round(float(v), 4) for v in _rng.standard_normal(EMB_DIM)]
    for _ in range(N_PLANES)
]


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in float64 (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def plane_dot(emb: Column, plane: list[float]) -> Column:
    """Dot with a literal hyperplane: zip_with + sequential left fold —
    the same evaluation order as the oracle's left-assoc term chain, in a
    compact expression (a 512-node literal tree bloats codegen)."""
    lits = F.array(*[F.lit(w) for w in plane])
    return F.aggregate(
        F.zip_with(emb, lits, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(emb: Column) -> Column:
    """8-bit random-hyperplane bucket id (0..255)."""
    bucket = F.lit(0)
    for p, plane in enumerate(HYPERPLANES):
        bucket = bucket + F.when(plane_dot(emb, plane) > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    (query_id, neighbor_id, rank, sim) — self-matches excluded; ties
    broken by neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Same output shape as cosine_topk; recall < 1 by design (bucket
    boundary misses), which is the documented ANN trade-off."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


# --- oracle SQL fragments -------------------------------------------------

def sql_dot(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Left-assoc chain CAST(a[i] AS DOUBLE)*CAST(b[i] AS DOUBLE) + ... —
    textually mirrors plane-free dot; DuckDB lists are 1-indexed."""
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_cosine(a: str, b: str, dim: int = EMB_DIM) -> str:
    return (
        f"({sql_dot(a, b, dim)} / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)})))"
    )


def sql_plane_dot(emb: str, plane: list[float]) -> str:
    terms = [
        f"CAST({emb}[{i + 1}] AS DOUBLE) * {w!r}" for i, w in enumerate(plane)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_lsh_bucket(emb: str) -> str:
    parts = [
        f"(CASE WHEN {sql_plane_dot(emb, plane)} > 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(HYPERPLANES)
    ]
    return "(" + " + ".join(parts) + ")"
