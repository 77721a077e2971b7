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
# 4 planes → 16 buckets: sized so a bucket still holds enough candidates
# at the sandbox corpus sizes (500-5000 vectors). At 10^9+ vectors, more
# planes (or multi-probe) keeps bucket occupancy near k; the plane count
# is the recall/cost dial.
N_PLANES = 4

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


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_centroids``
    inverted lists, probe the query's ``n_probe`` nearest lists only.

    Centroids here are the first ``n_centroids`` corpus vectors
    (deterministic sampled-centroid IVF — the k-means refinement is an
    offline concern; the query-time plan is identical).  At 100 TB the
    wins are structural: the corpus is clustered ONCE (a write-time
    partition-by-cluster), each query scans ~n_probe/n_centroids of the
    data, and the centroid table is a broadcast.  Same output shape as
    cosine_topk; recall < 1 by design."""
    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_emb")
    )

    def assign(df: DataFrame, id_alias: str, emb_alias: str, probes: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(id_alias), F.col(vec_col).alias(emb_alias)
        ).crossJoin(F.broadcast(cents)).select(
            id_alias, emb_alias, "cent_id",
            cosine(F.col(emb_alias), F.col("cent_emb")).alias("csim"),
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.col("csim").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= probes)
            .drop("csim", "crank")
        )

    corpus_a = assign(corpus, "neighbor_id", "c_emb", 1)
    query_a = assign(queries, "query_id", "q_emb", n_probe)

    scored = (
        corpus_a.join(query_a, on="cent_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
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
    """Approximate top-k: candidates restricted to the query's LSH bucket
    plus all Hamming-1 neighbor buckets (multi-probe — each flipped
    hyperplane bit probes one adjacent bucket, the standard recall fix
    for boundary misses).  Same output shape as cosine_topk; recall < 1
    by design, which is the documented ANN trade-off."""
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        lsh_bucket(F.col(vec_col)).alias("b0"),
    )
    probes = F.array(
        F.col("b0"), *[F.col("b0").bitwiseXOR(1 << p) for p in range(N_PLANES)]
    )
    q = q0.select(
        "query_id", "q_emb", F.explode(probes).alias("bucket")
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
        .distinct()
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
