"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, one narrow pass computing
  dot/norms with ``zip_with`` + ``aggregate`` (sequential left fold →
  deterministic, oracle-reproducible), ``row_number`` per query for
  top-k. At 100 TB the corpus never shuffles: queries are broadcast,
  the scan is embarrassingly parallel, and only k rows per query
  survive to the (tiny) final sort.

- **LSH-bucketed ANN** — random-hyperplane signatures: ``N_PLANES``
  fixed hyperplanes → ``N_PLANES`` sign bits → ``2**N_PLANES`` buckets
  (4 planes → 16 buckets here); candidates share the query's bucket,
  so the expensive cosine runs on ~1/2**N_PLANES of the corpus per
  query. The scale path when the query set is large enough that
  broadcast brute force stops being free. Hyperplanes are fixed
  literals (generated once from a seeded RNG at module import), so the
  SQL oracle reproduces the exact same buckets.

- **Near-duplicate pairs** — the same buckets drive all-vs-all
  near-dup detection without a cartesian product: every vector joins
  only against its own bucket plus Hamming-1 probe buckets, so the
  candidate set is O(n·avg_bucket_occupancy), not O(n²). Recall < 1
  by design (pairs whose signatures differ in ≥2 bits are missed) —
  the standard LSH trade-off; the plane count is the recall/cost dial.

All arithmetic is float32 → float64 promotion with left-associative
summation in BOTH engines, so results are bit-identical pre-rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

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
    """Sequential left-fold dot product in float64 (deterministic order).

    Formulation note (measured, sf0.1): the HOF lambda evaluates
    interpreted per element, but the two alternatives are WORSE —
    an unrolled 64-term ``element_at`` chain bloats codegen past
    JIT-able size (ann queries 3-6× slower), and that is exactly the
    simhash lesson repeating.  For BULK pair scoring use
    :func:`cosine_pairs` (Arrow pandas UDF, dimension-sequential numpy
    — bit-identical values at vectorized speed); this Column form
    remains for single-expression contexts (bucket hashing, oracles,
    small literals)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DataType object, not a DDL string: string return types are parsed via
# the active SparkContext, which doesn't exist yet at module-import time.
@pandas_udf(DoubleType())
def cosine_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched pair cosine, bit-identical to :func:`cosine`:
    numpy is vectorized across ROWS but accumulates SEQUENTIALLY over
    dimensions (``acc += x_i * y_i`` per dim, float64), which is the
    same left-associative chain the Column form and the DuckDB oracle
    evaluate — so values agree pre-rounding, at vectorized speed (the
    632k-candidate near-dup query: 11.7 s → 4.0 s end-to-end at sf0.1,
    with the residual dominated by the pair shuffle, not scoring)."""
    import numpy as np

    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    n = A.shape[0]
    d = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for i in range(A.shape[1]):
        x, y = A[:, i], B[:, i]
        d += x * y
        na += x * x
        nb += y * y
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(d / (np.sqrt(na) * np.sqrt(nb)))


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
    """``N_PLANES``-bit random-hyperplane bucket id (0..2**N_PLANES-1)."""
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
            cosine_pairs(F.col("q_emb"), F.col("c_emb")).alias("sim"),
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


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization of an embedding column: per-vector
    symmetric scale ``q_i = floor(x_i · 127 / max|x|)`` stored as
    ``array<tinyint>`` — 4× smaller than float32 (16× vs float64), the
    standard memory/bandwidth lever for a 100-TB vector corpus.  Cosine
    is scale-invariant, so the per-vector scale cancels and ranking
    runs directly on the quantized ints — whose dot products are exact
    integers (≤ 127²·64 ≪ 2⁵³), making the variant bit-reproducible in
    ANY summation order.  All-zero vectors quantize to zeros (guarded
    division).  Deterministic floor arithmetic, so the DuckDB oracle
    (:func:`sql_quantize_cte`) reproduces every code."""
    vec = F.col(vec_col)
    mx = F.aggregate(
        vec, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
    )
    out = df.withColumn("__mx", mx)
    q = F.when(
        F.col("__mx") == 0.0,
        F.transform(vec, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            vec,
            lambda x: F.floor(
                x.cast("double") * F.lit(127.0) / F.col("__mx")
            ).cast("tinyint"),
        )
    )
    return out.withColumn(vec_col, q).drop("__mx")


def quantized_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors
    (:func:`quantize_embeddings` → :func:`cosine_topk`): the quantized
    sibling of the exact baseline.  At scale the quantized corpus is
    what sits in memory/cache — 4× more vectors per executor — and the
    float corpus is consulted only to re-rank the survivors (re-ranking
    is ``cosine_topk`` over the k·n_queries survivor set, driver-free)."""
    return cosine_topk(
        quantize_embeddings(corpus, id_col, vec_col),
        quantize_embeddings(queries, id_col, vec_col),
        k=k, id_col=id_col, vec_col=vec_col,
    )


def quantized_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: int8-quantized shortlist → EXACT float
    re-rank — the production pattern for a 100-TB vector corpus.

    Stage 1 scans only the quantized codes (4× less memory/bandwidth
    than float32, so 4× more corpus per executor) and keeps
    ``shortlist`` candidates per query; stage 2 touches the float
    vectors ONLY for those candidates — the (queries × shortlist)
    ids-only candidate set is broadcast into the corpus scan, so the
    full-precision column is read for a vanishing fraction of rows and
    nothing corpus-sized ever shuffles.  Returned ``sim`` values are
    the EXACT cosine (identical to :func:`cosine_topk` for every pair
    the shortlist retains), so quantization can only cost recall at
    the shortlist boundary, never precision of the reported scores."""
    cand = quantized_ann_topk(
        corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_pairs(F.col("q_emb"), F.col("c_emb")).alias("sim"),
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


def sql_quantize_cte(table: str = "embeddings",
                     vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`quantize_embeddings` as a derived-table SQL
    fragment: same guarded ``floor(x·127/max|x|)`` codes."""
    return f"""
(SELECT vec_id,
        CASE WHEN mx = 0 THEN list_transform({vec_col}, x -> CAST(0 AS TINYINT))
             ELSE list_transform({vec_col},
                  x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS TINYINT))
        END AS {vec_col}
 FROM (SELECT vec_id, {vec_col},
              list_aggregate(list_transform({vec_col},
                             x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
       FROM {table}))
"""


def assign_centroids(df: DataFrame, cents: DataFrame, id_alias: str,
                     emb_alias: str, probes: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Nearest-``probes`` centroid assignment against a broadcast
    centroid table — the shared IVF building block (in-memory
    ``ivf_ann_topk`` and the persistent ``ops.ann_index`` build/probe).

    ``probes == 1`` (the corpus side — corpus-sized input) uses a
    ``max_by`` aggregate instead of a ``row_number`` window: the
    aggregate is map-side reducible, so each task reduces its corpus×k
    candidate rows to one row per vector BEFORE the exchange — the
    window formulation would shuffle k× the corpus WITH embedding
    payloads just to rank them.  Tie-break is identical (highest csim,
    then lowest cent_id — NaN sorts greatest in both formulations).
    ``probes > 1`` (the query side — a handful of rows) keeps the
    window."""
    scored = df.select(
        F.col(id_col).alias(id_alias), F.col(vec_col).alias(emb_alias)
    ).crossJoin(F.broadcast(cents)).select(
        id_alias, emb_alias, "cent_id",
        cosine_pairs(F.col(emb_alias), F.col("cent_emb")).alias("csim"),
    )
    if probes == 1:
        best = scored.groupBy(id_alias).agg(
            F.max_by(
                F.struct(F.col(emb_alias).alias("emb"),
                         F.col("cent_id").alias("cent_id")),
                F.struct(F.col("csim").alias("csim"),
                         (-F.col("cent_id")).alias("neg_cid")),
            ).alias("best")
        )
        return best.select(
            id_alias,
            F.col("best.emb").alias(emb_alias),
            F.col("best.cent_id").alias("cent_id"),
        )
    w = Window.partitionBy(id_alias).orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= probes)
        .drop("csim", "crank")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_centroids``
    inverted lists, probe the query's ``n_probe`` nearest lists only.

    Default centroids are the first ``n_centroids`` corpus vectors
    (deterministic sampled-centroid IVF); pass ``centroids`` —
    e.g. from ``clustering.kmeans_fit`` via ``ivf_kmeans_ann_topk`` —
    for trained coarse quantization (tighter lists → better recall at
    the same n_probe).  At 100 TB the wins are structural either way:
    the corpus is clustered ONCE (a write-time partition-by-cluster),
    each query scans ~n_probe/n_centroids of the data, and the centroid
    table is a broadcast.  Same output shape as cosine_topk; recall < 1
    by design."""
    if centroids is not None:
        spark = corpus.sparkSession
        cents = spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
            "cent_id int, cent_emb array<double>",
        )
    else:
        cents = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_emb")
        )

    corpus_a = assign_centroids(corpus, cents, "neighbor_id", "c_emb", 1,
                                id_col, vec_col)
    query_a = assign_centroids(queries, cents, "query_id", "q_emb", n_probe,
                               id_col, vec_col)

    scored = (
        corpus_a.join(query_a, on="cent_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_pairs(F.col("q_emb"), F.col("c_emb")).alias("sim"),
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


def ivf_kmeans_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with TRAINED coarse centroids: fit Lloyd's k-means on the
    corpus (``clustering.kmeans_fit`` — broadcast centroids, one narrow
    scan per iteration, only k×dim to the driver), then run the same
    inverted-list probe plan over the fitted centroids.  The fit is the
    offline build step of a production IVF index; query-time cost is
    identical to ``ivf_ann_topk``."""
    from .clustering import kmeans_fit

    centroids, _ = kmeans_fit(corpus, k=n_centroids, n_iter=n_iter,
                              id_col=id_col, vec_col=vec_col)
    return ivf_ann_topk(corpus, queries, k, n_centroids, n_probe,
                        id_col, vec_col, centroids=centroids)


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
    # No distinct needed: a corpus vector lives in exactly ONE bucket,
    # and a query's probe values are pairwise distinct, so each
    # (query, neighbor) pair joins at most once — deduplicating here
    # would only add a shuffle.
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pairs(F.col("q_emb"), F.col("c_emb")).alias("sim"),
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


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed candidates —
    NO all-pairs join anywhere in the plan.

    Each vector lands in its sign-bit bucket; side A additionally probes
    every Hamming-1 neighbor bucket (one flipped hyperplane bit each).
    The equi-join on the probe key therefore emits each unordered pair
    whose signatures differ in ≤1 bit exactly once (after ``id_a <
    id_b``), and the expensive cosine runs only on those candidates:
    O(n · bucket_occupancy) work, vs O(n²) for a crossJoin.  At 10⁹
    vectors the plan is a hash-partitioned self-join on a small int key
    — more planes shrink buckets to keep per-key work bounded.

    Recall < 1 by design (a near-dup pair ≥2 sign bits apart is
    missed) — the documented LSH trade-off shared with ``lsh_ann_topk``.
    """
    # The probe join ships ONLY (id, probe) — never the vectors: the
    # a-side replicates each row 1+N_PLANES times, and replicating
    # embedding payloads 5× through that shuffle is the dominant cost at
    # 10⁹ vectors.  Embeddings re-attach to the surviving id pairs by
    # plain key joins (auto-broadcast at small scale, co-partitionable
    # sort-merge at large), then one Arrow batch scores the candidates.
    e = df.select(
        F.col(id_col).alias("vec_id"),
        lsh_bucket(F.col(vec_col)).alias("b0"),
    )
    probes = F.array(
        F.col("b0"), *[F.col("b0").bitwiseXOR(1 << p) for p in range(N_PLANES)]
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.explode(probes).alias("probe"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("b0").alias("probe"))
    pairs = (
        a.join(b, on="probe")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    ea = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    eb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    return (
        pairs.join(ea, on="id_a")
        .join(eb, on="id_b")
        .select(
            "id_a", "id_b",
            cosine_pairs(F.col("emb_a"), F.col("emb_b")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def semantic_neardup_pairs(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 5,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means cluster the
    embedding space (Lloyd's, ``..clustering.kmeans`` — one narrow
    assignment pass per iteration, only k×dim numbers reach the driver),
    then score cosine ONLY within each cluster.  (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — the published recipe: cluster, then prune
    high-similarity pairs inside clusters.)

    Scale shape: the candidate set is Σ|cluster|²/2 ≈ n²/(2k) instead of
    n²/2 — k is the cost dial and grows with the corpus (k ∝ n keeps
    per-cluster work constant, the same bound the IVF index uses for its
    inverted lists).  The pair join is an equi-join on a small int
    cluster id carrying ids only; embeddings re-attach to surviving
    pairs by key join, and one Arrow batch scores the candidates —
    nothing corpus×corpus ever materializes.  Recall < 1 by design:
    a near-dup pair straddling a cluster boundary is missed (the
    published trade-off; LSH-bucketed ``neardup_pairs`` is the
    complementary candidate generator)."""
    from .clustering import kmeans

    assigned, _ = kmeans(df, k=k, n_iter=n_iter, id_col=id_col,
                         vec_col=vec_col)
    ids = assigned.select("cluster", "vec_id")
    pairs = (
        ids.select("cluster", F.col("vec_id").alias("id_a"))
        .join(ids.select("cluster", F.col("vec_id").alias("id_b")),
              on="cluster")
        .where(F.col("id_a") < F.col("id_b"))
    )
    ea = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    eb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    return (
        pairs.join(ea, on="id_a")
        .join(eb, on="id_b")
        .select(
            "cluster", "id_a", "id_b",
            cosine_pairs(F.col("emb_a"), F.col("emb_b")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("cluster", "id_a", "id_b", F.round("sim", 6).alias("sim"))
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


def sql_neardup_pairs(threshold: float = 0.4, table: str = "embeddings") -> str:
    """DuckDB twin of ``neardup_pairs``: same buckets, same Hamming-1
    probes (``xor(b0, 1<<p)``), same candidate predicate — value-exact."""
    cos = sql_cosine("emb_a", "emb_b")
    probe_selects = ["  SELECT vec_id, embedding, b0 AS probe FROM e"] + [
        f"  SELECT vec_id, embedding, xor(b0, {1 << p}) AS probe FROM e"
        for p in range(N_PLANES)
    ]
    return f"""
WITH e AS (
  SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS b0 FROM {table}
),
probes AS (
{chr(10).join(s + (' UNION ALL' if i < N_PLANES else '') for i, s in enumerate(probe_selects))}
),
cand AS (
  SELECT a.vec_id AS id_a, a.embedding AS emb_a,
         b.vec_id AS id_b, b.embedding AS emb_b
  FROM probes a JOIN e b ON a.probe = b.b0 AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round({cos}, 6) AS sim
FROM cand WHERE {cos} >= {threshold}
"""
