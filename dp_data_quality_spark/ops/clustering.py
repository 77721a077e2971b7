"""Distributed iterative clustering: Lloyd's k-means with DataFrame ops.

The iterative-algorithm shape on Spark: per iteration, one broadcast
(k×dim centroid literals — bytes), one narrow assignment pass over the
corpus (no shuffle), and one partial+final aggregation for the centroid
update; only k×dim numbers ever reach the driver.  At 100 TB the corpus
is scanned once per iteration and nothing else moves — the same plan
MLlib's KMeans lowers to, expressed in the public DataFrame API.

Determinism: centroids initialize from the first k vector ids,
assignment ties break toward the lower centroid id (min over a
(dist, cent_id) struct), and the element-wise mean is an exact
`avg` per dimension — identical results on every run/partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist) — nearest centroid per vector; the centroid
    set rides into the plan as literals (broadcast by value)."""
    # array_min over (dist, cid) structs: lexicographic struct ordering IS
    # the argmin-with-lower-id tie-break, and the expression tree stays
    # linear in k (a nested when-chain would copy the accumulated subtree
    # per centroid — exponential codegen, OOM by k≈10).
    cands = F.array(*[
        F.struct(
            _sq_dist(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in vec])
            ).alias("d"),
            F.lit(cid).alias("cid"),
        )
        for cid, vec in centroids
    ])
    best = F.array_min(cands)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        best["cid"].alias("cluster"),
        best["d"].alias("sq_dist"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Lloyd's iterations; returns (final centroids, per-iteration SSE).

    Centroid update: posexplode dimensions → avg per (cluster, dim) →
    collect k×dim to the driver (tiny) for the next iteration's
    broadcast literals.  The SSE rides ALONG the same aggregate (summed
    where dim==0, so each row counts once), making each Lloyd iteration
    exactly ONE Spark job / one corpus scan — no separate SSE action,
    no persist."""
    init = (
        df.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("cid"), F.col(vec_col))
        .collect()
    )
    centroids = [(r.cid, list(r[vec_col])) for r in init]
    sses: list[float] = []

    for _ in range(n_iter):
        assigned = assign_clusters(df, centroids, id_col, vec_col)
        new_rows = (
            assigned.select(
                "cluster", "sq_dist",
                F.posexplode("embedding").alias("dim", "val"),
            )
            .groupBy("cluster", "dim")
            .agg(
                F.avg("val").alias("m"),
                # each vector's sq_dist appears once per dim; count it
                # only on dim 0 so the ride-along SSE is exact
                F.sum(F.when(F.col("dim") == 0, F.col("sq_dist"))).alias("sse_d0"),
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("centroid"),
                F.sum("sse_d0").alias("sse"),
            )
            .collect()
        )
        sses.append(float(sum(r.sse for r in new_rows)))
        centroids = [(r.cluster, list(r.centroid)) for r in new_rows]

    return centroids, sses


def kmeans(
    df: DataFrame,
    k: int = 10,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means; returns (final assignments, per-iteration SSE)."""
    centroids, sses = kmeans_fit(df, k, n_iter, id_col, vec_col)
    return assign_clusters(df, centroids, id_col, vec_col), sses
