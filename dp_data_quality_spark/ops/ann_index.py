"""Persistent IVF index for similarity search: build once, probe many.

The ANN family in :mod:`.similarity` recomputes its coarse quantization
per query (fine for one-shot queries; wasteful for a served index).  A
100-TB similarity-search deployment builds the index ONCE and probes it
many times — the same pattern :mod:`.incremental` established for the
dedup signature index.  Layout on disk:

- ``{path}/centroids`` — the fitted coarse quantizer: ``(cent_id int,
  cent_emb array<double>)``, k rows (k-means over the corpus, Lloyd's
  via :func:`..clustering.kmeans_fit`).
- ``{path}/lists`` — the inverted lists: every corpus vector stored
  under its nearest centroid, ``partitionBy("cent_id")`` so that a
  probe reads ONLY the probed lists (static partition pruning — the
  probe collects its ≤ |queries|·n_probe distinct list ids, a few ints,
  and pushes them into the scan as a literal IN filter; the other
  ``(n_centroids - n_probe)/n_centroids`` of the corpus is never
  opened).

Probe cost is O(|queries| · corpus/n_centroids · n_probe) with NO
k-means fit, NO corpus scan, and NO shuffle of the lists (the query
assignment table is broadcast).  Numerically the probe reproduces
:func:`..similarity.ivf_kmeans_ann_topk` bit-for-bit: the centroids are
persisted as float64 exactly as fitted, the lists round-trip the
float32 embeddings losslessly through parquet, and the scoring is the
same ``cosine_pairs`` chain — which is what lets the unrolled-k-means
DuckDB oracle hash-gate the persisted path end-to-end.

Scale notes: at 10⁹ vectors the lists are ~256 GB of parquet split over
n_centroids partitions — each probe task reads a bounded slice; the
centroid table is k×dim doubles (broadcast); rebuilds are atomic
(overwrite both directories).  For query batches too large to
broadcast, flip the probe join's broadcast hint to a shuffle join on
``cent_id`` — the list side is already partitioned by it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import assign_centroids, cosine_pairs


@dataclass
class IvfIndexInfo:
    path: str
    n_centroids: int
    n_vectors: int


_assign = assign_centroids  # shared IVF assignment (see similarity.py):
# probes==1 → map-side-reducible max_by (no corpus×k embedding shuffle),
# probes>1 → per-query window; identical ranking/tie-breaks both ways.

# v2: the marker gained a corpus fingerprint (n_corpus) and rebuilds
# delete the marker up front — v1 markers are unconditionally rebuilt
INDEX_FORMAT_VERSION = 2


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reuse_existing: bool = False,
) -> IvfIndexInfo:
    """Offline build: fit the coarse quantizer and materialize the
    inverted lists.  One k-means fit (n_iter corpus scans) + one
    assignment scan + one partitioned write; deterministic (seeded init
    = first k vectors, ties broken on cent_id), so rebuilding from the
    same corpus produces byte-identical lists.

    ``reuse_existing=True`` is the build-once production mode: when a
    committed marker (``_BUILT.json``) with matching parameters exists
    at ``index_path``, the build is skipped entirely and only the probe
    pays — rebuilding from the same corpus is a no-op by determinism.
    The marker records (version, n_centroids, n_iter, n_corpus,
    n_vectors); any mismatch forces a rebuild.  ``n_corpus`` binds the
    marker to the corpus it was built from (row count — metadata-cheap
    on parquet sources, so the reuse check never scans vector data; a
    same-count different-content corpus still requires an explicit
    rebuild, documented trade-off vs hashing the corpus every probe).

    Crash safety both ways: the marker is DELETED before any rebuild
    touches the directories (a crash mid-rebuild can never leave a
    stale marker validating new-centroids/old-lists) and is committed
    LAST via exclusive create (its presence implies both directories
    are complete; a concurrent builder racing the same path fails the
    create instead of silently double-committing)."""
    import json

    from .clustering import kmeans_fit

    spark = corpus.sparkSession
    n_corpus = corpus.count()
    params = {
        "version": INDEX_FORMAT_VERSION,
        "n_centroids": n_centroids,
        "n_iter": n_iter,
        "n_corpus": n_corpus,
    }
    jp = spark._jvm.org.apache.hadoop.fs.Path(f"{index_path}/_BUILT.json")
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if reuse_existing and fs.exists(jp):
        stream = fs.open(jp)
        try:
            raw = bytes(
                spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            ).decode()
        finally:
            stream.close()
        marker = json.loads(raw)
        if {k: marker.get(k) for k in params} == params:
            return IvfIndexInfo(path=index_path, n_centroids=n_centroids,
                                n_vectors=marker["n_vectors"])
    # rebuilding: retire the old marker FIRST so reuse_existing can
    # never accept a partially overwritten index
    if fs.exists(jp):
        fs.delete(jp, False)
    centroids, _ = kmeans_fit(corpus, k=n_centroids, n_iter=n_iter,
                              id_col=id_col, vec_col=vec_col)
    cents = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cent_id int, cent_emb array<double>",
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")

    assigned = _assign(corpus, cents, "vec_id", "embedding", 1,
                       id_col, vec_col)
    (
        assigned.repartition("cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(f"{index_path}/lists")
    )
    # nearest-1 assignment preserves row count, so the lists hold
    # exactly n_corpus vectors — no read-back scan of the written index
    out = fs.create(jp, False)
    try:
        out.write(bytearray(
            json.dumps({**params, "n_vectors": n_corpus}).encode()
        ))
    finally:
        out.close()
    return IvfIndexInfo(path=index_path, n_centroids=n_centroids,
                        n_vectors=n_corpus)


def probe_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Online probe: top-k cosine neighbors per query from the PERSISTED
    index — no k-means fit, no full-corpus scan.  Reads the centroid
    table (k rows), assigns each query its ``n_probe`` nearest lists,
    then scans only those list partitions (literal IN filter → static
    partition pruning at the parquet scan).  Output schema matches
    ``similarity.cosine_topk``: (query_id, neighbor_id, rank, sim)."""
    cents = spark.read.parquet(f"{index_path}/centroids")
    query_a = _assign(queries, cents, "query_id", "q_emb", n_probe,
                      id_col, vec_col)

    # ≤ |queries|·n_probe ints — driver-bounded by construction
    probe_ids = sorted(
        r.cent_id for r in query_a.select("cent_id").distinct().collect()
    )
    lists = (
        spark.read.parquet(f"{index_path}/lists")
        .filter(F.col("cent_id").isin(probe_ids))
        .select("cent_id", F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"))
    )
    scored = (
        lists.join(F.broadcast(query_a), on="cent_id")
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
        .select("query_id", "neighbor_id", "rank",
                F.round("sim", 6).alias("sim"))
    )
