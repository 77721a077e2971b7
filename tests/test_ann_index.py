"""Persistent IVF index: build-once/probe-many, partition-pruned probes,
parity with the in-memory IVF path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _emb_df(spark, n=200, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [round(float(x), 4) for x in rng.standard_normal(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_probe_matches_inmemory_ivf(spark, tmp_path):
    from dp_data_quality_spark.ops.ann_index import (
        build_ivf_index, probe_ivf_index,
    )
    from dp_data_quality_spark.ops.similarity import ivf_kmeans_ann_topk

    corpus = _emb_df(spark)
    queries = corpus.filter(F.col("vec_id") < 3)
    idx = str(tmp_path / "ivf")
    info = build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)
    assert info.n_vectors == 200

    got = probe_ivf_index(spark, queries, idx, k=5, n_probe=2)
    want = ivf_kmeans_ann_topk(corpus, queries, k=5, n_centroids=8,
                               n_probe=2, n_iter=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_second_run_probes_without_rebuilding(spark, tmp_path, monkeypatch):
    """After the build, probing must touch neither k-means nor the corpus:
    the fit is poisoned and the probe still answers from disk."""
    from dp_data_quality_spark.ops import ann_index, clustering

    corpus = _emb_df(spark)
    idx = str(tmp_path / "ivf")
    ann_index.build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)

    def boom(*a, **k):  # any re-fit attempt fails the test
        raise AssertionError("probe must not re-fit the quantizer")

    monkeypatch.setattr(clustering, "kmeans_fit", boom)
    queries = _emb_df(spark).filter(F.col("vec_id") < 3)
    out = ann_index.probe_ivf_index(spark, queries, idx, k=5, n_probe=2)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in rows)


def test_probe_scans_only_probed_partitions(spark, tmp_path):
    """Static partition pruning: the probe's list scan opens only the
    probed cent_id partitions, not the whole index."""
    import os

    from dp_data_quality_spark.ops.ann_index import (
        build_ivf_index, probe_ivf_index,
    )

    corpus = _emb_df(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)
    n_lists_on_disk = len(
        [d for d in os.listdir(f"{idx}/lists") if d.startswith("cent_id=")]
    )
    assert n_lists_on_disk > 2

    one_query = corpus.filter(F.col("vec_id") == 0)
    probe = probe_ivf_index(spark, one_query, idx, k=5, n_probe=2)
    # the lists scan must carry the literal IN as a PARTITION filter
    # (pruned at planning — unprobed cent_id directories never open)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cent_id" in ln
    ]
    assert scan_lines, plan
    assert any("cent_id IN" in ln or "cent_id#" in ln for ln in scan_lines)
    # and the executed scan reads at most n_probe of the on-disk lists
    probed = {
        r.cent_id
        for r in probe.select(F.col("neighbor_id")).join(
            spark.read.parquet(f"{idx}/lists").select(
                F.col("vec_id").alias("neighbor_id"), "cent_id"
            ),
            "neighbor_id",
        ).select("cent_id").distinct().collect()
    }
    assert 1 <= len(probed) <= 2 < n_lists_on_disk


def test_rebuild_is_deterministic(spark, tmp_path):
    from dp_data_quality_spark.ops.ann_index import (
        build_ivf_index, probe_ivf_index,
    )

    corpus = _emb_df(spark)
    queries = corpus.filter(F.col("vec_id") < 3)
    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)
    r1 = sorted(map(tuple, probe_ivf_index(spark, queries, idx, k=5).collect()))
    build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)  # overwrite
    r2 = sorted(map(tuple, probe_ivf_index(spark, queries, idx, k=5).collect()))
    assert r1 == r2


def test_rebuild_retires_stale_marker_before_overwriting(spark, tmp_path, monkeypatch):
    """A crash mid-REBUILD must not leave the old marker validating a
    half-overwritten index: the marker is deleted before any directory
    is touched, so reuse_existing can never serve new-centroids/old-lists."""
    import os

    import pytest

    from dp_data_quality_spark.ops import ann_index, clustering

    corpus = _emb_df(spark)
    idx = str(tmp_path / "ivf")
    ann_index.build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)
    assert os.path.exists(f"{idx}/_BUILT.json")

    def boom(*a, **k):
        raise RuntimeError("crash mid-rebuild")

    monkeypatch.setattr(clustering, "kmeans_fit", boom)
    with pytest.raises(RuntimeError, match="crash mid-rebuild"):
        ann_index.build_ivf_index(corpus, idx, n_centroids=4, n_iter=2,
                                  reuse_existing=True)
    # stale marker is gone → the next reuse_existing build cannot accept
    # the inconsistent state; it rebuilds from scratch
    assert not os.path.exists(f"{idx}/_BUILT.json")
    monkeypatch.undo()
    info = ann_index.build_ivf_index(corpus, idx, n_centroids=8, n_iter=3,
                                     reuse_existing=True)
    assert info.n_vectors == 200 and os.path.exists(f"{idx}/_BUILT.json")


def test_marker_is_bound_to_corpus(spark, tmp_path, monkeypatch):
    """reuse_existing over a DIFFERENT corpus at the same path must
    rebuild, not silently serve the stale index (the marker records a
    corpus fingerprint)."""
    from dp_data_quality_spark.ops import ann_index, clustering

    idx = str(tmp_path / "ivf")
    ann_index.build_ivf_index(_emb_df(spark, n=200), idx,
                              n_centroids=8, n_iter=3)

    calls = {"n": 0}
    orig = clustering.kmeans_fit

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(clustering, "kmeans_fit", counting)
    info = ann_index.build_ivf_index(_emb_df(spark, n=100), idx,
                                     n_centroids=8, n_iter=3,
                                     reuse_existing=True)
    assert calls["n"] == 1 and info.n_vectors == 100


def test_build_assignment_partial_aggregates_no_window(spark):
    """The offline build's nearest-1 assignment must be a map-side
    reducible aggregate (partial max_by before the exchange), not a
    row_number window that shuffles corpus×k embedding rows."""
    from dp_data_quality_spark.ops.ann_index import _assign
    from pyspark.sql import Window

    corpus = _emb_df(spark)
    cents = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cent_id"),
        F.col("embedding").cast("array<double>").alias("cent_emb"),
    )
    out = _assign(corpus, cents, "vec_id", "embedding", 1,
                  "vec_id", "embedding")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan

    # and it selects exactly the rows the window formulation would
    from dp_data_quality_spark.ops.similarity import cosine_pairs

    scored = corpus.select(
        F.col("vec_id"), F.col("embedding")
    ).crossJoin(F.broadcast(cents)).select(
        "vec_id", "cent_id",
        cosine_pairs(F.col("embedding"), F.col("cent_emb")).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    want = {
        (r.vec_id, r.cent_id)
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1).collect()
    }
    got = {(r.vec_id, r.cent_id) for r in out.collect()}
    assert got == want


def test_reuse_existing_skips_rebuild_but_param_change_rebuilds(spark, tmp_path, monkeypatch):
    from dp_data_quality_spark.ops import ann_index, clustering

    corpus = _emb_df(spark)
    idx = str(tmp_path / "ivf")
    info = ann_index.build_ivf_index(corpus, idx, n_centroids=8, n_iter=3)
    assert info.n_vectors == 200

    calls = {"n": 0}
    orig = clustering.kmeans_fit

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(clustering, "kmeans_fit", counting)
    # same params + reuse_existing → no re-fit, marker supplies the info
    info2 = ann_index.build_ivf_index(
        corpus, idx, n_centroids=8, n_iter=3, reuse_existing=True
    )
    assert calls["n"] == 0 and info2.n_vectors == 200
    # changed params → marker mismatch → full rebuild
    ann_index.build_ivf_index(
        corpus, idx, n_centroids=4, n_iter=2, reuse_existing=True
    )
    assert calls["n"] == 1
