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
