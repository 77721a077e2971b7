"""Cross-run incremental dedup: probe vs persisted index, keep-first
within batch, idempotent batch_id reruns."""

from __future__ import annotations


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


T_A = "the quick brown fox jumps over the lazy dog again and again"
T_B = "a completely different document about distributed query engines"
T_C = "yet another unique piece of text discussing window aggregates"


def test_incremental_dedup_two_batches_and_idempotent_rerun(spark, tmp_path):
    from dp_data_quality_spark.ops.incremental import incremental_dedup

    idx = str(tmp_path / "sig_index")

    # batch 1: docs 1..3; 2 duplicates 1 within the batch
    b1 = _df(spark, [(1, T_A), (2, T_A), (3, T_B)])
    r1 = incremental_dedup(spark, b1, idx, "b1")
    assert (r1.n_input, r1.n_kept) == (3, 2)
    assert r1.n_dropped_within_batch == 1 and r1.n_dropped_vs_index == 0
    assert sorted(r.doc_id for r in r1.kept.collect()) == [1, 3]
    # index now holds the two survivors' signatures
    index = spark.read.parquet(idx)
    assert sorted(r.doc_id for r in index.collect()) == [1, 3]

    # batch 2: 10 duplicates the ingested corpus (doc 1), 12 duplicates
    # 11 within the batch, 11 is new
    b2 = _df(spark, [(10, T_A), (11, T_C), (12, T_C)])
    r2 = incremental_dedup(spark, b2, idx, "b2")
    assert (r2.n_dropped_vs_index, r2.n_dropped_within_batch) == (1, 1)
    assert sorted(r.doc_id for r in r2.kept.collect()) == [11]
    pairs = {(r.doc_a, r.doc_b, r.source) for r in r2.dup_pairs.collect()}
    assert (10, 1, "index") in pairs
    assert (12, 11, "batch") in pairs
    index = spark.read.parquet(idx)
    assert sorted(r.doc_id for r in index.collect()) == [1, 3, 11]

    # RERUN batch 2 under the same batch_id: the batch must not dedup
    # against its own committed partition, results are identical, and
    # the index is not double-inserted
    r2b = incremental_dedup(spark, b2, idx, "b2")
    assert (r2b.n_dropped_vs_index, r2b.n_dropped_within_batch) == (1, 1)
    assert sorted(r.doc_id for r in r2b.kept.collect()) == [11]
    index = spark.read.parquet(idx)
    assert sorted(r.doc_id for r in index.collect()) == [1, 3, 11]
    assert {r.batch_id for r in index.collect()} == {"b1", "b2"}


def test_signature_agreement_matches_exact_on_identical_docs(spark):
    from dp_data_quality_spark.ops.dedup import minhash_signatures
    from dp_data_quality_spark.ops.incremental import signature_agreement_pairs

    left = minhash_signatures(_df(spark, [(1, T_A), (2, T_B)]))
    right = minhash_signatures(_df(spark, [(10, T_A), (11, T_C)]))
    got = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in signature_agreement_pairs(left, right, 0.8).collect()}
    # identical text → all 16 components agree; unrelated texts share no
    # band key and never become candidates
    assert got == {(1, 10): 1.0}


def test_same_id_reingestion_is_caught(spark, tmp_path):
    """A doc re-ingested in a LATER batch under the SAME doc_id must match
    its own index entry (est 1.0), not be kept and re-appended."""
    from dp_data_quality_spark.ops.incremental import incremental_dedup

    idx = str(tmp_path / "sig_index")
    incremental_dedup(spark, _df(spark, [(1, T_A), (2, T_B)]), idx, "b1")
    r2 = incremental_dedup(spark, _df(spark, [(1, T_A), (5, T_C)]), idx, "b2")
    assert r2.n_dropped_vs_index == 1
    assert sorted(r.doc_id for r in r2.kept.collect()) == [5]
    index = spark.read.parquet(idx)
    # doc 1's signature appears once (batch b1), never duplicated
    assert sorted(r.doc_id for r in index.collect()) == [1, 2, 5]


def test_shingleless_docs_kept_and_counted(spark, tmp_path):
    """Docs too short to shingle (< 3 words) produce no signature: they
    are kept, never indexed, and the stats still reconcile —
    n_input counts the full batch and n_kept == kept.count()."""
    from dp_data_quality_spark.ops.incremental import incremental_dedup

    idx = str(tmp_path / "sig_index")
    r1 = incremental_dedup(
        spark, _df(spark, [(1, T_A), (2, "hi there")]), idx, "b1"
    )
    assert (r1.n_input, r1.n_kept) == (2, 2)
    assert r1.n_kept == r1.kept.count()
    assert sorted(r.doc_id for r in r1.kept.collect()) == [1, 2]
    # only the shingled doc reaches the index
    assert sorted(r.doc_id for r in spark.read.parquet(idx).collect()) == [1]

    # a later shingle-less doc is never probed → kept, stats reconcile
    r2 = incremental_dedup(spark, _df(spark, [(3, "hi there")]), idx, "b2")
    assert (r2.n_input, r2.n_kept) == (1, 1)
    assert r2.n_kept == r2.kept.count()


def test_corrupt_index_propagates_not_first_batch(spark, tmp_path):
    """A readable-path-but-unreadable-index error must raise, not be
    silently treated as 'first batch' (which would skip historical dedup
    and admit duplicates)."""
    import pytest

    from dp_data_quality_spark.ops.incremental import incremental_dedup

    idx = tmp_path / "sig_index"
    idx.mkdir()
    (idx / "batch_id=b0").mkdir()
    (idx / "batch_id=b0" / "part-00000.parquet").write_bytes(b"not parquet")
    with pytest.raises(Exception):
        incremental_dedup(spark, _df(spark, [(1, T_A)]), str(idx), "b1")
