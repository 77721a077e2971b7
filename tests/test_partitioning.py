"""Bucketed-join (shuffle elision) and salted-join (skew) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dp_data_quality_spark.ops.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_elides_shuffle(spark):
    # managed tables land in ./spark-warehouse; DROP TABLE cleans them up
    orders = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("v2")
    )
    write_bucketed(orders, "b_orders", "k", n_buckets=8)
    write_bucketed(items, "b_items", "k", n_buckets=8)
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_items", on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 0
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") + 10).alias("rv")
    )
    plain = left.join(right, on="k").select("k", "lv", "rv")
    salted = salted_join(left, right, on="k", n_salts=8).select("k", "lv", "rv")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    assert len(a) > 0


def test_salted_left_join(spark):
    left = spark.range(0, 100).select(F.col("id").alias("k"))
    right = spark.range(0, 50).select(F.col("id").alias("k"), F.lit(1).alias("r"))
    plain = left.join(right, on="k", how="left").select("k", "r")
    salted = salted_join(left, right, on="k", n_salts=4, how="left").select("k", "r")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_hows(spark):
    import pytest
    from dp_data_quality_spark.ops.partitioning import salted_join

    l = spark.createDataFrame([(1, "a")], ["k", "v"])
    r = spark.createDataFrame([(1, "b")], ["k", "w"])
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(l, r, on="k", how=how)
    # accepted spellings still work
    assert salted_join(l, r, on="k", how="left_outer").count() == 1


def test_salted_join_fans_out_hot_key(spark):
    """The skew claim, empirically: a 100:1 hot key's join rows spread
    across tasks under salted_join (plain join funnels them into ONE
    task).  Asserted on the executed output's per-partition row counts
    and on the shuffle key including the salt."""
    n_hot = 8000
    left = spark.range(0, n_hot + 800).select(
        F.when(F.col("id") < n_hot, 0).otherwise(F.col("id") % 100 + 1)
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 101).select(
        F.col("id").alias("k"), (F.col("id") + 10).alias("rv")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would coalesce this test's tiny shuffle into one partition and
    # mask the fan-out; production-size partitions are never coalesced
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        salted = salted_join(left, right, on="k", n_salts=16)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan  # shuffle key carries the salt
        by_part = (
            salted.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        biggest = max(r["count"] for r in by_part)
        # plain join: one task owns all n_hot hot rows; salted: no task
        # owns more than a fraction of them
        assert biggest < n_hot / 2, by_part

        plain = left.join(right, on="k")
        by_part_plain = (
            plain.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        assert max(r["count"] for r in by_part_plain) >= n_hot
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_aqe_splits_planted_skew_join(spark):
    """AQE's skew-join split — the automatic path for mid-size skew the
    docs point to (salting is for beyond-task-budget keys): a planted
    100:1 hot key makes the final adaptive plan mark the sort-merge
    join skew=true and split the oversized partition."""
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    payload = "x" * 64
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # payload must be non-constant: a literal would be constant-folded
        # out of the shuffle (and compress to nothing), hiding the skew
        # from the map-output statistics the AQE rule reads
        left = spark.range(0, 20_000 + 100 * 50).select(
            F.when(F.col("id") < 20_000, 0)
            .otherwise(F.col("id") % 100 + 1).alias("k"),
            F.concat(F.lit(payload), F.sha2(F.col("id").cast("string"), 256))
            .alias("pl"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit(payload).alias("pr")
        )
        out = left.join(right, on="k")
        # materialize THIS df's own query execution (count() would spawn
        # a separate one and leave this AQE plan unfinalized)
        assert len(out.collect()) == 25_000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
