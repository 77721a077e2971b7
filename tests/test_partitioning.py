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
