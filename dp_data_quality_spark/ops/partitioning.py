"""Partitioning tools for the 100 TB path: bucketed tables (shuffle-free
co-located joins) and salted joins (skew splitting).

Bucketing: pre-shuffling both sides of a recurring join into the same
bucket layout (`bucketBy` on the join key) makes every later join on
that key a zero-Exchange SortMergeJoin — the shuffle is paid once at
write time instead of per query.  On Iceberg the same effect comes from
a bucket partition transform (`bucket(N, key)`); the API below is the
plain-Spark (`saveAsTable`) equivalent usable in this sandbox.

Salting: when one join key dominates (a mega-conversation, a viral
item), the standard hash join puts the whole key on one task.
``salted_join`` splits each left-side hot row into one of ``n_salts``
sub-keys and replicates the (small or aggregated) right side per salt —
turning one straggler task into ``n_salts`` even ones.  AQE's skew-join
splitting handles mid-size skew automatically; salting is for the keys
big enough that even one key's single partition exceeds a task's
budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables — Catalyst elides both
    shuffles (verify: no Exchange above either scan in the plan)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side, explode
    the right side once per salt, join on (key, salt).

    Output equals ``left.join(right, on, how)`` for inner/left joins;
    right-side row multiplicity is preserved because each right row is
    matched by exactly one salt per left row.  Right/full-outer joins
    would emit each unmatched right row once PER SALT (it exists in
    every salt replica) — silently wrong, so they are rejected."""
    if how.lower().replace("_", "") not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "unmatched right rows would be duplicated n_salts times"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
