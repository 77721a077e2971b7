"""Deterministic sampling / dataset splitting.

Training-data pipelines need train/val/test splits that are (a) stable
across reruns and cluster sizes, (b) leakage-safe (the same KEY always
lands in the same split — e.g. every turn of a conversation), and
(c) reproducible outside Spark.  ``rand()``-based sampling fails all
three; this module splits on an md5-derived key hash (``ops.hashing``,
the same cross-engine hash family every oracle uses), so the split is a
pure function of the key, reproducible in any engine with md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h32, sql_h32

# resolution of the split boundaries (fractions quantized to 1/10000)
_BUCKETS = 10_000


def _boundaries(fractions: dict[str, float]) -> list[tuple[str, int]]:
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be a non-empty dict of >=0 floats")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions.values())}")
    out, acc = [], 0
    for name, frac in fractions.items():  # dict order = boundary order
        acc += int(round(frac * _BUCKETS))
        out.append((name, acc))
    out[-1] = (out[-1][0], _BUCKETS)  # absorb rounding residue
    return out


def split_column(key: Column, fractions: dict[str, float]) -> Column:
    """Split label for a key: md5-derived hash bucket → first boundary
    it falls under.  Same key → same split, on every run and engine."""
    bucket = h32(key.cast("string")) % _BUCKETS
    expr = None
    for name, hi in reversed(_boundaries(fractions)):
        expr = F.lit(name) if expr is None else F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return expr


def deterministic_split(
    df: DataFrame, key_col: str, fractions: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning every row by its key's hash —
    leakage-safe (all rows sharing ``key_col`` share a split) and
    cluster-size-independent."""
    return df.withColumn(out_col, split_column(F.col(f"`{key_col}`"), fractions))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str,
    out_rank: str = "sample_rank",
) -> DataFrame:
    """EXACT-k deterministic sample per stratum — the fixed-size eval
    sample a pipeline pins next to its fractional splits: keep the k
    rows with the smallest md5-derived key hash inside each stratum
    (hash-order ≈ uniform-random order, but a pure function of the key,
    so the sample is identical on every run, cluster size, and engine).

    Equivalent to a per-stratum reservoir sample of size k with the
    hash as the priority — the distributed formulation is one window
    ``row_number`` per stratum (strata rank in parallel; only k rows per
    stratum survive).  Ties on the hash break by the key itself, so the
    result is total-order deterministic even on hash collisions.

    Output: input columns + ``sample_rank`` (1..k within the stratum).
    A stratum with fewer than k rows keeps all its rows.  If ``key_col``
    is not unique per row, duplicate keys can exceed k only by tying —
    row_number still cuts at exactly k rows, deterministically."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    hash_col = h32(F.col(f"`{key_col}`").cast("string"))
    w = Window.partitionBy(*[F.col(f"`{c}`") for c in strata_cols]).orderBy(
        hash_col.asc(), F.col(f"`{key_col}`").asc()
    )
    return (
        df.withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) <= k)
    )


def sql_stratified_sample(
    table: str, strata_cols: list[str], k: int, key_col: str
) -> str:
    """DuckDB twin of :func:`stratified_sample` — same md5 hash order."""
    strata = ", ".join(strata_cols)
    h = sql_h32(f"CAST({key_col} AS VARCHAR)")
    return f"""
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY {strata} ORDER BY {h} ASC, {key_col} ASC
  ) AS INT) AS sample_rank
  FROM {table}
) WHERE sample_rank <= {k}
"""


def sql_split_column(key: str, fractions: dict[str, float]) -> str:
    """DuckDB twin of :func:`split_column` — same md5 bucket, same
    boundaries."""
    bucket = f"({sql_h32(f'CAST({key} AS VARCHAR)')} % {_BUCKETS})"
    bounds = _boundaries(fractions)
    # nested CASE mirroring the Column when-chain; the innermost arm is
    # the final split name (its boundary is always 10000)
    expr = f"'{bounds[-1][0]}'"
    for name, hi in reversed(bounds[:-1]):
        expr = f"(CASE WHEN {bucket} < {hi} THEN '{name}' ELSE {expr} END)"
    return expr
