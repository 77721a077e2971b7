"""Table profiling: per-column completeness / uniqueness / range stats.

The data-profiling companion to the 17-rule contract: where the rules
judge individual cells, the profiler summarizes whole columns —
null counts, exact distinct counts, completeness ratio, min/max — the
numbers a data-quality triage starts from.

Plan shape: ONE scan → ONE aggregation row holding every per-column
statistic (countDistinct over k columns lowers to Spark's expand +
single aggregate — k× the rows through the agg, but still one pass
over the table and standard partial aggregation), then an
explode(array(struct...)) pivots the single wide row into the long
(col_name, stats...) form.  Contrast with profile-per-column loops
(the reference's O(columns) driver round-trips, quality_report.py:143):
here the driver never sees data and the table is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, completeness, min_val,
    max_val) — one row per profiled column, computed in one pass.

    ``min_val``/``max_val`` are the native min/max cast to string (so
    heterogeneous column types share one output schema); ``completeness``
    = non-null fraction.  ``exact_distinct=True`` uses count-distinct
    (Spark's expand: k× rows through one aggregate — exact, and what the
    oracle checks); ``False`` switches to HyperLogLog++
    (``approx_count_distinct``, default rsd 5%) — at 10⁹+ rows per
    column the expand multiplier and the per-distinct-value state make
    exact counting the wrong default, and the sketch profiles every
    column in one cheap pass.
    """
    cols = columns or df.columns
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(f"`{c}`")
        aggs += [
            F.count(col).alias(f"__nn_{i}"),
            nd(col).alias(f"__nd_{i}"),
            F.min(col).cast(T.StringType()).alias(f"__mn_{i}"),
            F.max(col).cast(T.StringType()).alias(f"__mx_{i}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
            F.col(f"__nd_{i}").alias("n_distinct"),
            F.round(F.col(f"__nn_{i}") / F.col("__n"), 6).alias("completeness"),
            F.col(f"__mn_{i}").alias("min_val"),
            F.col(f"__mx_{i}").alias("max_val"),
        )
        for i, c in enumerate(cols)
    ])
    return wide.select(F.explode(entries).alias("p")).select("p.*")


def profile_quantiles(
    df: DataFrame,
    columns: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """(col_name, q_25, q_50, q_75, …) exact linear-interpolation
    quantiles per numeric column — Spark's ``percentile`` (exact, one
    aggregation; at extreme scale swap in ``percentile_approx``, same
    output shape).  Both Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the (n-1)·p linear interpolation, which
    is what makes this oracle-checkable bit-for-bit."""
    aggs = []
    for i, c in enumerate(columns):
        col = F.col(f"`{c}`").cast("double")
        for p in probs:
            aggs.append(
                F.round(F.expr(f"percentile(CAST(`{c}` AS DOUBLE), {p!r})"), 6)
                .alias(f"__q_{i}_{str(p).replace('.', '_')}")
            )
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            *[
                F.col(f"__q_{i}_{str(p).replace('.', '_')}")
                .alias(f"q_{int(p * 100)}")
                for p in probs
            ],
        )
        for i, c in enumerate(columns)
    ])
    return wide.select(F.explode(entries).alias("p")).select("p.*")


def sql_profile_quantiles(
    table: str, columns: list[str], probs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> str:
    parts = [
        f"SELECT '{c}' AS col_name, " + ", ".join(
            f"round(quantile_cont(CAST({c} AS DOUBLE), {p}), 6) AS q_{int(p * 100)}"
            for p in probs
        ) + f" FROM {table}"
        for c in columns
    ]
    return "\nUNION ALL\n".join(parts)


def sql_profile_table(table: str, columns: list[str]) -> str:
    """DuckDB twin: same stats per column, UNION ALL of per-column
    aggregates (the small-scale oracle doesn't need the one-pass plan)."""
    parts = [
        f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
        f"count(*) - count({c}) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct, "
        f"round(count({c}) / count(*), 6) AS completeness, "
        f"CAST(min({c}) AS VARCHAR) AS min_val, "
        f"CAST(max({c}) AS VARCHAR) AS max_val FROM {table}"
        for c in columns
    ]
    return "\nUNION ALL\n".join(parts)
