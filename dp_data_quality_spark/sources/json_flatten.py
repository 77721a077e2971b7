"""Recursive flattening of nested JSON DataFrames.

Capability parity with the reference's ``JsonToDataframe``
(/root/reference/dp_data_quality/json_to_dataframe.py:40-114): arrays
are exploded vertically, structs and maps are flattened horizontally
with ``parent_child`` column renaming, recursing until no nested type
remains.  Re-expressed as pure schema-driven ``select`` projections —
each recursion level is ONE projection (the reference rebuilds the
DataFrame per nested column), so Catalyst collapses the whole flatten
into a single plan node stack and the JSON scan is read once.

Scale note: ``explode_outer`` multiplies rows; flattening k sibling
arrays multiplies cardinality — same semantics as the reference
(explode per level, json_to_dataframe.py:88-93), same caveat at scale.

Map columns: a map's key set lives in DATA, not schema, so per-key
flattening is inherently data-dependent.  By default ``flatten`` runs
ONE bounded distinct pass per map column per level (an EAGER Spark job
inside an otherwise lazy transformation — two runs over different data
can yield different schemas).  Callers that need a fully lazy /
deterministic-schema path (streaming, plan composition) pass
``map_keys={"col": ["k1", "k2"]}``; streaming DataFrames with map
columns REQUIRE it and are rejected otherwise (collect on a streaming
plan would raise an opaque AnalysisException deep inside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def has_nested(df: DataFrame) -> bool:
    """Any ArrayType/StructType/MapType column present?
    (json_to_dataframe.py:40-67)."""
    return any(
        isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        for f in df.schema.fields
    )


def _observed_map_keys(df: DataFrame, name: str, cap: int) -> list[str]:
    """Distinct keys of a map column, sorted — ONE pruned distinct pass
    (only the map column is scanned, nothing else moves).  Bounded by
    ``cap``: per-key columns only make sense for enum-like key sets; an
    unbounded key domain would explode the schema, so we fail loudly."""
    rows = (
        df.select(F.explode(F.map_keys(F.col(f"`{name}`"))).alias("k"))
        .distinct()
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        raise ValueError(
            f"map column '{name}' has more than {cap} distinct keys; "
            "per-key flattening would explode the schema"
        )
    return sorted(str(r.k) for r in rows)


def flatten_once(
    df: DataFrame,
    max_map_keys: int = 200,
    map_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One flattening level: explode the FIRST array column (the reference
    explodes one at a time, json_to_dataframe.py:88-93), then expand all
    struct/map columns with parent_child names.

    ``map_keys``: caller-supplied key list per map column — keeps the
    transformation fully lazy (no distinct-keys job) and the output
    schema fixed regardless of data.  Required for streaming inputs."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            return df.select(
                *[
                    F.explode_outer(F.col(f"`{c}`")).alias(c)
                    if c == f.name
                    else F.col(f"`{c}`")
                    for c in df.columns
                ]
            )

    cols = []
    for f in df.schema.fields:
        name = f.name
        if isinstance(f.dataType, T.StructType):
            for sub in f.dataType.fields:
                cols.append(
                    F.col(f"`{name}`.`{sub.name}`").alias(f"{name}_{sub.name}")
                )
        elif isinstance(f.dataType, T.MapType):
            # per-key parent_child columns, like the reference's
            # col(name + '.*') star expansion (json_to_dataframe.py:103-111).
            # Key list: caller-supplied (lazy, schema-stable) or one bounded
            # distinct pass over the (pruned) map column; a key absent in a
            # given row yields NULL, exactly as a missing struct field would.
            if map_keys is not None and name in map_keys:
                keys = sorted(str(k) for k in map_keys[name])
            elif df.isStreaming:
                raise ValueError(
                    f"map column '{name}' on a streaming DataFrame: supply "
                    "map_keys={'%s': [...]} — observed-key flattening needs "
                    "an eager batch job" % name
                )
            else:
                keys = _observed_map_keys(df, name, max_map_keys)
            for key in keys:
                cols.append(
                    F.col(f"`{name}`").getItem(key).alias(f"{name}_{key}")
                )
        else:
            cols.append(F.col(f"`{name}`"))
    return df.select(*cols)


def flatten(
    df: DataFrame,
    max_depth: int = 32,
    max_map_keys: int = 200,
    map_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Flatten until no nested types remain (json_to_dataframe.py:114's
    recursion), depth-capped for safety.  See the module docstring for
    the map-column eager-job caveat; ``map_keys`` keeps it lazy."""
    depth = 0
    while has_nested(df) and depth < max_depth:
        df = flatten_once(df, max_map_keys=max_map_keys, map_keys=map_keys)
        depth += 1
    return df
