"""Format-sniffed scans — the reference's ``ReadDataPyspark`` surface
(/root/reference/dp_data_quality/read_data.py:27-77) without driver-side
boto3: extension → reader dispatch, JSON routed through the recursive
flattener, TXT treated as JSON lines (read_data.py:37-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .json_flatten import flatten


def read_csv(spark: SparkSession, path: str, infer_schema: bool = True) -> DataFrame:
    """CSV with header + inferSchema (read_data.py:46-55).  At scale,
    prefer an explicit schema: inference is an extra full scan."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", infer_schema)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, do_flatten: bool = True) -> DataFrame:
    """Single-line JSON, recursively flattened
    (json_to_dataframe.py:28-38,118-128)."""
    df = spark.read.json(path)
    return flatten(df) if do_flatten else df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


_DISPATCH = {
    "csv": read_csv,
    "json": read_json,
    "txt": read_json,  # read_data.py:37-38
    "parquet": read_parquet,
}


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """Extension-sniffed dispatch (read_data.py:27-44)."""
    ext = path.rsplit(".", 1)[-1].lower()
    fn = _DISPATCH.get(ext)
    if fn is None:
        raise ValueError(f"unsupported format: {ext!r} ({path})")
    return fn(spark, path)
