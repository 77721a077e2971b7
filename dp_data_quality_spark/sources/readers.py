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


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet, built into Spark (no extra
    package); predicate pushdown and column pruning apply the same way,
    so lake tables stored as ORC plug into every operator unchanged."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the ``spark-avro`` package on the cluster
    classpath (it ships with most distros but is NOT bundled in
    pyspark's default jars); raises a clear error when absent."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # AnalysisException: failed to find source
        if "avro" in str(exc).lower():
            raise NotImplementedError(
                "Avro needs the spark-avro package on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<ver>)"
            ) from exc
        raise


_DISPATCH = {
    "csv": read_csv,
    "json": read_json,
    "txt": read_json,  # read_data.py:37-38
    "parquet": read_parquet,
    "orc": read_orc,
    "avro": read_avro,
}


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """Extension-sniffed dispatch (read_data.py:27-44)."""
    ext = path.rsplit(".", 1)[-1].lower()
    fn = _DISPATCH.get(ext)
    if fn is None:
        raise ValueError(f"unsupported format: {ext!r} ({path})")
    return fn(spark, path)
