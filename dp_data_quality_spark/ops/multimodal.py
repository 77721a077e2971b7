"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct (format, n_bytes, sha256). The Spark-side plumbing —
schema, partition-preserving mapInPandas, Arrow batch shapes — is real
and tested; the actual media decode is STUBBED (decode libraries are
not in this container) behind ``decode_media``, which raises
``NotImplementedError`` for real formats and produces a deterministic
fake "thumbnail" for the synthetic ``utf8-text`` format so the batch
path is exercised end-to-end.

Scale notes: feature extraction is ``mapInPandas`` (Arrow-batched,
partition-local, no shuffle); binary payloads never pass through the
driver; metadata-only queries prune the binary column at the Parquet
scan (columnar projection), so a "count by format" never reads bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("thumb", T.StringType()),
])

REAL_FORMATS = {"jpeg", "png", "wav", "mp4"}


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add an opaque ``payload: binary`` column + typed metadata struct —
    the canonical multimodal row shape (here synthesized from text so the
    plumbing is testable without media files)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("utf8-text").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_media(fmt: str, payload: bytes) -> bytes:
    """STUB: real media decode is not available in this environment.

    For the synthetic ``utf8-text`` format, returns a deterministic fake
    "thumbnail" (first 16 bytes) so the Arrow batch path runs for real.
    """
    if fmt in REAL_FORMATS:
        raise NotImplementedError(
            f"decode for {fmt!r} requires media libraries not present in "
            "this container; plug in PIL/ffmpeg here on a real cluster"
        )
    return payload[:16]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch is a pandas DataFrame; hashing/thumbnailing
    happen partition-locally. Output schema is fixed (FEATURE_SCHEMA)."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            fmts = pdf["fmt"]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "format": fmts,
                "n_bytes": payloads.str.len().astype("int32"),
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "thumb": [
                    decode_media(f, p).hex() for f, p in zip(fmts, payloads)
                ],
            })

    src = df.select(
        F.col(id_col), F.col("payload"), F.col("media_meta.format").alias("fmt")
    )
    return src.mapInPandas(_batches, schema=FEATURE_SCHEMA)
