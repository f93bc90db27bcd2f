"""Multimodal (binary payload) columns: schema plumbing, metadata, and
feature extraction over opaque bytes.

The reference's closest seed is its bytea→Binary mapping (reference
src/pg_arrow_source.rs:96,185); here the pattern is extended the way a
training-data pipeline uses it: an opaque ``binary`` payload column +
typed metadata struct, with decode/feature-extraction as Arrow-batched
``mapInPandas`` stages.

The actual media decode (image/audio/video) is STUBBED — the container has
no codec libraries — but the Spark-side plumbing (schema, batch iteration,
partition-parallel UDF signature) is real and tested; swap `_decode_stub`
for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct
    (every real multimodal table carries exactly this shape: bytes + sidecar
    metadata)."""
    payload = F.col(text_col).cast("binary")
    return df.withColumns(
        {
            "payload": payload,
            "media_meta": F.struct(
                F.lit("utf8-text").alias("format"),
                F.octet_length(payload).cast("bigint").alias("byte_len"),
                F.lit(1).cast("bigint").alias("n_channels"),
            ),
        }
    )


def payload_features(df: DataFrame) -> DataFrame:
    """JVM-side feature extraction on binary payloads: length, content hash,
    head bytes — no Python in the loop."""
    return df.select(
        "doc_id",
        F.col("media_meta.format").alias("media_format"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("head_hex"),
    )


# -- decode stage (stubbed codec, real plumbing) ----------------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("head_u32", T.LongType()),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': byte statistics standing in for a codec.
    Production would decode image/audio here (PIL / soundfile / ffmpeg);
    those libs are unavailable in this container by design."""
    if payload is None:
        return {"byte_len": 0, "mean_byte": 0.0, "head_u32": 0}
    return {
        "byte_len": len(payload),
        "mean_byte": sum(payload) / len(payload) if payload else 0.0,
        "head_u32": int.from_bytes(payload[:4].ljust(4, b"\0"), "big"),
    }


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage over ``mapInPandas``: each executor
    processes whole record batches; batch shape and partitioning are
    unchanged, so this composes with any upstream repartition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(run, schema=_DECODE_SCHEMA)
