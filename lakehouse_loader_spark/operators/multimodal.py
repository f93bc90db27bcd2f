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


# -- resize stage (stubbed codec, real fixed-shape-tensor plumbing) ---------

RESIZE_DIM = 16


def _resize_stub(payload: bytes, dim: int = RESIZE_DIM) -> list[float]:
    """Deterministic fake 'resize': fold the byte stream into a fixed-length
    mean-pooled vector — the shape contract of a real thumbnail/spectrogram
    resize (variable-size media in, fixed tensor out).  Production swaps
    this for PIL's Image.resize / librosa feature frames."""
    if not payload:
        return [0.0] * dim
    buckets = [0.0] * dim
    counts = [0] * dim
    n = len(payload)
    for i, b in enumerate(payload):
        j = i * dim // n
        buckets[j] += b
        counts[j] += 1
    return [s / c if c else 0.0 for s, c in zip(buckets, counts)]


def resize_features(df: DataFrame, dim: int = RESIZE_DIM) -> DataFrame:
    """Resize stage: binary payload → fixed-``dim`` float vector per row
    (``array<double>``), Arrow-batched.  The output column is exactly the
    embedding-table shape, so resized media feeds directly into the
    similarity/ANN operators (operators/similarity.py)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized": pdf["payload"].map(lambda p: _resize_stub(p, dim)),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=schema)


# -- frame sampling (row-expanding plumbing: one media row → many frames) ---

def sample_frames(
    df: DataFrame, frame_bytes: int = 32, every_nth: int = 4
) -> DataFrame:
    """Frame-sampling stage: slice each payload into fixed-size 'frames' and
    keep every ``every_nth``-th — the ROW-EXPANDING mapInPandas shape a
    video pipeline needs (one input row yields 0..n frame rows, unlike the
    1:1 decode/resize stages).  Emits (doc_id, frame_idx, frame, n_frames);
    production replaces the byte slicing with ffmpeg keyframe extraction.

    Scale note: expansion happens executor-side per batch, so output
    volume never converges on the driver; downstream repartition can
    rebalance if frame counts are skewed."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, totals = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"].values, pdf["payload"]):
                if payload is None:
                    continue
                chunks = [
                    bytes(payload[i : i + frame_bytes])
                    for i in range(0, len(payload), frame_bytes)
                ]
                for k in range(0, len(chunks), every_nth):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(chunks[k])
                    totals.append(len(chunks))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "n_frames": totals}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=schema)
