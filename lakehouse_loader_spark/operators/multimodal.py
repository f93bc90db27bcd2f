"""Multimodal (binary payload) columns: schema plumbing, metadata, and
feature extraction over opaque bytes.

The reference's closest seed is its bytea→Binary mapping (reference
src/pg_arrow_source.rs:96,185); here the pattern is extended the way a
training-data pipeline uses it: an opaque ``binary`` payload column +
typed metadata struct, with decode/feature-extraction as Arrow-batched
``mapInPandas`` stages.

Two decode tiers:

* REAL codecs (operators/media_codec.py + operators/jpeg.py): WAV
  (RIFF/PCM), PPM/PGM, uncompressed 24-bit BMP, PNG (r7) and baseline
  JPEG (r8) decode genuinely with numpy — no media libraries needed.
  ``decode_media_features`` / ``resize_media_features`` run these
  end-to-end (oracle-checked via deterministic synthesized media whose
  decoded fields SQL can recompute — exactly for the lossless formats,
  within measured tolerance for JPEG).
* The byte-statistics path (``_decode_stub`` / ``_resize_stub``) remains
  for OPAQUE payloads — formats still out of scope (MP3/H.264,
  arithmetic-coded JPEG) degrade there; production swaps in PIL/ffmpeg
  behind the same mapInPandas signatures.
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

# -- REAL codec stages (operators/media_codec.py: WAV / PPM / PGM / BMP) ----

MEDIA_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("peak_value", T.DoubleType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL media payload per row — WAV bytes for even ids, PPM
    for odd (media_codec.synth_payload) — Arrow-batched.  This is the
    deterministic staging used by tests/bench/oracles; a production table
    would carry ingested bytes in the same (id, payload) shape."""
    from lakehouse_loader_spark.operators import media_codec as MC

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids.values, "payload": [MC.synth_payload(int(i)) for i in ids]}
            )

    return df.select(id_col).mapInPandas(run, schema=schema)


def synthesize_media_jpeg(
    df: DataFrame, id_col: str = "doc_id", quality: int = 100
) -> DataFrame:
    """Attach a REAL JPEG payload per row — the SAME modular pixel ramp
    as ``synth_payload``'s image rows (width 8+id%9, height 6+id%5),
    encoded through the pure-numpy codec (operators/jpeg.py) at
    near-lossless q100.  Every third row encodes PROGRESSIVE (SOF2,
    r9) — the two encoders share their coefficient plan, so the decoder
    must produce identical pixels either way and the oracle needs no
    per-row branching.  JPEG is lossy, so its driver oracle checks exact
    header fields plus WITHIN-TOLERANCE stat flags (the r7 bounded-oracle
    pattern) instead of exact pixel statistics."""
    import numpy as np

    from lakehouse_loader_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def one(doc_id: int) -> bytes:
        w, h = 8 + doc_id % 9, 6 + doc_id % 5
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        px = ((x * 7 + y * 11 + c * 5 + doc_id * 3) % 251).astype(np.uint8)
        enc = encode_jpeg_progressive if doc_id % 3 == 0 else encode_jpeg
        return enc(px, quality=quality)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids.values, "payload": [one(int(i)) for i in ids]}
            )

    # the id column usually scans from one parquet file = one partition;
    # fan the per-row encode work across the cluster before mapInPandas
    seed = df.select(id_col)
    width = seed.sparkSession.sparkContext.defaultParallelism
    return seed.repartition(width).mapInPandas(run, schema=schema)


def synthesize_media_flac(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL FLAC payload per row — the SAME modular sample ramp
    as ``synth_payload``'s WAV rows (channels 1+(id//2)%2, rate by id%3,
    frames 400+(id%7)*50), compressed through the pure-numpy encoder
    (operators/flac.py: fixed predictors + Rice residuals).  FLAC is
    lossless, so its driver oracle recomputes the decoded statistics
    EXACTLY from the same closed forms as the WAV rows."""
    import numpy as np

    from lakehouse_loader_spark.operators.flac import encode_flac
    from lakehouse_loader_spark.operators.media_codec import WAV_RATES

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def one(doc_id: int) -> bytes:
        nch = 1 + (doc_id // 2) % 2
        rate = WAV_RATES[doc_id % 3]
        nf = 400 + (doc_id % 7) * 50
        i = np.arange(nf)[:, None]
        c = np.arange(nch)[None, :]
        samples = ((i * 7 + c * 3 + doc_id * 13) % 201 - 100).astype(np.int16)
        return encode_flac(samples, rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids.values, "payload": [one(int(i)) for i in ids]}
            )

    seed = df.select(id_col)
    width = seed.sparkSession.sparkContext.defaultParallelism
    return seed.repartition(width).mapInPandas(run, schema=schema)


def decode_media_features(df: DataFrame) -> DataFrame:
    """REAL decode stage: sniff + parse WAV/PPM/PGM/BMP/PNG/baseline-JPEG
    per payload (numpy, executor-side); opaque/undecodable payloads
    degrade to byte statistics with media_format='opaque' instead of
    failing the task."""
    from lakehouse_loader_spark.operators import media_codec as MC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [MC.decode_media(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats).rename(columns={"format": "media_format"})
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in MEDIA_DECODE_SCHEMA.fields]]

    return df.select("doc_id", "payload").mapInPandas(run, schema=MEDIA_DECODE_SCHEMA)


def resize_media_features(df: DataFrame, out_dim: int = RESIZE_DIM) -> DataFrame:
    """REAL resize stage: images → nearest-neighbor ``out_dim``×``out_dim``
    grayscale thumbnail (channel-mean then index-map resize); audio →
    ``out_dim``² RMS windows.  Both land in one fixed-length
    ``array<double>`` column (the embedding-table shape), so resized media
    feeds the similarity/ANN operators directly."""
    from lakehouse_loader_spark.operators import media_codec as MC
    import numpy as np

    n_out = out_dim * out_dim
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_format", T.StringType()),
            T.StructField("resized", T.ArrayType(T.DoubleType())),
        ]
    )

    def one(payload: bytes) -> tuple[str, list[float]]:
        kind = MC.sniff_format(payload)
        try:
            if kind in MC.AUDIO_FORMATS:
                d = MC.decode_audio(payload, kind)
                return d["format"], MC.audio_window_rms(d["samples"], n_out).tolist()
            if kind in MC.IMAGE_FORMATS:
                d = MC.decode_image(payload, kind)
                px = d["pixels"].astype(np.float64)
                if px.ndim == 3:
                    px = px.mean(axis=2)
                return d["format"], MC.resize_image_nearest(px, out_dim, out_dim).ravel().tolist()
        except MC.DECODE_ERRORS:
            pass  # sniffed-but-corrupt stream: same never-die contract as decode
        return "opaque", _resize_stub(payload, n_out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_format": [k for k, _ in pairs],
                    "resized": [v for _, v in pairs],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=schema)
