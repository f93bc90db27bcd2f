"""Training-data export: the hand-off from lakehouse tables to training
jobs.

- JSONL: the interchange format text-training pipelines consume (one JSON
  object per line, gzip-compressed parts) — the write-side twin of
  ``sources.readers.read_jsonl_source``.
- WebDataset: sharded tar files for multimodal training — each sample is a
  pair of members ``{key}.bin`` (the opaque payload) and ``{key}.json``
  (typed metadata), samples packed ``shard_rows`` to a tar.  Sequential
  tar reads are the I/O shape GPU data loaders want; shards are written
  executor-side (one task per input partition, stdlib tarfile — no extra
  deps) and a manifest DataFrame of (shard, entries, bytes) comes back for
  bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compression: str = "gzip",
) -> int:
    """Write ``df`` as JSON-lines parts under ``path`` (gzip by default —
    text corpora compress ~5×, and every training framework reads .jsonl.gz
    natively).  ``max_records_per_file`` bounds part size the same way the
    parquet writers do.  Returns the number of part files written."""
    (
        df.write.option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .json(path)
    )
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.startswith("part-")
    )


def export_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_col: str,
    meta_cols: list[str] | None = None,
    shard_rows: int = 1000,
) -> DataFrame:
    """Write WebDataset-style tar shards.

    Each input partition becomes one or more tars named
    ``shard-{partition:05d}-{seq:04d}.tar``; within a tar, each sample
    contributes ``{key}.bin`` (payload bytes) and ``{key}.json``
    (metadata from ``meta_cols``).  Keys must be unique — loaders group
    members by key prefix.

    Scale shape: executors stream their partition into tars row-by-row
    (constant memory — one sample buffered at a time), the driver sees
    only the returned manifest.  Pre-partition the input (repartition /
    repartitionByRange on the key) to control shard count and ordering;
    at 100 TB that is the only knob that matters.

    Returns the manifest DataFrame: (shard, n_entries, n_bytes); call an
    action on it to execute the export.
    """
    import io
    import json as _json
    import tarfile

    import pandas as pd

    meta_cols = list(meta_cols or [])
    os.makedirs(out_dir, exist_ok=True)
    abs_dir = os.path.abspath(out_dir)
    sel = df.select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(payload_col).cast("binary").alias("__payload"),
        *meta_cols,
    ).withColumn("__pid", F.spark_partition_id())

    out_schema = "shard STRING, n_entries BIGINT, n_bytes BIGINT"

    def write_shards(batches):
        state = {"tar": None, "buf": None, "name": None, "rows": 0, "seq": 0, "pid": 0}

        def open_shard(pid: int):
            state.update(
                name=f"shard-{pid:05d}-{state['seq']:04d}.tar",
                buf=io.BytesIO(),
                rows=0,
                pid=pid,
            )
            state["tar"] = tarfile.open(fileobj=state["buf"], mode="w")

        def close_shard():
            state["tar"].close()
            data = state["buf"].getvalue()
            full = os.path.join(abs_dir, state["name"])
            with open(full, "wb") as fh:
                fh.write(data)
            rec = (state["name"], state["rows"], len(data))
            state["seq"] += 1
            state["tar"] = None
            return rec

        def add(name: str, payload: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            state["tar"].addfile(info, io.BytesIO(payload))

        manifest = []
        for pdf in batches:
            keys = pdf["__key"].tolist()
            payloads = pdf["__payload"].tolist()
            pids = pdf["__pid"].tolist()
            metas = {c: pdf[c].tolist() for c in meta_cols}
            for i, key in enumerate(keys):
                if state["tar"] is None:
                    open_shard(int(pids[i]))
                payload = bytes(payloads[i]) if payloads[i] is not None else b""
                add(f"{key}.bin", payload)
                add(
                    f"{key}.json",
                    _json.dumps(
                        {c: metas[c][i] for c in meta_cols}, default=str
                    ).encode("utf-8"),
                )
                state["rows"] += 1
                if state["rows"] >= shard_rows:
                    manifest.append(close_shard())
        if state["tar"] is not None and state["rows"] > 0:
            manifest.append(close_shard())
        yield pd.DataFrame(manifest, columns=["shard", "n_entries", "n_bytes"])

    return sel.mapInPandas(write_shards, schema=out_schema)


def export_avro(
    df: DataFrame, target: str, rows_per_file: int = 100_000
) -> DataFrame:
    """Avro OCF export — the write-side twin of
    ``sources.readers.read_avro_source`` (training/interchange pipelines
    that speak Avro instead of JSONL get a typed, splittable hand-off).

    Executor-side: each task encodes its partition into
    ``rows_per_file``-bounded OCF parts with the pure-python encoder the
    Iceberg manifests already use (sinks/avro_ocf.py — no JVM avro
    package), so memory per task is one file's rows and the write scales
    with partition count.  Nullable unions mirror Spark nullability;
    date/timestamp land as the logical types the reader maps back, so
    ``read_avro_source(export_avro(df)) == df``.  Returns a manifest
    DataFrame of (file, rows)."""
    import datetime as _dt
    import uuid as _uuid

    from pyspark.sql import types as T

    def avro_type(dt):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")

    schema = df.schema
    avro_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": f.name, "type": ["null", avro_type(f.dataType)], "default": None}
            for f in schema.fields
        ],
    }
    os.makedirs(target, exist_ok=True)
    names = [f.name for f in schema.fields]
    dtypes = [f.dataType for f in schema.fields]
    epoch = _dt.date(1970, 1, 1)

    def to_datum(v, dt):
        import pandas as pd

        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return None
        if isinstance(dt, T.DateType):
            d = v.date() if isinstance(v, _dt.datetime) else v
            return (d - epoch).days
        if isinstance(dt, T.TimestampNTZType):
            return pd.Timestamp(v).value // 1_000
        return v

    def run(batches):
        import pandas as pd

        from lakehouse_loader_spark.sinks import avro_ocf

        rows: list[dict] = []
        out = []

        def flush():
            if not rows:
                return
            name = f"part-{_uuid.uuid4().hex}.avro"
            avro_ocf.write_ocf(os.path.join(target, name), avro_schema, list(rows))
            out.append((name, len(rows)))
            rows.clear()

        for pdf in batches:
            cols = [pdf[n].tolist() for n in names]
            nulls = [pd.isna(pdf[n]).tolist() for n in names]
            for i in range(len(pdf)):
                rows.append(
                    {
                        n: (None if isnull[i] else to_datum(col[i], dt))
                        for n, col, isnull, dt in zip(names, cols, nulls, dtypes)
                    }
                )
                if len(rows) >= rows_per_file:
                    flush()
        flush()
        yield pd.DataFrame(out, columns=["file", "rows"]) if out else pd.DataFrame(
            {"file": pd.Series(dtype="object"), "rows": pd.Series(dtype="int64")}
        )

    return df.mapInPandas(run, "file string, rows long")


def export_csv(
    df: DataFrame, target: str, delimiter: str = ",", compression: str = "gzip"
) -> int:
    """CSV export — the write-side twin of ``read_csv_source`` (the last
    interchange format with a reader but no writer).  Header row per part,
    gzip by default; timestamps land ISO-formatted so the reader's
    inferred-then-frozen schema contract round-trips.  Returns part
    count."""
    (
        df.write.option("header", True)
        .option("delimiter", delimiter)
        .option("compression", compression)
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .mode("error")
        .csv(target)
    )
    return len([f for f in os.listdir(target) if f.startswith("part-")])


def export_orc(df: DataFrame, target: str, compression: str = "zstd") -> int:
    """ORC export — write-side twin of ``read_orc_source``.  Columnar with
    footer stats (min/max per stripe), so downstream Hive/Trino/Spark scans
    skip stripes the same way parquet row-groups skip; zstd by default.
    Returns part count."""
    df.write.option("compression", compression).mode("error").orc(target)
    return len([f for f in os.listdir(target) if f.startswith("part-")])
