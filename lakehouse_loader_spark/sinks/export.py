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
