"""V2 checkpoint READ support (readerFeature `v2Checkpoint`): the log
replay must seed from a UUID-named checkpoint manifest whose add actions
live in `_sidecars/` parquet files — the layout newer delta-spark writes.
Writes to such tables stay refused (this writer emits classic
checkpoints)."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


def _to_v2(path: str) -> int:
    """Convert the newest classic checkpoint into the v2 manifest+sidecar
    layout (and delete the classic file so any successful read proves the
    v2 path executed)."""
    v = DL._checkpoint_versions(path)[-1]
    classic = os.path.join(DL._log_dir(path), f"{v:020d}.checkpoint.parquet")
    rows = pq.read_table(classic).to_pylist()
    add_rows = [r for r in rows if r.get("add")]
    other = [r for r in rows if not r.get("add")]
    sidecar_dir = os.path.join(DL._log_dir(path), "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)
    sc_name = f"{uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.Table.from_pylist([{"add": r["add"]} for r in add_rows]),
        os.path.join(sidecar_dir, sc_name),
    )
    cols = ("protocol", "metaData", "txn", "sidecar", "checkpointMetadata")
    manifest_rows = [{c: r.get(c) for c in cols} for r in other]
    manifest_rows.append(
        {**{c: None for c in cols}, "sidecar": {"path": sc_name, "sizeInBytes": 1}}
    )
    manifest_rows.append(
        {**{c: None for c in cols}, "checkpointMetadata": {"version": v}}
    )
    manifest = os.path.join(
        DL._log_dir(path), f"{v:020d}.checkpoint.{uuid.uuid4().hex}.parquet"
    )
    pq.write_table(pa.Table.from_pylist(manifest_rows), manifest)
    os.remove(classic)
    return v


def _seal_pre_checkpoint_json(path: str, v: int) -> None:
    """Delete the JSON commits at/below the checkpoint so replay CANNOT
    reconstruct state without reading it."""
    for f in os.listdir(DL._log_dir(path)):
        if f.endswith(".json") and int(f.split(".")[0]) <= v:
            os.remove(os.path.join(DL._log_dir(path), f))


def test_v2_checkpoint_read_and_time_continuity(spark, tmpdir):
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(
        spark.range(0, 100).select("id", (F.col("id") * 2).alias("v")), t
    )
    DL.write_delta(spark.range(100, 120).select("id", (F.col("id") * 2).alias("v")), t, append=True)
    DL.add_check_constraint(t, "pos", "id >= 0")
    v = DL.write_checkpoint(t)
    cp_v = _to_v2(t)
    assert cp_v == v
    _seal_pre_checkpoint_json(t, cp_v)
    # reads seed from the v2 manifest: rows, schema, and the checkpointed
    # configuration (constraint) must all round-trip through the sidecars
    assert DL.read_delta(spark, t).count() == 120
    assert DL.table_constraints(t) == {"pos": "id >= 0"}
    # protocol rides in the manifest (not a sidecar)
    assert DL.table_protocol(t)["minWriterVersion"] == 3
    # appends on top of the v2-seeded state keep working (protocol has no
    # v2Checkpoint writer demand in this fixture)
    DL.write_delta(spark.range(120, 125).select("id", (F.col("id") * 2).alias("v")), t, append=True)
    assert DL.read_delta(spark, t).count() == 125


def test_v2_checkpoint_with_dv_descriptors(spark, tmpdir):
    """A merge-on-read DELETE's deletion vectors must survive the
    manifest→sidecar round trip (null struct members stripped the same
    way the classic loader does)."""
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(spark.range(0, 50).select("id"), t)
    DL.delete_from_delta(spark, t, "id < 7", mode="merge-on-read")
    DL.write_checkpoint(t)
    cp_v = _to_v2(t)
    _seal_pre_checkpoint_json(t, cp_v)
    got = DL.read_delta(spark, t)
    assert got.count() == 43
    assert got.filter("id < 7").count() == 0


def test_v2_checkpoint_reader_feature_accepted_writer_refused(spark, tmpdir):
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(spark.range(0, 10).select("id"), t)
    latest = DL._read_log(t)[0]
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    with open(DL._version_file(t, latest + 1), "w") as fh:
        fh.write(json.dumps({"protocol": proto}) + "\n")
        fh.write(json.dumps({"commitInfo": {"operation": "UPGRADE"}}) + "\n")
    assert DL.read_delta(spark, t).count() == 10  # read-supported now
    with pytest.raises(DL.UnsupportedProtocolError, match="v2Checkpoint"):
        DL.write_delta(spark.range(10, 12).select("id"), t, append=True)


def test_multipart_classic_checkpoint_reads(spark, tmpdir):
    """delta-spark splits large classic checkpoints into
    `<v>.checkpoint.<part>.<parts>.parquet` files; the loader must consume
    every part of the version."""
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(spark.range(0, 80).select("id"), t)
    v = DL.write_checkpoint(t)
    classic = os.path.join(DL._log_dir(t), f"{v:020d}.checkpoint.parquet")
    rows = pq.read_table(classic).to_pylist()
    half = len(rows) // 2
    cols = ("protocol", "metaData", "txn", "add")
    for i, chunk in enumerate((rows[:half], rows[half:]), start=1):
        pq.write_table(
            pa.Table.from_pylist([{c: r.get(c) for c in cols} for r in chunk]),
            os.path.join(
                DL._log_dir(t), f"{v:020d}.checkpoint.{i:010d}.{2:010d}.parquet"
            ),
        )
    os.remove(classic)
    _seal_pre_checkpoint_json(t, v)
    assert DL.read_delta(spark, t).count() == 80


def test_ict_hook_inert_on_plain_tables(spark, tmpdir):
    """_with_ict runs inside EVERY commit: on tables without the feature it
    must return the actions untouched (no reorder, no injected fields)."""
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(spark.range(0, 5).select("id"), t)
    actions = [{"add": {"path": "x.parquet"}}, {"commitInfo": {"timestamp": 1}}]
    out = DL._with_ict(t, DL._read_log(t)[0] + 1, actions)
    assert out is actions  # identity, not a copy
