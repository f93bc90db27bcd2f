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


def test_v2_checkpoint_demanding_table_writable_and_checkpoints_v2(spark, tmpdir):
    """r9: the v2Checkpoint writer feature is implemented — writes to a
    demanding table proceed, and write_checkpoint auto-emits the
    UUID-manifest + _sidecars layout (never a classic file, which would
    violate the feature's writer requirement)."""
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
    assert DL.read_delta(spark, t).count() == 10
    DL.write_delta(spark.range(10, 12).select("id"), t, append=True)
    v = DL.write_checkpoint(t)
    classic = os.path.join(DL._log_dir(t), f"{v:020d}.checkpoint.parquet")
    assert not os.path.exists(classic)
    manifests = [
        f
        for f in os.listdir(DL._log_dir(t))
        if f.startswith(f"{v:020d}.checkpoint.") and f.endswith(".parquet")
    ]
    assert len(manifests) == 1
    assert os.path.isdir(os.path.join(DL._log_dir(t), "_sidecars"))
    _seal_pre_checkpoint_json(t, v)
    assert DL.read_delta(spark, t).count() == 12


class TestV2CheckpointWrite:
    """r9 write side: this writer's own v2 checkpoints read back through
    the existing v2 reader and replay-match classic checkpoints."""

    def _fixture(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), "t")
        DL.write_delta(
            spark.range(0, 90).select("id", (F.col("id") * 2).alias("v")), t
        )
        DL.write_delta(
            spark.range(90, 120).select("id", (F.col("id") * 2).alias("v")),
            t, append=True,
        )
        DL.add_check_constraint(t, "pos", "id >= 0")
        DL.delete_from_delta(spark, t, "id < 5", mode="merge-on-read")
        return t

    def test_roundtrip_own_writer_own_reader(self, spark, tmpdir):
        t = self._fixture(spark, tmpdir)
        v = DL.write_checkpoint(t, v2=True)
        _seal_pre_checkpoint_json(t, v)
        got = DL.read_delta(spark, t)
        assert got.count() == 115
        assert got.filter("id < 5").count() == 0  # DV descriptor survived
        assert DL.table_constraints(t) == {"pos": "id >= 0"}
        assert DL.table_protocol(t)["minWriterVersion"] >= 3

    def test_replay_equivalence_with_classic(self, spark, tmpdir):
        t = self._fixture(spark, tmpdir)
        meta_c, adds_c, txns_c = None, None, None
        v = DL.write_checkpoint(t, v2=False)
        meta_c, adds_c, txns_c, _ = DL._load_checkpoint(t, v)
        # replace with a v2 checkpoint of the same version
        classic = os.path.join(DL._log_dir(t), f"{v:020d}.checkpoint.parquet")
        os.remove(classic)
        v2v = DL.write_checkpoint(t, v2=True)
        assert v2v == v
        meta_v, adds_v, txns_v, _ = DL._load_checkpoint(t, v)
        assert meta_v == meta_c
        assert adds_v == adds_c
        assert txns_v == txns_c

    def test_sidecar_sharding(self, spark, tmpdir, monkeypatch):
        t = os.path.join(str(tmpdir), "t")
        # 6 files via repartition
        DL.write_delta(spark.range(0, 600).select("id").repartition(6), t)
        monkeypatch.setattr(DL, "V2_SIDECAR_MAX_ADDS", 2)
        v = DL.write_checkpoint(t, v2=True)
        import pyarrow.parquet as _pq

        man = DL._checkpoint_paths(t, v)
        assert len(man) == 1
        rows = _pq.read_table(man[0]).to_pylist()
        sidecars = [r for r in rows if r.get("sidecar")]
        assert len(sidecars) == 3  # 6 adds / 2 per shard
        assert any(r.get("checkpointMetadata") for r in rows)
        assert not any(r.get("add") for r in rows)  # adds never in manifest
        _seal_pre_checkpoint_json(t, v)
        assert DL.read_delta(spark, t).count() == 600

    def test_enable_v2_checkpoints_upgrade(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), "t")
        DL.write_delta(spark.range(0, 20).select("id"), t)
        DL.enable_v2_checkpoints(t)
        proto = DL.table_protocol(t)
        assert "v2Checkpoint" in proto["readerFeatures"]
        assert "v2Checkpoint" in proto["writerFeatures"]
        # auto-detection: plain write_checkpoint now emits v2
        DL.write_delta(spark.range(20, 25).select("id"), t, append=True)
        v = DL.write_checkpoint(t)
        assert not os.path.exists(
            os.path.join(DL._log_dir(t), f"{v:020d}.checkpoint.parquet")
        )
        _seal_pre_checkpoint_json(t, v)
        assert DL.read_delta(spark, t).count() == 25
        # idempotent
        DL.enable_v2_checkpoints(t)


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
