"""Delta identity columns (writer feature `identityColumns`): map-side
value assignment beyond the high-water mark, mark tracked in the schema
metadata from file stats (no second data pass), GENERATED ALWAYS refusal,
UPDATE refusal, and the concurrent-assignment conflict."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


def _src(spark, lo=0, n=10):
    return spark.range(lo, lo + n).select(F.col("id").alias("v"))


def test_create_assigns_and_tracks_watermark(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, identity_columns={"id": {"start": 100, "step": 10}})
    back = DL.read_delta(spark, t)
    ids = [r.id for r in back.collect()]
    assert len(ids) == len(set(ids)) == 10  # unique
    assert all((i - 100) % 10 == 0 and i >= 100 for i in ids)  # start + k*step
    spec = DL.table_identity_columns(t)["id"]
    assert spec["start"] == 100 and spec["step"] == 10
    assert spec["highWaterMark"] == max(ids)
    proto = DL.table_protocol(t)
    assert proto["minWriterVersion"] == 7
    assert "identityColumns" in proto["writerFeatures"]


def test_appends_never_reuse_values(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, identity_columns={"id": {}})
    for lo in (10, 20, 30):
        DL.write_delta(_src(spark, lo=lo).repartition(3), t, append=True)
    ids = [r.id for r in DL.read_delta(spark, t).collect()]
    assert len(ids) == 40
    assert len(set(ids)) == 40  # no collisions across appends/partitions
    assert DL.table_identity_columns(t)["id"]["highWaterMark"] == max(ids)


def test_negative_step_advances_downward(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, identity_columns={"id": {"start": 0, "step": -5}})
    DL.write_delta(_src(spark, lo=10), t, append=True)
    ids = [r.id for r in DL.read_delta(spark, t).collect()]
    assert len(set(ids)) == 20
    assert all(i <= 0 and i % 5 == 0 for i in ids)
    assert DL.table_identity_columns(t)["id"]["highWaterMark"] == min(ids)


def test_generated_always_refuses_explicit_values(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        DL.write_delta(
            spark.range(3).select("id"), t, identity_columns={"id": {}}
        )
    DL.write_delta(_src(spark), t, identity_columns={"id": {}})
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        DL.write_delta(
            spark.range(3).selectExpr("id AS v", "id"), t, append=True
        )


def test_allow_explicit_insert_accepts_and_bumps(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(
        _src(spark), t, identity_columns={"id": {"allowExplicitInsert": True}}
    )
    hw0 = DL.table_identity_columns(t)["id"]["highWaterMark"]
    explicit = spark.range(3).selectExpr("id AS v", f"id + {hw0 + 100} AS id")
    DL.write_delta(explicit, t, append=True)
    assert DL.table_identity_columns(t)["id"]["highWaterMark"] == hw0 + 102


def test_update_refuses_identity_column(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, identity_columns={"id": {}})
    with pytest.raises(ValueError, match="identity columns"):
        DL.update_delta(spark, t, "v = 1", {"id": "id + 1"})


def test_concurrent_identity_append_conflicts(spark, tmpdir, monkeypatch):
    """Two writers assigning from the same mark must surface as a
    ConcurrentModificationError, never silently collide."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, identity_columns={"id": {}})

    real_read = DL._read_log
    state = {"raced": False}

    def racing_read(path, as_of_version=None):
        out = real_read(path, as_of_version)
        if not state["raced"]:
            state["raced"] = True
            # the "other writer" lands an identity append between this
            # writer's assignment and its commit
            monkeypatch.setattr(DL, "_read_log", real_read)
            DL.write_delta(_src(spark, lo=50), t, append=True)
            monkeypatch.setattr(DL, "_read_log", racing_read)
            return out  # stale snapshot: pre-race mark
        return real_read(path, as_of_version)

    monkeypatch.setattr(DL, "_read_log", racing_read)
    with pytest.raises(DL.ConcurrentModificationError, match="high-water"):
        DL.write_delta(_src(spark, lo=90), t, append=True)


def test_primitive_contract(spark, tmpdir):
    with pytest.raises(ValueError, match="nonzero"):
        DL.write_delta(
            _src(spark), os.path.join(tmpdir, "t"), identity_columns={"id": {"step": 0}}
        )
