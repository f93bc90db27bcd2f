"""Change Data Feed write side (writer feature `changeDataFeed`): DML on
enabled tables persists its exact row-level changes as `_change_data`
files with cdc actions; the reader prefers them (yielding the update
pre/post images the log diff cannot pair); vacuum applies retention."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


def _src(spark, lo=0, n=20):
    return spark.range(lo, lo + n).select("id", (F.col("id") * 10).alias("v"))


def _table(spark, tmpdir, **kw):
    t = os.path.join(str(tmpdir), "t")
    DL.write_delta(_src(spark), t, **kw)
    DL.enable_change_data_feed(t)
    return t


def _cdc_actions(path, version):
    with open(DL._version_file(path, version)) as fh:
        return [json.loads(ln)["cdc"] for ln in fh if '"cdc"' in ln]


def _changes(spark, t, since):
    return DL.read_delta_changes(spark, t, since).collect()


class TestDeleteCdc:
    @pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
    def test_delete_writes_and_reader_prefers_cdc(self, spark, tmpdir, mode):
        t = _table(spark, tmpdir)
        v0 = DL._read_log(t)[0]
        DL.delete_from_delta(spark, t, "id < 3", mode=mode)
        v1 = DL._read_log(t)[0]
        acts = _cdc_actions(t, v1)
        assert acts and all(a["path"].startswith("_change_data/") for a in acts)
        assert all(a["dataChange"] is False for a in acts)
        ch = _changes(spark, t, v0)
        assert sorted((r.id, r._change_type) for r in ch) == [
            (0, "delete"), (1, "delete"), (2, "delete")
        ]
        assert {r._commit_version for r in ch} == {v1}


class TestUpdateCdc:
    @pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
    def test_update_yields_paired_images(self, spark, tmpdir, mode):
        t = _table(spark, tmpdir)
        v0 = DL._read_log(t)[0]
        DL.update_delta(spark, t, "id = 5", {"v": "v + 1"}, mode=mode)
        ch = _changes(spark, t, v0)
        # THE cdc payoff: pre/post images, not the delete+insert the log
        # diff degrades to
        assert sorted((r._change_type, r.v) for r in ch) == [
            ("update_postimage", 51), ("update_preimage", 50)
        ]


class TestMergeCdc:
    @pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
    def test_merge_yields_images_and_inserts(self, spark, tmpdir, mode):
        t = _table(spark, tmpdir)
        v0 = DL._read_log(t)[0]
        source = spark.createDataFrame([(5, 555), (100, 1000)], "id long, v long")
        DL.merge_delta(spark, t, source, key="id", mode=mode)
        ch = _changes(spark, t, v0)
        got = sorted((r.id, r._change_type, r.v) for r in ch)
        assert (100, "insert", 1000) in got
        assert (5, "update_preimage", 50) in got
        assert (5, "update_postimage", 555) in got
        assert len(got) == 3


class TestLifecycle:
    def test_appends_need_no_cdc(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        v0 = DL._read_log(t)[0]
        DL.write_delta(_src(spark, lo=100, n=2), t, append=True)
        v1 = DL._read_log(t)[0]
        assert _cdc_actions(t, v1) == []  # blind append: derivable
        ch = _changes(spark, t, v0)
        assert sorted((r.id, r._change_type) for r in ch) == [
            (100, "insert"), (101, "insert")
        ]

    def test_partitioned_cdc_carries_partition_values(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), "t")
        df = _src(spark).withColumn("p", (F.col("id") % 2).cast("string"))
        DL.write_delta(df, t, partition_by=["p"])
        DL.enable_change_data_feed(t)
        v0 = DL._read_log(t)[0]
        DL.delete_from_delta(spark, t, "id IN (2, 3)")
        acts = _cdc_actions(t, DL._read_log(t)[0])
        assert {a["partitionValues"]["p"] for a in acts} == {"0", "1"}
        ch = _changes(spark, t, v0)
        assert sorted((r.id, r.p) for r in ch) == [(2, "0"), (3, "1")]

    def test_partitioned_cdc_unescapes_special_values(self, spark, tmpdir):
        # Spark percent-encodes ':' in hive dir names (ts=2024%3A01); the
        # cdc action must record the TRUE value, and the change-feed read
        # must cast the right literal back into the partition column
        t = os.path.join(str(tmpdir), "t")
        df = _src(spark, n=4).withColumn(
            "p", F.concat(F.lit("v:"), (F.col("id") % 2).cast("string"))
        )
        DL.write_delta(df, t, partition_by=["p"])
        DL.enable_change_data_feed(t)
        v0 = DL._read_log(t)[0]
        DL.delete_from_delta(spark, t, "id IN (0, 1)")
        acts = _cdc_actions(t, DL._read_log(t)[0])
        assert {a["partitionValues"]["p"] for a in acts} == {"v:0", "v:1"}
        ch = _changes(spark, t, v0)
        assert sorted((r.id, r.p) for r in ch) == [(0, "v:0"), (1, "v:1")]

    def test_vacuum_retention_and_loud_read_after(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        v0 = DL._read_log(t)[0]
        DL.delete_from_delta(spark, t, "id = 1")
        assert len(_changes(spark, t, v0)) == 1
        # the delete is still the LATEST version: retain=0 keeps its cdc
        DL.vacuum_delta(t)
        assert len(_changes(spark, t, v0)) == 1
        # push the delete out of the window, then vacuum reaps its cdc
        DL.write_delta(_src(spark, lo=200, n=1), t, append=True)
        deleted = DL.vacuum_delta(t)
        assert any(p.startswith("_change_data/") for p in deleted)
        with pytest.raises(FileNotFoundError, match="cdc"):
            _changes(spark, t, v0)
        # within a wider retention window the cdc file survives
        t2 = _table(spark, tmpdir.mkdir("w2"))
        v0 = DL._read_log(t2)[0]
        DL.delete_from_delta(spark, t2, "id = 1")
        DL.write_delta(_src(spark, lo=200, n=1), t2, append=True)
        DL.vacuum_delta(t2, retain_versions=2)
        assert len(_changes(spark, t2, v0)) == 2  # delete + insert commits

    def test_restore_refuses_on_cdf_table(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        with pytest.raises(ValueError, match="RESTORE"):
            DL.restore_delta(spark, t, 1)

    def test_protocol_feature_claimed(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        proto = DL.table_protocol(t)
        assert proto["minWriterVersion"] in (4, 7)
        if proto["minWriterVersion"] == 7:
            assert "changeDataFeed" in proto["writerFeatures"]
