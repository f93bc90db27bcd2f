"""Delta column mapping, name mode: foreign tables whose parquet files
carry PHYSICAL column names (delta.columnMapping.physicalName field
metadata) read back under their logical names; id mode, nested mapping
and partitioned mapped tables refuse loudly.

r9 adds the WRITE side: enable_column_mapping upgrades a table in place
(physicalName = current name, so existing files stay resolvable),
rename/drop/add column become metadata-only ALTERs, and appends translate
logical→physical before writing — DML rewrites stay refused.

The reference pins protocol (1,1) and never encounters mapping
(src/delta_destination.rs:446-458); this is interop with delta-spark
tables that enabled the feature."""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as D


def _mapped_table(spark, base, mode="name", nested=False, partitioned=False):
    t = os.path.join(base, f"t_{uuid.uuid4().hex[:6]}")
    os.makedirs(t)
    phys = spark.range(0, 1000).select(
        F.col("id").alias("col-aaaa"), (F.col("id") * 2).alias("col-bbbb")
    )
    pdir = os.path.join(base, f"stage_{uuid.uuid4().hex[:6]}")
    phys.coalesce(1).write.parquet(pdir)
    rel = "part-00000-mapped.parquet"
    shutil.copy(glob.glob(os.path.join(pdir, "*.parquet"))[0], os.path.join(t, rel))
    doubled_type = "long"
    if nested:
        doubled_type = {
            "type": "struct",
            "fields": [
                {
                    "name": "inner",
                    "type": "long",
                    "nullable": True,
                    "metadata": {"delta.columnMapping.physicalName": "col-x"},
                }
            ],
        }
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaaa",
                },
            },
            {
                "name": "doubled",
                "type": doubled_type,
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbbb",
                },
            },
        ],
    }
    meta = {
        "id": str(uuid.uuid4()),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema),
        "partitionColumns": ["id"] if partitioned else [],
        "configuration": {
            "delta.columnMapping.mode": mode,
            "delta.columnMapping.maxColumnId": "2",
        },
        "createdTime": int(time.time() * 1000),
    }
    D._commit(
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(t, rel)),
                    "modificationTime": int(time.time() * 1000),
                    "dataChange": True,
                }
            },
        ],
    )
    return t


def test_name_mode_reads_logical_names_and_values(spark, tmpdir):
    t = _mapped_table(spark, str(tmpdir))
    df = D.read_delta(spark, t)
    assert df.columns == ["id", "doubled"]
    assert df.count() == 1000
    assert df.agg(F.sum("doubled")).first()[0] == 999 * 1000
    assert df.filter("id = 7").first().doubled == 14
    # reader-2 legacy protocol is accepted (columnMapping is implemented)
    assert D.table_protocol(t)["minReaderVersion"] == 2


def test_id_mode_and_nested_mapping_refused(spark, tmpdir):
    t = _mapped_table(spark, str(tmpdir), mode="id")
    with pytest.raises(D.UnsupportedProtocolError, match="id"):
        D.read_delta(spark, t)
    t2 = _mapped_table(spark, str(tmpdir), nested=True)
    with pytest.raises(D.UnsupportedProtocolError, match="nested"):
        D.read_delta(spark, t2)


def test_partitioned_mapped_table_refused(spark, tmpdir):
    t = _mapped_table(spark, str(tmpdir), partitioned=True)
    with pytest.raises(D.UnsupportedProtocolError, match="partition"):
        D.read_delta(spark, t)


def test_dml_into_mapped_tables_refused_append_allowed(spark, tmpdir):
    t = _mapped_table(spark, str(tmpdir))
    df = D.read_delta(spark, t)
    for op in (
        lambda: D.delete_from_delta(spark, t, "id = 1"),
        lambda: D.update_delta(spark, t, "id = 1", {"doubled": "3"}),
        lambda: D.merge_delta(spark, t, df.limit(1), key="id"),
    ):
        with pytest.raises(D.UnsupportedProtocolError):
            op()
    # appends translate logical→physical (r9): the new file must carry the
    # FOREIGN table's physical names and read back under logical ones
    add = spark.createDataFrame([(5000, 10000)], "id long, doubled long")
    D.write_delta(add, t, append=True)
    got = D.read_delta(spark, t)
    assert got.count() == 1001
    assert got.filter("id = 5000").first()["doubled"] == 10000
    newest = max(
        glob.glob(os.path.join(t, "*.parquet")), key=os.path.getmtime
    )
    import pyarrow.parquet as pq

    assert pq.read_schema(newest).names == ["col-aaaa", "col-bbbb"]


class TestColumnMappingWrite:
    """r9 write side: in-place upgrade + metadata-only schema evolution."""

    def _table(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), f"w_{uuid.uuid4().hex[:6]}")
        # nullable columns so later single-row appends align
        D.write_delta(
            spark.createDataFrame(
                [(i, i * 2) for i in range(100)], "id long, v long"
            ),
            t,
        )
        return t

    def test_enable_upgrade_in_place(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        D.enable_column_mapping(t)
        proto = D.table_protocol(t)
        assert "columnMapping" in proto["readerFeatures"]
        assert "columnMapping" in proto["writerFeatures"]
        _, meta, _ = D._read_log(t)
        conf = meta["configuration"]
        assert conf["delta.columnMapping.mode"] == "name"
        assert conf["delta.columnMapping.maxColumnId"] == "2"
        sch = D.table_schema(t)
        # upgrade semantics: physicalName == current name, ids assigned
        for i, f in enumerate(sch.fields, start=1):
            assert f.metadata["delta.columnMapping.id"] == i
            assert f.metadata["delta.columnMapping.physicalName"] == f.name
        # pre-upgrade files still read
        assert D.read_delta(spark, t).count() == 100
        D.enable_column_mapping(t)  # idempotent

    def test_rename_is_metadata_only_and_appends_work(self, spark, tmpdir):
        import pyarrow.parquet as pq

        t = self._table(spark, tmpdir)
        files_before = set(glob.glob(os.path.join(t, "*.parquet")))
        D.enable_column_mapping(t)
        D.rename_column(t, "v", "value")
        assert set(glob.glob(os.path.join(t, "*.parquet"))) == files_before
        got = D.read_delta(spark, t)
        assert got.columns == ["id", "value"]
        assert got.agg(F.sum("value")).first()[0] == 2 * 99 * 100 // 2
        # post-rename append: logical 'value' lands as PHYSICAL 'v'
        D.write_delta(
            spark.createDataFrame([(100, 200)], "id long, value long"),
            t, append=True,
        )
        newest = max(glob.glob(os.path.join(t, "*.parquet")), key=os.path.getmtime)
        assert pq.read_schema(newest).names == ["id", "v"]
        got = D.read_delta(spark, t)
        assert got.count() == 101
        assert got.filter("id = 100").first()["value"] == 200

    def test_rename_refused_when_constraint_references(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        D.enable_column_mapping(t)
        D.add_check_constraint(t, "pos", "v >= 0")
        with pytest.raises(ValueError, match="references"):
            D.rename_column(t, "v", "value")
        with pytest.raises(ValueError, match="references"):
            D.drop_column(t, "v")
        D.drop_check_constraint(t, "pos")
        D.rename_column(t, "v", "value")
        assert "value" in D.read_delta(spark, t).columns

    def test_alters_require_mapping(self, spark, tmpdir):
        """RENAME/DROP need physical-name indirection and refuse unmapped;
        ADD COLUMN works on an unmapped table as a plain schema extension
        (r14 — the same state a mergeSchema append creates), null-filling
        pre-existing files on read."""
        t = self._table(spark, tmpdir)
        for op in (
            lambda: D.rename_column(t, "v", "w"),
            lambda: D.drop_column(t, "v"),
        ):
            with pytest.raises(D.UnsupportedProtocolError, match="mode=name"):
                op()
        D.add_column(t, "w", "long")
        sch = D.table_schema(t)
        assert "w" in sch.fieldNames()
        assert "delta.columnMapping.id" not in (sch["w"].metadata or {})
        got = D.read_delta(spark, t)
        assert got.filter("w IS NULL").count() == got.count()  # null-fills

    def test_add_column_null_fills_and_accepts_appends(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        D.enable_column_mapping(t)
        D.add_column(t, "tag", "string")
        sch = D.table_schema(t)
        tag = sch["tag"]
        assert tag.metadata["delta.columnMapping.id"] == 3
        assert tag.metadata["delta.columnMapping.physicalName"].startswith("col-")
        got = D.read_delta(spark, t)
        assert got.filter("tag IS NULL").count() == 100  # old files null-fill
        D.write_delta(
            spark.createDataFrame([(100, 1, "x")], "id long, v long, tag string"),
            t, append=True,
        )
        assert D.read_delta(spark, t).filter("tag = 'x'").count() == 1

    def test_drop_then_readd_never_resurrects(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        D.enable_column_mapping(t)
        D.drop_column(t, "v")
        assert D.read_delta(spark, t).columns == ["id"]
        D.add_column(t, "v", "long")
        got = D.read_delta(spark, t)
        # the re-added logical 'v' is a FRESH physical column — the old
        # values must NOT come back
        assert got.filter("v IS NOT NULL").count() == 0
        sch = D.table_schema(t)
        assert sch["v"].metadata["delta.columnMapping.physicalName"] != "v"
        assert sch["v"].metadata["delta.columnMapping.id"] == 3

    def test_enable_refusals(self, spark, tmpdir):
        part = os.path.join(str(tmpdir), "part")
        D.write_delta(
            spark.range(10).select("id", (F.col("id") % 2).alias("p")),
            part, partition_by=["p"],
        )
        with pytest.raises(D.UnsupportedProtocolError, match="partition"):
            D.enable_column_mapping(part)
        ident = os.path.join(str(tmpdir), "ident")
        D.write_delta(
            spark.range(10).select("id", (F.col("id") * 2).alias("v")),
            ident, identity_columns={"seq": {"start": 1, "step": 1}},
        )
        with pytest.raises(D.UnsupportedProtocolError, match="identity"):
            D.enable_column_mapping(ident)

    def test_checkpoint_round_trip_after_rename(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        D.enable_column_mapping(t)
        D.rename_column(t, "v", "value")
        v = D.write_checkpoint(t)
        for f in os.listdir(D._log_dir(t)):
            if f.endswith(".json") and int(f.split(".")[0]) <= v:
                os.remove(os.path.join(D._log_dir(t), f))
        got = D.read_delta(spark, t)
        assert got.columns == ["id", "value"]
        assert got.count() == 100
        # still evolvable and appendable after the checkpoint seed
        D.write_delta(
            spark.createDataFrame([(100, 1)], "id long, value long"),
            t, append=True,
        )
        assert D.read_delta(spark, t).count() == 101


def test_unmapped_tables_unaffected(spark, tmpdir):
    t = os.path.join(str(tmpdir), "plain")
    D.write_delta(spark.range(5).select("id"), t)
    assert D.read_delta(spark, t).count() == 5
