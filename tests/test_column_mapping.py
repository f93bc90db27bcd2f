"""Delta column mapping (reader feature, name mode): foreign tables whose
parquet files carry PHYSICAL column names (delta.columnMapping.physicalName
field metadata) read back under their logical names; id mode, nested
mapping, partitioned mapped tables, and ALL writes refuse loudly — this
writer emits logical parquet names, so writing into a mapped table would
produce files its mapping-aware readers cannot resolve.

The reference pins protocol (1,1) and never encounters mapping
(src/delta_destination.rs:446-458); this is read-interop with delta-spark
tables that enabled the feature (e.g. for column RENAME/DROP support)."""

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


def test_all_writes_into_mapped_tables_refused(spark, tmpdir):
    t = _mapped_table(spark, str(tmpdir))
    df = D.read_delta(spark, t)
    for op in (
        lambda: D.write_delta(df, t, append=True),
        lambda: D.delete_from_delta(spark, t, "id = 1"),
        lambda: D.update_delta(spark, t, "id = 1", {"doubled": "3"}),
        lambda: D.merge_delta(spark, t, df.limit(1), key="id"),
    ):
        with pytest.raises(D.UnsupportedProtocolError):
            op()


def test_unmapped_tables_unaffected(spark, tmpdir):
    t = os.path.join(str(tmpdir), "plain")
    D.write_delta(spark.range(5).select("id"), t)
    assert D.read_delta(spark, t).count() == 5
