"""Avro manifest interop: the Iceberg sink's manifest / manifest-list files
must be REAL Avro object container files (Iceberg spec v2), not a private
encoding.  Cross-validated against the JVM's org.apache.avro 1.12 (bundled
with Spark) through py4j: files written by ``avro_ocf`` are read back with
``DataFileReader`` (and vice versa), then the manifests of an actual
``write_iceberg`` table are decoded both ways and checked field-by-field.

Reference parity: iceberg_destination.rs:271 (manifest write) and :315
(manifest-list write) produce the same Avro encoding via iceberg-rust.
"""

from __future__ import annotations

import json
import os

import pytest

from lakehouse_loader_spark.sinks import avro_ocf
from lakehouse_loader_spark.sinks import iceberg as IC


def _jvm_read_avro(spark, path: str) -> tuple[str, list]:
    """Read an Avro OCF with the JVM library; returns (schema_json, records
    as py4j GenericData.Record objects)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    schema_json = reader.getSchema().toString()
    records = []
    while reader.hasNext():
        records.append(reader.next())
    reader.close()
    return schema_json, records


SIMPLE_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "string"], "default": None},
        {"name": "d", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}

SIMPLE_ROWS = [
    {"a": 1, "s": "x", "o": None, "d": 1.5, "arr": [1, 2, 3], "m": {"k": 9}},
    {"a": -(2**40), "s": "über", "o": "y", "d": -0.25, "arr": [], "m": {}},
]


def test_ocf_roundtrip_python(tmpdir):
    p = os.path.join(tmpdir, "t.avro")
    avro_ocf.write_ocf(p, SIMPLE_SCHEMA, SIMPLE_ROWS, metadata={"k": "v"})
    schema, meta, rows = avro_ocf.read_ocf(p)
    assert rows == SIMPLE_ROWS
    assert meta["k"] == "v"
    assert schema["name"] == "t"


def test_python_write_jvm_read(spark, tmpdir):
    """Files written by avro_ocf must parse with the REAL Avro library."""
    p = os.path.join(tmpdir, "t.avro")
    avro_ocf.write_ocf(p, SIMPLE_SCHEMA, SIMPLE_ROWS)
    schema_json, records = _jvm_read_avro(spark, p)
    assert json.loads(schema_json)["name"] == "t"
    assert len(records) == 2
    assert records[0].get("a") == 1
    assert str(records[0].get("s")) == "x"
    assert records[0].get("o") is None
    assert records[1].get("a") == -(2**40)
    assert str(records[1].get("o")) == "y"
    assert records[1].get("d") == -0.25


def test_jvm_write_python_read(spark, tmpdir):
    """avro_ocf's reader must parse files written by the REAL library."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(
            {
                "type": "record",
                "name": "j",
                "fields": [
                    {"name": "a", "type": "int"},
                    {"name": "s", "type": "string"},
                ],
            }
        )
    )
    p = os.path.join(tmpdir, "j.avro")
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    w.create(schema, jvm.java.io.File(p))
    for i, s in [(1, "one"), (2, "two")]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("a", i)
        rec.put("s", s)
        w.append(rec)
    w.close()
    _, _, rows = avro_ocf.read_ocf(p)
    assert rows == [{"a": 1, "s": "one"}, {"a": 2, "s": "two"}]


@pytest.fixture()
def ice_table(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = spark.range(0, 100).withColumnRenamed("id", "v")
    IC.write_iceberg(df, path)
    IC.write_iceberg(spark.range(100, 150).withColumnRenamed("id", "v"), path, append=True)
    return path


def test_manifest_list_is_spec_avro(spark, ice_table):
    _, meta = IC._read_metadata(ice_table)
    snap = meta["snapshots"][-1]
    schema_json, records = _jvm_read_avro(spark, snap["manifest-list"])
    schema = json.loads(schema_json)
    assert schema["name"] == "manifest_file"
    by_name = {f["name"]: f for f in schema["fields"]}
    # Iceberg field-ids must ride the Avro schema so spec readers can map
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["sequence_number"]["field-id"] == 515
    # append keeps the create's manifest + adds its own (R16)
    assert len(records) == 2
    seqs = sorted(r.get("sequence_number") for r in records)
    assert seqs == [1, 2]
    for r in records:
        assert r.get("content") == 0
        assert os.path.isfile(str(r.get("manifest_path")))
        assert r.get("manifest_length") == os.path.getsize(str(r.get("manifest_path")))
        assert r.get("added_files_count") >= 1


def test_manifest_entries_are_spec_avro(spark, ice_table):
    _, meta = IC._read_metadata(ice_table)
    manifests = IC._snapshot_manifests(ice_table, meta)
    total_rows = 0
    for mf in manifests:
        schema_json, records = _jvm_read_avro(spark, mf["manifest_path"])
        schema = json.loads(schema_json)
        assert schema["name"] == "manifest_entry"
        data_file = next(f for f in schema["fields"] if f["name"] == "data_file")
        assert data_file["field-id"] == 2
        df_fields = {f["name"]: f for f in data_file["type"]["fields"]}
        assert df_fields["file_path"]["field-id"] == 100
        assert df_fields["record_count"]["field-id"] == 103
        for r in records:
            assert r.get("status") == 1  # ADDED
            assert r.get("sequence_number") is None  # inherited (v2)
            d = r.get("data_file")
            fp = str(d.get("file_path"))
            assert os.path.isabs(fp) and os.path.isfile(fp)
            assert str(d.get("file_format")) == "PARQUET"
            assert d.get("file_size_in_bytes") == os.path.getsize(fp)
            total_rows += d.get("record_count")
    assert total_rows == 150  # footer-derived record counts are real


def test_manifest_file_metadata_keys(ice_table):
    """The manifest carries schema / partition-spec / format-version in its
    OCF key-value metadata, as the spec requires."""
    _, meta = IC._read_metadata(ice_table)
    mf = IC._snapshot_manifests(ice_table, meta)[0]
    _, file_meta, _ = avro_ocf.read_ocf(mf["manifest_path"])
    assert file_meta["format-version"] == "2"
    assert file_meta["content"] == "data"
    assert json.loads(file_meta["schema"])["type"] == "struct"
    assert json.loads(file_meta["partition-spec"]) == []  # unpartitioned


def test_partitioned_manifest_has_typed_partition_values(spark, tmpdir):
    import pyspark.sql.functions as F

    path = os.path.join(tmpdir, "icep")
    df = spark.range(0, 40).select(
        F.col("id").alias("v"), F.pmod("id", F.lit(4)).alias("k")
    )
    IC.write_iceberg(df, path, partition_by=["k"])
    _, meta = IC._read_metadata(path)
    mf = IC._snapshot_manifests(path, meta)[0]
    schema_json, records = _jvm_read_avro(spark, mf["manifest_path"])
    schema = json.loads(schema_json)
    data_file = next(f for f in schema["fields"] if f["name"] == "data_file")
    part = next(f for f in data_file["type"]["fields"] if f["name"] == "partition")
    [kf] = part["type"]["fields"]
    assert kf["name"] == "k" and kf["field-id"] == 1000
    got = {r.get("data_file").get("partition").get("k") for r in records}
    assert got == {0, 1, 2, 3}  # typed longs, not hive strings


def test_date_partition_values_encode_as_epoch_days(spark, tmpdir):
    """Identity partitions on DATE columns store Avro logical-date ints
    (days since epoch), not hive strings."""
    import datetime

    import pyspark.sql.functions as F

    path = os.path.join(tmpdir, "iced")
    df = spark.range(0, 8).select(
        F.col("id").alias("v"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), (F.pmod("id", F.lit(2))).cast("int")).alias("d"),
    )
    IC.write_iceberg(df, path, partition_by=["d"])
    _, meta = IC._read_metadata(path)
    mf = IC._snapshot_manifests(path, meta)[0]
    schema_json, records = _jvm_read_avro(spark, mf["manifest_path"])
    schema = json.loads(schema_json)
    data_file = next(f for f in schema["fields"] if f["name"] == "data_file")
    part = next(f for f in data_file["type"]["fields"] if f["name"] == "partition")
    [dfld] = part["type"]["fields"]
    # logical-date annotation on the int branch of the union
    non_null = [t for t in dfld["type"] if t != "null"][0]
    assert non_null == {"type": "int", "logicalType": "date"}
    got = {r.get("data_file").get("partition").get("d") for r in records}
    epoch = datetime.date(1970, 1, 1)
    want = {
        (datetime.date(2024, 1, 1) - epoch).days,
        (datetime.date(2024, 1, 2) - epoch).days,
    }
    assert got == want
    # pruned read still works through the hive canonical form
    kept, total = IC.prune_iceberg_files(path, "d", datetime.date(2024, 1, 2))
    assert kept and len(kept) < total


def test_iceberg_file_name_patterns_match_reference(spark, ice_table):
    """The reference e2e asserts these exact metadata file-name shapes
    (tests/basic_integration.rs:63-65): manifest-<uuid>.avro and
    manifest-list-<uuid>.avro under metadata/, data parquet under data/."""
    import re

    uuid_re = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    meta = sorted(os.listdir(os.path.join(ice_table, "metadata")))
    manifests = [f for f in meta if f.startswith("manifest-") and not f.startswith("manifest-list-")]
    lists = [f for f in meta if f.startswith("manifest-list-")]
    assert manifests and lists
    for f in manifests:
        assert re.fullmatch(rf"manifest-{uuid_re}\.avro", f), f
    for f in lists:
        assert re.fullmatch(rf"manifest-list-{uuid_re}\.avro", f), f
    assert "version-hint.text" in meta and "v0.metadata.json" in meta
    data = os.listdir(os.path.join(ice_table, "data"))
    assert all(re.match(r"part-\d{5}-.*\.parquet$", f) for f in data)
