"""Iceberg RENAME/DROP COLUMN (r9) — the format's signature metadata-only
evolution, field-id preserved across schema versions.

Resolution model: new data files embed real PARQUET:field_id metadata
(spec-conformant; id-resolving engines never depend on names), and the
``schema.name-mapping.default`` property tracks historical names for
files that predate ids.  Our own reader resolves by name: pre-rename
files surface their column under the OLD name, so the read paths extend
the scan schema with every historical name of a renamed field and
coalesce back (``_resolve_historical``).
Ambiguous states are refused at ALTER time: a rename target that ever
named a different field id, re-adding a retired name, renaming/dropping
partition-source columns.  DML rewrite paths refuse on renamed tables
(they resolve files by current name only) — the same containment as the
Delta twin's column-mapping DML refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC


def _table(spark, tmpdir, name="t"):
    t = os.path.join(str(tmpdir), name)
    IC.write_iceberg(
        spark.createDataFrame([(i, i * 2) for i in range(100)], "id long, v long"),
        t,
    )
    return t


def test_rename_metadata_only_and_old_files_resolve(spark, tmpdir):
    import glob

    t = _table(spark, tmpdir)
    files_before = set(glob.glob(os.path.join(t, "data", "**", "*.parquet"), recursive=True))
    IC.rename_column_iceberg(t, "v", "value")
    assert set(glob.glob(os.path.join(t, "data", "**", "*.parquet"), recursive=True)) == files_before
    got = IC.read_iceberg(spark, t)
    assert got.columns == ["id", "value"]
    assert got.agg(F.sum("value")).first()[0] == 2 * 99 * 100 // 2
    # field id preserved across the rename
    _, meta = IC._read_metadata(t)
    schemas = meta["schemas"]
    old_f = next(f for f in schemas[0]["fields"] if f["name"] == "v")
    new_f = next(
        f for f in schemas[meta["current-schema-id"]]["fields"] if f["name"] == "value"
    )
    assert old_f["id"] == new_f["id"]


def test_appends_after_rename_mix_old_and_new_files(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.rename_column_iceberg(t, "v", "value")
    IC.write_iceberg(
        spark.createDataFrame([(100, 200)], "id long, value long"), t, append=True
    )
    got = IC.read_iceberg(spark, t)
    assert got.count() == 101
    assert got.agg(F.sum("value")).first()[0] == 2 * 99 * 100 // 2 + 200
    assert got.filter("value IS NULL").count() == 0  # both eras resolve
    # a second rename chains the historical names
    IC.rename_column_iceberg(t, "value", "val2")
    got = IC.read_iceberg(spark, t)
    assert got.columns == ["id", "val2"]
    assert got.filter("val2 IS NULL").count() == 0


def test_rename_survives_mor_deletes_and_pruned_reads(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.delete_from_iceberg(spark, t, "id < 10", strategy="merge-on-read")
    IC.rename_column_iceberg(t, "v", "value")
    got = IC.read_iceberg(spark, t)
    assert got.count() == 90
    assert got.filter("value IS NULL").count() == 0
    # stats-pruned read: manifest bounds are FIELD-ID keyed, so pruning on
    # the renamed column still works against pre-rename manifests
    pruned = IC.read_iceberg_stats_pruned(spark, t, "id", 50, 60)
    assert pruned.filter("value IS NULL").count() == 0
    assert pruned.filter("id >= 50 AND id <= 60").count() == 11
    scan = IC.read_iceberg_scan(spark, t, [("id", ">=", 90)])
    assert scan.count() == 10 and scan.filter("value IS NULL").count() == 0


def test_rename_collision_and_swap_refused(spark, tmpdir):
    t = _table(spark, tmpdir)
    with pytest.raises(ValueError, match="already exists"):
        IC.rename_column_iceberg(t, "v", "id")
    IC.rename_column_iceberg(t, "v", "value")
    # 'v' is retired but still bound to its id in history: renaming ANOTHER
    # field to 'v' would misbind old files
    with pytest.raises(ValueError, match="historically"):
        IC.rename_column_iceberg(t, "id", "v")
    # renaming the SAME field back is fine (same id)
    IC.rename_column_iceberg(t, "value", "v")
    got = IC.read_iceberg(spark, t)
    assert got.columns == ["id", "v"]
    assert got.filter("v IS NULL").count() == 0


def test_partition_source_rename_drop_refused(spark, tmpdir):
    t = os.path.join(str(tmpdir), "part")
    IC.write_iceberg(
        spark.createDataFrame([(i, i % 3) for i in range(30)], "id long, p long"),
        t,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition-source"):
        IC.rename_column_iceberg(t, "p", "bucket_col")
    with pytest.raises(ValueError, match="partition-source"):
        IC.drop_column_iceberg(t, "p")


def test_drop_then_readd_refused_never_resurrects(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.drop_column_iceberg(t, "v")
    assert IC.read_iceberg(spark, t).columns == ["id"]
    # evolve-append re-adding the retired name must refuse
    with pytest.raises(ValueError, match="resurrect"):
        IC.write_iceberg(
            spark.createDataFrame([(200, 1)], "id long, v long"),
            t,
            append=True,
            evolve_schema=True,
        )
    # a FRESH name is fine
    IC.write_iceberg(
        spark.createDataFrame([(200, 1)], "id long, w long"),
        t,
        append=True,
        evolve_schema=True,
    )
    got = IC.read_iceberg(spark, t)
    assert got.columns == ["id", "w"]
    assert got.filter("w IS NOT NULL").count() == 1


def test_dml_refused_on_renamed_tables(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.rename_column_iceberg(t, "v", "value")
    src = spark.createDataFrame([(1, 3)], "id long, value long")
    for op in (
        lambda: IC.delete_from_iceberg(spark, t, "id = 1"),
        lambda: IC.delete_from_iceberg(spark, t, "id = 1", strategy="merge-on-read"),
        lambda: IC.update_iceberg(spark, t, "id = 1", {"value": "3"}),
        lambda: IC.merge_iceberg(spark, t, src, key="id"),
        lambda: IC.optimize_iceberg(spark, t),
        lambda: IC.equality_delete_iceberg(spark, t, src.select("id")),
    ):
        with pytest.raises(ValueError, match="renamed"):
            op()
    # plain appends and reads keep working
    IC.write_iceberg(
        spark.createDataFrame([(100, 7)], "id long, value long"), t, append=True
    )
    assert IC.read_iceberg(spark, t).count() == 101


def test_new_files_carry_parquet_field_ids(spark, tmpdir):
    """r9: data files embed real PARQUET:field_id metadata (the
    spec-conformant resolution handle) matching the table schema's ids —
    id-resolving external engines never depend on names at all."""
    import glob

    import pyarrow.parquet as pq

    t = _table(spark, tmpdir)
    _, meta = IC._read_metadata(t)
    ids = {f["name"]: f["id"] for f in meta["schemas"][meta["current-schema-id"]]["fields"]}
    for f in glob.glob(os.path.join(t, "data", "**", "*.parquet"), recursive=True):
        sch = pq.read_schema(f)
        for name, fid in ids.items():
            md = sch.field(name).metadata or {}
            assert md.get(b"PARQUET:field_id") == str(fid).encode(), (f, name)
    # post-rename appends keep the SAME id under the new name
    IC.rename_column_iceberg(t, "v", "value")
    IC.write_iceberg(
        spark.createDataFrame([(100, 1)], "id long, value long"), t, append=True
    )
    newest = max(
        glob.glob(os.path.join(t, "data", "**", "*.parquet"), recursive=True),
        key=os.path.getmtime,
    )
    sch = pq.read_schema(newest)
    assert sch.field("value").metadata[b"PARQUET:field_id"] == str(ids["v"]).encode()


def test_name_mapping_property_tracks_history(spark, tmpdir):
    import json as _json

    t = _table(spark, tmpdir)
    IC.rename_column_iceberg(t, "v", "value")
    IC.rename_column_iceberg(t, "value", "val2")
    _, meta = IC._read_metadata(t)
    mapping = {m["field-id"]: m["names"] for m in _json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )}
    fid = next(
        f["id"] for f in meta["schemas"][meta["current-schema-id"]]["fields"]
        if f["name"] == "val2"
    )
    assert mapping[fid][0] == "val2"
    assert set(mapping[fid]) == {"val2", "value", "v"}
