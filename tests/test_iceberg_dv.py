"""Iceberg v3 deletion vectors (sinks/puffin.py + merge-on-read-dv):
the Puffin container against the public spec, CRC-32C integrity, the
one-DV-per-data-file supersede invariant, interplay with v2 parquet
position deletes / equality deletes / OPTIMIZE / expire / time travel,
and the metadata-only target resolution the encoding exists for.

The reference pins Iceberg at spec v2 with no row-level deletes
(src/lib.rs delegation); this is the v3 format twin of the Delta sink's
deletion vectors (tests/test_delta_dv.py)."""

from __future__ import annotations

import glob
import json
import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import dv as DV
from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks import puffin as PF


def _table(spark, path, n=10_000, files=2):
    IC.write_iceberg(
        spark.range(0, n)
        .select("id", (F.col("id") % 10).alias("grp"), (F.col("id") * 2.0).alias("v"))
        .repartition(files),
        path,
    )


def _puffins(path):
    return sorted(glob.glob(os.path.join(path, "data", "dv-*.puffin")))


# -- Puffin container --------------------------------------------------------


def test_puffin_layout_and_footer_roundtrip(tmpdir):
    pos1 = np.array([0, 5, 7, 100000], dtype=np.uint64)
    pos2 = np.arange(0, 5000, 3, dtype=np.uint64)
    rel, metas = PF.write_dv_puffin(
        str(tmpdir),
        [
            ("/data/a.parquet", DV.serialize_positions(pos1), len(pos1)),
            ("/data/b.parquet", DV.serialize_positions(pos2), len(pos2)),
        ],
        snapshot_id=42,
        sequence_number=7,
    )
    full = os.path.join(str(tmpdir), rel)
    raw = open(full, "rb").read()
    assert raw[:4] == PF.PUFFIN_MAGIC and raw[-4:] == PF.PUFFIN_MAGIC
    blobs = PF.read_footer(full)
    assert [b["type"] for b in blobs] == [PF.DV_BLOB_TYPE] * 2
    assert blobs[0]["properties"]["referenced-data-file"] == "/data/a.parquet"
    assert int(blobs[1]["properties"]["cardinality"]) == len(pos2)
    for b, want in zip(blobs, (pos1, pos2)):
        ser = PF.read_blob(full, b["offset"], b["length"])
        got = DV.deserialize_positions(ser)
        assert np.array_equal(got, want)


def test_puffin_blob_crc_and_length_verified(tmpdir):
    pos = np.arange(100, dtype=np.uint64)
    rel, metas = PF.write_dv_puffin(
        str(tmpdir), [("/d/a.parquet", DV.serialize_positions(pos), 100)], 1, 1
    )
    full = os.path.join(str(tmpdir), rel)
    raw = bytearray(open(full, "rb").read())
    off = metas[0]["offset"]
    raw[off + 10] ^= 0xFF  # flip a bitmap byte
    open(full, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC-32C"):
        PF.read_blob(full, metas[0]["offset"], metas[0]["length"])


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert PF.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert PF.crc32c(b"123456789") == 0xE3069283  # the canonical check value


# -- merge-on-read-dv lifecycle ---------------------------------------------


def test_dv_delete_writes_puffin_not_data(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path)
    before = sorted(glob.glob(os.path.join(path, "data", "*.parquet")))
    r = IC.delete_from_iceberg(spark, path, "id % 4 = 0", strategy="merge-on-read-dv")
    assert r["deleted_rows"] == 2_500 and r["delete_files"] >= 1
    assert sorted(glob.glob(os.path.join(path, "data", "*.parquet"))) == before
    assert len(_puffins(path)) == 1
    got = IC.read_iceberg(spark, path)
    assert got.count() == 7_500 and got.filter("id % 4 = 0").count() == 0
    # format-version bumped on first DV commit
    assert IC._read_metadata(path)[1]["format-version"] == 3


def test_second_dv_supersedes_and_unions(spark, tmpdir):
    """The spec's one-DV-per-data-file invariant: a second DV delete on the
    same files writes bitmaps containing the UNION and drops the old
    entries from the delete manifests."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, files=3)
    IC.delete_from_iceberg(spark, path, "id % 5 = 0", strategy="merge-on-read-dv")
    IC.delete_from_iceberg(spark, path, "id % 7 = 0", strategy="merge-on-read-dv")
    want = 10_000 - sum(1 for i in range(10_000) if i % 5 == 0 or i % 7 == 0)
    assert IC.read_iceberg(spark, path).count() == want
    _, dels, _ = IC._split_live_entries(path, IC._read_metadata(path)[1])
    dv = [d for d in dels if IC._is_dv_entry(d)]
    assert len(dv) == len(dels) == 3  # exactly one live DV per data file
    # every live DV's cardinality equals the union for its target file
    for d in dv:
        ser = PF.read_blob(
            IC._abs_file(path, d["file_path"]),
            int(d["content_offset"]),
            int(d["content_size_in_bytes"]),
        )
        assert len(DV.deserialize_positions(ser)) == d["record_count"]


def test_dv_delete_is_idempotent_on_deleted_rows(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=1000, files=1)
    r1 = IC.delete_from_iceberg(spark, path, "id < 200", strategy="merge-on-read-dv")
    r2 = IC.delete_from_iceberg(spark, path, "id < 300", strategy="merge-on-read-dv")
    assert r1["deleted_rows"] == 200 and r2["deleted_rows"] == 100
    assert IC.read_iceberg(spark, path).count() == 700


def test_dv_mixes_with_v2_parquet_position_deletes(spark, tmpdir):
    """A v2 merge-on-read table can add DVs: both encodings apply in the
    same scan anti-join, and the DV probe never re-records rows the v2
    deletes already masked."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path)
    IC.delete_from_iceberg(spark, path, "id % 4 = 0", strategy="merge-on-read")
    r = IC.delete_from_iceberg(spark, path, "id % 6 = 0", strategy="merge-on-read-dv")
    # ids hit by BOTH predicates (12k) are already deleted -> not re-counted
    assert r["deleted_rows"] == sum(
        1 for i in range(10_000) if i % 6 == 0 and i % 4 != 0
    )
    want = 10_000 - sum(1 for i in range(10_000) if i % 4 == 0 or i % 6 == 0)
    assert IC.read_iceberg(spark, path).count() == want


def test_dv_with_equality_deletes_and_sequence_rules(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=1000, files=1)
    IC.equality_delete_iceberg(
        spark, path, spark.createDataFrame([(3,), (7,)], "id long")
    )
    IC.delete_from_iceberg(spark, path, "id >= 990", strategy="merge-on-read-dv")
    got = IC.read_iceberg(spark, path)
    assert got.count() == 1000 - 2 - 10
    assert got.filter("id IN (3, 7)").count() == 0


def test_dv_read_resolves_targets_from_metadata_only(spark, tmpdir):
    """The v3 win over v2 parquet deletes: plan-time target resolution
    opens NO delete file (referenced_data_file is in the manifest)."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path)
    IC.delete_from_iceberg(spark, path, "id % 3 = 0", strategy="merge-on-read-dv")
    _, dels, _ = IC._split_live_entries(path, IC._read_metadata(path)[1])
    targets = IC._delete_target_files(spark, path, dels)
    data_files = {
        IC._abs_file(path, d["file_path"])
        for d in IC._split_live_entries(path, IC._read_metadata(path)[1])[0]
    }
    assert targets == data_files  # every data file has matches for %3


def test_dv_time_travel_optimize_and_expire(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path)
    IC.delete_from_iceberg(spark, path, "grp = 0", strategy="merge-on-read-dv")
    meta = IC._read_metadata(path)[1]
    pre = meta["snapshots"][0]["snapshot-id"]
    assert IC.read_iceberg(spark, path, snapshot_id=pre).count() == 10_000
    assert IC.read_iceberg(spark, path).count() == 9_000
    # OPTIMIZE folds DVs into rewritten data files and drops them
    IC.optimize_iceberg(spark, path)
    _, dels, _ = IC._split_live_entries(path, IC._read_metadata(path)[1])
    assert not dels
    assert IC.read_iceberg(spark, path).count() == 9_000
    # expiring pre-optimize snapshots reaps the now-unreferenced puffin
    assert _puffins(path)
    IC.expire_snapshots(path, keep_last=1)
    assert not _puffins(path)
    assert IC.read_iceberg(spark, path).count() == 9_000


def test_dv_cow_dml_materializes_deletes(spark, tmpdir):
    """Copy-on-write DML on a DV table rewrites target files WITH the DV
    applied — dropped delete manifests must not resurrect rows."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=1000, files=1)
    IC.delete_from_iceberg(spark, path, "id < 100", strategy="merge-on-read-dv")
    IC.delete_from_iceberg(spark, path, "id >= 900", strategy="copy-on-write")
    got = IC.read_iceberg(spark, path)
    assert got.count() == 800
    assert got.filter("id < 100 OR id >= 900").count() == 0
    _, dels, _ = IC._split_live_entries(path, IC._read_metadata(path)[1])
    assert not dels  # COW materialized and dropped them


def test_dv_change_feed_surfaces_row_deletes(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=1000, files=1)
    meta = IC._read_metadata(path)[1]
    since = meta["snapshots"][-1]["snapshot-id"]
    IC.delete_from_iceberg(spark, path, "id < 50", strategy="merge-on-read-dv")
    ch = IC.read_iceberg_changes(spark, path, since)
    dels = ch.filter("_change_type = 'delete'")
    assert dels.count() == 50
    assert dels.agg(F.max("id")).first()[0] == 49


def test_dv_broadcast_gate_applies(spark, tmpdir, monkeypatch):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=2000, files=1)
    IC.delete_from_iceberg(spark, path, "id % 2 = 0", strategy="merge-on-read-dv")

    def hinted(df):
        return "strategy=broadcast" in df._jdf.queryExecution().optimizedPlan().toString()

    assert hinted(IC.read_iceberg(spark, path))
    monkeypatch.setattr(IC, "DELETE_BROADCAST_MAX", 0)
    over = IC.read_iceberg(spark, path)
    assert not hinted(over)
    assert over.count() == 1000


def test_v3_tables_with_unimplemented_defaults_refused(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=10, files=1)
    v, meta = IC._read_metadata(path)
    meta = json.loads(json.dumps(meta))
    meta["format-version"] = 3
    meta["schemas"][meta["current-schema-id"]]["fields"][0]["initial-default"] = 5
    with open(os.path.join(IC._meta_dir(path), f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(IC._hint_file(path), "w") as fh:
        fh.write(str(v + 1))
    with pytest.raises(RuntimeError, match="default"):
        IC.read_iceberg(spark, path)


def test_dv_blob_bytes_are_delta_compatible():
    """The harmonized serialization: an Iceberg DV blob's magic+vector is
    byte-identical to Delta's RoaringBitmapArray form — dv.py decodes it
    with no format branch."""
    pos = np.array([1, 2, 3, 70000, (1 << 33) + 5], dtype=np.uint64)
    ser = DV.serialize_positions(pos)
    blob = PF.dv_blob_bytes(ser)
    (ln,) = struct.unpack_from(">i", blob, 0)
    assert blob[4 : 4 + ln] == ser
    assert struct.unpack_from("<i", ser, 0)[0] == DV.DV_MAGIC


def test_pruned_scans_skip_unrelated_dv_blobs(spark, tmpdir):
    """A planner-pruned scan must not load DV blobs aimed at pruned-away
    files: targets resolve from the manifest, so the filter is
    metadata-only (the v3 advantage over v2 parquet deletes)."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=4000, files=4)
    IC.delete_from_iceberg(spark, path, "id % 2 = 0", strategy="merge-on-read-dv")
    _, meta = IC._read_metadata(path)
    data_entries, dels, partitioned = IC._split_live_entries(path, meta)
    one_file = [IC._abs_file(path, data_entries[0]["file_path"])]
    schema = IC.iceberg_to_schema(meta["schemas"][meta["current-schema-id"]])
    loaded = []
    orig = IC._dv_positions_frame

    def spy(spark_, path_, dv_entries):
        loaded.extend(dv_entries)
        return orig(spark_, path_, dv_entries)

    IC._dv_positions_frame, saved = spy, orig
    try:
        got = IC._scan_with_deletes(spark, path, schema, partitioned, one_file, dels)
        n = got.count()
    finally:
        IC._dv_positions_frame = saved
    assert len(loaded) == 1  # only the scanned file's DV, not all 4
    assert loaded[0]["referenced_data_file"] == one_file[0]
    import pyarrow.parquet as pq

    file_rows = pq.ParquetFile(one_file[0]).metadata.num_rows
    assert n == file_rows - loaded[0]["record_count"]


def test_scoped_optimize_materializes_dvs(spark, tmpdir):
    """OPTIMIZE WHERE on a DV table: DV target files are forced into the
    rewrite (targets resolve from metadata) so dropping the delete
    manifests never resurrects rows."""
    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=10_000, files=4)
    IC.delete_from_iceberg(spark, path, "id % 3 = 0", strategy="merge-on-read-dv")
    r = IC.optimize_iceberg(spark, path, where=[("id", "<", 100_000)])
    assert r["purged_delete_files"] == 4
    got = IC.read_iceberg(spark, path)
    assert got.count() == 10_000 - 3_334
    assert got.filter("id % 3 = 0").count() == 0
    _, dels, _ = IC._split_live_entries(path, IC._read_metadata(path)[1])
    assert not dels


def test_lost_dv_commit_cleans_all_staged_metadata(spark, tmpdir, monkeypatch):
    """A DV commit losing the optimistic race must remove EVERYTHING it
    staged: the puffin file, its delete manifest, the manifest list, AND
    (when superseding) the consolidated surviving-deletes manifest."""
    import glob as _glob

    from lakehouse_loader_spark.sinks.delta import ConcurrentModificationError

    path = os.path.join(tmpdir, "ice")
    _table(spark, path, n=1000, files=1)
    IC.delete_from_iceberg(spark, path, "id < 10", strategy="merge-on-read-dv")
    meta_before = sorted(_glob.glob(os.path.join(path, "metadata", "*")))
    puffins_before = set(_puffins(path))

    real_write_list = IC._write_manifest_list

    def steal_and_write(path_, snapshot_id, manifests, seq):
        # simulate a concurrent winner landing v(N+1) just before our commit
        v = IC._read_version(path)
        target = os.path.join(IC._meta_dir(path), f"v{v + 1}.metadata.json")
        if not os.path.exists(target):
            with open(target, "w") as fh:
                fh.write("{}")
        return real_write_list(path_, snapshot_id, manifests, seq)

    monkeypatch.setattr(IC, "_write_manifest_list", steal_and_write)
    with pytest.raises(ConcurrentModificationError):
        IC.delete_from_iceberg(spark, path, "id < 20", strategy="merge-on-read-dv")
    monkeypatch.undo()
    os.remove(sorted(_glob.glob(os.path.join(path, "metadata", "v*.metadata.json")))[-1])
    # no staged litter beyond the pre-race state
    assert set(_puffins(path)) == puffins_before
    assert sorted(_glob.glob(os.path.join(path, "metadata", "*"))) == meta_before
