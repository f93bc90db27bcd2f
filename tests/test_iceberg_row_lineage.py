"""Iceberg row lineage (spec v3 "Row Lineage") — the format twin of the
Delta sink's row tracking (tests/test_domain_row_tracking.py).

Model: table metadata carries ``next-row-id``; each snapshot records its
``first-row-id``; every data file carries an explicit ``first_row_id``
(manifest field id 142, next to the v3 DV fields 143-145 already written)
so a row's id is ``first_row_id + position``.  Enablement is one
metadata-only commit (the rewrite_manifests shape: status-EXISTING entries
keep their original sequence numbers).  Appends assign fresh ranges inside
the commit retry loop — a lost optimistic race re-reads the winner's
cursor and re-stamps the manifest, so ranges never overlap.  Merge-on-read
deletes (position deletes AND deletion vectors) preserve ids because
surviving rows' files and positions never change; rewriting ops refuse.

Reference scope: the reference writes plain v2 appends
(src/iceberg_destination.rs); row lineage is an engine extension over the
public spec (iceberg.apache.org/spec/#row-lineage).
"""

import os

import pytest

import lakehouse_loader_spark.sinks.iceberg as IC

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, lo=0, n=100):
    return spark.range(lo, lo + n).selectExpr(
        "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
    )


def _table(spark, tmpdir, name="t"):
    t = os.path.join(str(tmpdir), name)
    IC.write_iceberg(_df(spark), t, overwrite=True)
    return t


def test_backfill_assigns_consecutive_ranges(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.write_iceberg(_df(spark, 100), t, append=True)
    IC.enable_row_lineage_iceberg(t)
    _, meta = IC._read_metadata(t)
    assert meta["next-row-id"] == 200
    out = IC.read_iceberg_with_row_ids(spark, t)
    rows = out.collect()
    assert sorted(r["_row_id"] for r in rows) == list(range(200))
    # every row id unique, every file's range matches its record count
    data, _, _ = IC._split_live_entries(t, meta)
    spans = sorted((d["first_row_id"], d["record_count"]) for d in data)
    cursor = 0
    for first, n in spans:
        assert first == cursor
        cursor += n
    # idempotent
    v = IC._read_metadata(t)[0]
    IC.enable_row_lineage_iceberg(t)
    assert IC._read_metadata(t)[0] == v


def test_append_mints_fresh_range_and_snapshot_first_row_id(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    IC.write_iceberg(_df(spark, 100), t, append=True)
    _, meta = IC._read_metadata(t)
    assert meta["next-row-id"] == 200
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert snap["first-row-id"] == 100
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))
    # _last_updated_sequence_number distinguishes the two commits
    seqs = {r["_row_id"]: r["_last_updated_sequence_number"] for r in out.collect()}
    assert len({seqs[0], seqs[199]}) == 2


def test_overwrite_never_reuses_ids(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    IC.write_iceberg(_df(spark), t, overwrite=True)
    _, meta = IC._read_metadata(t)
    assert meta["next-row-id"] == 200  # cursor advanced past the old rows
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(100, 200))


def test_mor_deletes_preserve_ids_both_encodings(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    pre = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    IC.delete_from_iceberg(spark, t, "id % 10 = 3", strategy="merge-on-read")
    IC.delete_from_iceberg(spark, t, "id % 10 = 4", strategy="merge-on-read-dv")
    post = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    assert len(post) == 80
    assert all(pre[k] == v for k, v in post.items())


def test_rewriting_ops_refuse(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    for op in [
        lambda: IC.optimize_iceberg(spark, t),
        lambda: IC.delete_from_iceberg(spark, t, "id = 1"),
        lambda: IC.update_iceberg(spark, t, "id = 1", {"v": "v + 1"}),
        lambda: IC.merge_iceberg(spark, t, _df(spark, 0, 5), "id"),
        lambda: IC.append_to_branch(_df(spark, 900), t, "audit"),
    ]:
        with pytest.raises(ValueError, match="row-lineage"):
            op()


def test_rewrite_manifests_keeps_ids(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.write_iceberg(_df(spark, 100), t, append=True)
    IC.enable_row_lineage_iceberg(t)
    IC.write_iceberg(_df(spark, 200), t, append=True)
    pre = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    r = IC.rewrite_manifests(t)
    assert r["manifests_after"] < r["manifests_before"]
    post = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    assert post == pre


def test_time_travel_and_plain_reads_unaffected(spark, tmpdir):
    t = _table(spark, tmpdir)
    _, meta = IC._read_metadata(t)
    snap0 = meta["current-snapshot-id"]
    IC.enable_row_lineage_iceberg(t)
    IC.write_iceberg(_df(spark, 100), t, append=True)
    assert IC.read_iceberg(spark, t).count() == 200
    assert IC.read_iceberg(spark, t, snapshot_id=snap0).count() == 100


def test_empty_table_enablement(spark, tmpdir):
    t = os.path.join(str(tmpdir), "e")
    IC.write_iceberg(_df(spark).limit(0), t, overwrite=True)
    IC.enable_row_lineage_iceberg(t)
    _, meta = IC._read_metadata(t)
    assert meta["next-row-id"] == 0
    IC.write_iceberg(_df(spark, 0, 10), t, append=True)
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(10))


def test_read_refuses_without_lineage(spark, tmpdir):
    t = _table(spark, tmpdir)
    with pytest.raises(ValueError, match="not enabled"):
        IC.read_iceberg_with_row_ids(spark, t)


def test_partitioned_table_lineage(spark, tmpdir):
    t = os.path.join(str(tmpdir), "p")
    IC.write_iceberg(_df(spark), t, overwrite=True, partition_by=["k"])
    IC.enable_row_lineage_iceberg(t)
    IC.write_iceberg(_df(spark, 100), t, append=True)
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))
    # partition pruning still works on the plain read
    assert IC.read_iceberg(spark, t).where("k = 3").count() == 29
