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
surviving rows' files and positions never change; rewriting ops (OPTIMIZE,
CoW DML, MERGE, MOR UPDATE) preserve ids by materializing the resolved
values into the replacement files; branch appends mint fresh ranges from
the same table-wide cursor (publication is fast-forward-only).

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


def test_rewriting_ops_preserve_ids(spark, tmpdir):
    """OPTIMIZE / CoW DELETE / UPDATE / MERGE preserve row ids (spec v3:
    a rewrite materializes the resolved ids into the replacement files).
    The positive DML matrix lives in TestLineageDml below."""
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    pre = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    IC.optimize_iceberg(spark, t)
    IC.delete_from_iceberg(spark, t, "id = 1")
    IC.update_iceberg(spark, t, "id = 2", {"v": "v + 1"})
    IC.merge_iceberg(spark, t, _df(spark, 0, 5), "id")
    post = {r["id"]: r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()}
    # MERGE re-inserted the deleted id=1 with a FRESH row id; everyone else stable
    assert len(post) == 100
    assert all(pre[k] == v for k, v in post.items() if k != 1)
    assert post[1] >= 100


def test_branch_append_mints_fresh_range_publish_keeps_it(spark, tmpdir):
    """WAP with lineage (spec v3): a branch commit draws its first-row-id
    range from the SAME table-wide next-row-id cursor as main-line
    commits, so branch and main ranges never overlap; publish_branch is a
    pure fast-forward, so the minted ids are final at publish time."""
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    snap = IC.append_to_branch(_df(spark, 500), t, "audit")
    _, meta = IC._read_metadata(t)
    # cursor advanced table-wide even though main is untouched
    assert meta["next-row-id"] == 200
    assert meta["current-snapshot-id"] != snap
    assert IC.read_iceberg(spark, t).count() == 100  # main readers unaffected
    # the branch head's lineage: original rows 0-99 + branch rows 100-199
    out = IC.read_iceberg_with_row_ids(spark, t, snapshot_id=snap)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))
    # a MAIN append while the branch is unpublished takes the NEXT range
    IC.write_iceberg(_df(spark, 300), t, append=True)
    main = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in main.collect()) == list(range(100)) + list(
        range(200, 300)
    )


def test_branch_append_lineage_publish_flow(spark, tmpdir):
    t = _table(spark, tmpdir)
    IC.enable_row_lineage_iceberg(t)
    snap = IC.append_to_branch(_df(spark, 500), t, "audit")
    IC.publish_branch(t, "audit")
    _, meta = IC._read_metadata(t)
    assert meta["current-snapshot-id"] == snap
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))


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


class TestLineageDml:
    """Row lineage through the full DML matrix (the format twin of
    tests/test_domain_row_tracking.py's Delta coverage, added r10/r11):
    OPTIMIZE, CoW UPDATE/DELETE, MERGE, MOR UPDATE preserve stable ids;
    matched rows' ``_last_updated_sequence_number`` resolves to the
    rewriting commit's sequence number; inserts mint fresh non-overlapping
    ranges; a lost append race re-stamps from the winner's cursor.
    Exercises iceberg.py's ``_cow_iceberg`` rl path, ``_lineage_rewrite_scan``,
    ``optimize_iceberg``, ``merge_iceberg``, ``_mor_update_iceberg``."""

    @staticmethod
    def _rows(spark, t):
        return {
            r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }

    def test_cow_update_keeps_ids_bumps_matched_last_updated(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        res = IC.update_iceberg(spark, t, "id % 10 = 2", {"v": "v + 1000"})
        assert res["updated_rows"] == 10 and res["rewritten_files"] >= 1
        _, meta = IC._read_metadata(t)
        seq = meta["last-sequence-number"]
        rows = {
            r["id"]: (r["_row_id"], r["_last_updated_sequence_number"], r["v"])
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 100
        for i, (rid, lus, v) in rows.items():
            assert rid == pre[i][0]  # spec v3: UPDATE keeps the row id
            if i % 10 == 2:
                assert lus == seq and v == i * 1.5 + 1000
            else:
                # carried-over rows in the rewritten file keep their
                # original sequence number (physically materialized)
                assert lus == pre[i][1]
        # the DML snapshot's first-row-id is PERSISTED in the metadata
        # json (regression for the set-after-_append_snapshot bug): the
        # rewrite minted no ids, so it equals the pre-op cursor
        snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert snap["first-row-id"] == 100 and meta["next-row-id"] >= 100
        # replacement files physically carry the reserved columns
        import pyarrow.parquet as pq

        data, _, _ = IC._split_live_entries(t, meta)
        mat = [
            d for d in data
            if "_row_id" in pq.read_schema(IC._abs_file(t, d["file_path"])).names
        ]
        assert mat and all(d.get("first_row_id") is not None for d in data)

    def test_cow_delete_preserves_surviving_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        res = IC.delete_from_iceberg(spark, t, "id % 10 = 3")
        assert res["deleted_rows"] == 10 and res["rewritten_files"] >= 1
        post = self._rows(spark, t)
        assert len(post) == 90
        # survivors keep BOTH id and last-updated across the rewrite
        assert all(pre[k] == v for k, v in post.items())

    def test_merge_preserves_matched_ids_mints_insert_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        src = spark.range(95, 105).selectExpr(
            "id", "id % 7 as k", "cast(-1.0 as double) as v"
        )
        res = IC.merge_iceberg(spark, t, src, "id")
        assert res["updated"] == 5 and res["inserted"] == 5
        _, meta = IC._read_metadata(t)
        seq = meta["last-sequence-number"]
        rows = {
            r["id"]: (r["_row_id"], r["_last_updated_sequence_number"], r["v"])
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 105
        assert len({rid for rid, _, _ in rows.values()}) == 105  # all unique
        for i in range(95):  # untouched rows: id AND last-updated stable
            assert rows[i][:2] == pre[i]
        for i in range(95, 100):  # matched: id kept, last-updated bumped
            assert rows[i][0] == pre[i][0]
            assert rows[i][1] == seq and rows[i][2] == -1.0
        for i in range(100, 105):  # inserted: fresh ids past the old mark
            assert rows[i][0] >= 100 and rows[i][1] == seq
        assert meta["next-row-id"] == max(rid for rid, _, _ in rows.values()) + 1

    def test_merge_min_id_rule_on_multi_row_keys(self, spark, tmpdir):
        # key k matches SEVERAL target rows: the single replacement row
        # inherits the smallest matched id; the other matched ids retire
        # with their rows (same as a delete)
        t = os.path.join(str(tmpdir), "mk")
        IC.write_iceberg(
            spark.range(9).selectExpr("id", "id % 3 as k", "cast(id as double) as v"),
            t, overwrite=True,
        )
        IC.enable_row_lineage_iceberg(t)
        by_k = {}
        for r in IC.read_iceberg_with_row_ids(spark, t).collect():
            by_k.setdefault(r["k"], []).append(r["_row_id"])
        src = spark.createDataFrame([(100, 0, -1.0), (101, 1, -1.0)], "id long, k long, v double")
        IC.merge_iceberg(spark, t, src, "k")
        post = {
            r["k"]: r["_row_id"]
            for r in IC.read_iceberg_with_row_ids(spark, t).where("v = -1.0").collect()
        }
        assert post[0] == min(by_k[0]) and post[1] == min(by_k[1])
        # k=2 rows untouched, and no id is duplicated anywhere
        ids = [r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()]
        assert len(ids) == len(set(ids)) == 5
        assert set(by_k[2]) < set(ids)

    def test_optimize_preserves_ids_and_purges_deletes(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        for lo in (100, 200, 300):
            IC.write_iceberg(_df(spark, lo), t, append=True)
        IC.delete_from_iceberg(spark, t, "id % 10 = 7", strategy="merge-on-read")
        IC.delete_from_iceberg(spark, t, "id % 10 = 8", strategy="merge-on-read-dv")
        pre = self._rows(spark, t)
        files_before = len(IC._split_live_entries(t, IC._read_metadata(t)[1])[0])
        r = IC.optimize_iceberg(spark, t)
        assert r["rewritten_files"] == files_before
        _, meta = IC._read_metadata(t)
        data, deletes, _ = IC._split_live_entries(t, meta)
        assert not deletes  # compaction folded both delete encodings away
        assert len(data) < files_before
        post = self._rows(spark, t)
        assert len(post) == len(pre) == 320
        assert post == pre  # every id AND last-updated stable through compaction

    def test_mor_update_keeps_ids_bumps_matched_last_updated(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        res = IC.update_iceberg(
            spark, t, "id % 10 = 4", {"v": "-2.0"}, strategy="merge-on-read"
        )
        assert res["updated_rows"] == 10 and res["delete_files"] >= 1
        _, meta = IC._read_metadata(t)
        seq = meta["last-sequence-number"]
        rows = {
            r["id"]: (r["_row_id"], r["_last_updated_sequence_number"], r["v"])
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 100
        for i, (rid, lus, v) in rows.items():
            assert rid == pre[i][0]
            if i % 10 == 4:
                assert lus == seq and v == -2.0
            else:
                assert lus == pre[i][1]
        # a later OPTIMIZE folds the position deletes away, ids intact
        IC.optimize_iceberg(spark, t)
        assert self._rows(spark, t) == {k: v[:2] for k, v in rows.items()}

    def test_partitioned_table_dml_lineage(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), "pd")
        IC.write_iceberg(_df(spark), t, overwrite=True, partition_by=["k"])
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        IC.update_iceberg(spark, t, "id % 10 = 5", {"v": "0.0"})
        IC.delete_from_iceberg(spark, t, "id % 10 = 6")
        src = spark.range(98, 103).selectExpr(
            "id", "id % 7 as k", "cast(-3.0 as double) as v"
        )
        IC.merge_iceberg(spark, t, src, "id")
        rows = self._rows(spark, t)
        # 100 - 10 deleted + 3 inserted (98,99 matched; 100-102 new) = 93
        assert len(rows) == 93
        survivors = {k for k in pre if k % 10 != 6} | {100, 101, 102}
        assert set(rows) == survivors
        for k in pre:
            if k in rows and k < 98:
                assert rows[k][0] == pre[k][0]  # ids stable through all three ops
        assert rows[98][0] == pre[98][0] and rows[99][0] == pre[99][0]  # matched keep ids
        ids = [rid for rid, _ in rows.values()]
        assert len(ids) == len(set(ids))
        # partition pruning still works on the plain read (k = id % 7 on
        # every row, original and merged alike)
        expect_k3 = len([i for i in survivors if i % 7 == 3])
        assert IC.read_iceberg(spark, t).where("k = 3").count() == expect_k3

    def test_equality_deletes_preserve_ids_cow_refuses(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        pre = self._rows(spark, t)
        IC.equality_delete_iceberg(
            spark, t, spark.createDataFrame([(3,), (7,)], "id long")
        )
        post = self._rows(spark, t)
        assert len(post) == 98 and all(pre[k] == v for k, v in post.items())
        # CoW over unresolved equality deletes stays refused (lineage or not):
        # the rewrite cannot prove which masked rows a dropped eq-manifest hid
        with pytest.raises(ValueError, match="equality"):
            IC.update_iceberg(spark, t, "id = 1", {"v": "0.0"})

    def test_append_retry_restamps_from_winner_cursor(self, spark, tmpdir, monkeypatch):
        """A lost optimistic append race on a lineage table re-stamps the
        manifest's first_row_id from the WINNER's next-row-id cursor — the
        two commits' ranges never overlap (iceberg.py retry loop)."""
        t = _table(spark, tmpdir)
        IC.enable_row_lineage_iceberg(t)
        orig = IC._write_manifest_list
        state = {"fired": False}

        def hijack(*args, **kw):
            if not state["fired"]:
                state["fired"] = True
                # the winner lands between the loser's manifest write and
                # its commit, consuming ids 100-199
                IC.write_iceberg(_df(spark, 200), t, append=True)
            return orig(*args, **kw)

        monkeypatch.setattr(IC, "_write_manifest_list", hijack)
        IC.write_iceberg(_df(spark, 100), t, append=True)  # the loser
        monkeypatch.undo()
        assert state["fired"]
        _, meta = IC._read_metadata(t)
        assert meta["next-row-id"] == 300
        out = IC.read_iceberg_with_row_ids(spark, t)
        assert sorted(r["_row_id"] for r in out.collect()) == list(range(300))
        # the loser's (current) snapshot re-stamped PAST the winner's range
        snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        assert snap["first-row-id"] == 200
        # per-file spans are disjoint and exactly tile [0, 300)
        data, _, _ = IC._split_live_entries(t, meta)
        spans = sorted((d["first_row_id"], d["record_count"]) for d in data)
        cursor = 0
        for first, n in spans:
            assert first == cursor
            cursor += n
        assert cursor == 300


def test_enable_refuses_with_unpublished_branch(spark, tmpdir):
    """Enablement backfills only the MAIN snapshot; an unpublished branch
    would surface id-less files at publish time, so it refuses up front
    (publish or drop the ref first)."""
    t = _table(spark, tmpdir)
    IC.append_to_branch(_df(spark, 500), t, "audit")
    with pytest.raises(ValueError, match="unpublished branch"):
        IC.enable_row_lineage_iceberg(t)
    IC.publish_branch(t, "audit")
    IC.enable_row_lineage_iceberg(t)  # fine once published
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))


def test_rollback_restores_ids_with_rows(spark, tmpdir):
    """The Iceberg twin of Delta's restore test: rollback re-points at
    the target's manifest list, so deleted rows come back WITH their
    original ids and last-updated values; the next-row-id cursor never
    rewinds; rolling back past enablement is refused."""
    t = _table(spark, tmpdir)
    _, meta0 = IC._read_metadata(t)
    snap_pre_enable = meta0["current-snapshot-id"]
    IC.enable_row_lineage_iceberg(t)
    pre = TestLineageDml._rows(spark, t)
    _, meta = IC._read_metadata(t)
    snap_enabled = meta["current-snapshot-id"]
    IC.delete_from_iceberg(spark, t, "id % 10 = 3")
    IC.update_iceberg(spark, t, "id = 4", {"v": "0.0"})
    cursor_before = IC._read_metadata(t)[1]["next-row-id"]
    IC.rollback_iceberg(t, snap_enabled)
    post = TestLineageDml._rows(spark, t)
    assert post == pre  # rows, ids AND last-updated all back
    _, meta2 = IC._read_metadata(t)
    assert meta2["next-row-id"] >= cursor_before  # cursor is monotone
    with pytest.raises(ValueError, match="predates row-lineage"):
        IC.rollback_iceberg(t, snap_pre_enable)


def test_enable_allows_branch_at_published_ancestor(spark, tmpdir):
    """A branch whose head is an ANCESTOR of main is published history,
    not divergence — it holds no files outside main's lineage, so it must
    not block enablement (over-conservative refusal, r11 advice).  A
    lineage read AT the stale head still refuses on its own (the ancestor
    snapshot's manifests carry no first_row_id)."""
    t = _table(spark, tmpdir)
    first_snap = IC.snapshot_ids(t)[0]
    IC.write_iceberg(_df(spark, 100), t, append=True)
    IC.create_ref(t, "old-head", snapshot_id=first_snap, ref_type="branch")

    IC.enable_row_lineage_iceberg(t)  # must not refuse
    out = IC.read_iceberg_with_row_ids(spark, t)
    assert sorted(r["_row_id"] for r in out.collect()) == list(range(200))
    # the stale branch head predates enablement: lineage read there refuses
    with pytest.raises(ValueError, match="first_row_id|missing"):
        IC.read_iceberg_with_row_ids(spark, t, snapshot_id=first_snap)
    # a DIVERGED branch (head off the main ancestry) still blocks
    t2 = _table(spark, tmpdir, name="t2")
    IC.append_to_branch(_df(spark, 500), t2, "audit")
    with pytest.raises(ValueError, match="unpublished branch"):
        IC.enable_row_lineage_iceberg(t2)
