"""Merge-on-read positional deletes for the Iceberg sink (spec v2
content=1 delete files): write-side commits, read-side anti-join
application, copy-on-write/compaction interplay, and the change feed."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks.delta import ConcurrentModificationError


def _data_files(path):
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "data", "**", "*.parquet"), recursive=True)
        if "delete-" not in os.path.basename(f)
    )


def _delete_files(path):
    return sorted(glob.glob(os.path.join(path, "data", "delete-*.parquet")))


def _two_file_table(spark, path):
    lo = spark.range(0, 50).select("id", (F.col("id") % 2 == 0).alias("flag"))
    hi = spark.range(1000, 1050).select("id", F.lit(None).cast("boolean").alias("flag"))
    IC.write_iceberg(lo.coalesce(1), path)
    IC.write_iceberg(hi.coalesce(1), path, append=True)


def test_mor_delete_writes_positions_not_data(spark, tmpdir):
    """Merge-on-read DELETE: no data file is rewritten — a position-delete
    file appears instead — and reads drop exactly the matched rows.  Time
    travel to the pre-delete snapshot still sees everything."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    before = _data_files(path)
    pre = IC.snapshot_ids(path)[-1]

    res = IC.delete_from_iceberg(
        spark, path, "flag = true AND id < 20", strategy="merge-on-read"
    )
    assert res["deleted_rows"] == 10
    assert res["delete_files"] >= 1 and res["data_files"] == 2
    assert _data_files(path) == before  # untouched bytes
    assert _delete_files(path)

    back = IC.read_iceberg(spark, path)
    assert back.count() == 90
    assert back.filter("flag = true AND id < 20").count() == 0
    assert back.filter("id >= 1000").count() == 50
    assert IC.read_iceberg(spark, path, snapshot_id=pre).count() == 100

    snap = [s for s in IC.snapshot_ids(path)][-1]
    _, meta = IC._read_metadata(path)
    summary = [s for s in meta["snapshots"] if s["snapshot-id"] == snap][0]["summary"]
    assert summary["operation"] == "delete"
    assert summary["delete-mode"] == "merge-on-read"


def test_mor_delete_is_idempotent_on_deleted_rows(spark, tmpdir):
    """A second merge-on-read DELETE whose predicate overlaps the first
    must not re-record already-deleted positions (delete-set growth and
    double-counted totals)."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    r1 = IC.delete_from_iceberg(spark, path, "id < 20", strategy="merge-on-read")
    assert r1["deleted_rows"] == 20
    r2 = IC.delete_from_iceberg(spark, path, "id < 30", strategy="merge-on-read")
    assert r2["deleted_rows"] == 10  # only 20..29
    assert IC.read_iceberg(spark, path).count() == 70
    # zero-match delete commits nothing
    snaps = IC.snapshot_ids(path)
    r3 = IC.delete_from_iceberg(spark, path, "id < 30", strategy="merge-on-read")
    assert r3["deleted_rows"] == 0
    assert IC.snapshot_ids(path) == snaps


def test_mor_delete_on_partitioned_table_and_pruned_read(spark, tmpdir):
    path = os.path.join(tmpdir, "icep")
    df = spark.range(0, 60).select("id", (F.col("id") % 3).alias("b"))
    IC.write_iceberg(df, path, partition_by=["b"])
    res = IC.delete_from_iceberg(
        spark, path, "b = 1 AND id < 30", strategy="merge-on-read"
    )
    assert res["deleted_rows"] == 10
    back = IC.read_iceberg(spark, path)
    assert back.count() == 50
    assert back.filter("b = 1").count() == 10
    # prune skips delete files in its candidates and the pruned scan still
    # applies the deletes
    files, total = IC.prune_iceberg_files(path, "b", 1)
    assert files and total >= len(files)
    assert all("delete-" not in f for f in files)
    pruned = IC.read_iceberg_pruned(spark, path, "b", 1)
    assert pruned.count() == 10
    assert pruned.filter("id < 30").count() == 0


def test_optimize_purges_position_deletes(spark, tmpdir):
    """Compaction reads merge-on-read state and commits clean data files:
    the logical rows are unchanged, no delete manifest is carried, and the
    post-compaction snapshot needs no anti-join."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id < 10", strategy="merge-on-read")
    logical = sorted(r.id for r in IC.read_iceberg(spark, path).collect())

    res = IC.optimize_iceberg(spark, path)
    assert res["purged_delete_files"] >= 1
    _, meta = IC._read_metadata(path)
    data, dels, _ = IC._split_live_entries(path, meta)
    assert dels == [] and data
    assert sorted(r.id for r in IC.read_iceberg(spark, path).collect()) == logical


def test_cow_dml_on_mor_table_materializes_deletes(spark, tmpdir):
    """Copy-on-write DELETE/UPDATE over a table carrying position deletes:
    deleted rows never resurrect (delete-target files are forced into the
    rewrite and every delete manifest drops from the new snapshot)."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id < 10", strategy="merge-on-read")

    # COW update touching only the hi file: lo file is a delete target and
    # must be rewritten anyway
    res = IC.update_iceberg(spark, path, "id >= 1040", {"flag": "true"})
    assert res["updated_rows"] == 10
    _, meta = IC._read_metadata(path)
    data, dels, _ = IC._split_live_entries(path, meta)
    assert dels == []
    back = IC.read_iceberg(spark, path)
    assert back.count() == 90  # MOR deletes stayed applied
    assert back.filter("id < 10").count() == 0
    assert back.filter("flag = true AND id >= 1040").count() == 10


def test_merge_on_mor_table_treats_deleted_keys_as_inserts(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id < 5", strategy="merge-on-read")
    source = spark.range(3, 8).select(
        "id", F.lit(True).alias("flag")
    )  # 3,4 deleted → inserts; 5,6,7 live → updates
    res = IC.merge_iceberg(spark, path, source, key="id")
    assert res["updated"] == 3 and res["inserted"] == 2
    _, meta = IC._read_metadata(path)
    _, dels, _ = IC._split_live_entries(path, meta)
    assert dels == []
    back = IC.read_iceberg(spark, path)
    assert back.count() == 97  # 100 - 5 deleted + 2 re-inserted
    assert back.filter("id IN (0, 1, 2)").count() == 0
    assert back.filter("flag = true AND id IN (3, 4, 5, 6, 7)").count() == 5


def test_change_feed_surfaces_mor_deletes_as_row_deletes(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    first = IC.snapshot_ids(path)[-1]
    IC.delete_from_iceberg(spark, path, "id >= 1045", strategy="merge-on-read")
    ch = IC.read_iceberg_changes(spark, path, since_snapshot_id=first)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r.id for r in rows) == [1045, 1046, 1047, 1048, 1049]
    # appends reader refuses the non-append-only range
    with pytest.raises(ConcurrentModificationError):
        IC.read_iceberg_appends(spark, path, since_snapshot_id=first)


def test_mor_delete_then_append_then_changes(spark, tmpdir):
    """Sequence MOR-delete → append: the append's change rows are pure
    inserts (carried delete files don't leak into the diff), and the final
    read applies deletes only to their target files."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    base = IC.snapshot_ids(path)[-1]
    IC.delete_from_iceberg(spark, path, "id < 3", strategy="merge-on-read")
    extra = spark.range(2000, 2010).select("id", F.lit(False).alias("flag"))
    IC.write_iceberg(extra.coalesce(1), path, append=True)

    back = IC.read_iceberg(spark, path)
    assert back.count() == 107
    assert back.filter("id < 3").count() == 0

    ch = IC.read_iceberg_changes(spark, path, since_snapshot_id=base).collect()
    dels = sorted(r.id for r in ch if r["_change_type"] == "delete")
    ins = sorted(r.id for r in ch if r["_change_type"] == "insert")
    assert dels == [0, 1, 2]
    assert ins == list(range(2000, 2010))


def test_unknown_delete_strategy_rejected(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    with pytest.raises(ValueError, match="unknown delete strategy"):
        IC.delete_from_iceberg(spark, path, "id < 5", strategy="mor")


def test_rollback_past_mor_delete_resurrects_rows(spark, tmpdir):
    """Rolling back to a pre-delete snapshot drops the delete files from
    the current state (pure metadata): the rows read again, and the change
    feed shows the rollback as row-level inserts."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    pre = IC.snapshot_ids(path)[-1]
    IC.delete_from_iceberg(spark, path, "id < 4", strategy="merge-on-read")
    post = IC.snapshot_ids(path)[-1]
    assert IC.read_iceberg(spark, path).count() == 96

    IC.rollback_iceberg(path, pre)
    assert IC.read_iceberg(spark, path).count() == 100
    ch = IC.read_iceberg_changes(spark, path, since_snapshot_id=post).collect()
    assert {r["_change_type"] for r in ch} == {"insert"}
    assert sorted(r.id for r in ch) == [0, 1, 2, 3]


def test_cli_mor_delete_subcommand(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main

    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    before = _data_files(path)
    do_main(
        ["delete-iceberg", path, "--where", "id >= 1045", "--strategy", "merge-on-read"]
    )
    assert _data_files(path) == before
    assert _delete_files(path)
    assert IC.read_iceberg(spark, path).count() == 95


def test_mor_equals_cow_for_any_predicate(spark, tmpdir):
    """Strategy equivalence: for a set of predicates (null-valued, empty,
    full-file, cross-file), merge-on-read and copy-on-write leave the SAME
    logical table — only the physical layout differs."""
    preds = [
        "flag = true AND id < 20",   # partial, one file
        "id >= 1000",                # an entire file
        "flag IS NULL",              # null semantics
        "id % 7 = 0",                # scattered across files
    ]
    for i, pred in enumerate(preds):
        mor = os.path.join(tmpdir, f"mor{i}")
        cow = os.path.join(tmpdir, f"cow{i}")
        _two_file_table(spark, mor)
        _two_file_table(spark, cow)
        IC.delete_from_iceberg(spark, mor, pred, strategy="merge-on-read")
        IC.delete_from_iceberg(spark, cow, pred, strategy="copy-on-write")
        a = sorted(map(tuple, IC.read_iceberg(spark, mor).collect()))
        b = sorted(map(tuple, IC.read_iceberg(spark, cow).collect()))
        assert a == b, pred


def test_iceberg_history_lists_operations_newest_first(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id < 3", strategy="merge-on-read")
    hist = IC.iceberg_history(path)
    assert [h["operation"] for h in hist] == ["delete", "append", "overwrite"]
    assert hist[0]["is_current"] and not hist[1]["is_current"]
    assert hist[0]["summary"]["delete-mode"] == "merge-on-read"
    assert hist[0]["sequence_number"] > hist[1]["sequence_number"]


def test_refs_tag_pin_and_expire_interplay(spark, tmpdir):
    """Tags/branches: a ref time-travels by name, pins its snapshot
    against expire_snapshots, and dropping it makes the snapshot
    expirable again."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    first = IC.snapshot_ids(path)[0]
    IC.create_ref(path, "v1.0", snapshot_id=first, ref_type="tag")
    IC.write_iceberg(
        spark.range(3000, 3010).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        append=True,
    )
    assert IC.resolve_ref(path, "v1.0") == first
    assert IC.read_iceberg(spark, path, ref="v1.0").count() == 50
    assert IC.read_iceberg(spark, path).count() == 110

    # expire keeps the tagged snapshot alive
    IC.expire_snapshots(path, keep_last=1)
    assert first in IC.snapshot_ids(path)
    assert IC.read_iceberg(spark, path, ref="v1.0").count() == 50

    with pytest.raises(ValueError, match="at most one"):
        IC.read_iceberg(spark, path, snapshot_id=first, ref="v1.0")
    with pytest.raises(ValueError, match="no ref"):
        IC.read_iceberg(spark, path, ref="nope")
    with pytest.raises(ValueError, match="ref_type"):
        IC.create_ref(path, "x", ref_type="bogus")

    # dropping the tag releases the pin
    IC.drop_ref(path, "v1.0")
    assert IC.list_refs(path) == {}
    IC.expire_snapshots(path, keep_last=1)
    assert first not in IC.snapshot_ids(path)


def test_cli_ref_subcommands(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main

    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    do_main(["tag-iceberg", path, "rel-1"])
    assert "rel-1" in IC.list_refs(path)
    assert IC.read_iceberg(spark, path, ref="rel-1").count() == 100
    do_main(["drop-ref-iceberg", path, "rel-1"])
    assert IC.list_refs(path) == {}


def test_write_audit_publish_flow(spark, tmpdir):
    """WAP: a branch append is invisible on the main line until audited
    and published; publishing fast-forwards current (pure metadata) and
    drops the branch; a second branch append stacks on the branch head."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)

    s1 = IC.append_to_branch(
        spark.range(5000, 5020).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    # main line unchanged; branch sees the staged rows
    assert IC.read_iceberg(spark, path).count() == 100
    assert IC.read_iceberg(spark, path, ref="audit").count() == 120
    assert IC.resolve_ref(path, "audit") == s1

    # second staged append stacks on the BRANCH head, not on current
    IC.append_to_branch(
        spark.range(6000, 6005).select("id", F.lit(False).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    assert IC.read_iceberg(spark, path).count() == 100
    assert IC.read_iceberg(spark, path, ref="audit").count() == 125

    # audit with the quality operator, then publish
    from lakehouse_loader_spark.operators.quality import expectations_report

    staged = IC.read_iceberg(spark, path, ref="audit")
    rep = {
        r.rule: r.violations
        for r in expectations_report(staged, {"id_neg": F.col("id") < 0}).collect()
    }
    assert rep == {"id_neg": 0}
    published = IC.publish_branch(path, "audit")
    assert IC.read_iceberg(spark, path).count() == 125
    assert IC.list_refs(path) == {}
    assert published in IC.snapshot_ids(path)

    # guards: publishing a missing branch / appending to a tag
    with pytest.raises(ValueError, match="no branch"):
        IC.publish_branch(path, "audit")
    IC.create_ref(path, "pin", ref_type="tag")
    with pytest.raises(ValueError, match="is a tag"):
        IC.append_to_branch(
            spark.range(1).select("id", F.lit(True).alias("flag")), path, "pin"
        )


def test_binpack_compaction_rewrites_only_small_files(spark, tmpdir):
    """small_file_threshold: small files pack, the big file's BYTES carry
    over untouched, logical rows unchanged; with position deletes, the
    delete-target file rewrites regardless of size and the deletes purge."""
    import glob as _glob

    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 50_000).coalesce(1), path)  # big file
    for lo in (60_000, 60_100, 60_200):  # three tiny appends
        IC.write_iceberg(spark.range(lo, lo + 100).coalesce(1), path, append=True)
    _, meta = IC._read_metadata(path)
    data, _, _ = IC._split_live_entries(path, meta)
    big = max(data, key=lambda d: d["file_size_in_bytes"])["file_path"]
    sizes = sorted(d["file_size_in_bytes"] for d in data)
    threshold = sizes[-1]  # everything but the big file is "small"

    res = IC.optimize_iceberg(spark, path, small_file_threshold=threshold)
    assert res["rewritten_files"] == 3 and res["new_files"] >= 1
    _, meta2 = IC._read_metadata(path)
    data2, _, _ = IC._split_live_entries(path, meta2)
    assert big in {d["file_path"] for d in data2}  # carried, not rewritten
    assert len(data2) < len(data)
    assert IC.read_iceberg(spark, path).count() == 50_300

    # nothing small left → no-op, no new snapshot
    snaps = IC.snapshot_ids(path)
    res2 = IC.optimize_iceberg(spark, path, small_file_threshold=threshold)
    assert res2["rewritten_files"] == 0 and IC.snapshot_ids(path) == snaps

    # a MOR delete on the BIG file forces it into the binpack rewrite
    IC.delete_from_iceberg(spark, path, "id < 10", strategy="merge-on-read")
    res3 = IC.optimize_iceberg(spark, path, small_file_threshold=threshold)
    assert res3["purged_delete_files"] >= 1
    _, meta3 = IC._read_metadata(path)
    data3, dels3, _ = IC._split_live_entries(path, meta3)
    assert dels3 == []
    assert IC.read_iceberg(spark, path).count() == 50_290


def test_binpack_parameter_validation(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    with pytest.raises(ValueError, match=">= 1 byte"):
        IC.optimize_iceberg(spark, path, small_file_threshold=0)
    with pytest.raises(ValueError, match="don't combine"):
        IC.optimize_iceberg(spark, path, target_partitions=4, small_file_threshold=10)
    with pytest.raises(ValueError, match="table-wide clustering"):
        IC.optimize_iceberg(spark, path, zorder_by=["id"], small_file_threshold=10)
    from lakehouse_loader_spark.sinks import delta as DL

    dp = os.path.join(tmpdir, "dl")
    DL.write_delta(spark.range(10).coalesce(1), dp)
    with pytest.raises(ValueError, match=">= 1 byte"):
        DL.optimize_delta(spark, dp, small_file_threshold=-5)


def test_metadata_inspection_tables(spark, tmpdir):
    """files/snapshots/manifests/refs come back as DataFrames with the
    live state; the Delta twin exposes files/history."""
    from lakehouse_loader_spark.sinks import delta as DL
    from lakehouse_loader_spark.sinks.delta import read_delta_meta
    from lakehouse_loader_spark.sinks.iceberg import read_iceberg_meta

    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id < 5", strategy="merge-on-read")
    IC.create_ref(path, "v1")

    files = read_iceberg_meta(spark, path, "files")
    by_content = {r.content: r for r in files.collect()}
    assert files.count() == 3  # 2 data + 1 delete file
    assert by_content["position-deletes"].record_count == 5
    assert by_content["data"].has_bounds

    snaps = read_iceberg_meta(spark, path, "snapshots")
    assert [r.operation for r in snaps.collect()] == ["overwrite", "append", "delete"]
    assert snaps.filter("is_current").count() == 1

    mans = read_iceberg_meta(spark, path, "manifests")
    assert {r.content for r in mans.collect()} == {"data", "deletes"}

    refs = read_iceberg_meta(spark, path, "refs")
    assert refs.collect()[0].name == "v1"
    with pytest.raises(ValueError, match="unknown metadata table"):
        read_iceberg_meta(spark, path, "nope")

    dpath = os.path.join(tmpdir, "dl")
    DL.write_delta(spark.range(10).coalesce(1), dpath)
    DL.write_delta(spark.range(10, 20).coalesce(1), dpath, append=True)
    dfiles = read_delta_meta(spark, dpath, "files")
    assert dfiles.count() == 2 and all(r.has_stats for r in dfiles.collect())
    assert sum(r.num_records for r in dfiles.collect()) == 20
    hist = read_delta_meta(spark, dpath, "history")
    modes = [
        json.loads(r.operation_parameters).get("mode")
        for r in hist.orderBy("version").collect()
    ]
    assert modes[:2] == ["CreateTable", "Append"]


def test_mor_delete_on_hidden_partitioned_table(spark, tmpdir):
    """MOR deletes over a TRANSFORM-partitioned table (bucket hidden
    partitioning): the delete anti-join keys on physical file paths, so
    hidden partition dirs must round-trip through the scan normalization;
    compaction then purges deletes while keeping the spec layout."""
    path = os.path.join(tmpdir, "iceb")
    df = spark.range(0, 300).select("id", (F.col("id") % 7).alias("v"))
    IC.write_iceberg(df, path, partition_by=["bucket(4, id)"])
    res = IC.delete_from_iceberg(spark, path, "v = 3", strategy="merge-on-read")
    assert res["deleted_rows"] == df.filter("v = 3").count()
    back = IC.read_iceberg(spark, path)
    assert back.count() == 300 - res["deleted_rows"]
    assert back.filter("v = 3").count() == 0
    # partition-pruned read still applies the deletes
    files, total = IC.prune_iceberg_files(path, "id_bucket", 2)
    assert files and total >= len(files)
    pruned = IC.read_iceberg_pruned(spark, path, "id_bucket", 2)
    assert pruned.filter("v = 3").count() == 0
    # compaction keeps the hidden-partition layout and purges the deletes
    out = IC.optimize_iceberg(spark, path)
    assert out["purged_delete_files"] >= 1
    back2 = IC.read_iceberg(spark, path)
    assert back2.count() == 300 - res["deleted_rows"]
    files2, _ = IC.prune_iceberg_files(path, "id_bucket", 2)
    assert files2  # spec survived the rewrite


def test_publish_branch_refuses_when_main_advanced(spark, tmpdir):
    """WAP race (ADVICE r5): a main-line commit lands during the audit
    window.  Fast-forwarding current to the branch head would silently drop
    that commit's rows (the branch forked BEFORE it), so publish must fail
    loudly; dropping the branch and re-staging on the new current works."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)

    IC.append_to_branch(
        spark.range(5000, 5020).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    # concurrent main-line append during the audit window
    IC.write_iceberg(
        spark.range(7000, 7010).select("id", F.lit(False).alias("flag")).coalesce(1),
        path,
        append=True,
    )
    with pytest.raises(IC.ConcurrentSpecChangeError, match="main line advanced"):
        IC.publish_branch(path, "audit")
    # main line rows are intact — nothing was dropped
    assert IC.read_iceberg(spark, path).count() == 110
    # remediation: re-fork from the new current and publish cleanly
    IC.drop_ref(path, "audit")
    IC.append_to_branch(
        spark.range(5000, 5020).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    IC.publish_branch(path, "audit")
    assert IC.read_iceberg(spark, path).count() == 130


def test_change_feed_skips_unpublished_branch_snapshots(spark, tmpdir):
    """An unpublished WAP branch snapshot interleaves with main-line commits
    in the snapshots list; the change feed must walk only the main lineage
    (no phantom insert/delete pairs for branch-only files) until the branch
    is published — then its rows surface once, at the publish point."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    base = IC.snapshot_ids(path)[-1]

    staged = IC.append_to_branch(
        spark.range(5000, 5020).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    # main-line append AFTER the branch snapshot entered the list
    IC.write_iceberg(
        spark.range(7000, 7010).select("id", F.lit(False).alias("flag")).coalesce(1),
        path,
        append=True,
    )
    ch = IC.read_iceberg_changes(spark, path, since_snapshot_id=base).collect()
    assert {r["_change_type"] for r in ch} == {"insert"}
    assert sorted(r.id for r in ch) == list(range(7000, 7010)), (
        "branch-only rows must not appear in the main-line change feed"
    )
    # a branch-only snapshot id is not a valid feed bound
    with pytest.raises(ValueError, match="main lineage"):
        IC.read_iceberg_changes(spark, path, since_snapshot_id=staged)
    # publish (after re-forking past the race guard) surfaces the rows once
    IC.drop_ref(path, "audit")
    IC.append_to_branch(
        spark.range(5000, 5020).select("id", F.lit(True).alias("flag")).coalesce(1),
        path,
        "audit",
    )
    IC.publish_branch(path, "audit")
    ch2 = IC.read_iceberg_changes(spark, path, since_snapshot_id=base).collect()
    assert sorted(r.id for r in ch2) == list(range(5000, 5020)) + list(range(7000, 7010))
    assert {r["_change_type"] for r in ch2} == {"insert"}


def test_lost_mor_commit_leaves_no_orphan_metadata(spark, tmpdir):
    """A losing optimistic DELETE commit must clean up everything it staged:
    parquet delete files AND the Avro manifest / manifest-list minted for
    the never-committed snapshot (ADVICE r5: metadata litter on retry)."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    meta_files_before = sorted(glob.glob(os.path.join(path, "metadata", "*")))

    # simulate a concurrent winner: pre-create the next metadata version
    version = max(
        int(os.path.basename(p).split(".")[0][1:])
        for p in glob.glob(os.path.join(path, "metadata", "v*.metadata.json"))
    )
    blocker = os.path.join(path, "metadata", f"v{version + 1}.metadata.json")
    with open(blocker, "w") as fh:
        fh.write("{}")

    with pytest.raises(ConcurrentModificationError):
        IC.delete_from_iceberg(spark, path, "id < 10", strategy="merge-on-read")
    os.remove(blocker)
    assert sorted(glob.glob(os.path.join(path, "metadata", "*"))) == meta_files_before
    assert _delete_files(path) == []

    # same contract for the equality-delete path
    with open(blocker, "w") as fh:
        fh.write("{}")
    with pytest.raises(ConcurrentModificationError):
        IC.equality_delete_iceberg(
            spark, path, spark.createDataFrame([(1,), (2,)], "id long")
        )
    os.remove(blocker)
    assert sorted(glob.glob(os.path.join(path, "metadata", "*"))) == meta_files_before
    assert _delete_files(path) == []

    # same contract for the copy-on-write DML path (VERDICT r6 item 2):
    # a losing COW delete/update/merge (all share _cow_iceberg) must remove
    # its freshly REWRITTEN data files too, not just the Avro metadata —
    # while the prior snapshot's carried-over files stay untouched
    data_files_before = sorted(glob.glob(os.path.join(path, "data", "*")))
    with open(blocker, "w") as fh:
        fh.write("{}")
    with pytest.raises(ConcurrentModificationError):
        IC.delete_from_iceberg(spark, path, "id < 10")  # copy-on-write default
    os.remove(blocker)
    assert sorted(glob.glob(os.path.join(path, "metadata", "*"))) == meta_files_before
    assert sorted(glob.glob(os.path.join(path, "data", "*"))) == data_files_before


def test_rewrite_manifests_consolidates_and_preserves_semantics(spark, tmpdir):
    """Manifest consolidation is pure metadata: one data (+ one delete)
    manifest afterwards, same rows, equality-delete sequence ordering
    preserved via explicit entry sequence numbers, time travel intact, and
    the change feed sees no phantom changes (operation=replace)."""
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 20).coalesce(1), path)
    for lo in (20, 40, 60):
        IC.write_iceberg(spark.range(lo, lo + 20).coalesce(1), path, append=True)
    # equality-delete ids 5 and 25, then re-insert 5 (post-delete row must
    # survive ONLY because its sequence number is larger)
    IC.equality_delete_iceberg(spark, path, spark.createDataFrame([(5,), (25,)], "id long"))
    IC.write_iceberg(spark.range(5, 6).coalesce(1), path, append=True)
    pre_rows = sorted(r.id for r in IC.read_iceberg(spark, path).collect())
    pre_snapshot = IC.snapshot_ids(path)[-1]
    n_manifests_before = len(
        IC._snapshot_manifests(path, IC._read_metadata(path)[1])
    )
    assert n_manifests_before >= 5

    res = IC.rewrite_manifests(path)
    assert res["manifests_before"] == n_manifests_before
    assert res["manifests_after"] == 2  # one data + one delete manifest

    post = sorted(r.id for r in IC.read_iceberg(spark, path).collect())
    assert post == pre_rows
    assert 25 not in post and 5 in post  # delete held; re-insert survived
    # time travel to the pre-rewrite snapshot still resolves
    assert sorted(
        r.id for r in IC.read_iceberg(spark, path, snapshot_id=pre_snapshot).collect()
    ) == pre_rows
    # change feed: the rewrite snapshot contributes nothing
    ch = IC.read_iceberg_changes(spark, path, since_snapshot_id=pre_snapshot).collect()
    assert ch == []
    # idempotent no-op below the threshold
    again = IC.rewrite_manifests(path)
    assert again == {"manifests_before": 2, "manifests_after": 2}
    # a further append stacks on the consolidated base
    IC.write_iceberg(spark.range(100, 110).coalesce(1), path, append=True)
    assert IC.read_iceberg(spark, path).count() == len(pre_rows) + 10


def test_expire_snapshots_older_than_keeps_recent_history(spark, tmpdir):
    import time as _time

    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 5).coalesce(1), path)
    IC.write_iceberg(spark.range(5, 10).coalesce(1), path, append=True)
    _time.sleep(1.1)
    cutoff = int(_time.time() * 1000)
    IC.write_iceberg(spark.range(10, 15).coalesce(1), path, append=True)
    # keep_last=1 alone would expire both old snapshots; the time rule
    # additionally retains everything at/after the cutoff
    deleted = IC.expire_snapshots(path, keep_last=1, older_than_ms=cutoff)
    assert deleted, "two pre-cutoff snapshots should expire"
    assert len(IC.snapshot_ids(path)) == 1
    assert IC.read_iceberg(spark, path).count() == 15
    # with a cutoff before ALL snapshots nothing is old enough
    assert IC.expire_snapshots(path, keep_last=1, older_than_ms=1000) == []


def test_optimize_where_scopes_the_rewrite(spark, tmpdir):
    """OPTIMIZE WHERE: only the files the predicate can touch rewrite; the
    rest carry over byte-identical.  Position deletes still materialize
    (their targets join the rewrite set) and rows are unchanged."""
    path = os.path.join(tmpdir, "icep")
    df = spark.range(0, 300).select("id", (F.col("id") % 3).alias("b"))
    IC.write_iceberg(df.repartition(3, "b"), path, partition_by=["b"])
    # fragment partition b=1 with extra appends
    for lo in (1000, 2000):
        IC.write_iceberg(
            spark.range(lo, lo + 30).select("id", F.lit(1).cast("long").alias("b")).coalesce(1),
            path,
            append=True,
        )
    files_before = {
        d["file_path"] for d in IC._split_live_entries(path, IC._read_metadata(path)[1])[0]
    }
    untouched_before = {
        d["file_path"]
        for d in IC._split_live_entries(path, IC._read_metadata(path)[1])[0]
        if "b=1" not in d["file_path"]
    }
    res = IC.optimize_iceberg(spark, path, where=[("b", "=", 1)])
    assert res["rewritten_files"] == len(files_before) - len(untouched_before)
    data_after = {
        d["file_path"] for d in IC._split_live_entries(path, IC._read_metadata(path)[1])[0]
    }
    # non-matching files carried over byte-identical (same paths)
    assert untouched_before <= data_after
    assert not (data_after & (files_before - untouched_before)), "scoped files rewrote"
    back = IC.read_iceberg(spark, path)
    assert back.count() == 360
    assert back.filter("b = 1").count() == 160

    # deletes on a carried partition force their targets into the rewrite
    IC.delete_from_iceberg(spark, path, "b = 0 AND id < 30", strategy="merge-on-read")
    res2 = IC.optimize_iceberg(spark, path, where=[("b", "=", 2)])
    assert res2["purged_delete_files"] >= 1
    back2 = IC.read_iceberg(spark, path)
    assert back2.count() == 360 - 10
    assert back2.filter("b = 0 AND id < 30").count() == 0

    # no-match scope is a no-op; zorder_by is refused
    assert IC.optimize_iceberg(spark, path, where=[("b", "=", 99)]) == {
        "rewritten_files": 0, "new_files": 0, "purged_delete_files": 0,
    }
    with pytest.raises(ValueError, match="table-wide clustering"):
        IC.optimize_iceberg(spark, path, where=[("b", "=", 1)], zorder_by=["id"])


def test_optimize_where_refuses_equality_deletes(spark, tmpdir):
    """A scoped rewrite cannot materialize key-scoped equality deletes for
    only SOME files while dropping the delete manifest — carried files
    would resurrect deleted rows.  Must refuse loudly."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.equality_delete_iceberg(spark, path, spark.createDataFrame([(3,)], "id long"))
    with pytest.raises(ValueError, match="scoped optimize"):
        IC.optimize_iceberg(spark, path, where=[("id", "<", 100)])
    # a FULL optimize still refuses until the equality deletes compact away
    # via the documented route
    assert IC.read_iceberg(spark, path).filter("id = 3").count() == 0


def test_publish_branch_detects_midcall_mainline_commit(spark, tmpdir, monkeypatch):
    """VERDICT r6 item 8 (the symmetric half of the fork-base guard): a
    main-line commit that lands BETWEEN publish_branch's metadata read and
    its O_EXCL conditional put must fail the publish loudly — the commit
    loop retries over the WINNER's state and the fork-base check re-fires
    there — leaving the main line and the branch ref intact."""
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 10).coalesce(1), path)  # S0
    IC.append_to_branch(spark.range(100, 110).coalesce(1), path, "audit")
    stale_version, stale_meta = IC._read_metadata(path)
    # the racing main-line append wins the next version while publish_branch
    # (below) still holds the pre-append view of the table
    IC.write_iceberg(spark.range(10, 20).coalesce(1), path, append=True)  # S1

    real_read = IC._read_metadata
    calls = {"n": 0}

    def stale_read(p):
        # publish_branch reads twice before its first O_EXCL (its own probe
        # + the commit loop's); serve both the pre-append state so the race
        # is detected by the conditional put, not the entry check
        calls["n"] += 1
        if calls["n"] <= 2:
            return stale_version, json.loads(json.dumps(stale_meta))
        return real_read(p)

    monkeypatch.setattr(IC, "_read_metadata", stale_read)
    with pytest.raises(IC.ConcurrentSpecChangeError, match="main line advanced"):
        IC.publish_branch(path, "audit")
    monkeypatch.undo()

    # nothing corrupted: current is still the main-line S1 lineage, the
    # branch rows stayed unpublished, and the failed publish kept the ref
    rows = sorted(r.id for r in IC.read_iceberg(spark, path).collect())
    assert rows == list(range(0, 20))
    refs = IC._read_metadata(path)[1]["refs"]
    assert refs["audit"]["type"] == "branch"


def test_pos_delete_broadcast_gated_by_record_count(spark, tmpdir, monkeypatch):
    """The MOR read anti-join broadcasts the position-delete frame only
    while the manifests' record counts fit DELETE_BROADCAST_MAX; an
    over-threshold accumulated delete set plans a shuffled anti-join —
    never an executor-memory-sized broadcast.  The estimate is
    metadata-only (no delete file opened to decide)."""
    path = os.path.join(tmpdir, "ice")
    _two_file_table(spark, path)
    IC.delete_from_iceberg(spark, path, "id % 5 = 0", strategy="merge-on-read")

    def hinted(df):
        # the gate manifests as an explicit broadcast hint on the delete
        # side of the logical plan (Spark may still auto-broadcast tiny
        # frames by its size threshold — that is size-aware and safe; the
        # bug was HINTING an arbitrarily large frame past that threshold)
        return "strategy=broadcast" in df._jdf.queryExecution().optimizedPlan().toString()

    under = IC.read_iceberg(spark, path)
    assert hinted(under)
    assert under.count() == 80
    monkeypatch.setattr(IC, "DELETE_BROADCAST_MAX", 0)
    over = IC.read_iceberg(spark, path)
    assert not hinted(over)
    p = over._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p  # equi keys keep it hash/merge
    assert over.count() == 80  # same rows either way


class TestMorUpdate:
    """Merge-on-read UPDATE (r9): position-delete the matched rows AND
    append their updated copies in ONE snapshot — the format twin of the
    Delta sink's _update_mor.  Position deletes address the OLD files'
    (path, pos), so the same-snapshot copies survive them."""

    def _table(self, spark, tmpdir, name="u", partition_by=None):
        t = os.path.join(str(tmpdir), name)
        df = spark.range(200).selectExpr(
            "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
        )
        IC.write_iceberg(df, t, overwrite=True, partition_by=partition_by)
        return t

    def test_update_masks_and_appends_one_snapshot(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        n_data_before = len(_data_files(t))
        res = IC.update_iceberg(
            spark, t, "id % 10 = 2", {"v": "v + 1000"}, strategy="merge-on-read"
        )
        assert res["updated_rows"] == 20 and res["new_files"] >= 1
        assert len(_delete_files(t)) == res["delete_files"]
        # old data files untouched (no rewrite)
        assert all(os.path.exists(f) for f in _data_files(t)[:n_data_before])
        got = {r["id"]: r["v"] for r in IC.read_iceberg(spark, t).collect()}
        assert len(got) == 200
        for i in range(200):
            assert got[i] == (i * 1.5 + 1000 if i % 10 == 2 else i * 1.5)

    def test_update_does_not_resurrect_deleted_rows(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        IC.delete_from_iceberg(spark, t, "id % 10 = 5", strategy="merge-on-read")
        IC.update_iceberg(
            spark, t, "id % 10 = 5", {"v": "0.0"}, strategy="merge-on-read"
        )
        assert IC.read_iceberg(spark, t).count() == 180

    def test_chained_updates_and_optimize_fold(self, spark, tmpdir):
        t = self._table(spark, tmpdir)
        IC.update_iceberg(spark, t, "id = 2", {"v": "v + 1"}, strategy="merge-on-read")
        IC.update_iceberg(spark, t, "id = 2", {"v": "v + 1"}, strategy="merge-on-read")
        got = {r["id"]: r["v"] for r in IC.read_iceberg(spark, t).collect()}
        assert got[2] == 2 * 1.5 + 2 and len(got) == 200
        IC.optimize_iceberg(spark, t)
        assert not _delete_files(t) or not IC._split_live_entries(
            t, IC._read_metadata(t)[1]
        )[1]
        got2 = {r["id"]: r["v"] for r in IC.read_iceberg(spark, t).collect()}
        assert got2 == got

    def test_partitioned_update(self, spark, tmpdir):
        t = self._table(spark, tmpdir, name="up", partition_by=["k"])
        IC.update_iceberg(spark, t, "id < 50", {"v": "-1.0"}, strategy="merge-on-read")
        out = IC.read_iceberg(spark, t)
        assert out.count() == 200 and out.where("v = -1.0").count() == 50

    def test_refusals(self, spark, tmpdir):
        t = self._table(spark, tmpdir, name="ur")
        with pytest.raises(ValueError, match="unknown update strategy"):
            IC.update_iceberg(spark, t, "id=1", {"v": "0.0"}, strategy="nope")
        # MOR UPDATE on a row-lineage table is now a preservation op, not a
        # refusal: the matched row keeps its id in the same-snapshot copy
        # (full matrix in test_iceberg_row_lineage.TestLineageDml)
        IC.enable_row_lineage_iceberg(t)
        pre = {
            r["id"]: r["_row_id"]
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }
        IC.update_iceberg(spark, t, "id=1", {"v": "0.0"}, strategy="merge-on-read")
        post = {
            r["id"]: r["_row_id"]
            for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        }
        assert post == pre
