"""Row-level change feed derived from the Delta transaction log
(`read_delta_changes`): inserts from appends, delete+insert diffs from
copy-on-write DML, compactions skipped, vacuumed pre-images fail loudly."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdf_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 3).alias("grp"), F.concat(F.lit("r"), F.col("id")).alias("name")
    )


def _staged(spark, tmpdir):
    """v0/v1 create with ids 0..9, v2 append ids 10..14, v3 delete id%3=0,
    v4 optimize (no-op logically), v5 update names where id=7."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark, 0, 10), t)
    DL.write_delta(_df(spark, 10, 15), t, append=True)
    DL.delete_from_delta(spark, t, "grp = 0")
    DL.optimize_delta(spark, t)
    DL.update_delta(spark, t, "id = 7", {"name": "'updated'"})
    return t


def _changes(spark, t, since, end=None):
    df = DL.read_delta_changes(spark, t, since, end)
    return {
        (r.id, r._change_type, r._commit_version): r.name
        for r in df.collect()
    }


def test_change_feed_classifies_commits(spark, tmpdir):
    t = _staged(spark, tmpdir)
    ch = _changes(spark, t, since=1)
    # v2: pure inserts of ids 10..14
    inserts_v2 = {k for k in ch if k[2] == 2}
    assert inserts_v2 == {(i, "insert", 2) for i in range(10, 15)}
    # v3: deletes of every id % 3 == 0 in 0..14
    deletes_v3 = {k for k in ch if k[2] == 3}
    assert deletes_v3 == {(i, "delete", 3) for i in range(0, 15) if i % 3 == 0}
    # v4 (OPTIMIZE): absent entirely
    assert not any(k[2] == 4 for k in ch)
    # v5 (UPDATE id=7): one delete of the pre-image + one insert of the post
    v5 = {k: v for k, v in ch.items() if k[2] == 5}
    assert set(v5) == {(7, "delete", 5), (7, "insert", 5)}
    assert v5[(7, "delete", 5)] == "r7" and v5[(7, "insert", 5)] == "updated"


def test_change_feed_window_and_floor(spark, tmpdir):
    t = _staged(spark, tmpdir)
    # only the append commit
    ch = _changes(spark, t, since=1, end=2)
    assert ch and all(k[2] == 2 and k[1] == "insert" for k in ch)
    # empty window -> empty frame with the contract columns
    empty = DL.read_delta_changes(spark, t, 5)
    assert empty.count() == 0
    assert empty.columns == ["id", "grp", "name", "_change_type", "_commit_version"]
    with pytest.raises(ValueError):
        DL.read_delta_changes(spark, t, 99)


def test_change_feed_replays_evolved_schema(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark, 0, 5), t)
    evolved = _df(spark, 5, 8).withColumn("score", F.col("id") * 2.0)
    DL.write_delta(evolved, t, append=True, merge_schema=True)
    ch = DL.read_delta_changes(spark, t, 1)
    assert "score" in ch.columns
    got = {(r.id, r.score) for r in ch.collect()}
    assert got == {(i, float(i * 2)) for i in range(5, 8)}


def test_change_feed_fails_on_vacuumed_preimage(spark, tmpdir):
    t = _staged(spark, tmpdir)
    DL.vacuum_delta(t)  # drops unreferenced pre-image files
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        DL.read_delta_changes(spark, t, 1).count()


def test_cli_evolved_append_and_changes_export(spark, tmpdir):
    """parquet-to-delta -a --evolve-schema appends a wider file by name;
    changes-delta exports the feed's rows as parquet."""
    from lakehouse_loader_spark.cli import do_main

    base = os.path.join(tmpdir, "base.parquet")
    wider = os.path.join(tmpdir, "wider.parquet")
    _df(spark, 0, 10).write.parquet(base)
    _df(spark, 10, 14).withColumn("score", F.col("id") * 2.0).write.parquet(wider)
    t = os.path.join(tmpdir, "t")
    do_main(["parquet-to-delta", base, t])
    # evolved append via the CLI flag pair
    do_main(["parquet-to-delta", wider, t, "-a", "--evolve-schema"])
    back = DL.read_delta(spark, t)
    assert back.count() == 14 and "score" in back.columns
    # --evolve-schema without -a is a usage error
    with pytest.raises(SystemExit) as exc_info:
        do_main(["parquet-to-delta", wider, t, "--evolve-schema"])
    assert exc_info.value.code == 2
    out = os.path.join(tmpdir, "changes_out")
    do_main(["changes-delta", t, out, "--since", "1"])
    exported = spark.read.parquet(out)
    assert exported.count() == 4
    assert {r.id for r in exported.collect()} == {10, 11, 12, 13}
    assert set(exported.columns) >= {"_change_type", "_commit_version"}


# -- Iceberg twin -----------------------------------------------------------


def test_iceberg_change_feed(spark, tmpdir):
    from lakehouse_loader_spark.sinks import iceberg as IC

    t = os.path.join(tmpdir, "it")
    IC.write_iceberg(_df(spark, 0, 10), t)                      # ordinal 0
    IC.write_iceberg(_df(spark, 10, 15), t, append=True)        # ordinal 1
    IC.delete_from_iceberg(spark, t, "grp = 0")                 # ordinal 2
    IC.optimize_iceberg(spark, t)                               # ordinal 3 (replace)
    IC.update_iceberg(spark, t, "id = 7", {"name": "'updated'"})  # ordinal 4

    first = IC.snapshot_ids(t)[0]
    ch = {
        (r.id, r._change_type, r._snapshot_ordinal): r.name
        for r in IC.read_iceberg_changes(spark, t, since_snapshot_id=first).collect()
    }
    assert {k for k in ch if k[2] == 1} == {(i, "insert", 1) for i in range(10, 15)}
    assert {k for k in ch if k[2] == 2} == {
        (i, "delete", 2) for i in range(0, 15) if i % 3 == 0
    }
    assert not any(k[2] == 3 for k in ch)  # OPTIMIZE skipped
    v4 = {k: v for k, v in ch.items() if k[2] == 4}
    assert set(v4) == {(7, "delete", 4), (7, "insert", 4)}
    assert v4[(7, "delete", 4)] == "r7" and v4[(7, "insert", 4)] == "updated"
    # None since: the creating snapshot surfaces as inserts at ordinal 0
    full = IC.read_iceberg_changes(spark, t)
    assert full.filter(
        (F.col("_snapshot_ordinal") == 0) & (F.col("_change_type") == "insert")
    ).count() == 10
    # expired history fails loudly: the since snapshot is gone from the
    # metadata (and its files from disk), so the feed refuses the range
    IC.expire_snapshots(t, keep_last=1)
    with pytest.raises(ValueError, match="not in"):
        IC.read_iceberg_changes(spark, t, since_snapshot_id=first).count()
