"""Checkpointed incremental tailing (streaming/tail.py): windows are
exactly the appended rows, the cursor survives restarts, a crash between
apply and cursor-advance replays the SAME window with the SAME run index,
and non-append history fails loudly instead of double-counting."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks.delta import (
    ConcurrentModificationError,
    optimize_delta,
    write_delta,
)
from lakehouse_loader_spark.sinks.iceberg import write_iceberg
from lakehouse_loader_spark.streaming.tail import _MARKER, tail_appends


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


class Recorder:
    def __init__(self):
        self.windows = []

    def __call__(self, df, run_idx):
        self.windows.append((run_idx, sorted(r["id"] for r in df.collect())))


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_tail_windows_are_exact_and_cursor_persists(spark, tmpdir, fmt):
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write = write_delta if fmt == "delta" else write_iceberg
    write(_df(spark, 0, 10), table)

    rec = Recorder()
    r0 = tail_appends(spark, table, ckpt, rec)
    assert r0["run"] == 0 and not r0["empty"]
    assert rec.windows == [(0, list(range(10)))]

    # no new commits -> empty, apply not called
    r1 = tail_appends(spark, table, ckpt, rec)
    assert r1["empty"] and len(rec.windows) == 1

    write(_df(spark, 10, 15), table, append=True)
    write(_df(spark, 15, 18), table, append=True)
    r2 = tail_appends(spark, table, ckpt, rec)
    assert r2["run"] == 1 and not r2["empty"]
    # both appends land in ONE window, only the fresh rows
    assert rec.windows[-1] == (1, list(range(10, 18)))

    # cursor is on disk, not in memory: a fresh call sees nothing new
    assert tail_appends(spark, table, ckpt, rec)["empty"]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_crash_between_apply_and_advance_replays_same_window(
    spark, tmpdir, fmt
):
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write = write_delta if fmt == "delta" else write_iceberg
    write(_df(spark, 0, 5), table)
    rec = Recorder()
    tail_appends(spark, table, ckpt, rec)

    write(_df(spark, 5, 9), table, append=True)

    boom = RuntimeError("sink crashed after commit, before cursor advance")

    def crashing(df, run_idx):
        rec(df, run_idx)
        raise boom

    with pytest.raises(RuntimeError):
        tail_appends(spark, table, ckpt, crashing)
    # a LATER append lands before the retry — the replay must NOT widen
    # the recorded window past what the crashed run's sink may have
    # committed under run_idx
    write(_df(spark, 9, 12), table, append=True)
    tail_appends(spark, table, ckpt, rec)
    crashed = rec.windows[1]
    replayed = rec.windows[2]
    assert crashed == replayed == (1, [5, 6, 7, 8])
    # and the next window picks up the rest with the next run index
    tail_appends(spark, table, ckpt, rec)
    assert rec.windows[3] == (2, [9, 10, 11])


def test_non_append_history_fails_loudly(spark, tmpdir):
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 10), table)
    rec = Recorder()
    tail_appends(spark, table, ckpt, rec)
    write_delta(_df(spark, 10, 2000), table, append=True)
    optimize_delta(spark, table)  # rewrites files: history no longer append-only
    with pytest.raises(ConcurrentModificationError):
        tail_appends(spark, table, ckpt, rec)


def test_corrupt_marker_refuses(spark, tmpdir):
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 3), table)
    rec = Recorder()
    tail_appends(spark, table, ckpt, rec)
    with open(os.path.join(ckpt, _MARKER), "w") as fh:
        fh.write('{"cursor": 0, "runs"')  # torn write
    with pytest.raises(ValueError, match="corrupt tail cursor"):
        tail_appends(spark, table, ckpt, rec)


def test_marker_is_atomic_json(spark, tmpdir):
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 3), table)
    tail_appends(spark, table, ckpt, Recorder())
    state = json.load(open(os.path.join(ckpt, _MARKER)))
    # the Delta sink's two-commit create layout (protocol/metaData at v0,
    # Add actions at v1) puts the fresh table's cursor at version 1
    assert state == {"cursor": 1, "runs": 1}
    assert not os.path.exists(os.path.join(ckpt, _MARKER) + ".tmp")


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_tail_changes_windows_carry_row_level_dml(spark, tmpdir, fmt):
    """tail_changes consumes DML as row-level deltas where tail_appends
    refuses: a delete plus an append between cursors arrives as one
    window of ('delete', old rows) + ('insert', new rows)."""
    from lakehouse_loader_spark.sinks.delta import delete_from_delta
    from lakehouse_loader_spark.sinks.iceberg import delete_from_iceberg
    from lakehouse_loader_spark.streaming.tail import tail_changes

    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write = write_delta if fmt == "delta" else write_iceberg
    delete = delete_from_delta if fmt == "delta" else delete_from_iceberg
    write(_df(spark, 0, 10), table)

    windows = []

    def apply(df, run_idx, is_snapshot):
        if is_snapshot:
            windows.append((run_idx, "snapshot", sorted(r["id"] for r in df.collect())))
        else:
            rows = df.collect()
            windows.append(
                (
                    run_idx,
                    sorted((r["_change_type"], r["id"]) for r in rows),
                )
            )
        return len(windows[-1][-1])

    r0 = tail_changes(spark, table, ckpt, apply)
    assert r0["run"] == 0 and windows[0][1] == "snapshot"
    assert windows[0][2] == list(range(10))

    delete(spark, table, "id < 2")
    write(_df(spark, 10, 12), table, append=True)
    r1 = tail_changes(spark, table, ckpt, apply)
    assert r1["run"] == 1 and r1["rows"] == 4
    assert windows[1][1] == [
        ("delete", 0),
        ("delete", 1),
        ("insert", 10),
        ("insert", 11),
    ]
    assert tail_changes(spark, table, ckpt, apply)["empty"]
