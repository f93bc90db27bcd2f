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


def test_empty_marker_refuses(spark, tmpdir):
    """A zero-length marker is a torn write (power loss), never a fresh
    attach: _write_marker fsyncs before the atomic rename, so an empty
    file under the final name cannot be legitimate.  Treating it as {}
    would re-attach as run 0 under the SAME app-id — the txn ledger
    suppresses the snapshot and the cursor jumps to the current end,
    silently skipping every window since the old cursor (ADVICE r12)."""
    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 3), table)
    rec = Recorder()
    tail_appends(spark, table, ckpt, rec)
    with open(os.path.join(ckpt, _MARKER), "w"):
        pass  # truncate to zero length
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
    assert state == {"cursor": 1, "runs": 1, "feed": "appends"}
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


def test_feed_switch_on_same_checkpoint_refuses(spark, tmpdir):
    """A checkpoint created by one feed refuses the other: switching
    silently would change semantics AND the transactional app-id, letting
    a crash-replayed window slip past the other feed's ledger entry."""
    from lakehouse_loader_spark.streaming.tail import tail_changes

    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 5), table)
    tail_appends(spark, table, ckpt, Recorder())
    with pytest.raises(ValueError, match="created by the 'appends' feed"):
        tail_changes(spark, table, ckpt, lambda df, i, s: None)


def test_cdf_enabled_update_replicates_as_upsert_not_delete(spark, tmpdir, monkeypatch):
    """A CDF-enabled Delta source persists UPDATE images as
    update_preimage/update_postimage cdc rows; the keyed reduction must
    treat the postimage as the key's final image (upsert), never a
    tombstone.  Verified through the reduction itself with a recording
    merge stub (no Postgres needed)."""
    import lakehouse_loader_spark.sources.pgwire as PW
    from lakehouse_loader_spark.sinks.delta import (
        enable_change_data_feed,
        update_delta,
    )
    from lakehouse_loader_spark.streaming import tail as TL

    table = os.path.join(str(tmpdir), "t")
    ckpt = os.path.join(str(tmpdir), "ckpt")
    write_delta(_df(spark, 0, 6), table)
    enable_change_data_feed(table)

    published = []

    def fake_overwrite(df, conn_url, pg_table, mode, txn):
        published.append(("snapshot", sorted(r["id"] for r in df.collect())))
        return df.count()

    def fake_merge(df, conn_url, pg_table, key_cols, delete_col, txn):
        rows = df.collect()
        ups = sorted((r["id"], r["v"]) for r in rows if not r[delete_col])
        dels = sorted(r["id"] for r in rows if r[delete_col])
        published.append(("merge", ups, dels))
        return (len(ups), len(dels))

    monkeypatch.setattr(PW, "write_postgres_wire", fake_overwrite)
    monkeypatch.setattr(PW, "merge_postgres_wire", fake_merge)
    # the schema-drift probe would open a real socket; "no target yet"
    # (empty column list) is the honest stub for a recording sink
    monkeypatch.setattr(PW, "table_columns_postgres_wire", lambda *a, **k: [])

    TL.replicate_changes_to_postgres(
        spark, table, "postgresql://x@localhost/db", "t", ckpt, key_cols=["id"]
    )
    update_delta(spark, table, "id = 2", {"v": "v + 100"})
    TL.replicate_changes_to_postgres(
        spark, table, "postgresql://x@localhost/db", "t", ckpt, key_cols=["id"]
    )
    assert published[0][0] == "snapshot"
    kind, ups, dels = published[1]
    assert kind == "merge"
    assert ups == [(2, 104)], f"postimage must upsert, got {ups}"
    assert dels == [], f"update must not tombstone the key, got deletes {dels}"


def test_cdc_null_key_and_duplicate_key_refuse(spark, tmpdir, monkeypatch):
    import lakehouse_loader_spark.sources.pgwire as PW
    from lakehouse_loader_spark.streaming import tail as TL

    monkeypatch.setattr(PW, "write_postgres_wire", lambda *a, **k: 0)
    monkeypatch.setattr(PW, "merge_postgres_wire", lambda *a, **k: (0, 0))

    # duplicate key in the initial snapshot
    t1 = os.path.join(str(tmpdir), "t1")
    write_delta(
        spark.createDataFrame([(1, 10), (1, 11)], "id long, v long"), t1
    )
    with pytest.raises(ValueError, match="not unique per key"):
        TL.replicate_changes_to_postgres(
            spark, t1, "postgresql://x@localhost/db", "t",
            os.path.join(str(tmpdir), "c1"), key_cols=["id"],
        )

    # NULL key in the initial snapshot
    t2 = os.path.join(str(tmpdir), "t2")
    write_delta(
        spark.createDataFrame([(None, 10), (2, 11)], "id long, v long"), t2
    )
    with pytest.raises(ValueError, match="NULL in key column"):
        TL.replicate_changes_to_postgres(
            spark, t2, "postgresql://x@localhost/db", "t",
            os.path.join(str(tmpdir), "c2"), key_cols=["id"],
        )


# ---------------------------------------------------------------------------
# Crash-injection property test (VERDICT r12 item 4): a randomized
# kill-point walk over the two-phase marker protocol.  The r12 review
# found eight defects in this family BY HAND; this is the systematic
# randomized coverage of the docstring contracts (tail.py:1-32):
#   transactional apply  -> exactly-once (no skip, no double-apply)
#   non-transactional    -> at-least-once, NEVER a skipped window, and
#                           replays target only the recorded window
# Schedule events: append N rows | run with a crash before the sink
# effect | run with a crash after the sink effect | clean run.  Every
# crash is followed by restarts until the window lands, mirroring a
# supervised consumer.
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


class _Crash(Exception):
    pass


class _Sink:
    """In-process stand-in for a transactional / plain sink with
    injectable kill points.  Transactional mode mirrors the pg txn
    ledger: (run_idx) already published -> the apply is a no-op."""

    def __init__(self, transactional: bool):
        self.transactional = transactional
        self.rows: list[int] = []
        self.ledger: set[int] = set()
        self.crash_point: str | None = None  # "before" | "after" | None
        self.run_indices: list[int] = []

    def apply(self, df, run_idx):
        self.run_indices.append(run_idx)
        if self.crash_point == "before":
            self.crash_point = None
            raise _Crash("killed before sink effect")
        batch = [r["id"] for r in df.collect()]
        if self.transactional:
            if run_idx not in self.ledger:
                # ledger insert + rows land in ONE transaction
                self.ledger.add(run_idx)
                self.rows.extend(batch)
        else:
            self.rows.extend(batch)
        if self.crash_point == "after":
            self.crash_point = None
            raise _Crash("killed after sink effect")


_EVENTS = st.lists(
    st.one_of(
        st.integers(min_value=1, max_value=3).map(lambda n: ("append", n)),
        st.sampled_from([("run", None), ("run", "before"), ("run", "after")]),
    ),
    min_size=2,
    max_size=6,
)


@settings(max_examples=int(os.environ.get("LHL_TAIL_SCHEDULES", "50")), deadline=None)
@given(events=_EVENTS, transactional=st.booleans())
@pytest.mark.slow  # crash-schedule sweep (~30s) — slow tier (r16)
def test_tail_crash_schedule_contracts(spark, tmp_path_factory, events, transactional):
    base = str(tmp_path_factory.mktemp("crash"))
    table = os.path.join(base, "t")
    ckpt = os.path.join(base, "ckpt")
    write_delta(_df(spark, 0, 2), table)  # snapshot window: ids 0,1
    hi = 2
    sink = _Sink(transactional)

    def run_once():
        try:
            tail_appends(spark, table, ckpt, sink.apply)
            return True
        except _Crash:
            return False

    # shadow model of the cursor protocol, to know when apply SHOULD run
    committed = 0  # rows whose window the cursor has passed
    pend_end = None  # recorded-but-unapplied window end (row count)
    effective_after_crashes = 0
    for ev, arg in events:
        if ev == "append":
            write_delta(_df(spark, hi, hi + arg), table, append=True)
            hi += arg
            continue
        if pend_end is None and committed == hi:
            # nothing to consume: protocol returns empty WITHOUT calling
            # apply, so an armed crash never fires
            sink.crash_point = None
            assert run_once()
            continue
        if pend_end is None:
            pend_end = hi  # the protocol records this window before apply
        sink.crash_point = arg
        ok = run_once()
        assert ok == (arg is None)
        if arg is None:
            committed, pend_end = pend_end, None
        elif arg == "after":
            effective_after_crashes += 1

    # drain: a supervised consumer restarts until the table is consumed
    sink.crash_point = None
    for _ in range(3):
        run_once()

    expected = list(range(hi))
    if transactional:
        # exactly-once: every appended row exactly once, no double-apply
        assert sorted(sink.rows) == expected
        assert len(sink.rows) == len(set(sink.rows))
    else:
        # at-least-once: nothing skipped; duplicates only whole-window
        # replays (multiplicity bounded by effective after-crashes + 1)
        assert sorted(set(sink.rows)) == expected
        from collections import Counter

        assert max(Counter(sink.rows).values()) <= 1 + effective_after_crashes

    # run indices never skip: each applied window's index increments by
    # exactly 1 across SUCCESSFUL applies, and a crash-replay reuses the
    # same index (monotone non-decreasing overall, no gaps)
    idx = sink.run_indices
    assert idx == sorted(idx)
    assert set(idx) == set(range(max(idx) + 1)) if idx else True
