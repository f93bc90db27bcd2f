"""Optimistic-commit protocol under REAL concurrent writers (threads):
interleaved appends must serialize — every successful commit's rows are
present exactly once, every metadata version parses, and the snapshot
lineage is consistent.  The conflict tests elsewhere simulate a single
lost race; this exercises genuine interleaving."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks.delta import (
    ConcurrentModificationError,
    read_delta,
    write_delta,
)


def _run_writers(n_threads, n_commits, fn):
    """Run fn(thread_idx, commit_idx) across threads; returns the set of
    (thread, commit) pairs that committed successfully.  A race loser must
    surface as one of the CLASSIFIED concurrency errors (or retry-exhaustion
    FileExistsError) — anything else is a protocol bug (r11's torn-hint
    ValueError died silently in a worker thread here)."""
    ok: set[tuple[int, int]] = set()
    errors: list[tuple[int, int, str]] = []
    lock = threading.Lock()

    def work(t):
        for c in range(n_commits):
            try:
                fn(t, c)
            except (
                ConcurrentModificationError,
                IC.ConcurrentSpecChangeError,
                RuntimeError,
                FileExistsError,  # COMMIT_RETRIES exhausted: lost every race
            ):
                continue  # lost too many races: acceptable, must not corrupt
            except BaseException as e:  # noqa: BLE001 — the assert below reports it
                with lock:
                    errors.append((t, c, repr(e)))
                continue
            with lock:
                ok.add((t, c))

    threads = [threading.Thread(target=work, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, f"unclassified crashes in writer threads: {errors}"
    return ok


def test_concurrent_iceberg_appends_serialize(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 1).select(F.lit(-1).cast("long").alias("tag")), path)

    def append(t, c):
        tag = t * 1000 + c
        IC.write_iceberg(
            spark.range(0, 10).select(F.lit(tag).cast("long").alias("tag")).coalesce(1),
            path,
            append=True,
        )

    ok = _run_writers(3, 4, append)
    assert len(ok) >= 6, f"too many lost commits: {ok}"
    back = IC.read_iceberg(spark, path)
    counts = {r["tag"]: r["n"] for r in back.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()}
    for (t, c) in ok:
        assert counts.get(t * 1000 + c) == 10, f"commit {(t, c)} lost rows"
    # no phantom tags beyond the seed and successful commits
    assert set(counts) <= {-1} | {t * 1000 + c for (t, c) in ok}
    # lineage consistency: every snapshot readable, row counts non-decreasing
    sizes = [
        IC.read_iceberg(spark, path, snapshot_id=s).count() for s in IC.snapshot_ids(path)
    ]
    assert sizes == sorted(sizes)
    # every metadata version on disk parses
    import json as _json

    meta_dir = os.path.join(path, "metadata")
    for f in os.listdir(meta_dir):
        if f.endswith(".metadata.json"):
            with open(os.path.join(meta_dir, f)) as fh:
                _json.load(fh)


def test_concurrent_delta_appends_serialize(spark, tmpdir):
    path = os.path.join(tmpdir, "dl")
    write_delta(spark.range(0, 1).select(F.lit(-1).cast("long").alias("tag")), path)

    def append(t, c):
        tag = t * 1000 + c
        write_delta(
            spark.range(0, 10).select(F.lit(tag).cast("long").alias("tag")).coalesce(1),
            path,
            append=True,
        )

    ok = _run_writers(3, 4, append)
    assert len(ok) >= 6, f"too many lost commits: {ok}"
    back = read_delta(spark, path)
    counts = {r["tag"]: r["n"] for r in back.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()}
    for (t, c) in ok:
        assert counts.get(t * 1000 + c) == 10, f"commit {(t, c)} lost rows"
    assert set(counts) <= {-1} | {t * 1000 + c for (t, c) in ok}
    # log replay at every version must parse and be monotone in rows
    from lakehouse_loader_spark.sinks.delta import _read_log

    latest, _, _ = _read_log(path)
    sizes = [read_delta(spark, path, version=v).count() for v in range(1, latest + 1)]
    assert sizes == sorted(sizes)


def test_hint_never_torn_under_writer_storm(tmpdir):
    """version-hint.text updates are atomic (tmp-file + os.replace): a
    reader polling the hint during a storm of hint writers must NEVER see
    a torn/empty file.  r11's truncate-then-write exposed an empty-file
    window that crashed readers with ``int('')`` (demonstrated live by
    this module's iceberg append test)."""
    path = os.path.join(tmpdir, "hint_storm")
    os.makedirs(os.path.join(path, "metadata"))
    IC._write_hint(path, 0)
    with open(os.path.join(path, "metadata", "v0.metadata.json"), "w") as fh:
        fh.write("{}")

    stop = threading.Event()
    errors: list[str] = []

    def reader():
        while not stop.is_set():
            try:
                v = IC._read_version(path)
            except BaseException as e:  # noqa: BLE001
                errors.append(repr(e))
                return
            assert 0 <= v
    readers = [threading.Thread(target=reader) for _ in range(4)]
    for th in readers:
        th.start()
    writers = [
        threading.Thread(
            target=lambda: [IC._write_hint(path, v) for v in range(2500)]
        )
        for _ in range(2)
    ]
    for th in writers:
        th.start()
    for th in writers:
        th.join()
    stop.set()
    for th in readers:
        th.join()
    assert not errors, f"reader observed a torn hint: {errors[:3]}"
    # no tmp litter left behind
    leftovers = [
        f for f in os.listdir(os.path.join(path, "metadata"))
        if f.startswith(".version-hint.")
    ]
    assert not leftovers


def test_empty_hint_recovers_via_directory_probe(spark, tmpdir):
    """A torn/garbled hint left by a foreign writer (or a non-POSIX fs) is
    treated as hint-lag: _read_version probes metadata/ for max vN instead
    of crashing, so reads keep working."""
    path = os.path.join(tmpdir, "ice_empty_hint")
    IC.write_iceberg(spark.range(0, 7).select(F.col("id").alias("tag")), path)
    hint = os.path.join(path, "metadata", "version-hint.text")
    for content in ("", "  ", "garbage"):
        with open(hint, "w") as fh:
            fh.write(content)
        assert IC._read_version(path) == 0
        assert IC.read_iceberg(spark, path).count() == 7
