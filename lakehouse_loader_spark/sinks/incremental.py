"""Incremental materialized-aggregate maintenance over a Delta or Iceberg
source — append-only by default, with opt-in incremental view maintenance
over DML history via the row-level change feeds (``on_rewrite="cdf"``).

The reference is a one-shot loader (each run rewrites or appends a whole
table, src/lib.rs:84-198); the natural next step for a pipeline consuming
its output is "keep a GROUP BY summary of this table fresh without
rescanning it".  This module folds ONLY the source versions not yet
processed into a small aggregate Delta table:

    source (append-only Delta)  --read_delta_appends-->  delta rows
    delta rows --partial agg--> partials
    (old aggregate ∪ partials) --re-aggregate--> new aggregate table

Exactly-once is the same Delta ``txn`` (appId, version) handshake
``stream_to_delta`` uses (streaming/events.py): the last folded SOURCE
version rides the target's commit; a replay of an already-folded range is
detected up front and skipped.

Scale shape: the incremental read is O(new files) via the file-level append
feed (log-only planning); the delta aggregates map-side before one shuffle
on the group key; the merge re-aggregates (old ∪ partial), and an aggregate
table is ≤ |group-key domain| rows — orders of magnitude smaller than a
100 TB source, so rewriting it per refresh is the cheap part.

Only decomposable aggregates are supported — sum / count / min / max, the
fns with an associative merge (sum→sum, count→sum, min→min, max→max).  avg
is deliberately absent: request sum + count and divide at read time
(avg-of-avgs is wrong, and storing the pair is the standard fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks.delta import (
    ConcurrentModificationError,
    _read_log,
    last_txn_version,
    read_delta,
    read_delta_appends,
    table_exists,
    write_delta,
)

# agg fn -> (delta-partial fn, merge fn over partial columns)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _partial_agg(
    df: DataFrame, group_by: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    cols = []
    for out, (fn, src) in aggs.items():
        partial_fn, _ = _DECOMPOSABLE[fn]
        cols.append(partial_fn(F.lit(1) if src == "*" else F.col(src)).alias(out))
    return df.groupBy(*group_by).agg(*cols)


def _merge_agg(
    df: DataFrame, group_by: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    cols = []
    for out, (fn, _src) in aggs.items():
        _, merge_fn = _DECOMPOSABLE[fn]
        cols.append(merge_fn(F.col(out)).alias(out))
    return df.groupBy(*group_by).agg(*cols)


def _signed_partial(
    changes: DataFrame, group_by: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial aggregate over a change feed: inserts weigh +1, deletes -1,
    so sums and counts fold DML exactly (an UPDATE's delete+insert pair
    nets to the value difference).  Only invertible fns reach here —
    min/max cannot be maintained under deletes without the full group."""
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    cols = []
    for out, (fn, src) in aggs.items():
        if fn == "sum":
            cols.append(F.sum(F.col(src) * w).alias(out))
        else:  # count
            counted = F.lit(1) if src == "*" else F.when(F.col(src).isNotNull(), 1).otherwise(0)
            cols.append(F.sum(counted * w).cast("long").alias(out))
    cols.append(F.count(F.lit(1)).alias("__nchanges"))  # unsigned feed-row count
    return changes.groupBy(*group_by).agg(*cols)


def _delta_source(spark: SparkSession, source_path: str):
    """(current marker, read-snapshot fn, read-appends fn, read-changes fn)
    for a Delta source; the marker is the table version (monotonic by
    construction)."""
    from lakehouse_loader_spark.sinks.delta import read_delta_changes

    source_version, _, _ = _read_log(source_path)

    def full():
        return read_delta(spark, source_path, version=source_version)

    def appends(since_marker: int):
        return read_delta_appends(
            spark, source_path, since_version=since_marker, end_version=source_version
        )

    def changes(since_marker: int):
        return read_delta_changes(
            spark, source_path, since_version=since_marker, end_version=source_version
        )

    return source_version, full, appends, changes


def _iceberg_source(spark: SparkSession, source_path: str):
    """Same contract for an Iceberg source.  Snapshot IDs are random, so
    the monotonic marker is the snapshot SEQUENCE number; the since-marker
    maps back to its snapshot id through the retained history (an expired
    since-snapshot is a loud error — rebuild from scratch)."""
    from lakehouse_loader_spark.sinks.iceberg import (
        _read_metadata,
        read_iceberg,
        read_iceberg_appends,
        read_iceberg_changes,
    )

    _, meta = _read_metadata(source_path)
    cur_id = meta["current-snapshot-id"]
    by_seq = {s["sequence-number"]: s["snapshot-id"] for s in meta.get("snapshots", [])}
    cur_seq = next(
        s["sequence-number"] for s in meta["snapshots"] if s["snapshot-id"] == cur_id
    )

    def _resolve(since_marker: int) -> int:
        if since_marker not in by_seq:
            raise ValueError(
                f"snapshot with sequence number {since_marker} is no longer "
                f"retained in {source_path} (expired?); delete the aggregate "
                "table and rebuild from scratch"
            )
        return by_seq[since_marker]

    def full():
        return read_iceberg(spark, source_path, snapshot_id=cur_id)

    def appends(since_marker: int):
        return read_iceberg_appends(
            spark,
            source_path,
            since_snapshot_id=_resolve(since_marker),
            end_snapshot_id=cur_id,
        )

    def changes(since_marker: int):
        return read_iceberg_changes(
            spark,
            source_path,
            since_snapshot_id=_resolve(since_marker),
            end_snapshot_id=cur_id,
        )

    return cur_seq, full, appends, changes


def refresh_aggregate(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    app_id: str = "delta-agg-maintenance",
    source_format: str = "delta",
    on_rewrite: str = "fail",
) -> dict:
    """Bring ``target_path`` up to date with
    ``SELECT group_by, aggs FROM source GROUP BY group_by``, reprocessing
    only source versions committed since the last refresh.

    ``aggs`` maps output column -> (fn, source column), fn in
    {sum, count, min, max}; source column "*" with count means COUNT(*).
    ``source_format``: "delta" (marker = table version) or "iceberg"
    (marker = snapshot sequence number, resolved back to a snapshot id
    through the retained history).  The aggregate TARGET is always a Delta
    table — its txn marker is the exactly-once mechanism.

    Returns {"since": v, "through": v', "delta_rows": n, "refreshed": bool}.

    Failure model: the fold OVERWRITES the (small) aggregate table, and the
    folded-through source version rides that same commit — a crash mid-
    refresh leaves the old table+old marker, no table at all, or (between
    the overwrite's create commits) an EMPTY table with no marker; the next
    refresh resumes from the marker or, in the latter two cases, recomputes
    from scratch.  Every re-read derives from the source log, so no state
    is ever unrecoverable.  A NON-empty unmarked target is refused — that
    is someone else's table, not a crash remnant.

    ``on_rewrite`` decides what happens when the source range is NOT
    append-only (DELETE/UPDATE/MERGE/overwrite committed since the last
    refresh):

    - ``"fail"`` (default): raise ConcurrentModificationError (from the
      append feed) — a silent double count is worse than a forced recompute
    - ``"rebuild"``: recompute the aggregate from the full snapshot
    - ``"cdf"``: fold the row-level change feed instead of the append feed
      (incremental view maintenance): inserts weigh +1, deletes -1, so an
      UPDATE nets to its value difference and an emptied group is dropped.
      Requires every aggregate to be INVERTIBLE (sum/count only — a
      deleted row may have held the group's min/max, which only the full
      group can re-derive) plus one ``("count", "*")`` output so emptied
      groups are detectable.  Works for both source formats; uses
      read_delta_changes / read_iceberg_changes.
    """
    for out, (fn, _src) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: '{fn}' is not a decomposable aggregate "
                f"(supported: {sorted(_DECOMPOSABLE)}); for avg, request "
                "sum and count and divide at read time"
            )
    if on_rewrite not in ("fail", "rebuild", "cdf"):
        raise ValueError(f"unknown on_rewrite mode {on_rewrite!r}")
    nrows_col = next(
        (out for out, (fn, src) in aggs.items() if fn == "count" and src == "*"), None
    )
    if on_rewrite == "cdf":
        bad = [out for out, (fn, _s) in aggs.items() if fn in ("min", "max")]
        if bad:
            raise ValueError(
                f"cdf maintenance cannot invert min/max ({bad}); use "
                "on_rewrite='rebuild' or drop those columns"
            )
        if nrows_col is None:
            raise ValueError(
                "cdf maintenance needs a ('count', '*') output column to "
                "detect emptied groups"
            )
    if source_format == "delta":
        cur_marker, read_full, read_appends, read_changes = _delta_source(spark, source_path)
    elif source_format == "iceberg":
        cur_marker, read_full, read_appends, read_changes = _iceberg_source(spark, source_path)
    else:
        raise ValueError(f"unknown source_format {source_format!r}")

    def _full_rebuild(overwrite: bool) -> dict:
        snap = read_full()
        # carry a hidden per-group row count through ONE source scan: the
        # checkpoint materializes the partials, the tiny sum reads them —
        # a separate snap.count() would re-scan the whole source just for
        # the informational field
        counted = _partial_agg(
            snap, group_by, {**aggs, "__nrows": ("count", "*")}
        ).localCheckpoint(eager=True)
        n = counted.agg(F.sum("__nrows")).first()[0] or 0
        write_delta(
            counted.drop("__nrows"), target_path,
            overwrite=overwrite, txn=(app_id, cur_marker),
        )
        return {
            "since": -1,
            "through": cur_marker,
            "delta_rows": int(n),
            "refreshed": True,
        }

    if not table_exists(target_path):
        return _full_rebuild(overwrite=False)

    since = last_txn_version(target_path, app_id)
    if since < 0:
        _, _, live_adds = _read_log(target_path)
        if not live_adds:
            # crash remnant: overwrite's delete-then-create window can leave
            # v0 (protocol+metaData) committed with no data and no txn
            # marker; an EMPTY unmarked target holds nothing to lose, so
            # recompute from scratch instead of wedging every future refresh
            return _full_rebuild(overwrite=True)
        raise ValueError(
            f"target {target_path} exists with data but carries no txn "
            f"marker for appId {app_id!r} — it was not built by "
            "refresh_aggregate; refusing to guess its coverage"
        )
    if since >= cur_marker:
        return {"since": since, "through": since, "delta_rows": 0, "refreshed": False}

    if on_rewrite == "cdf":
        partial = _signed_partial(read_changes(since), group_by, aggs).localCheckpoint(
            eager=True
        )
        n = partial.agg(F.sum("__nchanges")).first()[0] or 0
        if n == 0:
            merged = read_delta(spark, target_path)
        else:
            merged = _merge_agg(
                read_delta(spark, target_path).unionByName(partial.drop("__nchanges")),
                group_by,
                aggs,
            ).localCheckpoint(eager=True)
            neg = merged.filter(F.col(nrows_col) < 0).count()
            if neg:
                raise ValueError(
                    f"{neg} groups folded to a negative row count — the target "
                    "does not cover the folded range (marker misuse?); delete "
                    "it and rebuild from scratch"
                )
            # a group whose rows were all deleted leaves the aggregate
            merged = merged.filter(F.col(nrows_col) > 0)
        merged = merged.localCheckpoint(eager=True)
        write_delta(merged, target_path, overwrite=True, txn=(app_id, cur_marker))
        return {
            "since": since,
            "through": cur_marker,
            "delta_rows": int(n),
            "refreshed": True,
        }

    try:
        delta = read_appends(since)
    except ConcurrentModificationError:
        if on_rewrite == "rebuild":
            return _full_rebuild(overwrite=True)
        raise
    # one scan of the new files: checkpoint the counted partials, then the
    # row count is a tiny aggregate over them (not a second file scan)
    partial_counted = _partial_agg(
        delta, group_by, {**aggs, "__nrows": ("count", "*")}
    ).localCheckpoint(eager=True)
    n = partial_counted.agg(F.sum("__nrows")).first()[0] or 0
    if n == 0:
        # versions advanced without data (e.g. metadata-only commits):
        # still move the marker so the next refresh's log replay shortens
        merged = read_delta(spark, target_path)
    else:
        merged = _merge_agg(
            read_delta(spark, target_path).unionByName(partial_counted.drop("__nrows")),
            group_by,
            aggs,
        )
    # materialize BEFORE the overwrite deletes the old table the plan reads
    # from (localCheckpoint keeps it distributed; the aggregate is small)
    merged = merged.localCheckpoint(eager=True)
    write_delta(merged, target_path, overwrite=True, txn=(app_id, cur_marker))
    return {"since": since, "through": cur_marker, "delta_rows": int(n), "refreshed": True}
