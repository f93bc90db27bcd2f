"""Incremental materialized-aggregate maintenance over an append-only Delta
source.

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


def refresh_aggregate(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    app_id: str = "delta-agg-maintenance",
) -> dict:
    """Bring ``target_path`` up to date with
    ``SELECT group_by, aggs FROM source GROUP BY group_by``, reprocessing
    only source versions committed since the last refresh.

    ``aggs`` maps output column -> (fn, source column), fn in
    {sum, count, min, max}; source column "*" with count means COUNT(*).

    Returns {"since": v, "through": v', "delta_rows": n, "refreshed": bool}.

    Failure model: the fold OVERWRITES the (small) aggregate table, and the
    folded-through source version rides that same commit — a crash mid-
    refresh leaves either the old table+old marker or no table at all (the
    overwrite's delete-then-create window); the next refresh then resumes
    from the marker or recomputes from scratch respectively.  Both re-reads
    derive from the source log, so no state is ever unrecoverable.

    Raises ConcurrentModificationError (from read_delta_appends) if the
    source range is not append-only — OPTIMIZE/MERGE on the source means
    file-level deltas can no longer attribute rows, and a silent double
    count is worse than a forced full recompute.
    """
    for out, (fn, _src) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: '{fn}' is not a decomposable aggregate "
                f"(supported: {sorted(_DECOMPOSABLE)}); for avg, request "
                "sum and count and divide at read time"
            )
    source_version, _, _ = _read_log(source_path)

    if not table_exists(target_path):
        snap = read_delta(spark, source_path, version=source_version)
        agg = _partial_agg(snap, group_by, aggs)
        write_delta(agg, target_path, txn=(app_id, source_version))
        return {
            "since": -1,
            "through": source_version,
            "delta_rows": snap.count(),
            "refreshed": True,
        }

    since = last_txn_version(target_path, app_id)
    if since < 0:
        raise ValueError(
            f"target {target_path} exists but carries no txn marker for "
            f"appId {app_id!r} — it was not built by refresh_aggregate; "
            "refusing to guess its coverage"
        )
    if since >= source_version:
        return {"since": since, "through": since, "delta_rows": 0, "refreshed": False}

    delta = read_delta_appends(spark, source_path, since_version=since, end_version=source_version)
    n = delta.count()
    if n == 0:
        # versions advanced without data (e.g. metadata-only commits):
        # still move the marker so the next refresh's log replay shortens
        merged = read_delta(spark, target_path)
    else:
        partial = _partial_agg(delta, group_by, aggs)
        merged = _merge_agg(
            read_delta(spark, target_path).unionByName(partial), group_by, aggs
        )
    # materialize BEFORE the overwrite deletes the old table the plan reads
    # from (localCheckpoint keeps it distributed; the aggregate is small)
    merged = merged.localCheckpoint(eager=True)
    write_delta(merged, target_path, overwrite=True, txn=(app_id, source_version))
    return {"since": since, "through": source_version, "delta_rows": n, "refreshed": True}
