"""As-of (temporal point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union-merge pattern: union the keyed left and
right streams, sort within key by (ts, side), and carry the latest right-side
payload forward with ``last(..., ignorenulls=True)``.  One shuffle on the
key, no broadcast of either side, no per-row lookup — the shape that holds at
100 TB (equivalent to the merge phase of a sort-merge join).

Right side must be unique per (key, ts) for deterministic results — true for
rollup/checkpoint tables by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the matching right
    row with equal ``key``: direction="backward" picks the LATEST right row
    with ``right_ts <= left_ts``; direction="forward" picks the EARLIEST
    right row with ``right_ts >= left_ts`` (both inclusive);
    direction="nearest" picks whichever of those two is closer in time
    (ties go backward — the already-seen row, the causally safe choice).

    Returns all left columns plus ``value_cols`` (null when no right row
    matches, like an ASOF LEFT JOIN).  Tolerance bounds are expressed by
    shifting ``left_ts`` before the call (see asof_join_event_rate)."""
    # a right row with NULL timestamp can never be "at or before/after" any
    # left row — drop them up front.  Without this, ascending-scan paths
    # sort NULLs FIRST and last(ignorenulls) would hand every left row the
    # null-ts payload as a bogus backward match (and in nearest mode its
    # NULL distance poisons the closer-side comparison).
    right = right.filter(F.col(right_ts).isNotNull())
    if direction == "nearest":
        return _asof_join_nearest(left, right, key, left_ts, right_ts, value_cols, how)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    lcols = left.columns
    # all value columns ride in ONE struct so the window picks the matched
    # right ROW atomically — per-column last(ignorenulls) would stitch
    # values from DIFFERENT right rows whenever the newest one has a NULL
    # member (and could not represent "matched a row whose value is NULL")
    payload = F.struct(*[F.col(v) for v in value_cols])
    # tie order at equal ts: the right row must be ELIGIBLE — backward
    # scans ⟸ so right sorts before left; forward scans ⟹ so left sorts
    # before right
    left_src = 1 if direction == "backward" else 0
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__src", F.lit(left_src)).withColumn(
        "__payload", F.lit(None).cast(right.select(payload.alias("p")).schema["p"].dataType)
    )
    r = (
        right.withColumn("__t", F.col(right_ts))
        .withColumn("__src", F.lit(1 - left_src))
        .withColumn("__payload", payload)
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "__t", "__src", "__payload", *[c for c in lcols if c != key]]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    if direction == "backward":
        w = (
            W.partitionBy(key)
            .orderBy("__t", "__src")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        # DESCENDING scan with the same GROWING preceding frame: the frame
        # of a row holds exactly the rows with __t >= its own, and
        # last(ignorenulls) is the nearest such right row.  A
        # (currentRow, unboundedFollowing) frame would be semantically
        # identical but Spark re-evaluates unbounded-following frames from
        # scratch per row — O(n²) per key partition; the growing preceding
        # frame is incremental, O(n), matching the backward path.
        # Tie order flips with the sort: right rows (src=1) must sort
        # BEFORE left (src=0) at equal ts, which __src descending gives.
        w = (
            W.partitionBy(key)
            .orderBy(F.col("__t").desc(), F.col("__src").desc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    match_expr = F.last("__payload", ignorenulls=True).over(w)
    # a NULL left timestamp matches nothing in either direction (in a
    # descending sort nulls come LAST, so without the guard a null-ts left
    # row's frame would span the whole partition and invent a match)
    match_expr = F.when(F.col("__t").isNotNull(), match_expr)
    matched = unioned.withColumn("__match", match_expr)
    out = matched.filter(F.col("__src") == F.lit(left_src))
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    for v in value_cols:
        out = out.withColumn(v, F.col("__match").getField(v))
    return out.select(*lcols, *value_cols)


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str,
) -> DataFrame:
    """Nearest-direction as-of: ONE union + ONE shuffle on the key, with
    both scan directions as two window passes over the same partitioning
    (the second window adds a sort, never an exchange).  The right
    timestamp rides inside the payload struct so the time distance of each
    candidate is computable at choose time; ties prefer the backward
    (already-seen) row."""
    lcols = left.columns
    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(v) for v in value_cols])
    # backward-eligibility tie order: right (src 0) before left (src 1) asc
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__src", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(right.select(payload.alias("p")).schema["p"].dataType)
    )
    r = (
        right.withColumn("__t", F.col(right_ts))
        .withColumn("__src", F.lit(0))
        .withColumn("__payload", payload)
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "__t", "__src", "__payload", *[c for c in lcols if c != key]]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    wb = (
        W.partitionBy(key)
        .orderBy("__t", "__src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # descending scan, right still first at equal ts (src ascending)
    wf = (
        W.partitionBy(key)
        .orderBy(F.col("__t").desc(), F.col("__src").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    guard = F.col("__t").isNotNull()
    back = F.when(guard, F.last("__payload", ignorenulls=True).over(wb))
    fwd = F.when(guard, F.last("__payload", ignorenulls=True).over(wf))
    matched = unioned.withColumn("__b", back).withColumn("__f", fwd)
    dist_b = matched["__t"] - matched["__b"].getField("__rts")
    dist_f = matched["__f"].getField("__rts") - matched["__t"]
    choose = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(dist_f < dist_b, F.col("__f"))
        .otherwise(F.col("__b"))
    )
    out = matched.withColumn("__match", choose).filter(F.col("__src") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    for v in value_cols:
        out = out.withColumn(v, F.col("__match").getField(v))
    return out.select(*lcols, *value_cols)
