"""Shared compound-predicate machinery for the scan planners (the Iceberg
and Delta read paths express the same grammar; only the metadata they prune
from differs).  Everything here is pure — no I/O, no Spark session."""

from __future__ import annotations

SCAN_OPS = ("=", "<", "<=", ">", ">=", "between", "in")


def normalize_preds(predicates: list[tuple]) -> list[tuple]:
    out = []
    for p in predicates:
        col, op = p[0], p[1]
        if op not in SCAN_OPS:
            raise ValueError(f"unsupported op {op!r} (have {SCAN_OPS})")
        if op == "between":
            if len(p) != 4:
                raise ValueError("between needs (col, 'between', lo, hi)")
        elif op == "in":
            if len(p) != 3 or not isinstance(p[2], (list, tuple, set)):
                raise ValueError("in needs (col, 'in', [values...])")
        elif len(p) != 3:
            raise ValueError(f"predicate needs (col, op, value): {p!r}")
        out.append(tuple(p))
    return out


def partition_excludes(op: str, part, pv) -> bool:
    """Can a file be excluded given its EXACT (possibly transformed)
    partition value ``part`` and the transformed predicate literal(s)
    ``pv``?  All supported ops are null-rejecting, so a null partition
    (whole file has col NULL) excludes unconditionally."""
    if part is None:
        return True
    if op == "=":
        return part != pv
    if op == "in":
        return part not in pv
    if op in (">", ">="):
        return part < pv
    if op in ("<", "<="):
        return part > pv
    if op == "between":
        lo, hi = pv
        return part < lo or part > hi
    return False


def bounds_exclude(op: str, mn, mx, v) -> bool:
    """Can a file be excluded from its [mn, mx] column bounds?  Files
    without bounds are never excluded (mn/mx None)."""
    if mn is None or mx is None:
        return False
    if op == "=":
        return not (mn <= v <= mx)
    if op == "in":
        return not any(mn <= x <= mx for x in v)
    if op == ">":
        return mx <= v
    if op == ">=":
        return mx < v
    if op == "<":
        return mn >= v
    if op == "<=":
        return mn > v
    if op == "between":
        lo, hi = v
        return mx < lo or mn > hi
    return False


def predicate_column(p: tuple):
    """The EXACT Spark Column for a predicate — the residual filter every
    planned scan re-applies (pruning is file-granular)."""
    from pyspark.sql import functions as F

    col, op = F.col(p[0]), p[1]
    if op == "=":
        return col == F.lit(p[2])
    if op == "<":
        return col < F.lit(p[2])
    if op == "<=":
        return col <= F.lit(p[2])
    if op == ">":
        return col > F.lit(p[2])
    if op == ">=":
        return col >= F.lit(p[2])
    if op == "between":
        return col.between(F.lit(p[2]), F.lit(p[3]))
    return col.isin([x for x in p[2]])


def residual_filter(preds: list[tuple]):
    import functools

    if not preds:
        return None
    return functools.reduce(lambda a, b: a & b, (predicate_column(p) for p in preds))
