"""Shared compound-predicate machinery for the scan planners (the Iceberg
and Delta read paths express the same grammar; only the metadata they prune
from differs).  Everything here is pure — no I/O, no Spark session."""

from __future__ import annotations

SCAN_OPS = ("=", "<", "<=", ">", ">=", "between", "in")


def _check_atom(p: tuple) -> tuple:
    col, op = p[0], p[1]
    if op not in SCAN_OPS:
        raise ValueError(f"unsupported op {op!r} (have {SCAN_OPS})")
    if op == "between":
        if len(p) != 4:
            raise ValueError("between needs (col, 'between', lo, hi)")
    elif op == "in":
        if len(p) != 3 or not isinstance(p[2], (list, tuple, set)):
            raise ValueError("in needs (col, 'in', [values...])")
        # tuple-ize the value list so normalized atoms are hashable
        # (planners key per-atom literal caches on the atom itself)
        return (p[0], "in", tuple(p[2]))
    elif len(p) != 3:
        raise ValueError(f"predicate needs (col, op, value): {p!r}")
    return tuple(p)


def normalize_preds(predicates: list) -> list[list[tuple]]:
    """CNF normalization: the input is a list ANDed together; each element
    is either one atomic predicate tuple, or a LIST of atomic tuples ORed
    together.  Returns a list of OR-groups (singletons for plain atoms).
    A file is excludable under a group only when EVERY disjunct excludes
    it; under the whole predicate when ANY group does."""
    groups: list[list[tuple]] = []
    for p in predicates:
        if isinstance(p, (list,)) or (
            isinstance(p, tuple) and p and isinstance(p[0], (list, tuple))
        ):
            group = [_check_atom(a) for a in p]
            if not group:
                raise ValueError("empty OR-group")
            groups.append(group)
        else:
            groups.append([_check_atom(p)])
    return groups


def atoms_of(groups: list[list[tuple]]) -> list[tuple]:
    return [a for g in groups for a in g]


def file_verdict(groups: list[list[tuple]], atom_excludes) -> str | None:
    """None (keep) or the excluding mechanism: 'partition' when every
    disjunct of the deciding group was excluded by its exact partition
    value, else 'stats'.  ``atom_excludes(atom) -> None|'partition'|'stats'``.
    """
    for group in groups:
        results = [atom_excludes(a) for a in group]
        if all(r is not None for r in results):
            return "partition" if all(r == "partition" for r in results) else "stats"
    return None


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


def residual_filter(groups: list):
    """Exact Spark filter for a normalized (or raw) predicate set: AND over
    groups, OR within a group."""
    import functools

    groups = normalize_preds(groups)  # idempotent on normalized input
    if not groups:
        return None

    def group_col(g):
        return functools.reduce(lambda a, b: a | b, (predicate_column(p) for p in g))

    return functools.reduce(lambda a, b: a & b, (group_col(g) for g in groups))
