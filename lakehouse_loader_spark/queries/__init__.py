"""Declared-query registry.

Each query from SURVEY.md §2 registers itself here with (a) a Spark
implementation ``fn(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI
SQL string a DuckDB oracle can run on the same parquet tables (``oracle``;
``None`` for genuinely non-SQL-expressible operators — the driver then runs a
weaker rows-only check).

Column-name discipline: every computed/aggregate column is aliased to the SAME
name in both the Spark plan and the oracle SQL — the correctness gate sorts
columns by name before hashing values.

Float discipline: any column derived by arithmetic (sums of doubles, ratios)
is rounded to a fixed scale in BOTH implementations, because double summation
order differs between engines; raw (non-derived) doubles are left untouched —
both engines read identical parquet bits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for the DuckDB oracle, or None (rows-only check)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query-defining module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    import lakehouse_loader_spark.queries.relational  # noqa: F401
    import lakehouse_loader_spark.queries.extensions  # noqa: F401
    import lakehouse_loader_spark.queries.pipeline  # noqa: F401

    _LOADED = True
