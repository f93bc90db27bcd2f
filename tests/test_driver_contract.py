"""Guards the driver contract itself: __spark_entry__ must expose a
well-formed queries()/oracle_sql() pair and a working entry() under a
session the driver configures (i.e. not ours)."""

from __future__ import annotations

import __spark_entry__ as ent


def test_contract_shapes(spark):
    qs = ent.queries()
    os_ = ent.oracle_sql()
    assert len(qs) >= 60
    assert set(os_) <= set(qs), "every oracle key must have a query"
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) == 10


def test_sampling_order_derived_from_driver_records():
    """The driver samples a prefix of registration order, so ordering decides
    coverage.  Priority must be DERIVED from CORRECTNESS_r*.json (never-
    sampled first, then broken, then stalest greens) — a hardcoded list went
    stale in r04 (ADVICE).  With the r01–r04 records present, every name
    with a missing or broken record must land inside the first 50."""
    from lakehouse_loader_spark.queries import (
        REGISTRY,
        _driver_history,
        _ensure_loaded,
        _ordered_names,
    )

    _ensure_loaded()
    names = _ordered_names()
    assert sorted(names) == sorted(REGISTRY), "ordering must be a permutation"
    hist = _driver_history()
    if not hist:  # fresh checkout without CORRECTNESS files: plain order
        assert names == list(REGISTRY)
        return
    prefix = set(names[:50])
    for n in REGISTRY:
        rec = hist.get(n)
        if rec is None or not rec[1]:  # never sampled, or latest record broken
            assert n in prefix, f"{n} (record={rec}) must be in the sampled prefix"
    # greens are ordered stalest-first
    green_rounds = [hist[n][0] for n in names if n in hist and hist[n][1]]
    assert green_rounds == sorted(green_rounds)


def test_all_queries_have_distinct_output_columns(spark):
    """The driver sorts columns by name before hashing — duplicate output
    column names would be ambiguous."""
    from tests.conftest import SF_ORACLE

    for name, fn in ent.queries().items():
        cols = fn(spark, SF_ORACLE).columns
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns: {cols}"
