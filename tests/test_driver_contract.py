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


def test_all_queries_have_distinct_output_columns(spark):
    """The driver sorts columns by name before hashing — duplicate output
    column names would be ambiguous."""
    from tests.conftest import SF_ORACLE

    for name, fn in ent.queries().items():
        cols = fn(spark, SF_ORACLE).columns
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns: {cols}"
