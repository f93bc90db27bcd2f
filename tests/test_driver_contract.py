"""Guards the driver contract itself: __spark_entry__ must expose a
well-formed queries()/oracle_sql() pair and a working entry() under a
session the driver configures (i.e. not ours)."""

from __future__ import annotations

import pytest

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
    coverage.  Priority must be DERIVED from CORRECTNESS_r*.json (broken
    records first — they have a STANDING bad record needing re-proof — then
    never-sampled, then stalest greens) — a hardcoded list went stale in r04
    (ADVICE).  More new queries can exist than sample slots, so the hard
    invariant is: every BROKEN record in the prefix, and no green query
    ahead of any never-sampled one."""
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
    broken = [n for n in REGISTRY if n in hist and not hist[n][1]]
    never = [n for n in REGISTRY if n not in hist]
    # a green whose last record was rows-only but whose registry entry now
    # carries an oracle must RE-prove (the old green proves less than the
    # current contract) — it ranks with the never-sampled bucket
    upgraded = [
        n for n in REGISTRY
        if n in hist and hist[n][1] and hist[n][2] and REGISTRY[n].oracle is not None
    ]
    for n in broken:
        assert n in prefix, f"{n} (broken record) must be in the sampled prefix"
    # ordering is broken < (never-sampled ∪ contract-upgraded) < settled green
    rank_of = {n: i for i, n in enumerate(names)}
    settled = [
        n for n in REGISTRY if n in hist and hist[n][1] and n not in upgraded
    ]
    if never:
        worst_reprove = max(rank_of[n] for n in never + upgraded)
        for n in settled:
            assert rank_of[n] > max(rank_of[b] for b in broken + never[:1]), n
        greens_before_never = [n for n in settled if rank_of[n] < worst_reprove]
        assert greens_before_never == [], greens_before_never
    # settled greens are ordered stalest-first (contract-upgraded greens
    # rank earlier, in the re-prove bucket, regardless of round)
    green_rounds = [
        hist[n][0]
        for n in names
        if n in hist and hist[n][1] and n not in set(upgraded)
    ]
    assert green_rounds == sorted(green_rounds)


@pytest.mark.slow  # full-registry plan sweep (~4 min) — slow tier (r16)
def test_all_queries_have_distinct_output_columns(spark):
    """The driver sorts columns by name before hashing — duplicate output
    column names would be ambiguous."""
    from tests.conftest import SF_ORACLE

    for name, fn in ent.queries().items():
        cols = fn(spark, SF_ORACLE).columns
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns: {cols}"


def test_hash_fail_record_is_not_green():
    """A hash-mismatch record with err=None must land in the re-prove-first
    bucket (r05: tpch_q12_like had rows/schema match but hash_match=False and
    was mis-bucketed as green, so the fix was never re-sampled)."""
    from lakehouse_loader_spark.queries import _record_is_green

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 3, "oracle_rows": 3, "err": None}
    assert _record_is_green(ok)
    assert _record_is_green({**ok, "err": "no_oracle"})
    assert not _record_is_green({**ok, "hash_match": False})
    assert not _record_is_green({**ok, "rows_match": False})
    assert not _record_is_green({**ok, "schema_match": False})
    assert not _record_is_green({**ok, "err": "boom"})
    assert not _record_is_green({**ok, "spark_rows": None})
    # rows-only records carry no match flags at all — still green
    assert _record_is_green({"spark_rows": 10, "err": None})


def test_duplicate_query_name_raises():
    from lakehouse_loader_spark.queries import _ensure_loaded, query

    _ensure_loaded()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="registered twice"):
        @query("scan_project")
        def clobber(spark, sf_dir):  # pragma: no cover
            raise AssertionError
