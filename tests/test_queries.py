"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

from tests._compare import assert_frames_match
from tests.conftest import SF_ORACLE

_ensure_loaded()
ORACLE_KEYS = sorted(k for k, spec in REGISTRY.items() if spec.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, spec in REGISTRY.items() if spec.oracle is None)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, key):
    spec = REGISTRY[key]
    spark_pdf = spec.fn(spark, SF_ORACLE).toPandas()
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(spark, key):
    spec = REGISTRY[key]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
