from __future__ import annotations

import os

import duckdb
import pytest

from lakehouse_loader_spark import get_spark
from lakehouse_loader_spark.catalog import TABLE_NAMES, table_path

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lakehouse-tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the test tables registered as views, mirroring
    the driver's oracle setup."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_ORACLE, name)}')"
        )
    yield con
    con.close()
