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


@pytest.fixture(scope="session")
def planner_tables(spark, tmp_path_factory):
    """One staged Iceberg table per partition layout for the planner
    property test (session-scoped: hypothesis re-runs share the staging)."""
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.sinks import iceberg as IC

    base = tmp_path_factory.mktemp("planner")
    df = spark.range(0, 1000).select(
        "id",
        (F.col("id") % 10).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("n"), (F.col("id") % 50).cast("string")).alias("name"),
    )
    tables = {}
    for layout in (None, ["k"], ["bucket(4, id)"], ["truncate(2, name)"]):
        path = str(base / f"t_{abs(hash(str(layout)))}")
        IC.write_iceberg(
            df.repartitionByRange(6, "id").sortWithinPartitions("id"),
            path,
            partition_by=layout,
        )
        tables[str(layout)] = path
    return df, tables
