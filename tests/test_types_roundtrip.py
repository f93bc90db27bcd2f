"""Golden all-types round-trip — the t1 fixture (FIXTURES.md §1, mirroring
the reference's tests/postgres-init-scripts/init-pg-data.sql and the
value-level assertions of test_pg_arrow_source,
tests/basic_integration.rs:220-427): every supported leaf type, an all-NULL
row, numeric edge values, through both sinks and back bit-faithfully."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from lakehouse_loader_spark.sinks import delta as DL
from lakehouse_loader_spark.sinks import iceberg as IC

T1_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("cbool", T.BooleanType(), True),
        T.StructField("cchar", T.ByteType(), True),
        T.StructField("cint2", T.ShortType(), True),
        T.StructField("cint4", T.IntegerType(), True),
        T.StructField("cint8", T.LongType(), True),
        T.StructField("cfloat4", T.FloatType(), True),
        T.StructField("cfloat8", T.DoubleType(), True),
        T.StructField("ctimestamp", T.TimestampNTZType(), True),
        T.StructField("ctimestamptz", T.TimestampType(), True),
        T.StructField("cdate", T.DateType(), True),
        T.StructField("cnumeric", T.DecimalType(8, 3), True),
        T.StructField("ctext", T.StringType(), True),
        T.StructField("cbytea", T.BinaryType(), True),
    ]
)

# The reference's hand-set numeric edge rows (init-pg-data.sql:50-58):
# expected unscaled i128 {0, 1, -2, 3000, -4000, 50001, ±99999999}
NUMERIC_EDGES = {
    2: Decimal("0.000"),
    3: Decimal("0.001"),
    4: Decimal("-0.002"),
    5: Decimal("3.000"),
    6: Decimal("-4.000"),
    7: Decimal("50.001"),
    8: Decimal("99999.999"),
    9: Decimal("-99999.999"),
}

N_ROWS = 201  # row 1 all-NULL + 200 generated (reference: 1 + 25,000)


def _t1_rows():
    base_ts = dt.datetime(2024, 1, 1)
    base_tstz = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    base_date = dt.date(2024, 1, 1)
    rows = [(1,) + (None,) * 13]  # id=1 all-NULL (init-pg-data.sql:18)
    for s in range(1, N_ROWS):
        rid = s + 1
        rows.append(
            (
                rid,
                s % 2 == 1,
                (s % 256) - 128,
                s,
                s,
                s,
                s + 0.5,
                s + 0.5,
                base_ts + dt.timedelta(seconds=s),
                base_tstz + dt.timedelta(seconds=s),
                base_date + dt.timedelta(days=s),
                NUMERIC_EDGES.get(rid, Decimal(s) / Decimal(1000)),
                str(s),
                s.to_bytes(4, "big"),
            )
        )
    return rows


@pytest.fixture(scope="module")
def t1(spark):
    return spark.createDataFrame(_t1_rows(), T1_SCHEMA)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="t1_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _assert_t1_faithful(back, int_widened: bool = False):
    expected = [(f.name, f.dataType) for f in T1_SCHEMA.fields]
    if int_widened:
        # Iceberg's type system has no byte/short — both are `int` per spec,
        # matching the reference's Arrow Int8/Int16 → Iceberg int mapping
        expected = [
            (n, T.IntegerType() if isinstance(t, (T.ByteType, T.ShortType)) else t)
            for n, t in expected
        ]
    assert [(f.name, f.dataType) for f in back.schema.fields] == expected
    got = {r.id: r for r in back.collect()}
    assert len(got) == N_ROWS
    # all-NULL row (basic_integration.rs checks nulls first row)
    r1 = got[1]
    for f in T1_SCHEMA.fieldNames()[1:]:
        assert getattr(r1, f) is None, f
    # value spot checks (reference asserts first rows per column)
    r2 = got[2]
    assert r2.cbool is True and r2.cchar == -127 and r2.cint8 == 1
    assert r2.cfloat4 == 1.5 and r2.ctext == "1"
    assert r2.ctimestamp == dt.datetime(2024, 1, 1, 0, 0, 1)
    assert r2.cdate == dt.date(2024, 1, 2)
    assert r2.cbytea == (1).to_bytes(4, "big")
    # numeric edges → exact decimals (scaled-i128 parity)
    for rid, expected in NUMERIC_EDGES.items():
        assert got[rid].cnumeric == expected, (rid, got[rid].cnumeric, expected)


def test_t1_delta_roundtrip(spark, t1, tmpdir):
    path = os.path.join(tmpdir, "t1_delta")
    DL.write_delta(t1, path)
    _assert_t1_faithful(DL.read_delta(spark, path))


def test_t1_iceberg_roundtrip(spark, t1, tmpdir):
    path = os.path.join(tmpdir, "t1_iceberg")
    IC.write_iceberg(t1, path)
    _assert_t1_faithful(IC.read_iceberg(spark, path), int_widened=True)


def test_t1_batch_boundaries(spark, t1):
    """Reference asserts 10,000/10,000/5,001 batch splits at batch_size
    10,000 (basic_integration.rs:222-241); the Spark analog is
    maxRecordsPerFile rollover (R7)."""
    import glob
    import tempfile as tf

    d = tf.mkdtemp(prefix="t1_parts_")
    try:
        path = os.path.join(d, "t")
        DL.write_delta(t1.repartition(1), path, max_rows_per_file=100)
        parts = glob.glob(os.path.join(path, "*.parquet"))
        assert len(parts) == 3  # 100 + 100 + 1
        total = spark.read.parquet(*parts).count()
        assert total == N_ROWS
    finally:
        shutil.rmtree(d, ignore_errors=True)
