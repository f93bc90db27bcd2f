"""Iceberg hidden-partitioning transforms (sinks/transforms.py): Murmur3
bucket hashing pinned to the spec's appendix-B test vectors, canonical
expression parsing, and day/bucket/truncate partitioned writes with
manifest-level pruning."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks import transforms as TR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ptrans_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# -- spec appendix-B hash vectors -------------------------------------------


def test_murmur3_matches_iceberg_spec_vectors():
    # int/long hash identically via the widened 8-byte little-endian form
    assert TR.murmur3_long(np.array([34], dtype=np.int64))[0] == 2017239379
    # date 2017-11-16 = epoch day 17486
    assert TR.murmur3_long(np.array([17486], dtype=np.int64))[0] == -653330422
    # timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert TR.murmur3_long(np.array([1510871468000000], dtype=np.int64))[0] == -2047944441
    # strings hash as UTF-8 bytes
    assert TR.murmur3_bytes(b"iceberg") == 1210000089


def test_partition_expr_roundtrip():
    cases = {
        "ts": ("identity", "ts"),
        "day(ts)": ("day", "ts"),
        "bucket(16, id)": ("bucket[16]", "id"),
        "truncate(4, name)": ("truncate[4]", "name"),
    }
    for expr, (transform, src) in cases.items():
        assert TR.parse_partition_expr(expr) == (transform, src)
        assert TR.expr_of(transform, src) == expr
    assert TR.field_name("day", "ts") == "ts_day"
    assert TR.field_name("bucket[16]", "id") == "id_bucket"
    assert TR.field_name("truncate[4]", "name") == "name_trunc"
    with pytest.raises(ValueError):
        TR.parse_partition_expr("median(ts)")
    assert TR.result_type("day", "timestamp") == "date"
    assert TR.result_type("bucket[16]", "long") == "int"
    assert TR.result_type("truncate[4]", "string") == "string"


# -- day-partitioned write + prune ------------------------------------------


def _events(spark):
    rows = [
        (i, dt.datetime(2024, 3, 1 + (i % 3), 10 + i % 5), f"u{i % 4}") for i in range(60)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user string")


def test_day_partitioned_iceberg(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_events(spark), t, partition_by=["day(ts)"])
    # hidden partitioning: data dirs carry the derived field, files the source
    days = sorted(
        d for d in os.listdir(os.path.join(t, "data")) if d.startswith("ts_day=")
    )
    assert days == ["ts_day=2024-03-01", "ts_day=2024-03-02", "ts_day=2024-03-03"]
    back = IC.read_iceberg(spark, t)
    assert back.columns == ["event_id", "ts", "user"] and back.count() == 60
    # manifest-level pruning by the transform value
    kept, total = IC.prune_iceberg_files(t, "ts_day", dt.date(2024, 3, 2))
    assert kept and len(kept) < total
    pruned = IC.read_iceberg_pruned(spark, t, "ts_day", dt.date(2024, 3, 2))
    expected = _events(spark).filter(F.to_date("ts") == F.lit("2024-03-02")).count()
    assert pruned.count() == expected > 0
    # appends inherit the transform spec
    IC.write_iceberg(_events(spark), t, append=True)
    assert IC.read_iceberg(spark, t).count() == 120
    assert IC._default_spec_cols(IC._read_metadata(t)[1]) == ["day(ts)"]


def test_bucket_partitioned_iceberg(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_events(spark), t, partition_by=["bucket(4, event_id)"])
    back = IC.read_iceberg(spark, t)
    assert back.count() == 60
    # every row lands in the bucket the spec's murmur3 assigns
    want_bucket = int(
        (int(TR.murmur3_long(np.array([7], dtype=np.int64))[0]) & 0x7FFFFFFF) % 4
    )
    pruned = IC.read_iceberg_pruned(spark, t, "event_id_bucket", want_bucket)
    assert 7 in {r.event_id for r in pruned.collect()}
    # the four buckets partition the table exactly
    counts = [
        IC.read_iceberg_pruned(spark, t, "event_id_bucket", b).count() for b in range(4)
    ]
    assert sum(counts) == 60


def test_truncate_partitioned_iceberg(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_events(spark), t, partition_by=["truncate(1, user)"])
    dirs = sorted(
        d for d in os.listdir(os.path.join(t, "data")) if d.startswith("user_trunc=")
    )
    assert dirs == ["user_trunc=u"]
    assert IC.read_iceberg(spark, t).count() == 60


def test_transform_column_bucket_nulls(spark):
    df = spark.createDataFrame([(1,), (None,)], "v long")
    out = df.select(
        TR.transform_column("bucket[8]", "v", df.schema["v"].dataType).alias("b")
    ).collect()
    by_input = {r[0]: None for r in out}
    vals = [r.b for r in out]
    assert vals[1] is None and vals[0] is not None and 0 <= vals[0] < 8


# -- orphan-file cleanup ----------------------------------------------------


def test_remove_orphan_files(spark, tmpdir):
    """Unreferenced data files / manifests / staging dirs older than the
    grace period are deleted; everything any snapshot references — and
    anything younger than the grace — survives."""
    import time

    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_events(spark), t)
    IC.write_iceberg(_events(spark), t, append=True)
    before = IC.read_iceberg(spark, t).count()

    orphan_data = os.path.join(t, "data", "orphan-000.parquet")
    _events(spark).limit(1).toPandas().to_parquet(orphan_data)
    orphan_avro = os.path.join(t, "metadata", "manifest-deadbeef.avro")
    with open(orphan_avro, "wb") as fh:
        fh.write(b"Obj\x01junk")
    staging = os.path.join(t, ".staging-crashed")
    os.makedirs(staging)
    old = time.time() - 7200
    for p in (orphan_data, orphan_avro, staging):
        os.utime(p, (old, old))

    # young orphan: inside the grace period, must survive
    young = os.path.join(t, "data", "orphan-young.parquet")
    _events(spark).limit(1).toPandas().to_parquet(young)

    removed = IC.remove_orphan_files(t, older_than_s=3600)
    assert sorted(removed) == [
        ".staging-crashed",
        "data/orphan-000.parquet",
        "metadata/manifest-deadbeef.avro",
    ]
    assert not os.path.exists(orphan_data) and not os.path.exists(staging)
    assert os.path.exists(young)
    # the table itself is untouched, including time travel
    assert IC.read_iceberg(spark, t).count() == before
    first = IC.snapshot_ids(t)[0]
    assert IC.read_iceberg(spark, t, snapshot_id=first).count() == before // 2


def test_remove_orphans_cli(spark, tmpdir):
    import time

    from lakehouse_loader_spark.cli import do_main

    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_events(spark), t)
    orphan = os.path.join(t, "data", "orphan.parquet")
    _events(spark).limit(1).toPandas().to_parquet(orphan)
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))
    do_main(["remove-orphans", t, "--older-than-hours", "1"])
    assert not os.path.exists(orphan)
    assert IC.read_iceberg(spark, t).count() == 60
