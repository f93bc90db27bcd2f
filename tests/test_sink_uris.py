"""file:// URI table locations for both sinks — the layer the reference's
CompatObjectStore provides (delta_destination.rs:232-390): a table may be
addressed by URI or by bare path interchangeably, and reads/writes through
either form see the same table.  Non-local schemes are rejected loudly
rather than silently treated as local directories."""

from __future__ import annotations

import os

import pytest

from lakehouse_loader_spark.sinks import delta as DL
from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks.staging import local_path


def _forms(path: str) -> list[str]:
    return [path, f"file://{path}"]


def test_local_path_normalization():
    assert local_path("/tmp/x") == "/tmp/x"
    assert local_path("file:///tmp/x") == "/tmp/x"
    assert local_path("file:/tmp/x") == "/tmp/x"
    assert local_path("file://localhost/tmp/x") == "/tmp/x"
    assert local_path("file:///tmp/with%20space") == "/tmp/with space"
    assert local_path("relative/dir") == "relative/dir"
    with pytest.raises(ValueError):
        local_path("s3://bucket/key")
    with pytest.raises(ValueError):
        local_path("file://otherhost/tmp/x")


@pytest.mark.parametrize("write_uri", [False, True])
def test_delta_uri_roundtrip(spark, tmpdir, write_uri):
    bare = os.path.join(tmpdir, "d")
    write_to, read_from = _forms(bare)[::-1] if write_uri else _forms(bare)
    df = spark.range(0, 50).withColumnRenamed("id", "v")
    DL.write_delta(df, write_to)
    # both address forms resolve to ONE table on disk
    assert os.path.isdir(os.path.join(bare, "_delta_log"))
    assert DL.table_exists(read_from)
    assert DL.read_delta(spark, read_from).count() == 50
    DL.write_delta(df, f"file://{bare}", append=True)
    assert DL.read_delta(spark, bare).count() == 100
    # create is the reference's two-commit layout (v0+v1) → append is v2
    assert DL.table_history(f"file://{bare}")[0]["version"] == 2


@pytest.mark.parametrize("write_uri", [False, True])
def test_iceberg_uri_roundtrip(spark, tmpdir, write_uri):
    bare = os.path.join(tmpdir, "i")
    write_to, read_from = _forms(bare)[::-1] if write_uri else _forms(bare)
    df = spark.range(0, 50).withColumnRenamed("id", "v")
    IC.write_iceberg(df, write_to)
    assert os.path.isfile(os.path.join(bare, "metadata", "version-hint.text"))
    assert IC.table_exists(read_from)
    assert IC.read_iceberg(spark, read_from).count() == 50
    IC.write_iceberg(df, f"file://{bare}", append=True)
    assert IC.read_iceberg(spark, bare).count() == 100
    assert IC.snapshot_sequence_numbers(f"file://{bare}") == [1, 2]


def test_iceberg_pruned_read_via_uri(spark, tmpdir):
    import pyspark.sql.functions as F

    bare = os.path.join(tmpdir, "ip")
    df = spark.range(0, 30).select(
        F.col("id").alias("v"), F.pmod("id", F.lit(3)).alias("k")
    )
    IC.write_iceberg(df, f"file://{bare}", partition_by=["k"])
    kept, total = IC.prune_iceberg_files(f"file://{bare}", "k", "1")
    assert kept and len(kept) < total
    assert IC.read_iceberg_pruned(spark, f"file://{bare}", "k", "1").count() == 10


def test_non_local_scheme_rejected(spark):
    df = spark.range(0, 1).withColumnRenamed("id", "v")
    with pytest.raises(ValueError, match="scheme"):
        DL.write_delta(df, "s3://bucket/table")
    with pytest.raises(ValueError, match="scheme"):
        IC.write_iceberg(df, "s3://bucket/table")
