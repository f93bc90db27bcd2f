"""Write-path options the reference left as TODOs (src/lib.rs:199-203):
parquet bloom filters and pre-write sort clustering, on both sinks."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL
from lakehouse_loader_spark.sinks import iceberg as IC


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="wopt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark):
    # md5 strings give the bloom filter high-cardinality values to encode
    return spark.range(0, 120000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    ).coalesce(1)


def _table_bytes(path: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if "_delta_log" not in p
    )


def test_delta_bloom_filter_written(spark, tmpdir):
    plain, bloomed = os.path.join(tmpdir, "p"), os.path.join(tmpdir, "b")
    DL.write_delta(_df(spark), plain)
    DL.write_delta(_df(spark), bloomed, bloom_filter_columns=["h"])
    # pyarrow 16 exposes no bloom metadata, so the contract check is the
    # bitset's size footprint: same rows, same codec, >100 KiB of filter
    delta = _table_bytes(bloomed) - _table_bytes(plain)
    assert delta > 100_000, delta
    # data is unaffected
    assert DL.read_delta(spark, bloomed).count() == 120000


def test_iceberg_bloom_filter_written(spark, tmpdir):
    plain, bloomed = os.path.join(tmpdir, "p"), os.path.join(tmpdir, "b")
    IC.write_iceberg(_df(spark), plain)
    IC.write_iceberg(_df(spark), bloomed, bloom_filter_columns=["h"])
    assert _table_bytes(bloomed) - _table_bytes(plain) > 100_000
    assert IC.read_iceberg(spark, bloomed).count() == 120000


def test_delta_sorted_write_tightens_stats(spark, tmpdir):
    """sort_by + the maxRecordsPerFile rollover gives each file a
    contiguous slice of the sort domain — the property stats-based data
    skipping depends on.  (Per-partition clustering: at scale you
    repartitionByRange upstream so partitions are range-disjoint too.)"""
    t = os.path.join(tmpdir, "t")
    df = spark.range(0, 100000).select(
        (F.hash("id") % 1000).alias("k"), F.col("id")
    ).coalesce(1)
    DL.write_delta(df, t, max_rows_per_file=25000, sort_by=["k"])
    _, _, adds = DL._read_log(t)
    ranges = []
    for a in adds.values():
        st = json.loads(a["stats"])
        ranges.append((st["minValues"]["k"], st["maxValues"]["k"]))
    assert len(ranges) >= 2
    # within-file ranges must be far narrower than the full domain
    spans = [hi - lo for lo, hi in ranges]
    assert sum(spans) / len(spans) < 1200  # unsorted would be ~2000 each
    # skipping actually prunes: a point probe keeps a strict subset
    kept, total = DL.prune_files_by_stats(t, "k", 0, 0)
    assert 0 < len(kept) < total


def test_cli_bloom_and_sort_flags(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main

    src = os.path.join(tmpdir, "src.parquet")
    _df(spark).write.parquet(src)
    plain, opt = os.path.join(tmpdir, "p"), os.path.join(tmpdir, "o")
    do_main(["parquet-to-delta", src, plain])
    do_main(["parquet-to-delta", src, opt, "--bloom-filter", "h", "--sort-by", "id"])
    assert _table_bytes(opt) - _table_bytes(plain) > 100_000
    assert DL.read_delta(spark, opt).count() == 120000
