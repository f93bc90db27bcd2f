"""Manifest column bounds (Iceberg spec lower/upper_bounds) and the data
skipping they enable."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC


def test_bound_codec_roundtrips_all_types():
    cases = [
        ("boolean", True),
        ("boolean", False),
        ("int", -42),
        ("long", 1 << 40),
        ("float", 1.5),
        ("double", -3.25),
        ("string", "naïve"),
        ("date", dt.date(2001, 2, 3)),
        ("timestamp", dt.datetime(2020, 5, 6, 7, 8, 9, 123456)),
    ]
    for t, v in cases:
        assert IC._decode_bound(t, IC._encode_bound(t, v)) == v, t
    # tz-aware timestamps normalize to UTC-naive
    aware = dt.datetime(2020, 1, 1, 12, tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert IC._decode_bound("timestamp", IC._encode_bound("timestamp", aware)) == (
        dt.datetime(2020, 1, 1, 10)
    )
    assert IC._encode_bound("fixed[16]", b"x") is None  # unsupported → no bound


def test_manifests_record_bounds_and_prune(spark, tmpdir):
    """Three range-disjoint files: the manifest bounds alone identify which
    files can hold a range — no data file opened to plan."""
    path = os.path.join(tmpdir, "ice")
    for lo in (0, 1000, 2000):
        IC.write_iceberg(
            spark.range(lo, lo + 100).select(
                "id", F.concat(F.lit("n"), F.col("id")).alias("name")
            ).coalesce(1),
            path,
            append=lo > 0,
        )
    _, meta = IC._read_metadata(path)
    data, _, _ = IC._split_live_entries(path, meta)
    assert len(data) == 3
    for d in data:
        assert d["lower_bounds"] and d["upper_bounds"]

    kept, total = IC.prune_iceberg_files_by_stats(path, "id", 1040, 1060)
    assert total == 3 and len(kept) == 1
    back = IC.read_iceberg_stats_pruned(spark, path, "id", 1040, 1060)
    assert back.count() == 100  # the one file; caller applies the row filter
    assert back.filter("id BETWEEN 1040 AND 1060").count() == 21
    # string bounds prune too
    kept_s, _ = IC.prune_iceberg_files_by_stats(path, "name", "n1000", "n1999")
    assert 1 <= len(kept_s) < 3
    with pytest.raises(ValueError, match="not a column"):
        IC.prune_iceberg_files_by_stats(path, "nope", 0, 1)


def test_merge_probe_skips_out_of_range_files(spark, tmpdir):
    """MERGE's matched-file probe reads only files whose key bounds
    intersect the source range — verified by result correctness plus the
    rewrite set staying minimal."""
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 100).select("id", F.lit(0.0).alias("v")).coalesce(1), path)
    IC.write_iceberg(
        spark.range(5000, 5100).select("id", F.lit(0.0).alias("v")).coalesce(1),
        path,
        append=True,
    )
    src = spark.range(5010, 5015).select("id", F.lit(9.0).alias("v"))
    res = IC.merge_iceberg(spark, path, src, key="id")
    assert res["updated"] == 5 and res["inserted"] == 0
    assert res["rewritten_files"] == 1  # the low file never probed as affected
    back = IC.read_iceberg(spark, path)
    assert back.filter("v = 9.0").count() == 5
    assert back.count() == 200


def test_pre_bounds_manifests_still_read_and_never_skip(spark, tmpdir):
    """Entries without bounds (older manifests / delete files) read fine
    and are conservatively kept by the pruner."""
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 50).select("id").coalesce(1), path)
    _, meta = IC._read_metadata(path)
    data, _, _ = IC._split_live_entries(path, meta)
    stripped = dict(data[0])
    stripped.pop("lower_bounds", None)
    stripped.pop("upper_bounds", None)
    assert IC._entry_bounds(stripped, 1, "long") == (None, None)
    kept, total = IC.prune_iceberg_files_by_stats(path, "id", 10_000, 20_000)
    assert total == 1 and len(kept) == 1 or len(kept) == 0  # bounds present → skip
    # MOR delete files carry no bounds and never break the pruner
    IC.delete_from_iceberg(spark, path, "id < 5", strategy="merge-on-read")
    kept2, total2 = IC.prune_iceberg_files_by_stats(path, "id", 0, 100)
    assert total2 == 1 and len(kept2) == 1
    pruned = IC.read_iceberg_stats_pruned(spark, path, "id", 0, 100)
    assert pruned.count() == 45  # deletes applied to the pruned scan


def test_timestamp_bound_encoding_is_exact():
    """int(total_seconds()*1e6) loses a microsecond on ~1% of values; the
    timedelta floor-division encode must round-trip EVERY microsecond
    timestamp (an upper bound 1us low would skip files that contain the
    boundary row)."""
    base = dt.datetime(2038, 2, 27, 21, 18, 46, 981929)  # a known-bad value
    assert IC._decode_bound("timestamp", IC._encode_bound("timestamp", base)) == base
    for i in range(50_000):
        v = dt.datetime(2030, 1, 1) + dt.timedelta(microseconds=981929 + i * 7919)
        assert IC._decode_bound("timestamp", IC._encode_bound("timestamp", v)) == v


def test_expire_pins_current_during_wap_window(spark, tmpdir):
    """With unpublished branch commits newer than current, expire must pin
    the CURRENT snapshot (age-based retention alone would expire it) and
    the table stays readable on both lines."""
    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 10).coalesce(1), path)
    IC.append_to_branch(spark.range(10, 20).coalesce(1), path, "audit")
    IC.append_to_branch(spark.range(20, 30).coalesce(1), path, "audit")
    IC.expire_snapshots(path, keep_last=1)
    assert IC.read_iceberg(spark, path).count() == 10  # main line intact
    assert IC.read_iceberg(spark, path, ref="audit").count() == 30
