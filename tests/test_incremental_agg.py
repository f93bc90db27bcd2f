"""Incremental materialized-aggregate maintenance (sinks/incremental.py):
each refresh must fold exactly the unseen source versions, match a
from-scratch aggregate, and be idempotent across replays."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks.delta import (
    ConcurrentModificationError,
    last_txn_version,
    optimize_delta,
    read_delta,
    write_delta,
)
from lakehouse_loader_spark.sinks.incremental import refresh_aggregate

APP = "test-agg"
AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="incr_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )


def _expected(spark, src):
    return {
        tuple(r)
        for r in read_delta(spark, src)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def test_initial_build_then_incremental_folds(spark, tmpdir):
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 60), src)
    r1 = refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    assert r1["refreshed"] and r1["since"] == -1
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == _expected(spark, src)

    write_delta(_batch(spark, 60, 100), src, append=True)
    r2 = refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    assert r2["refreshed"] and r2["delta_rows"] == 40
    # the fold consumed only the new versions, starting where r1 ended
    assert r2["since"] == r1["through"]
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == _expected(spark, src)


def test_refresh_without_new_data_is_noop(spark, tmpdir):
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 30), src)
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    v = last_txn_version(tgt, APP)
    r = refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    assert not r["refreshed"] and r["delta_rows"] == 0
    assert last_txn_version(tgt, APP) == v  # no spurious commit


def test_min_max_survive_merge(spark, tmpdir):
    """min/max must come from the MERGE fn, not re-summing partials: a
    second batch with a new global min must win."""
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 10, 40), src)
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    write_delta(_batch(spark, 0, 10), src, append=True)  # smaller v values
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    rows = {r["k"]: r for r in read_delta(spark, tgt).collect()}
    assert rows["0"]["lo"] == 0 and rows["1"]["lo"] == 1 and rows["2"]["lo"] == 2
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == _expected(spark, src)


def test_non_decomposable_agg_rejected(spark, tmpdir):
    with pytest.raises(ValueError, match="decomposable"):
        refresh_aggregate(
            spark, f"{tmpdir}/src", f"{tmpdir}/agg", ["k"], {"a": ("avg", "v")}
        )


def test_foreign_target_rejected(spark, tmpdir):
    """A target not built by refresh_aggregate (no txn marker) must be
    refused, not silently merged into."""
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 10), src)
    write_delta(_batch(spark, 0, 10), tgt)  # some unrelated table
    with pytest.raises(ValueError, match="txn marker"):
        refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)


def test_compacted_source_fails_loudly(spark, tmpdir):
    """OPTIMIZE rewrites history; the file-level feed must refuse rather
    than double-count rows whose files were compacted."""
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 30), src)
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    write_delta(_batch(spark, 30, 50), src, append=True)
    optimize_delta(spark, src, target_partitions=1)
    with pytest.raises(ConcurrentModificationError):
        refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)


def test_cli_refresh_agg(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main

    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 40), src)
    argv = [
        "refresh-agg", src, tgt,
        "--group-by", "k",
        "--agg", "n:count:*", "--agg", "total:sum:v",
        "--app-id", APP,
    ]
    do_main(argv)
    assert last_txn_version(tgt, APP) >= 0
    write_delta(_batch(spark, 40, 70), src, append=True)
    do_main(argv)
    got = {(r["k"], r["n"], r["total"]) for r in read_delta(spark, tgt).collect()}
    want = {
        tuple(r)
        for r in read_delta(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want


def test_streaming_materialized_view(spark, tmpdir):
    """Streaming materialized view: events stream into a Delta table
    (append-only commits), refresh_aggregate folds the new versions after
    each ingest round — the summary always equals a from-scratch batch
    aggregate over everything streamed so far."""
    import os

    from lakehouse_loader_spark.streaming import events as SE

    src_dir = f"{tmpdir}/src_files"
    os.makedirs(src_dir)
    tbl, ckpt, agg = f"{tmpdir}/tbl", f"{tmpdir}/ckpt", f"{tmpdir}/agg"
    aggs = {"n": ("count", "*"), "total": ("sum", "v")}

    def emit(lo, hi):
        _batch(spark, lo, hi).coalesce(1).write.mode("append").parquet(src_dir)

    def ingest():
        q = SE.stream_to_delta(
            spark.readStream.schema("k string, v long").parquet(src_dir), tbl, ckpt
        )
        q.awaitTermination(120)
        q.stop()

    emit(0, 40)
    ingest()
    refresh_aggregate(spark, tbl, agg, ["k"], aggs, app_id=APP)
    assert {tuple(r) for r in read_delta(spark, agg).collect()} == {
        tuple(r)
        for r in read_delta(spark, tbl)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }

    emit(40, 90)
    ingest()
    r = refresh_aggregate(spark, tbl, agg, ["k"], aggs, app_id=APP)
    assert r["refreshed"] and r["delta_rows"] == 50
    assert {tuple(r) for r in read_delta(spark, agg).collect()} == {
        tuple(r)
        for r in read_delta(spark, tbl)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }


def test_iceberg_source_refresh(spark, tmpdir):
    """refresh_aggregate over an ICEBERG source: the marker is the snapshot
    sequence number; incremental folds read only appended snapshots and
    match a from-scratch aggregate."""
    from lakehouse_loader_spark.sinks import iceberg as IC

    src, tgt = f"{tmpdir}/isrc", f"{tmpdir}/agg"
    IC.write_iceberg(_batch(spark, 0, 60), src)
    r1 = refresh_aggregate(
        spark, src, tgt, ["k"], AGGS, app_id=APP, source_format="iceberg"
    )
    assert r1["refreshed"] and r1["delta_rows"] == 60
    IC.write_iceberg(_batch(spark, 60, 100), src, append=True)
    r2 = refresh_aggregate(
        spark, src, tgt, ["k"], AGGS, app_id=APP, source_format="iceberg"
    )
    assert r2["refreshed"] and r2["delta_rows"] == 40
    assert r2["since"] == r1["through"]
    want = {
        tuple(r)
        for r in IC.read_iceberg(spark, src)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == want
    # no-op when nothing new
    r3 = refresh_aggregate(
        spark, src, tgt, ["k"], AGGS, app_id=APP, source_format="iceberg"
    )
    assert not r3["refreshed"]
    # overwrite rewrites history → loud refusal
    IC.write_iceberg(_batch(spark, 0, 10), src, overwrite=True)
    with pytest.raises(ConcurrentModificationError):
        refresh_aggregate(
            spark, src, tgt, ["k"], AGGS, app_id=APP, source_format="iceberg"
        )


def test_crash_remnant_empty_target_rebuilds(spark, tmpdir):
    """An overwrite crash can leave the target with v0 committed but no
    data and no txn marker; the next refresh must rebuild from scratch
    instead of wedging forever.  A NON-empty unmarked table stays refused
    (covered by test_foreign_target_rejected)."""
    import os

    from lakehouse_loader_spark.sinks.delta import _read_log

    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 30), src)
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    # simulate the crash window: strip the data commit, keep only v0
    log = f"{tgt}/_delta_log"
    for f in os.listdir(log):
        if f.endswith(".json") and int(f.split(".")[0]) > 0:
            os.remove(os.path.join(log, f))
    _, _, live = _read_log(tgt)
    assert not live and last_txn_version(tgt, APP) == -1  # remnant shape
    r = refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    assert r["refreshed"] and r["since"] == -1 and r["delta_rows"] == 30
    assert {tuple(x) for x in read_delta(spark, tgt).collect()} == _expected(spark, src)


# -- DML-aware maintenance (on_rewrite modes) -------------------------------

CDF_AGGS = {"n": ("count", "*"), "total": ("sum", "v")}


def _cdf_expected(spark, src):
    return {
        tuple(r)
        for r in read_delta(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }


def test_cdf_mode_folds_deletes_and_updates(spark, tmpdir):
    from lakehouse_loader_spark.sinks.delta import delete_from_delta, update_delta

    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 300), src)
    refresh_aggregate(spark, src, tgt, ["k"], CDF_AGGS, app_id=APP)
    # DML on the source: the append feed would refuse this range
    delete_from_delta(spark, src, "v % 5 = 0")
    update_delta(spark, src, "v = 7", {"v": "v + 1000"})
    with pytest.raises(ConcurrentModificationError):
        refresh_aggregate(spark, src, tgt, ["k"], CDF_AGGS, app_id=APP)
    res = refresh_aggregate(
        spark, src, tgt, ["k"], CDF_AGGS, app_id=APP, on_rewrite="cdf"
    )
    assert res["refreshed"] and res["delta_rows"] > 0
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == _cdf_expected(spark, src)
    # idempotent: a second cdf refresh folds nothing
    again = refresh_aggregate(
        spark, src, tgt, ["k"], CDF_AGGS, app_id=APP, on_rewrite="cdf"
    )
    assert not again["refreshed"]


def test_cdf_mode_drops_emptied_groups(spark, tmpdir):
    from lakehouse_loader_spark.sinks.delta import delete_from_delta

    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 30), src)
    refresh_aggregate(spark, src, tgt, ["k"], CDF_AGGS, app_id=APP)
    delete_from_delta(spark, src, "v % 3 = 1")  # kills group k='1' entirely
    refresh_aggregate(spark, src, tgt, ["k"], CDF_AGGS, app_id=APP, on_rewrite="cdf")
    got = {r.k for r in read_delta(spark, tgt).collect()}
    assert got == {"0", "2"}


def test_cdf_mode_validates_aggs(spark, tmpdir):
    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 10), src)
    with pytest.raises(ValueError, match="min/max"):
        refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP, on_rewrite="cdf")
    with pytest.raises(ValueError, match="count"):
        refresh_aggregate(
            spark, src, tgt, ["k"], {"total": ("sum", "v")}, app_id=APP, on_rewrite="cdf"
        )


def test_rebuild_mode_recovers_from_rewrites(spark, tmpdir):
    from lakehouse_loader_spark.sinks.delta import delete_from_delta

    src, tgt = f"{tmpdir}/src", f"{tmpdir}/agg"
    write_delta(_batch(spark, 0, 100), src)
    refresh_aggregate(spark, src, tgt, ["k"], AGGS, app_id=APP)
    delete_from_delta(spark, src, "v < 10")
    # min/max stay maintainable through a full rebuild
    res = refresh_aggregate(
        spark, src, tgt, ["k"], AGGS, app_id=APP, on_rewrite="rebuild"
    )
    assert res["refreshed"] and res["since"] == -1
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == _expected(spark, src)


def test_cdf_mode_iceberg_source(spark, tmpdir):
    from lakehouse_loader_spark.sinks.iceberg import (
        delete_from_iceberg,
        read_iceberg,
        write_iceberg,
    )

    src, tgt = f"{tmpdir}/isrc", f"{tmpdir}/agg"
    write_iceberg(_batch(spark, 0, 200), src)
    refresh_aggregate(
        spark, src, tgt, ["k"], CDF_AGGS, app_id=APP, source_format="iceberg"
    )
    delete_from_iceberg(spark, src, "v % 4 = 2")
    res = refresh_aggregate(
        spark, src, tgt, ["k"], CDF_AGGS, app_id=APP,
        source_format="iceberg", on_rewrite="cdf",
    )
    assert res["refreshed"]
    want = {
        tuple(r)
        for r in read_iceberg(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert {tuple(r) for r in read_delta(spark, tgt).collect()} == want
