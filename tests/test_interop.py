"""Cross-format metadata interop (sinks/interop.py): one parquet file
set readable under BOTH table formats — the public Delta-UniForm /
Apache-XTable concept, possible here because both commit protocols are
implemented in-repo.  The reference pins one format per destination
(delta_destination.rs / iceberg_destination.rs); this is the bridge a
mixed-reader fleet needs."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as D
from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks import interop as X


def _frame(spark, n=20_000):
    return spark.range(0, n).select(
        "id", (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )


def test_delta_to_iceberg_mirror_reads_identically(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    D.write_delta(_frame(spark).repartition(3), t)
    r = X.sync_iceberg_from_delta(t)
    assert r["files"] == 3 and r["iceberg_version"] == 0
    ice = IC.read_iceberg(spark, t)
    dlt = D.read_delta(spark, t)
    assert ice.count() == 20_000
    assert ice.exceptAll(dlt).count() == 0 and dlt.exceptAll(ice).count() == 0
    # zero data copied: the iceberg snapshot references delta's parquet
    assert len(glob.glob(os.path.join(t, "data", "*.parquet"))) == 0
    # stats ride along: manifests carry bounds, so iceberg-side pruning works
    _, meta = IC._read_metadata(t)
    entries, _, _ = IC._split_live_entries(t, meta)
    assert all(e.get("lower_bounds") for e in entries)


def test_delta_to_iceberg_sync_is_idempotent_and_incremental(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    D.write_delta(_frame(spark), t)
    X.sync_iceberg_from_delta(t)
    again = X.sync_iceberg_from_delta(t)
    assert again.get("up_to_date") is True
    D.write_delta(_frame(spark, 500), t, append=True)
    r = X.sync_iceberg_from_delta(t)
    assert "up_to_date" not in r
    assert IC.read_iceberg(spark, t).count() == 20_500


def test_iceberg_to_delta_mirror_reads_identically(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_frame(spark).repartition(2), t)
    r = X.sync_delta_from_iceberg(t)
    assert r["files"] == 2 and r["delta_version"] == 0
    dlt = D.read_delta(spark, t)
    ice = IC.read_iceberg(spark, t)
    assert dlt.count() == 20_000
    assert dlt.exceptAll(ice).count() == 0 and ice.exceptAll(dlt).count() == 0
    assert X.sync_delta_from_iceberg(t).get("up_to_date") is True
    IC.write_iceberg(_frame(spark, 700), t, append=True)
    X.sync_delta_from_iceberg(t)
    assert D.read_delta(spark, t).count() == 20_700


def test_mirror_refreshes_after_overwrite_not_just_append(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_frame(spark), t)
    X.sync_delta_from_iceberg(t)
    IC.write_iceberg(_frame(spark, 123), t, overwrite=True)
    X.sync_delta_from_iceberg(t)
    assert D.read_delta(spark, t).count() == 123


def test_live_deletes_refused_both_directions(spark, tmpdir):
    td = os.path.join(tmpdir, "d")
    D.write_delta(_frame(spark, 1000), td)
    D.delete_from_delta(spark, td, "id = 5", mode="merge-on-read")
    with pytest.raises(X.InteropNotPossibleError, match="deletion vectors"):
        X.sync_iceberg_from_delta(td)
    # after OPTIMIZE materializes the delete, the sync goes through
    D.optimize_delta(spark, td)
    X.sync_iceberg_from_delta(td)
    assert IC.read_iceberg(spark, td).count() == 999

    ti = os.path.join(tmpdir, "i")
    IC.write_iceberg(_frame(spark, 1000), ti)
    IC.delete_from_iceberg(spark, ti, "id = 5", strategy="merge-on-read-dv")
    with pytest.raises(X.InteropNotPossibleError, match="delete file"):
        X.sync_delta_from_iceberg(ti)
    IC.optimize_iceberg(spark, ti)
    X.sync_delta_from_iceberg(ti)
    assert D.read_delta(spark, ti).count() == 999


def test_partitioned_tables_refused(spark, tmpdir):
    td = os.path.join(tmpdir, "d")
    D.write_delta(_frame(spark, 100), td, partition_by=["k"])
    with pytest.raises(X.InteropNotPossibleError, match="partitioned"):
        X.sync_iceberg_from_delta(td)
    ti = os.path.join(tmpdir, "i")
    IC.write_iceberg(_frame(spark, 100), ti, partition_by=["k"])
    with pytest.raises(X.InteropNotPossibleError, match="partitioned"):
        X.sync_delta_from_iceberg(ti)


def test_mirror_then_native_write_on_mirror_side(spark, tmpdir):
    """The mirror is a REAL table of its format: after a sync, the mirror
    side accepts its own native appends (diverging from the source —
    mirrors lag by design, they never corrupt)."""
    t = os.path.join(tmpdir, "t")
    D.write_delta(_frame(spark, 1000), t)
    X.sync_iceberg_from_delta(t)
    IC.write_iceberg(_frame(spark, 10), t, append=True)
    assert IC.read_iceberg(spark, t).count() == 1010
    assert D.read_delta(spark, t).count() == 1000  # delta side unchanged
