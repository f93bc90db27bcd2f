"""Iceberg SORT ORDERS (spec "Sort Orders", r9) — the format twin of the
Delta sink's liquid-clustering declaration: ``set_sort_order_iceberg``
appends a sort-orders metadata entry (identity transforms, direction +
null-order per field) and points default-sort-order-id at it; writes then
cluster new files' rows with ``sortWithinPartitions`` (NO global sort — a
total order would be an all-data shuffle; per-file clustering is what
tightens the min/max stats) and stamp ``sort_order_id`` (manifest field
id 140) on the files written sorted; a plain OPTIMIZE re-sorts.

Reference scope: the reference leaves pre-write sorting as an explicit
TODO (src/lib.rs:202); sort orders are the Iceberg-native declaration of
the same intent.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import lakehouse_loader_spark.sinks.iceberg as IC

pytestmark = pytest.mark.usefixtures("spark")


def _table(spark, tmpdir, name="t"):
    t = os.path.join(str(tmpdir), name)
    df = spark.range(1000).selectExpr(
        "id", "(997 - id) % 31 as k", "cast(id * 1.5 as double) as v"
    )
    IC.write_iceberg(df, t, overwrite=True)
    return t, df


def _live(t):
    return IC._split_live_entries(t, IC._read_metadata(t)[1])[0]


def test_declare_validate_and_reset(spark, tmpdir):
    t, _ = _table(spark, tmpdir)
    IC.set_sort_order_iceberg(t, ["k", "v desc"])
    assert IC.table_sort_order(t) == ["k ASC NULLS FIRST", "v DESC NULLS LAST"]
    _, meta = IC._read_metadata(t)
    assert meta["default-sort-order-id"] == 1
    assert meta["sort-orders"][1]["fields"][0] == {
        "transform": "identity",
        "source-id": 2,
        "direction": "asc",
        "null-order": "nulls-first",
    }
    # identical re-declaration reuses the order id
    IC.set_sort_order_iceberg(t, ["k", "v desc"])
    assert len(IC._read_metadata(t)[1]["sort-orders"]) == 2
    # reset to unsorted order 0
    IC.set_sort_order_iceberg(t, [])
    assert IC.table_sort_order(t) == []
    assert IC._read_metadata(t)[1]["default-sort-order-id"] == 0
    with pytest.raises(ValueError, match="not in schema"):
        IC.set_sort_order_iceberg(t, ["nope"])
    with pytest.raises(ValueError, match="bad sort field"):
        IC.set_sort_order_iceberg(t, ["k sideways"])


def test_appends_sorted_and_stamped(spark, tmpdir):
    t, df = _table(spark, tmpdir)
    IC.set_sort_order_iceberg(t, ["k", "v desc"])
    IC.write_iceberg(df, t, append=True)
    data = _live(t)
    # pre-declaration files carry no id; new ones carry the declared order
    assert {d.get("sort_order_id") for d in data} == {None, 1}
    for d in data:
        if d.get("sort_order_id") != 1:
            continue
        pdf = pq.read_table(d["file_path"]).to_pandas()
        ks = pdf["k"].to_numpy()
        assert (np.diff(ks) >= 0).all()
        for kk in np.unique(ks):
            vs = pdf[pdf["k"] == kk]["v"].to_numpy()
            assert (np.diff(vs) <= 0).all()
    # caller-given sort_by wins over the declaration (no stamp)
    IC.write_iceberg(df, t, append=True, sort_by=["id"])
    newest = max(_live(t), key=lambda d: d["file_path"])
    assert IC.read_iceberg(spark, t).count() == 3000


def test_optimize_resorts_and_stamps(spark, tmpdir):
    t, df = _table(spark, tmpdir)
    IC.write_iceberg(df, t, append=True)
    IC.set_sort_order_iceberg(t, ["k"])
    IC.optimize_iceberg(spark, t)
    data = _live(t)
    assert {d.get("sort_order_id") for d in data} == {1}
    pdf = pq.read_table(data[0]["file_path"]).to_pandas()
    assert (np.diff(pdf["k"].to_numpy()) >= 0).all()
    assert IC.read_iceberg(spark, t).count() == 2000


def test_sorted_files_prune_harder(spark, tmpdir):
    """The point of the declaration: per-file k ranges tighten after a
    sorted OPTIMIZE into several files, so stats pruning touches fewer
    files for a point predicate."""
    t, df = _table(spark, tmpdir)
    IC.set_sort_order_iceberg(t, ["k"])
    IC.optimize_iceberg(spark, t, target_partitions=4)
    kept, total = IC.prune_iceberg_files_by_stats(t, "k", 3, 3)
    assert total >= 2 and len(kept) < total


def test_interplay_with_mor_and_manifest_rewrite(spark, tmpdir):
    t, df = _table(spark, tmpdir)
    IC.set_sort_order_iceberg(t, ["k"])
    IC.write_iceberg(df, t, append=True)
    IC.delete_from_iceberg(spark, t, "id % 10 = 3", strategy="merge-on-read")
    assert IC.read_iceberg(spark, t).count() == 1800
    IC.rewrite_manifests(t)
    # consolidation preserves each file's stamped order id
    data = _live(t)
    assert {d.get("sort_order_id") for d in data} == {None, 1}
    assert IC.read_iceberg(spark, t).count() == 1800
