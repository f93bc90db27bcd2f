"""Metadata inspection tables (sinks/inspect.py): snapshots/files/manifests/
refs for Iceberg, file inventory + history + DESCRIBE DETAIL for Delta —
contents cross-checked against the operations that produced them."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL
from lakehouse_loader_spark.sinks import iceberg as IC
from lakehouse_loader_spark.sinks.inspect import (
    delta_files,
    delta_history,
    describe_detail,
    iceberg_files,
    iceberg_manifests,
    iceberg_refs,
    iceberg_snapshots,
)


def _df(spark, n=100, lo=0):
    return spark.range(lo, lo + n).select("id", (F.col("id") * 2).alias("v"))


class TestIcebergInspection:
    def test_snapshots_lineage_and_current_flag(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark), t)
        IC.write_iceberg(_df(spark, lo=100), t, append=True)
        snaps = iceberg_snapshots(spark, t).orderBy("sequence_number").collect()
        assert len(snaps) == 2
        assert snaps[0].operation in ("append", "overwrite")
        assert snaps[1].operation == "append"
        assert snaps[1].parent_id == snaps[0].snapshot_id
        assert [s.is_current for s in snaps] == [False, True]
        assert snaps[1].summary.get("operation") == "append"

    def test_files_totals_match_table(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark, 250).repartition(4), t)
        files = iceberg_files(spark, t).collect()
        assert all(f.content == 0 for f in files)
        assert sum(f.record_count for f in files) == 250
        assert all(f.file_size_in_bytes > 0 for f in files)
        # time travel: the first snapshot's inventory is reachable by id
        IC.write_iceberg(_df(spark, 10, lo=250), t, append=True)
        first = iceberg_snapshots(spark, t).orderBy("sequence_number").collect()[0]
        old = iceberg_files(spark, t, snapshot_id=first.snapshot_id).collect()
        assert sum(f.record_count for f in old) == 250

    def test_delete_files_surface_with_content_kind(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark), t)
        IC.delete_from_iceberg(spark, t, "id < 10", strategy="merge-on-read")
        files = iceberg_files(spark, t).collect()
        kinds = {f.content for f in files}
        assert 0 in kinds and (1 in kinds or 2 in kinds)

    def test_manifests_counts(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark).coalesce(1), t)
        IC.write_iceberg(_df(spark, lo=100).coalesce(1), t, append=True)
        mans = iceberg_manifests(spark, t).collect()
        assert len(mans) == 2  # append keeps the prior manifest
        assert sum(m.added_files_count for m in mans) == 2

    def test_refs_include_main_and_tags(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark), t)
        IC.create_ref(t, "v1", ref_type="tag")
        refs = {r.name: r for r in iceberg_refs(spark, t).collect()}
        assert "main" in refs and refs["main"].type == "branch"
        assert refs["v1"].type == "tag"
        assert refs["v1"].snapshot_id == refs["main"].snapshot_id


class TestDeltaInspection:
    def test_files_inventory_and_dv_flag(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        DL.write_delta(_df(spark, 200).repartition(2), t)
        inv = delta_files(spark, t).collect()
        assert sum(f.num_records for f in inv) == 200
        assert all(not f.has_deletion_vector for f in inv)
        DL.delete_from_delta(spark, t, "id < 5", mode="merge-on-read")
        inv2 = delta_files(spark, t).collect()
        assert any(f.has_deletion_vector for f in inv2)

    def test_history_operations(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        DL.write_delta(_df(spark), t)
        DL.write_delta(_df(spark, lo=100), t, append=True)
        hist = delta_history(spark, t).orderBy("version").collect()
        # reference two-commit layout: v0 protocol/meta, v1 first adds,
        # v2 the append
        assert [h.version for h in hist] == [0, 1, 2]
        assert "append" in (hist[-1].operation_parameters.get("mode") or "").lower()

    def test_describe_detail_both_formats(self, spark, tmpdir):
        dt, it = os.path.join(tmpdir, "d"), os.path.join(tmpdir, "i")
        DL.write_delta(_df(spark, 150), dt)
        IC.write_iceberg(_df(spark, 150), it)
        dd = describe_detail(spark, dt).collect()[0]
        di = describe_detail(spark, it).collect()[0]
        assert (dd.format, dd.total_records) == ("delta", 150)
        assert (di.format, di.total_records) == ("iceberg", 150)
        assert dd.num_files >= 1 and di.total_bytes > 0


class TestIcebergStatistics:
    def test_analyze_writes_puffin_and_registers(self, spark, tmpdir):
        """ANALYZE: theta NDV sketches land in a Puffin statistics file
        referenced from metadata; estimates match exact distincts within
        the sketch's error bound (<1% at these cardinalities)."""
        from lakehouse_loader_spark.sinks.iceberg import (
            analyze_iceberg,
            table_statistics,
        )
        from lakehouse_loader_spark.sinks.puffin import STATS_BLOB_TYPE, read_footer

        t = os.path.join(tmpdir, "t")
        df = spark.range(0, 5000).select(
            "id", (F.col("id") % 37).alias("k"), (F.col("id") % 2 == 0).alias("b")
        )
        IC.write_iceberg(df, t)
        ndvs = analyze_iceberg(spark, t, columns=["id", "k"])
        assert abs(ndvs["id"] - 5000) <= 100
        assert ndvs["k"] == 37  # exact at tiny cardinality
        stats = table_statistics(t)
        assert len(stats) == 1
        entry = stats[0]
        snap = iceberg_snapshots(spark, t).filter("is_current").collect()[0]
        assert entry["snapshot-id"] == snap.snapshot_id
        blob_meta = read_footer(os.path.join(t, entry["statistics-path"]))
        assert {b["type"] for b in blob_meta} == {STATS_BLOB_TYPE}
        assert len(blob_meta) == 2
        assert all(b["properties"]["ndv"].isdigit() for b in blob_meta)
        assert os.path.getsize(os.path.join(t, entry["statistics-path"])) == entry[
            "file-size-in-bytes"
        ]

    def test_reanalyze_replaces_and_append_keeps_old_stats(self, spark, tmpdir):
        from lakehouse_loader_spark.sinks.iceberg import (
            analyze_iceberg,
            table_statistics,
        )

        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark), t)
        analyze_iceberg(spark, t, columns=["id"])
        analyze_iceberg(spark, t, columns=["id", "v"])  # replaces same-snapshot stats
        assert len(table_statistics(t)) == 1
        assert len(table_statistics(t)[0]["blob-metadata"]) == 2
        IC.write_iceberg(_df(spark, lo=100), t, append=True)
        analyze_iceberg(spark, t, columns=["id"])
        snaps = {s["snapshot-id"] for s in table_statistics(t)}
        assert len(snaps) == 2  # one stats file per analyzed snapshot

    def test_expire_drops_stats_of_forgotten_snapshots(self, spark, tmpdir):
        from lakehouse_loader_spark.sinks.iceberg import (
            analyze_iceberg,
            expire_snapshots,
            table_statistics,
        )

        t = os.path.join(tmpdir, "t")
        IC.write_iceberg(_df(spark), t)
        analyze_iceberg(spark, t, columns=["id"])
        old_path = table_statistics(t)[0]["statistics-path"]
        IC.write_iceberg(_df(spark, lo=100), t, append=True)
        analyze_iceberg(spark, t, columns=["id"])
        expire_snapshots(t, keep_last=1)
        stats = table_statistics(t)
        assert len(stats) == 1  # only the surviving snapshot's stats remain
        assert not os.path.exists(os.path.join(t, old_path))
        assert os.path.exists(os.path.join(t, stats[0]["statistics-path"]))
