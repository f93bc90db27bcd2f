"""Delta domain metadata + row tracking + liquid clustering (r9).

Domain metadata (PROTOCOL.md "Domain Metadata"): domainMetadata actions
replay last-wins per domain, persist through classic AND v2 checkpoints,
and back the two features that store per-table state outside metaData:

- rowTracking: every add carries a fresh baseRowId range +
  defaultRowCommitVersion; the high-water mark lives in the
  `delta.rowTracking` domain; read_delta_with_row_ids surfaces
  _row_id/_row_commit_version.  The FULL DML matrix preserves ids (r10):
  MOR deletes natively (surviving rows' files and positions never
  change), CoW UPDATE/DELETE, MERGE (both modes) and OPTIMIZE by
  materializing the stable ids into the rewritten files, RESTORE by
  re-adding the original add actions with their original ranges.
- clustering: clustering columns live in the `delta.clustering` domain;
  a plain OPTIMIZE re-clusters on them (z-order interleave) and stamps
  clusteringProvider="liquid" on the rewritten adds.

Reference scope note: the reference writes Delta tables without either
feature (src/delta_destination.rs); both are engine extensions over the
public Delta protocol spec.
"""

import json
import os

import pytest

import lakehouse_loader_spark.sinks.delta as D

pytestmark = pytest.mark.usefixtures("spark")


def _table(spark, tmpdir, name="t", n=100):
    t = os.path.join(str(tmpdir), name)
    df = spark.range(n).selectExpr(
        "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
    )
    D.write_delta(df, t)
    return t


class TestDomainMetadata:
    def test_set_get_remove(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.set_domain_metadata(t, "user.pipeline", json.dumps({"run": 1}))
        assert json.loads(D.table_domain_metadata(t)["user.pipeline"]) == {"run": 1}
        # last-wins overwrite
        D.set_domain_metadata(t, "user.pipeline", json.dumps({"run": 2}))
        assert json.loads(D.table_domain_metadata(t)["user.pipeline"]) == {"run": 2}
        D.remove_domain_metadata(t, "user.pipeline")
        assert "user.pipeline" not in D.table_domain_metadata(t)

    def test_feature_declared(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.set_domain_metadata(t, "user.x", "cfg")
        proto = D.table_protocol(t)
        assert proto["minWriterVersion"] == 7
        assert "domainMetadata" in proto["writerFeatures"]

    def test_system_domains_refused(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        with pytest.raises(ValueError, match="system-controlled"):
            D.set_domain_metadata(t, "delta.rowTracking", "{}")
        with pytest.raises(ValueError, match="system-controlled"):
            D.remove_domain_metadata(t, "delta.clustering")

    def test_as_of_version_replay(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.set_domain_metadata(t, "user.x", "a")
        v_a, _, _ = D._read_log(t)
        D.set_domain_metadata(t, "user.x", "b")
        assert D.table_domain_metadata(t)["user.x"] == "b"
        assert D.table_domain_metadata(t, as_of_version=v_a)["user.x"] == "a"

    def test_checkpoint_round_trip_classic_and_v2(self, spark, tmpdir):
        for v2 in (False, True):
            t = _table(spark, tmpdir, name=f"ck{v2}")
            D.set_domain_metadata(t, "user.keep", "yes")
            D.set_domain_metadata(t, "user.gone", "no")
            D.remove_domain_metadata(t, "user.gone")
            v = D.write_checkpoint(t, v2=v2)
            _, _, _, doms = D._load_checkpoint(t, v)
            assert doms == {"user.keep": "yes"}
            # replay seeded from this checkpoint sees the same state
            assert D.table_domain_metadata(t)["user.keep"] == "yes"
            assert "user.gone" not in D.table_domain_metadata(t)


class TestRowTracking:
    def test_backfill_and_read(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        proto = D.table_protocol(t)
        assert {"rowTracking", "domainMetadata"} <= set(proto["writerFeatures"])
        assert D._row_id_high_water_mark(t) == 99
        conf = D._read_log(t)[1]["configuration"]
        assert conf["delta.enableRowTracking"] == "true"
        # spec reserves the materialized column names at enablement
        assert conf["delta.rowTracking.materializedRowIdColumnName"].startswith(
            "_row-id-col-"
        )
        out = D.read_delta_with_row_ids(spark, t)
        assert sorted(r["_row_id"] for r in out.collect()) == list(range(100))
        # enablement is idempotent
        v_before = D._read_log(t)[0]
        D.enable_row_tracking(t)
        assert D._read_log(t)[0] == v_before

    def test_append_mints_fresh_ranges(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        more = spark.range(100, 150).selectExpr(
            "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
        )
        D.write_delta(more, t, append=True)
        assert D._row_id_high_water_mark(t) == 149
        out = D.read_delta_with_row_ids(spark, t)
        rows = {r["id"]: (r["_row_id"], r["_row_commit_version"]) for r in out.collect()}
        assert sorted(rid for rid, _ in rows.values()) == list(range(150))
        # appended rows carry the append commit's version, backfilled rows
        # the enablement commit's
        enable_v = next(
            v for v in range(D._read_log(t)[0] + 1)
            if "EnableRowTracking" in open(D._version_file(t, v)).read()
        )
        assert rows[0][1] == enable_v
        assert rows[149][1] == D._read_log(t)[0]

    def test_mor_delete_preserves_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        pre = {
            r["id"]: r["_row_id"]
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        res = D.delete_from_delta(spark, t, "id % 10 = 3", mode="merge-on-read")
        assert res["deleted_rows"] == 10
        post = {
            r["id"]: r["_row_id"]
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert len(post) == 90
        assert all(pre[k] == v for k, v in post.items())

    def test_column_mapping_matrix_closed(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        # the feature matrix is closed both ways with column mapping
        with pytest.raises(D.UnsupportedProtocolError, match="column-mapped|column mapping"):
            D.enable_column_mapping(t)

    def test_cow_update_keeps_ids_bumps_commit_version(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        pre = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        res = D.update_delta(spark, t, "id % 10 = 2", {"v": "v + 1000"})
        assert res["updated_rows"] == 10 and res["rewritten_files"] >= 1
        latest = D._read_log(t)[0]
        rows = {
            r["id"]: (r["_row_id"], r["_row_commit_version"], r["v"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 100
        for i, (rid, rcv, v) in rows.items():
            assert rid == pre[i][0]  # spec: UPDATE keeps the row id
            if i % 10 == 2:
                assert rcv == latest and v == i * 1.5 + 1000
            else:
                # carried-over rows in the rewritten file keep their
                # original commit version (physically materialized)
                assert rcv == pre[i][1]
        # the replacement files physically carry the materialized columns
        # (untouched files never rewritten don't need to)
        _, meta, adds = D._read_log(t)
        mat_id, _ = D._materialized_col_names(meta)
        import pyarrow.parquet as pq

        new_files = [
            p for p, a in adds.items()
            if a.get("defaultRowCommitVersion") == latest
        ]
        assert new_files and all(
            mat_id in pq.read_schema(os.path.join(t, p)).names for p in new_files
        )

    def test_cow_delete_preserves_surviving_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        pre = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        res = D.delete_from_delta(spark, t, "id % 10 = 3")
        assert res["deleted_rows"] == 10 and res["rewritten_files"] >= 1
        post = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert len(post) == 90
        # survivors keep BOTH id and commit version across the rewrite
        assert all(pre[k] == v for k, v in post.items())

    @pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
    def test_merge_preserves_matched_ids_mints_insert_ids(
        self, spark, tmpdir, mode
    ):
        t = _table(spark, tmpdir, name=f"m_{mode[:3]}")
        D.enable_row_tracking(t)
        pre = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        src = spark.range(95, 105).selectExpr(
            "id", "id % 7 as k", "cast(-1.0 as double) as v"
        )
        res = D.merge_delta(spark, t, src, "id", mode=mode)
        assert res["updated"] == 5 and res["inserted"] == 5
        latest = D._read_log(t)[0]
        rows = {
            r["id"]: (r["_row_id"], r["_row_commit_version"], r["v"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 105
        assert len({rid for rid, _, _ in rows.values()}) == 105  # all unique
        for i in range(95):  # untouched rows: id AND version stable
            assert rows[i][:2] == pre[i]
        for i in range(95, 100):  # updated: id kept, version bumped
            assert rows[i][0] == pre[i][0]
            assert rows[i][1] == latest and rows[i][2] == -1.0
        for i in range(100, 105):  # inserted: fresh ids past the old mark
            assert rows[i][0] > 99 and rows[i][1] == latest

    def test_restore_reverts_ids_with_rows(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        v_enabled = D._read_log(t)[0]
        D.delete_from_delta(spark, t, "id % 10 = 3", mode="merge-on-read")
        D.update_delta(spark, t, "id = 4", {"v": "0.0"})
        D.restore_delta(spark, t, v_enabled)
        out = {
            r["id"]: (r["_row_id"], r["_row_commit_version"], r["v"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert sorted(rid for rid, _, _ in out.values()) == list(range(100))
        assert out[4][2] == 6.0  # the update is undone with its file
        assert all(rcv == v_enabled for _, rcv, _ in out.values())
        # restoring past the enablement commit stays refused: those adds
        # carry no baseRowId ranges
        with pytest.raises(D.UnsupportedProtocolError, match="before row tracking"):
            D.restore_delta(spark, t, 0)

    def test_optimize_preserves_ids_via_materialization(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        for lo in (100, 200, 300):
            D.write_delta(
                spark.range(lo, lo + 100).selectExpr(
                    "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
                ),
                t,
                append=True,
            )
        pre = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        D.optimize_delta(spark, t, target_partitions=2)
        post = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert post == pre  # ids AND commit versions stable across rewrite
        # the rewritten files physically carry the materialized columns
        _, meta, adds = D._read_log(t)
        mat_id, _ = D._materialized_col_names(meta)
        import pyarrow.parquet as pq

        assert all(
            mat_id in pq.read_schema(os.path.join(t, p)).names for p in adds
        )
        # and fresh baseRowId ranges were still stamped on the new adds
        assert all(a.get("baseRowId") is not None for a in adds.values())
        # plain read is unaffected by the extra physical columns
        out = D.read_delta(spark, t)
        assert out.count() == 400 and "_row_id" not in out.columns

    def test_mor_update_keeps_ids_bumps_commit_version(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        pre = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        res = D.update_delta(
            spark, t, "id % 10 = 2", {"v": "v + 1000"}, mode="merge-on-read"
        )
        assert res["updated_rows"] == 10 and res["new_files"] >= 1
        latest = D._read_log(t)[0]
        rows = {
            r["id"]: (r["_row_id"], r["_row_commit_version"], r["v"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert len(rows) == 100
        for i, (rid, rcv, v) in rows.items():
            assert rid == pre[i][0]  # spec: UPDATE keeps the row id
            if i % 10 == 2:
                assert rcv == latest  # ...and bumps its commit version
                assert v == i * 1.5 + 1000
            else:
                assert rcv == pre[i][1]
        # a second update over already-updated rows still resolves
        D.update_delta(
            spark, t, "id = 2", {"v": "v + 1"}, mode="merge-on-read"
        )
        again = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert again[2][0] == pre[2][0]
        assert again[2][1] == D._read_log(t)[0]

    def test_optimize_purges_dvs_keeping_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        D.write_delta(
            spark.range(100, 200).selectExpr(
                "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
            ),
            t,
            append=True,
        )
        D.delete_from_delta(spark, t, "id % 10 = 7", mode="merge-on-read")
        pre = {
            r["id"]: r["_row_id"]
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        # bin-packing is the DV purge path; ids must survive the fold
        D.optimize_delta(spark, t, small_file_threshold=10 * 1024 * 1024,
                         target_partitions=1)
        _, _, adds = D._read_log(t)
        assert not any(a.get("deletionVector") for a in adds.values())
        post = {
            r["id"]: r["_row_id"]
            for r in D.read_delta_with_row_ids(spark, t).collect()
        }
        assert post == pre and len(post) == 180

    def test_checkpoint_preserves_row_ids(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_row_tracking(t)
        v = D.write_checkpoint(t)
        _, adds, _, doms = D._load_checkpoint(t, v)
        a = next(iter(adds.values()))
        assert a["baseRowId"] == 0
        assert "delta.rowTracking" in doms
        # a post-checkpoint append replays THROUGH the checkpoint
        D.write_delta(
            spark.range(100, 110).selectExpr(
                "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
            ),
            t,
            append=True,
        )
        out = D.read_delta_with_row_ids(spark, t)
        assert sorted(r["_row_id"] for r in out.collect()) == list(range(110))

    def test_read_refuses_without_feature(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        with pytest.raises(ValueError, match="not enabled"):
            D.read_delta_with_row_ids(spark, t)


class TestClustering:
    def test_declare_and_optimize(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_clustering(t, ["k", "v"])
        assert D.table_cluster_by(t) == ["k", "v"]
        assert "clustering" in D.table_protocol(t)["writerFeatures"]
        for _ in range(2):
            D.write_delta(
                spark.range(100).selectExpr(
                    "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
                ),
                t,
                append=True,
            )
        D.optimize_delta(spark, t, target_partitions=2)
        _, _, adds = D._read_log(t)
        assert {a.get("clusteringProvider") for a in adds.values()} == {"liquid"}
        assert D.read_delta(spark, t).count() == 300

    def test_explicit_layout_overrides(self, spark, tmpdir):
        t = _table(spark, tmpdir)
        D.enable_clustering(t, ["k"])
        D.write_delta(
            spark.range(100).selectExpr(
                "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
            ),
            t,
            append=True,
        )
        # a caller-chosen sort wins over the declaration; no liquid stamp
        D.optimize_delta(spark, t, sort_by=["id"])
        _, _, adds = D._read_log(t)
        assert {a.get("clusteringProvider") for a in adds.values()} == {None}

    def test_single_column_clustering_prunes(self, spark, tmpdir):
        """Single-column liquid clustering must yield DISJOINT per-file
        ranges after OPTIMIZE (range partition + sort), so stats pruning
        skips whole files for a point predicate."""
        t = os.path.join(str(tmpdir), "rc")
        df = spark.range(1000).selectExpr("id", "(997 - id) % 31 as k")
        D.write_delta(df, t)
        D.enable_clustering(t, ["k"])
        D.optimize_delta(spark, t, target_partitions=4)
        kept, total = D.prune_files_by_stats(t, "k", 3, 3)
        assert total >= 2 and len(kept) < total
        assert D.read_delta(spark, t).count() == 1000

    def test_refusals(self, spark, tmpdir):
        t = os.path.join(str(tmpdir), "p")
        df = spark.range(50).selectExpr("id", "id % 3 as k")
        D.write_delta(df, t, partition_by=["k"])
        with pytest.raises(ValueError, match="partition columns"):
            D.enable_clustering(t, ["k"])
        with pytest.raises(ValueError, match="not in schema"):
            D.enable_clustering(t, ["nope"])
        with pytest.raises(ValueError, match="at least one"):
            D.enable_clustering(t, [])
