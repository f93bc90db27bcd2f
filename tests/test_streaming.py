"""Structured Streaming tests: incremental window agg converges to the batch
answer; custom stateful operator accumulates across micro-batches."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from lakehouse_loader_spark.streaming import events as SE

from tests.conftest import SF_SMOKE


@pytest.fixture()
def staged_events(spark):
    """Split the sf0.001 events table into 3 parquet files so the file
    stream sees 3 micro-batches."""
    from lakehouse_loader_spark.catalog import load_table

    tmp = tempfile.mkdtemp(prefix="evstream_")
    # the catalog normalizes ts to TIMESTAMP_NTZ(µs) on any pyspark version
    src = load_table(spark, SF_SMOKE, "events")
    src.repartition(3).write.mode("overwrite").parquet(tmp)
    yield tmp, src
    shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_stream_converges_to_batch(spark, staged_events):
    path, src = staged_events
    stream = SE.read_event_stream(spark, path)
    q = (
        SE.windowed_event_agg(stream)
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.win_start): (r.n_events, r.total_value)
        for r in spark.sql("select * from win_agg").collect()
    }
    batch = (
        src.groupBy("event_type", F.window("ts", "10 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .select(
            "event_type",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "n",
            "tv",
        )
        .collect()
    )
    want = {(r.event_type, r.ws): (r.n, r.tv) for r in batch}
    assert got == want


def test_stateful_user_totals_accumulates(spark, staged_events):
    path, src = staged_events
    stream = SE.read_event_stream(spark, path)
    q = (
        SE.stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per micro-batch; the LAST emission
    # per user must equal the batch totals
    final = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.sql(
            """
            select user_id, n_events, total_value from (
              select *, row_number() over (partition by user_id order by n_events desc) rn
              from user_totals) where rn = 1
            """
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.tv, 4))
        for r in src.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert final == batch


def test_stream_to_delta_ingestion(spark, staged_events):
    """File stream → foreachBatch → Delta sink: all rows land, one commit
    per non-empty micro-batch, log replay equals the batch source."""
    import tempfile

    from lakehouse_loader_spark.sinks import delta as DL

    path, src = staged_events
    out = tempfile.mkdtemp(prefix="evdelta_")
    ckpt = tempfile.mkdtemp(prefix="evckpt_")
    try:
        q = SE.stream_to_delta(SE.read_event_stream(spark, path), os.path.join(out, "t"), ckpt)
        q.awaitTermination(120)
        back = DL.read_delta(spark, os.path.join(out, "t"))
        assert back.count() == src.count()
        assert {r.event_id for r in back.select("event_id").collect()} == {
            r.event_id for r in src.select("event_id").collect()
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_to_delta_app_id_follows_checkpoint_contents(spark, staged_events):
    """The exactly-once appId is persisted in a marker file inside the
    checkpoint dir, so relocating the checkpoint keeps the same identity
    (path-derived ids would silently defeat duplicate-batch detection)."""
    import tempfile

    path, src = staged_events
    out = tempfile.mkdtemp(prefix="evdelta_")
    ckpt = tempfile.mkdtemp(prefix="evckpt_")
    moved = tempfile.mkdtemp(prefix="evckpt_moved_")
    try:
        q = SE.stream_to_delta(SE.read_event_stream(spark, path), os.path.join(out, "t"), ckpt)
        q.awaitTermination(120)
        q.stop()  # fully release the checkpoint before relocating it
        marker = os.path.join(ckpt, "_lhl_app_id")
        assert os.path.exists(marker)
        with open(marker) as fh:
            app_id = fh.read().strip()
        # relocate the checkpoint dir; re-running the stream must reuse the
        # recorded appId (no new rows — every batch already committed)
        shutil.rmtree(moved)
        shutil.move(ckpt, moved)
        # force a REAL replay: drop the newest Spark commit marker so the
        # restarted stream re-delivers the last micro-batch with the same
        # batch_id — only last_txn_version(app_id) suppression keeps it from
        # appending twice (without this the trigger finds nothing new and
        # the assertion would pass even with broken appId logic)
        commits = os.path.join(moved, "commits")
        newest = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
        os.remove(os.path.join(commits, newest))
        # also drop the stale Hadoop-local-FS checksum, or the rewrite of
        # commits/N trips the concurrent-writer detection
        crc = os.path.join(commits, f".{newest}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        from lakehouse_loader_spark.sinks import delta as DL

        n_before = DL.read_delta(spark, os.path.join(out, "t")).count()
        q2 = SE.stream_to_delta(SE.read_event_stream(spark, path), os.path.join(out, "t"), moved)
        q2.awaitTermination(120)
        q2.stop()
        with open(os.path.join(moved, "_lhl_app_id")) as fh:
            assert fh.read().strip() == app_id
        assert DL.read_delta(spark, os.path.join(out, "t")).count() == n_before
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(moved, ignore_errors=True)


def test_stream_to_iceberg_ingestion_and_replay_suppression(spark, staged_events):
    """Iceberg twin of the Delta ingestion + replay tests: all rows land
    (one snapshot per non-empty micro-batch), and after deleting the newest
    Spark commit marker the restarted stream re-delivers the last batch —
    only the snapshot-summary batch marker keeps it from appending twice."""
    import tempfile

    from lakehouse_loader_spark.sinks import iceberg as IC

    path, src = staged_events
    out = tempfile.mkdtemp(prefix="evice_")
    ckpt = tempfile.mkdtemp(prefix="evickpt_")
    tbl = os.path.join(out, "t")
    try:
        q = SE.stream_to_iceberg(SE.read_event_stream(spark, path), tbl, ckpt)
        q.awaitTermination(120)
        q.stop()
        back = IC.read_iceberg(spark, tbl)
        assert back.count() == src.count()
        n_snaps = len(IC.snapshot_ids(tbl))
        assert n_snaps >= 1
        with open(os.path.join(ckpt, "_lhl_app_id")) as fh:
            app_id = fh.read().strip()
        assert IC.last_committed_batch(tbl, app_id) >= 0

        # force a REAL replay of the last micro-batch (same trick as the
        # Delta test: drop the newest Spark commit marker + its checksum)
        commits = os.path.join(ckpt, "commits")
        newest = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
        os.remove(os.path.join(commits, newest))
        crc = os.path.join(commits, f".{newest}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        q2 = SE.stream_to_iceberg(SE.read_event_stream(spark, path), tbl, ckpt)
        q2.awaitTermination(120)
        q2.stop()
        assert IC.read_iceberg(spark, tbl).count() == src.count()  # no dupes
        assert len(IC.snapshot_ids(tbl)) == n_snaps  # no extra snapshot
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, staged_events):
    """Watermarked stream-stream join result must equal the equivalent
    batch join once all input is consumed."""
    path, src = staged_events
    clicks = SE.read_event_stream(spark, path).filter("event_type = 'click'")
    purchases = SE.read_event_stream(spark, path).filter("event_type = 'purchase'")
    # unordered staged files ⇒ events arrive out of time order; a 40-day
    # watermark delay (> the data's 30-day span) means nothing is "late"
    q = (
        SE.stream_stream_click_purchase_join(clicks, purchases, watermark_delay="40 days")
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("select * from attrib").collect()
    }
    bc = src.filter("event_type = 'click'").selectExpr(
        "user_id c_user", "ts click_ts", "event_id click_id"
    )
    bp = src.filter("event_type = 'purchase'").selectExpr(
        "user_id p_user", "ts purchase_ts", "event_id purchase_id"
    )
    import pyspark.sql.functions as F2

    batch = bc.join(
        bp,
        (F2.col("c_user") == F2.col("p_user"))
        & (F2.col("purchase_ts") >= F2.col("click_ts"))
        & (F2.col("purchase_ts") <= F2.col("click_ts") + F2.expr("INTERVAL 1 HOUR")),
    )
    want = {(r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_dedup_drops_replayed_events(spark, staged_events):
    """An at-least-once source replays rows; dropDuplicatesWithinWatermark
    must emit each (event_id) exactly once — matching batch dropDuplicates
    over the duplicated input."""
    path, src = staged_events
    dup_dir = tempfile.mkdtemp(prefix="evdup_")
    try:
        # simulate replay: the same events written twice across files
        src.limit(400).repartition(2).write.mode("overwrite").parquet(dup_dir)
        src.limit(400).repartition(2).write.mode("append").parquet(dup_dir)
        stream = SE.read_event_stream(spark, dup_dir)
        q = (
            SE.streaming_dedup(stream, key_cols=("event_id",), watermark="2 hours")
            .writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select event_id from dedup_stream").collect()
        ids = [r.event_id for r in got]
        assert len(ids) == len(set(ids)), "stream emitted a duplicate key"
        want = {r.event_id for r in src.limit(400).select("event_id").distinct().collect()}
        assert set(ids) == want
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_streaming_session_windows_converge_to_batch(spark, staged_events):
    """Native session_window on the stream (append mode, watermarked) must
    produce exactly the batch session_window sessions once all input is
    consumed.  Micro-batches are staged in EVENT-TIME order — a source that
    replays history out of order beyond the watermark would (correctly)
    drop the late fragments as late data, which is watermark semantics, not
    a convergence property."""
    _, src = staged_events
    path = tempfile.mkdtemp(prefix="evsess_")
    # three chronological segments, written sequentially (file stream
    # processes in modification-time order)
    import time as _time

    mm = src.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    span = (mm.hi - mm.lo) / 3
    b1, b2 = mm.lo + span, mm.lo + 2 * span
    segs = [
        src.filter(F.col("ts") <= b1),
        src.filter((F.col("ts") > b1) & (F.col("ts") <= b2)),
        src.filter(F.col("ts") > b2),
    ]
    for seg in segs:
        seg.coalesce(1).write.mode("append").parquet(path)
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    stream = SE.read_event_stream(spark, path)
    q = (
        SE.session_window_agg(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("select * from sess_stream").collect()
    }
    batch = (
        src.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("ss"),
            "n",
        )
        .collect()
    )
    want = {(r.user_id, r.ss): r.n for r in batch}
    # append mode only emits sessions the final watermark has passed; every
    # emitted session must match its batch twin, and coverage must be
    # substantial (the tail of open sessions at end-of-stream stays unemitted)
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want.get(k) == v, f"session {k}: stream {v} vs batch {want.get(k)}"
    assert len(got) >= 0.8 * len(want)
    shutil.rmtree(path, ignore_errors=True)


def test_resolve_stream_app_id_validates_marker(tmpdir):
    """Empty/damaged markers are re-minted, never accepted: '' as an appId
    would make distinct streams share an identity and wrongly skip each
    other's batch ids."""
    ckpt = os.path.join(tmpdir, "ck")
    a1 = SE.resolve_stream_app_id(ckpt)
    assert a1.startswith("stream_to_delta-")
    # stable on re-resolve
    assert SE.resolve_stream_app_id(ckpt) == a1
    # damage the marker: truncate to empty
    marker = os.path.join(ckpt, "_lhl_app_id")
    open(marker, "w").close()
    a2 = SE.resolve_stream_app_id(ckpt)
    assert a2.startswith("stream_to_delta-") and a2 != ""
    with open(marker) as fh:
        assert fh.read().strip() == a2  # marker repaired
    # garbage content is also rejected and rewritten
    with open(marker, "w") as fh:
        fh.write("not-a-valid-id")
    assert SE.resolve_stream_app_id(ckpt).startswith("stream_to_delta-")


def test_resolve_stream_app_id_uri_schemes(tmpdir):
    """file:// URIs use the local marker scheme (same identity as the bare
    path); non-local URIs fall back to a path-derived id WITHOUT creating
    any local directory that would shadow the real checkpoint."""
    ckpt = os.path.join(tmpdir, "ck2")
    bare = SE.resolve_stream_app_id(ckpt)
    assert SE.resolve_stream_app_id(f"file://{ckpt}") == bare
    cwd_entries = set(os.listdir("."))
    s3 = SE.resolve_stream_app_id("s3://bucket/ckpt/path")
    assert s3.startswith("stream_to_delta-")
    # deterministic per URI, distinct per location
    assert SE.resolve_stream_app_id("s3://bucket/ckpt/path") == s3
    assert SE.resolve_stream_app_id("s3://bucket/ckpt/other") != s3
    # no stray local dirs were created for the s3 URI
    assert set(os.listdir(".")) == cwd_entries
    assert not os.path.exists("s3:")


def test_stream_upsert_maintains_latest_state(spark):
    """stream_upsert_to_delta keyed on user_id with latest_by=ts: after the
    bounded stream drains (time-ordered micro-batches), the table holds
    exactly one row per user — the globally latest event — and a replayed
    batch is suppressed by the txn marker."""
    import datetime as dt

    from lakehouse_loader_spark.sinks import delta as DL

    src_dir = tempfile.mkdtemp(prefix="upsrc_")
    out = tempfile.mkdtemp(prefix="uptbl_")
    ckpt = tempfile.mkdtemp(prefix="upckpt_")
    try:
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows_by_batch = []
        eid = 0
        for b in range(3):  # time-sliced batches: batch b covers hour b
            rows = []
            for i in range(40):
                uid = i % 7
                rows.append(
                    (
                        eid,
                        base + dt.timedelta(hours=b, minutes=i),
                        uid,
                        "view",
                        float(eid),
                        "{}",
                    )
                )
                eid += 1
            rows_by_batch.append(rows)
        for b, rows in enumerate(rows_by_batch):
            spark.createDataFrame(rows, SE.EVENT_SCHEMA).coalesce(1).write.parquet(
                os.path.join(src_dir, f"b{b}")
            )
        # one dir per batch -> 3 dirs of 1 file; stream them in name order
        stream = SE.read_event_stream(spark, os.path.join(src_dir, "b*"))
        q = SE.stream_upsert_to_delta(
            stream, os.path.join(out, "t"), ckpt, key="user_id", latest_by="ts"
        )
        q.awaitTermination(120)
        q.stop()
        back = DL.read_delta(spark, os.path.join(out, "t"))
        got = {(r.user_id): (r.event_id, r.ts) for r in back.collect()}
        # global latest per user: the last batch holds every user's newest event
        all_rows = [r for rows in rows_by_batch for r in rows]
        want = {}
        for r in sorted(all_rows, key=lambda r: r[1]):
            want[r[2]] = (r[0], r[1])
        assert back.count() == 7
        assert got == want
        # exactly-once marker recorded the last merged batch
        app_id = SE.resolve_stream_app_id(ckpt)
        assert DL.last_txn_version(os.path.join(out, "t"), app_id) >= 1
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_static_enrichment_matches_batch(spark, staged_events):
    """Stream-static broadcast enrichment converges to the batch left
    join: per-user tier labels attach to every event, unknown users pass
    through with null tier."""
    import uuid as _uuid

    from lakehouse_loader_spark.streaming.events import (
        enrich_stream_with_dimension,
        read_event_stream,
    )

    dim = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 2 == 0, "gold").otherwise("basic").alias("tier"),
    )
    path, _src = staged_events
    stream = read_event_stream(spark, path, max_files_per_trigger=2)
    sink = f"enrich_{_uuid.uuid4().hex[:8]}"
    q = (
        enrich_stream_with_dimension(stream, dim, on="user_id")
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("memory")
        .queryName(sink)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(sink)

    batch = spark.read.parquet(path).join(F.broadcast(dim), "user_id", "left")
    assert got.count() == batch.count()
    assert (
        got.filter("tier IS NULL").count() == batch.filter("tier IS NULL").count()
    )
    g = {r.event_id: r.tier for r in got.select("event_id", "tier").collect()}
    b = {r.event_id: r.tier for r in batch.select("event_id", "tier").collect()}
    assert g == b


def test_stream_upsert_to_iceberg_via_equality_deletes(spark):
    """The Iceberg streaming upsert: each batch commits an equality delete
    of its keys then appends — no file rewritten, yet the table reads as
    latest-state per key; compaction materializes it physically."""
    import datetime as dt
    import glob as _glob

    from lakehouse_loader_spark.sinks import iceberg as IC

    src_dir = tempfile.mkdtemp(prefix="iupsrc_")
    out = tempfile.mkdtemp(prefix="iuptbl_")
    ckpt = tempfile.mkdtemp(prefix="iupckpt_")
    try:
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows_by_batch = []
        eid = 0
        for b in range(3):
            rows = []
            for i in range(40):
                uid = i % 7
                rows.append(
                    (eid, base + dt.timedelta(hours=b, minutes=i), uid,
                     "view", float(eid), "{}")
                )
                eid += 1
            rows_by_batch.append(rows)
        for b, rows in enumerate(rows_by_batch):
            spark.createDataFrame(rows, SE.EVENT_SCHEMA).coalesce(1).write.parquet(
                os.path.join(src_dir, f"b{b}")
            )
        stream = SE.read_event_stream(spark, os.path.join(src_dir, "b*"))
        table = os.path.join(out, "t")
        q = SE.stream_upsert_to_iceberg(
            stream, table, ckpt, key="user_id", latest_by="ts"
        )
        q.awaitTermination(120)
        q.stop()

        back = IC.read_iceberg(spark, table)
        got = {r.user_id: (r.event_id, r.ts) for r in back.collect()}
        all_rows = [r for rows in rows_by_batch for r in rows]
        want = {}
        for r in sorted(all_rows, key=lambda r: r[1]):
            want[r[2]] = (r[0], r[1])
        assert back.count() == 7
        assert got == want
        # upserts arrived as equality-delete files, not rewrites
        assert _glob.glob(os.path.join(table, "data", "eqdelete-*.parquet"))
        app_id = SE.resolve_stream_app_id(ckpt)
        assert IC.last_committed_batch(table, app_id) >= 1

        # compaction materializes the latest state and drops the deletes
        IC.optimize_iceberg(spark, table)
        back2 = IC.read_iceberg(spark, table)
        assert {r.user_id: (r.event_id, r.ts) for r in back2.collect()} == want
        _, meta = IC._read_metadata(table)
        _, dels, _ = IC._split_live_entries(table, meta)
        assert dels == []
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package "
    "(state-server protocol) — not shipped in this container",
)
def test_transformwithstate_type_histogram_converges(spark, tmpdir):
    """Spark-4 arbitrary-state API parity: the MapState-per-event-type
    histogram (stateful_type_histogram) converges to the batch GROUP BY
    over a bounded file stream.  Dependency-gated the same way the live
    Postgres/MinIO e2e suite is environment-gated."""
    import os

    from pyspark.sql import functions as F

    from lakehouse_loader_spark.streaming.events import (
        read_event_stream,
        stateful_type_histogram,
    )

    src = os.path.join(tmpdir, "src")
    rows = [
        (i, f"2024-01-01 00:{i % 60:02d}:00", i % 3, ["click", "view"][i % 2], float(i), "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    for part in range(3):
        df.filter(F.col("event_id") % 3 == part).coalesce(1).write.parquet(
            os.path.join(src, f"f{part}")
        )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stateful_type_histogram(
                read_event_stream(spark, os.path.join(src, "f*"), max_files_per_trigger=1)
            )
            .writeStream.trigger(availableNow=True)
            .outputMode("update")
            .format("memory")
            .queryName("tws_hist")
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)

    got = {
        (r.user_id, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("tws_hist")
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"), F.max_by("total_value", "n_events").alias("total_value"))
        .collect()
    }
    want = {
        (r.user_id, r.event_type): (r.n, r.tv)
        for r in df.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want


def test_stateful_v2_fallback_twin_matches_batch_groupby(spark, tmpdir):
    """stateful_type_histogram_fallback (the applyInPandasWithState twin
    that streaming_stateful_v2_parity runs where transformWithState's
    protobuf dependency is absent) converges to the batch GROUP BY on the
    same per-(user, type) histogram — the same contract the v2 operator's
    protobuf-gated parity test pins."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from lakehouse_loader_spark.streaming.events import (
        read_event_stream,
        stateful_type_histogram_fallback,
        transformwithstate_runtime_available,
    )

    df = (
        spark.range(0, 3000)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            (F.col("id") % 7).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
                "event_type"
            ),
            (F.col("id") * 0.5).alias("value"),
            F.lit("{}").alias("props"),
        )
        .repartition(4)
    )
    staged = os.path.join(tmpdir, "ev")
    df.write.parquet(staged)
    sink = f"v2fb_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_type_histogram_fallback(
            read_event_stream(spark, staged, max_files_per_trigger=1)
        )
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table(sink)
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"), F.max_by("total_value", "n_events").alias("total_value"))
    )
    want = df.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
    got = got.select("user_id", "event_type", "n_events", "total_value")
    want = want.select("user_id", "event_type", "n_events", "total_value")
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert diff == 0
    # document which path the driver query would take in THIS container
    assert isinstance(transformwithstate_runtime_available(), bool)


def test_stream_stream_interval_join_matches_batch_and_evicts(spark, tmpdir):
    """The attribution join (clicks x purchases per user within a gap):
    converged append output equals the batch join, the physical plan is
    the symmetric-hash stream-stream join with watermarks on both sides
    (the state-eviction contract), and a narrow horizon on an in-order
    stream still converges — state is bounded by horizon x rate."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from lakehouse_loader_spark.streaming.events import (
        read_event_stream,
        stream_stream_interval_join,
    )

    df = (
        spark.range(0, 4000)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias("ts"),
            (F.col("id") % 11).alias("user_id"),
            F.when(F.col("id") % 3 == 0, "click").otherwise("purchase").alias(
                "event_type"
            ),
            (F.col("id") * 0.25).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    staged = os.path.join(tmpdir, "ev")
    # in-order staging: sortWithinPartitions on one range partitioning so
    # each micro-batch file covers a contiguous time span
    df.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(staged)

    def run(watermark):
        sink = f"ssj_{uuid.uuid4().hex[:8]}"
        clicks = read_event_stream(spark, staged, max_files_per_trigger=1).filter(
            F.col("event_type") == "click"
        )
        purchases = read_event_stream(spark, staged, max_files_per_trigger=1).filter(
            F.col("event_type") == "purchase"
        )
        joined = stream_stream_interval_join(
            clicks, purchases, gap="30 minutes", watermark=watermark
        )
        q = (
            joined.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .format("memory")
            .queryName(sink)
            .start()
        )
        q.awaitTermination(300)
        return spark.table(sink)

    got = run("30 days")
    want = (
        df.filter("event_type = 'click'")
        .alias("c")
        .join(
            df.filter("event_type = 'purchase'").alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("p.value").alias("purchase_value"),
        )
    )
    assert got.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().analyzed().toString()
    # the memory sink holds materialized rows; assert on the streaming
    # plan instead via a fresh unstarted frame
    clicks = read_event_stream(spark, staged).filter("event_type = 'click'")
    purchases = read_event_stream(spark, staged).filter("event_type = 'purchase'")
    frame = stream_stream_interval_join(clicks, purchases)
    lp = frame._jdf.queryExecution().analyzed().toString()
    assert lp.count("EventTimeWatermark") == 2  # BOTH sides evict state
    # a tight horizon trades completeness for bounded state: matches whose
    # click was evicted before the cross-batch purchase arrived are
    # dropped (the documented watermark semantics), but NO wrong rows are
    # ever emitted — the output is a strict subset of the batch join
    got2 = run("2 hours")
    assert got2.exceptAll(want).count() == 0
    assert got2.count() > 0


def test_stream_to_delta_into_row_tracked_table(spark, staged_events):
    """Streaming appends on a ROW-TRACKING table mint fresh, non-overlapping
    baseRowId ranges per micro-batch commit (the assignment runs inside the
    same write_delta retry loop as batch appends), the high-water mark ends
    at total_rows - 1, and every row id is unique."""
    import tempfile

    from lakehouse_loader_spark.sinks import delta as DL

    path, src = staged_events
    out = tempfile.mkdtemp(prefix="evdeltart_")
    ckpt = tempfile.mkdtemp(prefix="evckptrt_")
    t = os.path.join(out, "t")
    try:
        # seed the table with one batch row so row tracking can be enabled
        # before the stream appends (enablement backfills the seed file);
        # the file stream reads plain TIMESTAMP, so the seed must match
        DL.write_delta(src.limit(7).withColumn("ts", F.col("ts").cast("timestamp")), t)
        DL.enable_row_tracking(t)
        q = SE.stream_to_delta(SE.read_event_stream(spark, path), t, ckpt)
        q.awaitTermination(120)
        total = src.count() + 7
        assert DL._row_id_high_water_mark(t) == total - 1
        ids = [r["_row_id"] for r in DL.read_delta_with_row_ids(spark, t).collect()]
        assert sorted(ids) == list(range(total))
        # every streamed add carries its assigned range
        _, _, adds = DL._read_log(t)
        assert all(a.get("baseRowId") is not None for a in adds.values())
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_to_iceberg_into_row_lineage_table(spark, staged_events):
    """The Iceberg twin of the Delta row-tracking stream test: streaming
    appends on a ROW-LINEAGE table mint fresh, non-overlapping
    first_row_id ranges per micro-batch commit (assignment runs inside the
    same write_iceberg retry loop as batch appends), next-row-id ends at
    total_rows, and every row id is unique."""
    import tempfile

    from lakehouse_loader_spark.sinks import iceberg as IC

    path, src = staged_events
    out = tempfile.mkdtemp(prefix="evicert_")
    ckpt = tempfile.mkdtemp(prefix="evckpti_")
    t = os.path.join(out, "t")
    try:
        IC.write_iceberg(
            src.limit(7).withColumn("ts", F.col("ts").cast("timestamp")), t
        )
        IC.enable_row_lineage_iceberg(t)
        q = SE.stream_to_iceberg(SE.read_event_stream(spark, path), t, ckpt)
        q.awaitTermination(120)
        total = src.count() + 7
        _, meta = IC._read_metadata(t)
        assert meta["next-row-id"] == total
        ids = [
            r["_row_id"] for r in IC.read_iceberg_with_row_ids(spark, t).collect()
        ]
        assert sorted(ids) == list(range(total))
        # every live file carries its assigned range; spans tile exactly
        data, _, _ = IC._split_live_entries(t, meta)
        spans = sorted((d["first_row_id"], d["record_count"]) for d in data)
        cursor = 0
        for first, n in spans:
            assert first == cursor
            cursor += n
        assert cursor == total
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_parity_clone_releases_previous_memory_sink(spark):
    """The shared parity clone must not accumulate memory-sink tables
    across runs: each result set lives in JVM memory behind a catalog
    temp view, so a long-lived service re-running parities would grow
    the heap without bound.  Contract: the PREVIOUS same-query sink is
    dropped when the next run starts; the fresh sink stays queryable."""
    import lakehouse_loader_spark.queries.extensions as ext
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["streaming_window_parity"].fn
    n1 = fn(spark, SF_SMOKE).count()
    first = ext._PARITY_SINKS["sw_parity"]
    n2 = fn(spark, SF_SMOKE).count()
    second = ext._PARITY_SINKS["sw_parity"]
    assert n1 == n2 > 0
    assert first != second
    child = ext._PARITY_SESSIONS[8]
    names = {t.name for t in child.catalog.listTables()}
    assert first not in names, "previous parity sink must be dropped"
    assert second in names, "current parity sink must remain readable"


def test_parity_clone_isolates_confs_from_parent(spark):
    """The parity clone's bounded-run confs (narrow state width, retain=1,
    tmpfs checkpoint root, no-data batches off) must never leak to the
    caller's session: an unrelated query planned concurrently with a
    parity run keeps the parent's AQE/shuffle settings (the r11 verdict
    flagged exactly this leak for the set/restore pattern)."""
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded
    import lakehouse_loader_spark.queries.extensions as ext

    _ensure_loaded()
    before = {
        "parts": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "nodata": spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        ),
        "retain": spark.conf.get("spark.sql.streaming.minBatchesToRetain", "100"),
    }
    REGISTRY["streaming_window_parity"].fn(spark, SF_SMOKE).count()
    child = ext._PARITY_SESSIONS[8]
    assert child is not spark
    assert child.sparkContext is spark.sparkContext
    # clone carries the bounded-run confs...
    assert child.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "false"
    assert child.conf.get("spark.sql.streaming.minBatchesToRetain") == "1"
    # ...and the parent kept every one of its own
    assert spark.conf.get("spark.sql.shuffle.partitions") == before["parts"]
    assert spark.conf.get("spark.sql.adaptive.enabled") == before["aqe"]
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        == before["nodata"]
    )
    assert (
        spark.conf.get("spark.sql.streaming.minBatchesToRetain", "100")
        == before["retain"]
    )


def test_parity_clones_are_keyed_per_width(spark):
    """The clone cache is keyed per shuffle width (ADVICE r12): two
    parities started from different threads can never freeze each other's
    width into their first checkpoint, because a clone's width is set once
    at creation and never mutated."""
    import lakehouse_loader_spark.queries.extensions as ext

    c8 = ext._parity_stream_session(spark, width=8)
    c16 = ext._parity_stream_session(spark, width=16)
    assert c8 is not c16
    assert c8.conf.get("spark.sql.shuffle.partitions") == "8"
    assert c16.conf.get("spark.sql.shuffle.partitions") == "16"
    # cache hit returns the same clone, width intact
    assert ext._parity_stream_session(spark, width=8) is c8
    assert c8.conf.get("spark.sql.shuffle.partitions") == "8"
    # both share the parent's context and ONE checkpoint root
    assert c8.sparkContext is spark.sparkContext
    assert (
        c8.conf.get("spark.sql.streaming.checkpointLocation")
        == c16.conf.get("spark.sql.streaming.checkpointLocation")
    )


def test_resolve_stream_app_id_single_slash_file_uri(tmpdir):
    """file:/path (single slash — accepted by Spark/Hadoop as a
    checkpointLocation) must resolve to the SAME marker-backed appId as
    file:///path and a bare path: the pre-r14 '://' regex treated it as a
    relative dir and minted a CWD-dependent id, defeating exactly-once
    after a relocation."""
    from lakehouse_loader_spark.streaming.events import resolve_stream_app_id

    base = os.path.join(str(tmpdir), "ck")
    a = resolve_stream_app_id(base)
    assert resolve_stream_app_id(f"file:{base}") == a
    assert resolve_stream_app_id(f"file://{base}") == a
    assert os.path.isfile(os.path.join(base, "_lhl_app_id"))
    # no bogus './file:...' directory materialized anywhere
    assert not os.path.exists(f"file:{base}")


def test_stateful_histograms_keep_null_event_type(spark, tmpdir):
    """A NULL event_type row is a real group (the batch GROUP BY keeps
    it): pandas groupby's default dropna=True silently lost its count and
    value mass pre-r14.  The fallback operator must emit the NULL group
    and converge to the batch aggregate including it."""
    import uuid

    from lakehouse_loader_spark.streaming.events import (
        read_event_stream,
        stateful_type_histogram_fallback,
    )

    df = spark.range(0, 600).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 3).cast("string")))
        .alias("event_type"),
        (F.col("id") * 0.5).alias("value"),
        F.lit("{}").alias("props"),
    )
    staged = os.path.join(str(tmpdir), "ev")
    df.repartition(3).write.parquet(staged)
    sink = f"nullet_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_type_histogram_fallback(
            read_event_stream(spark, staged, max_files_per_trigger=1)
        )
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table(sink)
        .groupBy("user_id", "event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .select("user_id", "event_type", "n_events", "total_value")
    )
    want = (
        df.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select("user_id", "event_type", "n_events", "total_value")
    )
    assert want.filter(F.col("event_type").isNull()).count() > 0
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert diff == 0, "NULL event_type group lost or miscounted"
