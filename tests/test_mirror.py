"""Lakehouse→lakehouse incremental mirroring (streaming/tail.py
mirror_table) and the tombstone-capable merge primitives underneath it
(merge_delta / merge_iceberg with ``delete_col`` — the CDC-apply shape
merge_postgres_wire defined).

Coverage: cross-format mirrors in both directions (Delta↔Iceberg),
append and keyed-CDC modes, destination convergence under source DML,
exactly-once across a crash-replayed window (Delta txn action / Iceberg
snapshot-summary watermark), and the merge contracts (matched tombstone
deletes, unmatched tombstone no-op, CDC delete images, duplicate-key
refusal spanning upserts and tombstones)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks.delta import (
    delete_from_delta,
    enable_change_data_feed,
    merge_delta,
    read_delta,
    read_delta_changes,
    update_delta,
    write_delta,
)
from lakehouse_loader_spark.sinks.iceberg import (
    delete_from_iceberg,
    merge_iceberg,
    read_iceberg,
    write_iceberg,
)
from lakehouse_loader_spark.streaming.tail import _MARKER, mirror_table

# slow: dict-model merge property suites + CLI mirror e2e (~7 min)
pytestmark = pytest.mark.slow


def _df(spark, lo, hi, mult=10):
    return spark.range(lo, hi).select("id", (F.col("id") * mult).alias("v"))


def _tomb_batch(spark):
    # one update, one insert, one matched tombstone, one unmatched one
    return spark.createDataFrame(
        [(3, 999, False), (20, 200, False), (7, None, True), (99, None, True)],
        "id long, v long, dead boolean",
    )


# ---------------------------------------------------------------------------
# merge primitives with tombstones
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
def test_merge_delta_tombstones(spark, tmpdir, mode):
    t = os.path.join(str(tmpdir), "t")
    write_delta(_df(spark, 0, 10), t)
    res = merge_delta(spark, t, _tomb_batch(spark), "id", delete_col="dead", mode=mode)
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 1, 1)
    got = {r["id"]: r["v"] for r in read_delta(spark, t).collect()}
    assert got[3] == 999 and got[20] == 200
    assert 7 not in got and 99 not in got and len(got) == 10


def test_merge_delta_tombstone_cdc_images(spark, tmpdir):
    t = os.path.join(str(tmpdir), "t")
    write_delta(_df(spark, 0, 10), t)
    enable_change_data_feed(t)
    merge_delta(spark, t, _tomb_batch(spark), "id", delete_col="dead")
    ch = sorted(
        (r["_change_type"], r["id"])
        for r in read_delta_changes(spark, t, since_version=2).collect()
    )
    assert ("delete", 7) in ch, "matched tombstone emits a delete image"
    assert ("delete", 99) not in ch, "unmatched tombstone emits nothing"
    assert ("update_preimage", 3) in ch and ("update_postimage", 3) in ch
    assert ("insert", 20) in ch


def test_merge_delta_duplicate_key_across_kinds_refuses(spark, tmpdir):
    t = os.path.join(str(tmpdir), "t")
    write_delta(_df(spark, 0, 5), t)
    dup = spark.createDataFrame(
        [(1, 5, False), (1, None, True)], "id long, v long, dead boolean"
    )
    with pytest.raises(ValueError, match="duplicate"):
        merge_delta(spark, t, dup, "id", delete_col="dead")


def test_merge_iceberg_tombstones_and_txn_watermark(spark, tmpdir):
    t = os.path.join(str(tmpdir), "t")
    write_iceberg(_df(spark, 0, 10), t)
    res = merge_iceberg(
        spark, t, _tomb_batch(spark), "id", delete_col="dead", txn=("app", 1)
    )
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 1, 1)
    got = {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()}
    assert got[3] == 999 and got[20] == 200
    assert 7 not in got and 99 not in got and len(got) == 10
    # exactly-once: the summary-stamped (app, version) replays as a no-op
    res2 = merge_iceberg(
        spark, t, _tomb_batch(spark), "id", delete_col="dead", txn=("app", 1)
    )
    assert res2 == {"rewritten_files": 0, "updated": 0, "inserted": 0, "deleted": 0}
    assert {r["id"]: r["v"] for r in read_iceberg(spark, t).collect()} == got
    # a NEW version applies (no-op content here, but it must not skip)
    res3 = merge_iceberg(
        spark, t, spark.createDataFrame([(1, 111)], "id long, v long"),
        "id", txn=("app", 2),
    )
    assert res3["updated"] == 1


# ---------------------------------------------------------------------------
# mirror_table
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "src_fmt,dst_fmt", [("delta", "iceberg"), ("iceberg", "delta")]
)
def test_mirror_appends_cross_format(spark, tmpdir, src_fmt, dst_fmt):
    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_src = write_delta if src_fmt == "delta" else write_iceberg
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    write_src(_df(spark, 0, 20), src)
    r0 = mirror_table(spark, src, dst, ck, dst_fmt=dst_fmt)
    assert r0["rows"] == 20 and r0["run"] == 0
    write_src(_df(spark, 20, 25), src, append=True)
    write_src(_df(spark, 25, 27), src, append=True)
    r1 = mirror_table(spark, src, dst, ck, dst_fmt=dst_fmt)
    assert r1["rows"] == 7 and r1["run"] == 1  # both appends, one window
    assert sorted(r["id"] for r in read_dst(spark, dst).collect()) == list(range(27))
    assert mirror_table(spark, src, dst, ck, dst_fmt=dst_fmt)["empty"]


@pytest.mark.parametrize(
    "src_fmt,dst_fmt",
    [("delta", "delta"), ("delta", "iceberg"), ("iceberg", "delta")],
)
def test_mirror_keyed_cdc_converges_under_dml(spark, tmpdir, src_fmt, dst_fmt):
    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_src = write_delta if src_fmt == "delta" else write_iceberg
    read_src = read_delta if src_fmt == "delta" else read_iceberg
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    del_src = delete_from_delta if src_fmt == "delta" else delete_from_iceberg

    write_src(_df(spark, 0, 10), src)
    assert mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)[
        "rows"
    ] == 10
    del_src(spark, src, "id < 3")
    if src_fmt == "delta":
        update_delta(spark, src, "id = 5", {"v": "v + 1"})
    write_src(_df(spark, 10, 12), src, append=True)
    mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    want = {r["id"]: r["v"] for r in read_src(spark, src).collect()}
    got = {r["id"]: r["v"] for r in read_dst(spark, dst).collect()}
    assert got == want, "destination must converge to the source snapshot"
    assert 0 not in got and 10 in got


@pytest.mark.parametrize("dst_fmt", ["delta", "iceberg"])
def test_mirror_crash_replay_applies_zero(spark, tmpdir, dst_fmt):
    """A crash between the destination commit and the cursor advance
    replays the SAME window; the destination's (app, run) watermark —
    Delta txn action / Iceberg snapshot summary — suppresses it."""
    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_delta(_df(spark, 0, 5), src)
    mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    delete_from_delta(spark, src, "id = 0")
    marker = os.path.join(ck, _MARKER)
    pre = json.load(open(marker))
    r = mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    assert r["rows"] == 1
    post = json.load(open(marker))
    # rewind the marker to the recorded-pending state (= crash after the
    # destination commit, before the cursor write)
    with open(marker, "w") as fh:
        json.dump({**pre, "pending": post["cursor"]}, fh)
    r2 = mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    assert r2["rows"] == 0, "replayed window must apply zero rows"
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    assert sorted(x["id"] for x in read_dst(spark, dst).collect()) == [1, 2, 3, 4]


@pytest.mark.parametrize("dst_fmt", ["delta", "iceberg"])
def test_mirror_composite_key_cdc(spark, tmpdir, dst_fmt):
    """Composite business keys pass straight through to the merge
    primitives (r13 verdict item 4): a keyed mirror on (region, id)
    converges under deletes + appends without any upstream key
    concatenation."""
    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    base = spark.createDataFrame(
        [("eu", i, i * 10) for i in range(4)]
        + [("us", i, i * 100) for i in range(4)],
        "region string, id long, v long",
    )
    write_delta(base, src)
    r0 = mirror_table(
        spark, src, dst, ck, key_cols=["region", "id"], dst_fmt=dst_fmt
    )
    assert r0["rows"] == 8
    # delete one (region, id) tuple — the twin tuple in the other region
    # must survive, which a single-column key could not express
    delete_from_delta(spark, src, "region = 'eu' AND id = 2")
    write_delta(
        spark.createDataFrame([("ap", 0, 7)], "region string, id long, v long"),
        src,
        append=True,
    )
    mirror_table(spark, src, dst, ck, key_cols=["region", "id"], dst_fmt=dst_fmt)
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    got = {(r["region"], r["id"]): r["v"] for r in read_dst(spark, dst).collect()}
    assert ("eu", 2) not in got and got[("us", 2)] == 200
    assert got[("ap", 0)] == 7 and len(got) == 8


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_composite_key_null_refuses(spark, tmpdir, fmt):
    """NULL in any key column — composite OR single (r15: the historical
    one-NULL-key allowance was a silent append-on-replay hazard, since the
    equality join can never match it) — is unaddressable; refuse loudly
    (the pgwire guard's contract)."""
    t = os.path.join(str(tmpdir), "t")
    write = write_delta if fmt == "delta" else write_iceberg
    merge = merge_delta if fmt == "delta" else merge_iceberg
    write(
        spark.createDataFrame([("a", 1, 10)], "r string, id long, v long"), t
    )
    bad = spark.createDataFrame(
        [("a", None, 11)], "r string, id long, v long"
    )
    with pytest.raises(ValueError, match="NULL in key column"):
        merge(spark, t, bad, ["r", "id"])
    # single-column key: same refusal, same error shape
    with pytest.raises(ValueError, match="NULL in key column"):
        merge(spark, t, bad, "id")
    # and a valid single-key merge on the same table still works after
    good = spark.createDataFrame([("a", 1, 99)], "r string, id long, v long")
    res = merge(spark, t, good, "id")
    assert res["updated"] == 1


def test_cli_mirror_cross_format(spark, tmpdir):
    """CLI mirror drives the same checkpointed flow: snapshot run, then a
    keyed CDC window, Delta source into an Iceberg destination."""
    import subprocess
    import sys as _sys

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_delta(_df(spark, 0, 12), src)

    def run():
        return subprocess.run(
            [
                _sys.executable, "-m", "lakehouse_loader_spark.cli",
                "mirror", src, dst,
                "--checkpoint", ck, "--to", "iceberg", "--key", "id",
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )

    r0 = run()
    assert r0.returncode == 0, r0.stderr[-400:]
    assert "mirrored 12 rows" in r0.stderr
    delete_from_delta(spark, src, "id >= 10")
    r1 = run()
    assert r1.returncode == 0, r1.stderr[-400:]
    assert sorted(r["id"] for r in read_iceberg(spark, dst).collect()) == list(
        range(10)
    )
    r2 = run()
    assert "no new commits" in r2.stderr


# ---------------------------------------------------------------------------
# Property test: random upsert/tombstone batches against a dict model.
# Catches the interaction classes example tests miss (tombstone for a key
# inserted two batches ago, upsert resurrecting a deleted key, repeated
# tombstones, all-tombstone batches, empty-intersection batches).
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_BATCHES = st.lists(
    st.dictionaries(
        st.integers(min_value=0, max_value=14),  # small key space -> collisions
        st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=int(os.environ.get("LHL_MERGE_EXAMPLES", "15")), deadline=None)
@given(batches=_BATCHES, fmt=st.sampled_from(["delta", "iceberg"]))
def test_merge_tombstone_batches_match_dict_model(
    spark, tmp_path_factory, batches, fmt
):
    t = os.path.join(str(tmp_path_factory.mktemp("m")), "t")
    write = write_delta if fmt == "delta" else write_iceberg
    read = read_delta if fmt == "delta" else read_iceberg
    merge = merge_delta if fmt == "delta" else merge_iceberg

    write(_df(spark, 0, 5), t)  # keys 0..4 -> v = 10*id
    model = {i: i * 10 for i in range(5)}
    for batch in batches:
        rows = [
            (k, v if v is not None else None, v is None)
            for k, v in batch.items()
        ]
        src = spark.createDataFrame(rows, "id long, v long, dead boolean")
        res = merge(spark, t, src, "id", delete_col="dead")
        n_up = sum(1 for k, v in batch.items() if v is not None)
        matched_dead = sum(
            1 for k, v in batch.items() if v is None and k in model
        )
        assert res["deleted"] == matched_dead
        assert res["updated"] + res["inserted"] == n_up
        for k, v in batch.items():
            if v is None:
                model.pop(k, None)
            else:
                model[k] = v
        got = {r["id"]: r["v"] for r in read(spark, t).collect()}
        assert got == model, (got, model)


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_delete_col_shadowing_table_column_refuses(spark, tmpdir, fmt):
    """A tombstone flag named like a real column would silently treat
    data as markers (and drop the column from the applied row) — refuse."""
    t = os.path.join(str(tmpdir), "t")
    (write_delta if fmt == "delta" else write_iceberg)(_df(spark, 0, 3), t)
    merge = merge_delta if fmt == "delta" else merge_iceberg
    src = spark.createDataFrame([(1, True)], "id long, v boolean")
    with pytest.raises(ValueError, match="collides with a table column"):
        merge(spark, t, src, "id", delete_col="v")


def test_mirror_iceberg_replay_guard_survives_expire_snapshots(spark, tmpdir):
    """ADVICE r13: the Iceberg exactly-once watermark must not live ONLY
    in snapshot summaries — expire_snapshots deletes old snapshots
    (summaries included), so after destination maintenance plus another
    commit a crash-replayed window would double-apply.  The durable
    ``lhl-txn.<app_id>`` table property closes that hole."""
    from lakehouse_loader_spark.sinks.iceberg import (
        expire_snapshots,
        last_txn_version,
    )

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_delta(_df(spark, 0, 5), src)
    mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt="iceberg")
    delete_from_delta(spark, src, "id = 0")
    marker = os.path.join(ck, _MARKER)
    pre = json.load(open(marker))
    r = mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt="iceberg")
    assert r["rows"] == 1
    post = json.load(open(marker))
    # destination maintenance while the cursor is "pending": a foreign
    # append creates a NEWER snapshot, then expire_snapshots reclaims
    # every older one — including the snapshot whose summary carried the
    # run-1 watermark stamp
    write_iceberg(_df(spark, 100, 101), dst, append=True)
    expire_snapshots(dst, keep_last=1)
    from lakehouse_loader_spark.streaming.events import resolve_stream_app_id

    app_id = "tail-mirror-" + resolve_stream_app_id(ck)
    # the durable property survived the expiry
    assert last_txn_version(dst, app_id) >= 1
    # crash-rewind the cursor to the recorded-pending state and replay
    with open(marker, "w") as fh:
        json.dump({**pre, "pending": post["cursor"]}, fh)
    r2 = mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt="iceberg")
    assert r2["rows"] == 0, (
        "replayed window re-applied after expire_snapshots: the watermark "
        "must survive snapshot expiry"
    )
    got = sorted(x["id"] for x in read_iceberg(spark, dst).collect())
    assert got == [1, 2, 3, 4, 100]


_CBATCHES = st.lists(
    st.dictionaries(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=6),
        ),  # small composite key space -> cross-batch collisions
        st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=int(os.environ.get("LHL_MERGE_EXAMPLES", "15")), deadline=None)
@given(batches=_CBATCHES, fmt=st.sampled_from(["delta", "iceberg"]))
def test_merge_composite_key_batches_match_dict_model(
    spark, tmp_path_factory, batches, fmt
):
    """The tombstone dict-model walk, 2-column-key edition (r13 verdict
    item 4): same interaction classes, but the key is (g, id) — a pair
    differing in either component is a DIFFERENT key, so any fallback to
    a single column in the merge internals shows up as a model
    divergence immediately."""
    t = os.path.join(str(tmp_path_factory.mktemp("mc")), "t")
    write = write_delta if fmt == "delta" else write_iceberg
    read = read_delta if fmt == "delta" else read_iceberg
    merge = merge_delta if fmt == "delta" else merge_iceberg

    base = [("a", i, i * 10) for i in range(3)] + [("b", i, i * 100) for i in range(3)]
    write(spark.createDataFrame(base, "g string, id long, v long"), t)
    model = {(g, i): v for g, i, v in base}
    for batch in batches:
        rows = [
            (g, i, v if v is not None else None, v is None)
            for (g, i), v in batch.items()
        ]
        src = spark.createDataFrame(rows, "g string, id long, v long, dead boolean")
        res = merge(spark, t, src, ["g", "id"], delete_col="dead")
        n_up = sum(1 for v in batch.values() if v is not None)
        matched_dead = sum(
            1 for k, v in batch.items() if v is None and k in model
        )
        assert res["deleted"] == matched_dead
        assert res["updated"] + res["inserted"] == n_up
        for k, v in batch.items():
            if v is None:
                model.pop(k, None)
            else:
                model[k] = v
        got = {(r["g"], r["id"]): r["v"] for r in read(spark, t).collect()}
        assert got == model, (got, model)


# ---------------------------------------------------------------------------
# mirror_table schema-evolution contract (r13 verdict item 3 — the pg CDC
# path's on_schema_change, brought to the lakehouse→lakehouse mirror)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dst_fmt", ["delta", "iceberg"])
def test_mirror_schema_evolution_append_mode(spark, tmpdir, dst_fmt):
    from lakehouse_loader_spark.sinks.delta import add_column

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    # nullable source columns: the evolution appends below carry nullable
    # createDataFrame schemas, and this test is about COLUMN-SET drift
    write_delta(
        spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long"),
        src,
    )
    assert mirror_table(spark, src, dst, ck, dst_fmt=dst_fmt)["rows"] == 5
    # source gains a column mid-stream
    add_column(src, "extra", "long")
    write_delta(
        spark.createDataFrame([(10, 100, 7), (11, 110, 8)],
                              "id long, v long, extra long"),
        src, append=True,
    )
    # default: refuse, naming the column and the remedy
    with pytest.raises(ValueError, match="extra.*evolve"):
        mirror_table(spark, src, dst, ck, dst_fmt=dst_fmt)
    # nothing reached the destination
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    assert read_dst(spark, dst).count() == 5
    # evolve: destination gains the nullable column, old rows read NULL
    res = mirror_table(
        spark, src, dst, ck, dst_fmt=dst_fmt, on_schema_change="evolve"
    )
    assert res["rows"] == 2
    got = {r["id"]: r["extra"] for r in read_dst(spark, dst).collect()}
    assert got[10] == 7 and got[11] == 8
    assert all(got[i] is None for i in range(5))


@pytest.mark.parametrize("dst_fmt", ["delta", "iceberg"])
def test_mirror_schema_evolution_keyed_mode(spark, tmpdir, dst_fmt):
    from lakehouse_loader_spark.sinks.delta import add_column

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_delta(
        spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long"),
        src,
    )
    mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    add_column(src, "extra", "long")
    write_delta(
        spark.createDataFrame([(10, 100, 7)], "id long, v long, extra long"),
        src, append=True,
    )
    delete_from_delta(spark, src, "id = 0")
    with pytest.raises(ValueError, match="extra.*evolve"):
        mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt)
    res = mirror_table(
        spark, src, dst, ck, key_cols=["id"], dst_fmt=dst_fmt,
        on_schema_change="evolve",
    )
    assert res["rows"] == 2  # one upsert + one tombstone
    read_dst = read_delta if dst_fmt == "delta" else read_iceberg
    got = {r["id"]: r["extra"] for r in read_dst(spark, dst).collect()}
    assert 0 not in got and got[10] == 7
    assert all(got[i] is None for i in range(1, 5))


@pytest.mark.parametrize("keyed", [False, True])
def test_mirror_dropped_column_refuses_both_modes(spark, tmpdir, keyed):
    """A column the destination carries but the window doesn't (source
    dropped it, or the destination was extended out-of-band) refuses in
    BOTH on_schema_change modes — a keyed merge would silently NULL it for
    every touched key, an append window has no values for it."""
    from lakehouse_loader_spark.sinks.delta import add_column

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    key = ["id"] if keyed else None
    write_delta(
        spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long"),
        src,
    )
    mirror_table(spark, src, dst, ck, key_cols=key, dst_fmt="delta")
    add_column(dst, "ghost", "long")  # destination-only column
    write_delta(
        spark.createDataFrame([(10, 100), (11, 110)], "id long, v long"),
        src, append=True,
    )
    for mode in ("refuse", "evolve"):
        with pytest.raises(ValueError, match="no longer carries.*ghost"):
            mirror_table(
                spark, src, dst, ck, key_cols=key, dst_fmt="delta",
                on_schema_change=mode,
            )


def test_merge_delta_composite_key_cdc_images(spark, tmpdir):
    """CDF change images under a COMPOSITE key: pre/post/insert/delete
    images must match on the full key tuple — a first-column fallback
    would pair ('a',1) with ('b',1) and emit wrong images."""
    t = os.path.join(str(tmpdir), "t")
    write_delta(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
            "g string, id long, v long",
        ),
        t,
    )
    enable_change_data_feed(t)
    batch = spark.createDataFrame(
        [("a", 1, 99, False),   # update (a,1)
         ("b", 2, 40, False),   # insert (b,2)
         ("b", 1, None, True)], # delete (b,1)
        "g string, id long, v long, dead boolean",
    )
    res = merge_delta(spark, t, batch, ["g", "id"], delete_col="dead")
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 1, 1)
    ch = sorted(
        (r["_change_type"], r["g"], r["id"])
        for r in read_delta_changes(spark, t, since_version=2).collect()
    )
    assert ("update_preimage", "a", 1) in ch
    assert ("update_postimage", "a", 1) in ch
    assert ("insert", "b", 2) in ch
    assert ("delete", "b", 1) in ch
    # (b,1) deleted, (a,1) updated — the shared id=1 must not cross groups
    assert ("update_preimage", "b", 1) not in ch
    got = {(r["g"], r["id"]): r["v"] for r in read_delta(spark, t).collect()}
    assert got == {("a", 1): 99, ("a", 2): 20, ("b", 2): 40}


def test_merge_delta_composite_key_merge_on_read(spark, tmpdir):
    """Composite keys through the DV-masked merge path: matched tuples
    mask behind deletion vectors, the full source appends."""
    t = os.path.join(str(tmpdir), "t")
    write_delta(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
            "g string, id long, v long",
        ),
        t,
    )
    batch = spark.createDataFrame(
        [("a", 1, 99, False), ("b", 1, None, True), ("c", 1, 50, False)],
        "g string, id long, v long, dead boolean",
    )
    res = merge_delta(
        spark, t, batch, ["g", "id"], delete_col="dead", mode="merge-on-read"
    )
    assert (res["updated"], res["inserted"], res["deleted"]) == (1, 1, 1)
    got = {(r["g"], r["id"]): r["v"] for r in read_delta(spark, t).collect()}
    assert got == {("a", 1): 99, ("a", 2): 20, ("c", 1): 50}


def test_merge_delta_composite_key_row_tracking(spark, tmpdir):
    """Composite keys through the row-tracking path: matched tuples keep
    their stable row ids (the id_map groupBy runs over the full key
    tuple), inserts mint fresh ones."""
    from lakehouse_loader_spark.sinks.delta import (
        enable_row_tracking,
        read_delta_with_row_ids,
    )

    t = os.path.join(str(tmpdir), "t")
    write_delta(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
            "g string, id long, v long",
        ),
        t,
    )
    enable_row_tracking(t)
    pre = {
        (r["g"], r["id"]): r["_row_id"]
        for r in read_delta_with_row_ids(spark, t).collect()
    }
    batch = spark.createDataFrame(
        [("a", 1, 99), ("c", 1, 50)], "g string, id long, v long"
    )
    res = merge_delta(spark, t, batch, ["g", "id"])
    assert res["updated"] == 1 and res["inserted"] == 1
    rows = {
        (r["g"], r["id"]): (r["_row_id"], r["v"])
        for r in read_delta_with_row_ids(spark, t).collect()
    }
    assert rows[("a", 1)] == (pre[("a", 1)], 99)  # matched: id kept
    assert rows[("b", 1)][0] == pre[("b", 1)]     # untouched tuple stable
    assert len({rid for rid, _ in rows.values()}) == 4  # all unique


def test_merge_iceberg_composite_key_row_lineage(spark, tmpdir):
    """The Iceberg twin: composite-key merge on a row-lineage table keeps
    matched tuples' stable row ids and mints fresh ranges for inserts."""
    from lakehouse_loader_spark.sinks.iceberg import (
        enable_row_lineage_iceberg,
        read_iceberg_with_row_ids,
    )

    t = os.path.join(str(tmpdir), "t")
    write_iceberg(
        spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
            "g string, id long, v long",
        ),
        t,
    )
    enable_row_lineage_iceberg(t)
    pre = {
        (r["g"], r["id"]): r["_row_id"]
        for r in read_iceberg_with_row_ids(spark, t).collect()
    }
    batch = spark.createDataFrame(
        [("a", 1, 99), ("c", 1, 50)], "g string, id long, v long"
    )
    res = merge_iceberg(spark, t, batch, ["g", "id"])
    assert res["updated"] == 1 and res["inserted"] == 1
    rows = {
        (r["g"], r["id"]): (r["_row_id"], r["v"])
        for r in read_iceberg_with_row_ids(spark, t).collect()
    }
    assert rows[("a", 1)] == (pre[("a", 1)], 99)
    assert rows[("b", 1)][0] == pre[("b", 1)]
    assert len({rid for rid, _ in rows.values()}) == 4


def test_mirror_schema_evolution_iceberg_source(spark, tmpdir):
    """Evolution with an ICEBERG source (the other feed reader): the
    source gains a column via an evolved append; the keyed mirror into a
    Delta destination refuses by default and evolves on request."""
    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_iceberg(
        spark.createDataFrame([(i, i * 10) for i in range(5)], "id long, v long"),
        src,
    )
    mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt="delta")
    write_iceberg(
        spark.createDataFrame([(10, 100, 7)], "id long, v long, extra long"),
        src, append=True, evolve_schema=True,
    )
    with pytest.raises(ValueError, match="extra.*evolve"):
        mirror_table(spark, src, dst, ck, key_cols=["id"], dst_fmt="delta")
    res = mirror_table(
        spark, src, dst, ck, key_cols=["id"], dst_fmt="delta",
        on_schema_change="evolve",
    )
    assert res["rows"] == 1
    got = {r["id"]: r["extra"] for r in read_delta(spark, dst).collect()}
    assert got[10] == 7 and all(got[i] is None for i in range(5))


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_retyped_column_refuses(spark, tmpdir, fmt):
    """Same column NAME, different TYPE must refuse up front: an
    insert-only merge would otherwise write data files whose physical
    type conflicts with the table schema — failing only when a reader
    hits the new file."""
    t = os.path.join(str(tmpdir), "t")
    write = write_delta if fmt == "delta" else write_iceberg
    merge = merge_delta if fmt == "delta" else merge_iceberg
    write(spark.createDataFrame([(1, 10)], "id long, v long"), t)
    # insert-only source (key 99 unmatched) with v retyped to string
    bad = spark.createDataFrame([(99, "ten")], "id long, v string")
    with pytest.raises(ValueError, match="never retype columns"):
        merge(spark, t, bad, "id")


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_widens_int_source_losslessly(spark, tmpdir, fmt):
    """A source column narrower than the table's (int vs bigint) widens
    implicitly — the lossless direction stays ergonomic while retypes
    refuse (see test_merge_retyped_column_refuses)."""
    t = os.path.join(str(tmpdir), "t")
    write = write_delta if fmt == "delta" else write_iceberg
    read = read_delta if fmt == "delta" else read_iceberg
    merge = merge_delta if fmt == "delta" else merge_iceberg
    write(spark.createDataFrame([(1, 10)], "id long, v long"), t)
    res = merge(
        spark, t, spark.createDataFrame([(1, 11), (2, 22)], "id int, v int"), "id"
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    assert {r["id"]: r["v"] for r in read(spark, t).collect()} == {1: 11, 2: 22}


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_cli_merge_composite_key(spark, tmpdir, fmt):
    """The merge CLI end-to-end as a separate OS process: composite key
    (with sloppy whitespace), tombstone column, result counts printed."""
    import subprocess
    import sys as _sys

    t = os.path.join(str(tmpdir), "t")
    srcp = os.path.join(str(tmpdir), "src.parquet")
    write = write_delta if fmt == "delta" else write_iceberg
    read = read_delta if fmt == "delta" else read_iceberg
    write(spark.createDataFrame([("a", 1, 10), ("b", 1, 30)],
                                "g string, id long, v long"), t)
    spark.createDataFrame(
        [("a", 1, 99, False), ("b", 1, None, True), ("c", 2, 50, False)],
        "g string, id long, v long, dead boolean",
    ).write.parquet(srcp)
    r = subprocess.run(
        [_sys.executable, "-m", "lakehouse_loader_spark.cli",
         f"merge-{fmt}", t, "--source", srcp, "--key", "g, id",
         "--delete-col", "dead"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-400:]
    assert "1 updated, 1 inserted, 1 deleted" in r.stderr
    got = {(x["g"], x["id"]): x["v"] for x in read(spark, t).collect()}
    assert got == {("a", 1): 99, ("c", 2): 50}


def test_mirror_composite_key_with_evolution_one_stream(spark, tmpdir):
    """Interaction: a composite-key mirror stream that ALSO evolves —
    the evolved column must flow through the keyed merge on the full key
    tuple in the same checkpointed stream."""
    from lakehouse_loader_spark.sinks.delta import add_column

    src = os.path.join(str(tmpdir), "src")
    dst = os.path.join(str(tmpdir), "dst")
    ck = os.path.join(str(tmpdir), "ck")
    write_delta(
        spark.createDataFrame(
            [("a", 1, 10), ("b", 1, 30)], "g string, id long, v long"
        ),
        src,
    )
    mirror_table(spark, src, dst, ck, key_cols=["g", "id"], dst_fmt="iceberg")
    add_column(src, "extra", "long")
    write_delta(
        spark.createDataFrame([("c", 1, 50, 7)],
                              "g string, id long, v long, extra long"),
        src, append=True,
    )
    delete_from_delta(spark, src, "g = 'b' AND id = 1")
    res = mirror_table(
        spark, src, dst, ck, key_cols=["g", "id"], dst_fmt="iceberg",
        on_schema_change="evolve",
    )
    assert res["rows"] == 2  # one insert + one tombstone
    got = {(r["g"], r["id"]): (r["v"], r["extra"])
           for r in read_iceberg(spark, dst).collect()}
    assert got == {("a", 1): (10, None), ("c", 1): (50, 7)}
