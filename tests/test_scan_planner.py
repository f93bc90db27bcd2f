"""Compound-predicate scan planning (sinks/iceberg.py: plan_iceberg_scan /
read_iceberg_scan): hidden-partition pruning through the spec transforms,
manifest-bounds skipping, residual-filter exactness, delete interplay."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import iceberg as IC


def _staged(spark, path, partition_by=None, sort_col=None):
    df = spark.range(0, 1000).select(
        "id",
        (F.col("id") % 10).alias("k"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")).alias("d"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("name-"), F.lpad((F.col("id") % 50).cast("string"), 3, "0")).alias("name"),
    )
    if sort_col:
        df = df.repartitionByRange(8, sort_col).sortWithinPartitions(sort_col)
    IC.write_iceberg(df, path, partition_by=partition_by)
    return df


def _expected(spark, df, predicate_sql, cols):
    return sorted(
        map(tuple, df.filter(predicate_sql).select(*cols).collect())
    )


def test_identity_partition_equality_and_range(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = _staged(spark, path, partition_by=["k"])
    plan = IC.plan_iceberg_scan(path, [("k", "=", 3)])
    assert plan["excluded_by_partition"] >= 1
    got = sorted(map(tuple, IC.read_iceberg_scan(spark, path, [("k", "=", 3)], ["id", "k"]).collect()))
    assert got == _expected(spark, df, "k = 3", ["id", "k"])
    # range through identity
    plan2 = IC.plan_iceberg_scan(path, [("k", ">=", 8)])
    assert plan2["excluded_by_partition"] >= 1
    got2 = sorted(map(tuple, IC.read_iceberg_scan(spark, path, [("k", ">=", 8)], ["id"]).collect()))
    assert got2 == _expected(spark, df, "k >= 8", ["id"])


def test_day_transform_prunes_date_ranges(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = _staged(spark, path, partition_by=["day(d)"])
    preds = [("d", "between", "2024-02-01", "2024-02-10")]
    plan = IC.plan_iceberg_scan(path, preds)
    assert plan["excluded_by_partition"] > 0
    assert len(plan["files"]) < plan["total"]
    got = sorted(map(tuple, IC.read_iceberg_scan(spark, path, preds, ["id", "d"]).collect()))
    assert got == _expected(
        spark, df, "d BETWEEN DATE'2024-02-01' AND DATE'2024-02-10'", ["id", "d"]
    )
    # equality with a datetime.date literal
    got_eq = IC.read_iceberg_scan(spark, path, [("d", "=", dt.date(2024, 1, 5))], ["id"])
    assert sorted(r.id for r in got_eq.collect()) == sorted(
        r.id for r in df.filter("d = DATE'2024-01-05'").select("id").collect()
    )


def test_bucket_transform_prunes_equality_only(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = _staged(spark, path, partition_by=["bucket(8, id)"])
    plan = IC.plan_iceberg_scan(path, [("id", "=", 137)])
    assert plan["excluded_by_partition"] > 0
    got = IC.read_iceberg_scan(spark, path, [("id", "=", 137)], ["id", "k"]).collect()
    assert [tuple(r) for r in got] == [(137, 7)]
    # ranges must NOT prune through bucket (non-monotone) — but stats may;
    # the result stays exact either way
    got2 = sorted(r.id for r in IC.read_iceberg_scan(spark, path, [("id", ">=", 990)], ["id"]).collect())
    assert got2 == list(range(990, 1000))


def test_truncate_transform_string_prefix(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    # names are 'name-NNN' — truncate on a prefix length that actually
    # varies across rows (chars 1-7 include the first digit)
    df = _staged(spark, path, partition_by=["truncate(7, name)"])
    preds = [("name", "=", "name-007")]
    plan = IC.plan_iceberg_scan(path, preds)
    assert plan["excluded_by_partition"] > 0
    got = IC.read_iceberg_scan(spark, path, preds, ["id", "name"]).collect()
    assert got and all(r.name == "name-007" for r in got)
    assert sorted(r.id for r in got) == [
        r[0] for r in _expected(spark, df, "name = 'name-007'", ["id"])
    ]
    # string ranges prune through truncate too (prefix order is monotone)
    plan_r = IC.plan_iceberg_scan(path, [("name", ">=", "name-04")])
    assert plan_r["excluded_by_partition"] > 0
    got_r = sorted(r.id for r in IC.read_iceberg_scan(
        spark, path, [("name", ">=", "name-04")], ["id"]).collect())
    assert got_r == [r[0] for r in _expected(spark, df, "name >= 'name-04'", ["id"])]


def test_stats_pruning_on_sorted_non_partition_column(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = _staged(spark, path, sort_col="id")
    plan = IC.plan_iceberg_scan(path, [("id", "between", 100, 140)])
    assert plan["excluded_by_stats"] > 0
    assert len(plan["files"]) < plan["total"]
    got = sorted(r.id for r in IC.read_iceberg_scan(
        spark, path, [("id", "between", 100, 140)], ["id"]).collect())
    assert got == list(range(100, 141))
    # IN-list pruning
    plan_in = IC.plan_iceberg_scan(path, [("id", "in", [5, 990])])
    assert plan_in["excluded_by_stats"] > 0
    got_in = sorted(r.id for r in IC.read_iceberg_scan(
        spark, path, [("id", "in", [5, 990])], ["id"]).collect())
    assert got_in == [5, 990]


def test_compound_predicates_combine_partition_and_stats(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    df = _staged(spark, path, partition_by=["k"], sort_col="id")
    preds = [("k", "=", 4), ("id", "<", 200), ("v", ">=", 0.0)]
    plan = IC.plan_iceberg_scan(path, preds)
    assert plan["excluded_by_partition"] > 0
    got = sorted(map(tuple, IC.read_iceberg_scan(spark, path, preds, ["id", "k", "v"]).collect()))
    assert got == _expected(spark, df, "k = 4 AND id < 200 AND v >= 0.0", ["id", "k", "v"])


def test_scan_applies_deletes_and_projection(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _staged(spark, path, partition_by=["k"])
    IC.delete_from_iceberg(spark, path, "k = 3 AND id < 500", strategy="merge-on-read")
    got = sorted(r.id for r in IC.read_iceberg_scan(spark, path, [("k", "=", 3)], ["id"]).collect())
    assert got == [i for i in range(500, 1000) if i % 10 == 3]
    # equality deletes also apply
    IC.equality_delete_iceberg(spark, path, spark.createDataFrame([(503,)], "id long"))
    got2 = sorted(r.id for r in IC.read_iceberg_scan(spark, path, [("k", "=", 3)], ["id"]).collect())
    assert got2 == [i for i in range(500, 1000) if i % 10 == 3 and i != 503]


def test_scan_validates_inputs(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _staged(spark, path)
    with pytest.raises(ValueError, match="not a column"):
        IC.plan_iceberg_scan(path, [("nope", "=", 1)])
    with pytest.raises(ValueError, match="unsupported op"):
        IC.plan_iceberg_scan(path, [("id", "!=", 1)])
    with pytest.raises(ValueError, match="between needs"):
        IC.plan_iceberg_scan(path, [("id", "between", 1)])
    with pytest.raises(ValueError, match="not a column"):
        IC.read_iceberg_scan(spark, path, [("id", "=", 1)], ["ghost"])


def test_empty_plan_returns_typed_empty_frame(spark, tmpdir):
    path = os.path.join(tmpdir, "ice")
    _staged(spark, path, partition_by=["k"])
    out = IC.read_iceberg_scan(spark, path, [("k", "=", 99)], ["id", "name"])
    assert out.collect() == []
    assert out.columns == ["id", "name"]


# -- Delta twin --------------------------------------------------------------

from lakehouse_loader_spark.sinks import delta as DL  # noqa: E402


def _staged_delta(spark, path, partition_by=None, sort_col=None):
    df = spark.range(0, 1000).select(
        "id",
        (F.col("id") % 10).alias("k"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")).alias("d"),
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int"))
        ).alias("ts"),
        F.concat(F.lit("n"), (F.col("id") % 50).cast("string")).alias("name"),
    )
    if sort_col:
        df = df.repartitionByRange(8, sort_col).sortWithinPartitions(sort_col)
    DL.write_delta(df, path, partition_by=partition_by)
    return df


def test_delta_partition_and_stats_pruning(spark, tmpdir):
    path = os.path.join(tmpdir, "dl")
    df = _staged_delta(spark, path, partition_by=["k"], sort_col="id")
    preds = [("k", "=", 4), ("id", "<", 200)]
    plan = DL.plan_delta_scan(path, preds)
    assert plan["excluded_by_partition"] > 0
    assert len(plan["files"]) < plan["total"]
    got = sorted(map(tuple, DL.read_delta_scan(spark, path, preds, ["id", "k"]).collect()))
    want = sorted(map(tuple, df.filter("k = 4 AND id < 200").select("id", "k").collect()))
    assert got == want
    # range over the partition column (identity → every op prunes)
    plan_r = DL.plan_delta_scan(path, [("k", ">=", 8)])
    assert plan_r["excluded_by_partition"] > 0


def test_delta_temporal_stats_prune_as_iso_strings(spark, tmpdir):
    path = os.path.join(tmpdir, "dl")
    df = _staged_delta(spark, path, sort_col="d")
    import datetime as dt

    preds = [("d", "between", dt.date(2024, 2, 1), dt.date(2024, 2, 10))]
    plan = DL.plan_delta_scan(path, preds)
    assert plan["excluded_by_stats"] > 0
    got = sorted(r.id for r in DL.read_delta_scan(spark, path, preds, ["id"]).collect())
    want = sorted(
        r.id
        for r in df.filter("d BETWEEN DATE'2024-02-01' AND DATE'2024-02-10'").select("id").collect()
    )
    assert got == want
    # timestamp column with an ISO string literal
    got_ts = sorted(r.id for r in DL.read_delta_scan(
        spark, path, [("ts", ">=", "2024-03-25T00:00:00")], ["id"]).collect())
    want_ts = sorted(r.id for r in df.filter("ts >= TIMESTAMP'2024-03-25 00:00:00'").select("id").collect())
    assert got_ts == want_ts


def test_delta_scan_matches_iceberg_scan_semantics(spark, tmpdir):
    """Format parity: the same predicates over the same rows through both
    planners must return identical results."""
    dpath, ipath = os.path.join(tmpdir, "dl"), os.path.join(tmpdir, "ice")
    df = _staged_delta(spark, dpath, partition_by=["k"], sort_col="id")
    IC.write_iceberg(
        df.repartitionByRange(8, "id").sortWithinPartitions("id"), ipath, partition_by=["k"]
    )
    preds = [("k", "in", [2, 5]), ("id", "between", 300, 700), ("name", ">=", "n3")]
    a = sorted(map(tuple, DL.read_delta_scan(spark, dpath, preds, ["id", "k", "name"]).collect()))
    b = sorted(map(tuple, IC.read_iceberg_scan(spark, ipath, preds, ["id", "k", "name"]).collect()))
    assert a == b
    assert a == sorted(map(tuple, df.filter(
        "k IN (2,5) AND id BETWEEN 300 AND 700 AND name >= 'n3'"
    ).select("id", "k", "name").collect()))


def test_delta_scan_validates_and_empty(spark, tmpdir):
    path = os.path.join(tmpdir, "dl")
    _staged_delta(spark, path, partition_by=["k"])
    with pytest.raises(ValueError, match="not a column"):
        DL.plan_delta_scan(path, [("nope", "=", 1)])
    out = DL.read_delta_scan(spark, path, [("k", "=", 42)], ["id"])
    assert out.collect() == [] and out.columns == ["id"]


def test_cli_scan_subcommands(spark, tmpdir):
    from lakehouse_loader_spark.cli import do_main

    dpath = os.path.join(tmpdir, "dl")
    ipath = os.path.join(tmpdir, "ice")
    df = _staged_delta(spark, dpath, partition_by=["k"], sort_col="id")
    IC.write_iceberg(df, ipath, partition_by=["k"])
    out1 = os.path.join(tmpdir, "out1")
    do_main([
        "scan-delta", dpath, out1,
        "--pred", "k = 4", "--pred", "id between 100 300",
        "--columns", "id,k",
    ])
    got = sorted(r.id for r in spark.read.parquet(out1).collect())
    assert got == [i for i in range(100, 301) if i % 10 == 4]
    out2 = os.path.join(tmpdir, "out2")
    do_main([
        "scan-iceberg", ipath, out2,
        "--pred", "k in 2,5", "--pred", "id <= 50",
    ])
    got2 = sorted(r.id for r in spark.read.parquet(out2).collect())
    assert got2 == [i for i in range(51) if i % 10 in (2, 5)]


# -- Property: planner soundness under random predicates ---------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_COLS = ("id", "k", "v", "name")


def _rand_pred(draw):
    col = draw(st.sampled_from(_COLS))
    if col == "name":
        vals = st.sampled_from([f"n{i}" for i in range(0, 60, 7)])
    elif col == "v":
        vals = st.sampled_from([float(x) for x in range(0, 7)])
    else:
        vals = st.integers(min_value=-5, max_value=1005)
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "between", "in"]))
    if op == "between":
        a, b = draw(vals), draw(vals)
        return (col, "between", min(a, b), max(a, b))
    if op == "in":
        return (col, "in", draw(st.lists(vals, min_size=1, max_size=4)))
    return (col, op, draw(vals))


@st.composite
def _pred_sets(draw):
    out = []
    for _ in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            out.append([_rand_pred(draw) for _ in range(draw(st.integers(1, 3)))])
        else:
            out.append(_rand_pred(draw))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(preds=_pred_sets(), layout=st.sampled_from(
    [None, ["k"], ["bucket(4, id)"], ["truncate(2, name)"]]
))
def test_planner_soundness_random_predicates(spark, planner_tables, preds, layout):
    """SOUNDNESS: for ANY predicate set and ANY partition layout, the
    planned scan must return exactly the rows the full-table filter does —
    pruning may only skip files that provably contain no match."""
    df, tables = planner_tables
    path = tables[str(layout)]
    from lakehouse_loader_spark.sinks.scan_predicates import residual_filter

    want = sorted(r.id for r in df.filter(residual_filter(preds)).select("id").collect())
    got = sorted(r.id for r in IC.read_iceberg_scan(spark, path, preds, ["id"]).collect())
    assert got == want, (preds, layout)


def test_cnf_or_groups_prune_and_match(spark, tmpdir):
    """An OR-group excludes a file only when EVERY disjunct does; results
    stay exact and parity holds across both formats and the CLI."""
    ipath = os.path.join(tmpdir, "ice")
    dpath = os.path.join(tmpdir, "dl")
    df = _staged(spark, ipath, partition_by=["k"], sort_col="id")
    DL.write_delta(
        df.repartitionByRange(8, "id").sortWithinPartitions("id"), dpath, partition_by=["k"]
    )
    preds = [
        [("k", "=", 2), ("k", "=", 7)],          # OR-group over the partition
        [("id", "<", 100), ("id", ">=", 900)],   # OR-group over sorted stats
        ("v", ">=", 0.0),                        # plain atom
    ]
    plan = IC.plan_iceberg_scan(ipath, preds)
    assert plan["excluded_by_partition"] > 0
    want = sorted(
        map(tuple, df.filter(
            "(k = 2 OR k = 7) AND (id < 100 OR id >= 900) AND v >= 0.0"
        ).select("id", "k").collect())
    )
    got_i = sorted(map(tuple, IC.read_iceberg_scan(spark, ipath, preds, ["id", "k"]).collect()))
    got_d = sorted(map(tuple, DL.read_delta_scan(spark, dpath, preds, ["id", "k"]).collect()))
    assert got_i == want and got_d == want
    # a group with one always-true disjunct can never exclude
    loose = [[("k", "=", 2), ("id", ">=", 0)]]
    assert len(IC.plan_iceberg_scan(ipath, loose)["files"]) == IC.plan_iceberg_scan(ipath, loose)["total"]

    # CLI '|' syntax
    from lakehouse_loader_spark.cli import do_main

    out = os.path.join(tmpdir, "out")
    do_main([
        "scan-iceberg", ipath, out,
        "--pred", "k = 2 | k = 7",
        "--pred", "id < 100 | id >= 900",
        "--columns", "id,k",
    ])
    got_cli = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got_cli == want


def test_delta_timestamp_partition_pruning_normalizes_hive_form(spark, tmpdir):
    """Hive dir names store timestamps with a SPACE; the literal domain is
    'T'-separated ISO — without normalization every matching file was
    silently pruned (r6 review finding)."""
    path = os.path.join(tmpdir, "dl")
    df = spark.range(0, 40).select(
        "id",
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 4).cast("int"))
        ).alias("ts"),
    )
    DL.write_delta(df, path, partition_by=["ts"])
    preds = [("ts", "=", "2024-01-02T00:00:00")]
    plan = DL.plan_delta_scan(path, preds)
    assert plan["files"], "matching partition must survive"
    assert plan["excluded_by_partition"] > 0
    got = sorted(r.id for r in DL.read_delta_scan(spark, path, preds, ["id"]).collect())
    assert got == [i for i in range(40) if i % 4 == 1]
    # range over the ts partition prunes too and stays exact
    got_r = sorted(r.id for r in DL.read_delta_scan(
        spark, path, [("ts", ">=", "2024-01-03 00:00:00")], ["id"]).collect())
    assert got_r == [i for i in range(40) if i % 4 >= 2]
    # datetime literal form
    import datetime as _dt

    got_dt = sorted(r.id for r in DL.read_delta_scan(
        spark, path, [("ts", "=", _dt.datetime(2024, 1, 4))], ["id"]).collect())
    assert got_dt == [i for i in range(40) if i % 4 == 3]


def test_delta_date_only_literal_on_timestamp_column(spark, tmpdir):
    """A date-only string against a timestamp column must expand to
    midnight — Spark's residual cast matches midnight rows, so stats
    pruning must not exclude a min=max=midnight file (r6 review)."""
    path = os.path.join(tmpdir, "dl")
    df = spark.range(0, 8).select(
        "id", F.lit("1995-01-01 00:00:00").cast("timestamp").alias("ts")
    )
    DL.write_delta(df.coalesce(1), path)
    got = DL.read_delta_scan(spark, path, [("ts", "=", "1995-01-01")], ["id"]).collect()
    assert len(got) == 8
    plan = DL.plan_delta_scan(path, [("ts", "=", "1995-01-01")])
    assert plan["files"], "midnight-only file must not be stats-pruned"


def test_as_of_timestamp_skips_unpublished_branch_snapshots(spark, tmpdir):
    """AS OF TIMESTAMP must resolve against the MAIN lineage only — a WAP
    branch snapshot is unaudited and must not leak into time travel (r6
    review)."""
    import time as _time

    path = os.path.join(tmpdir, "ice")
    IC.write_iceberg(spark.range(0, 10).coalesce(1), path)
    IC.append_to_branch(spark.range(100, 120).coalesce(1), path, "audit")
    now = int(_time.time() * 1000) + 1000
    assert IC.read_iceberg(spark, path, as_of_timestamp_ms=now).count() == 10
    # after publishing, the rows ARE part of the main lineage
    IC.publish_branch(path, "audit")
    assert IC.read_iceberg(spark, path, as_of_timestamp_ms=int(_time.time() * 1000) + 1000).count() == 30


def test_delta_optimize_where_scopes_the_rewrite(spark, tmpdir):
    """Delta OPTIMIZE WHERE parity: only scoped files rewrite; carried
    files keep their paths; rows unchanged; zorder refused with a scope."""
    path = os.path.join(tmpdir, "dl")
    df = spark.range(0, 300).select("id", (F.col("id") % 3).alias("k"))
    DL.write_delta(df.repartition(3, "k"), path, partition_by=["k"])
    for lo in (1000, 2000):
        DL.write_delta(
            spark.range(lo, lo + 30).select("id", F.lit(1).cast("long").alias("k")).coalesce(1),
            path,
            append=True,
        )
    before = set(DL._read_log(path)[2])
    untouched = {p for p in before if "k=1" not in p}
    DL.optimize_delta(spark, path, where=[("k", "=", 1)])
    after = set(DL._read_log(path)[2])
    assert untouched <= after
    assert not (after & (before - untouched)), "scoped files must be replaced"
    back = DL.read_delta(spark, path)
    assert back.count() == 360 and back.filter("k = 1").count() == 160
    # scoped bin-packing composes; no-match scope is a no-op
    DL.optimize_delta(spark, path, where=[("k", "=", 0)], small_file_threshold=10**9)
    assert DL.read_delta(spark, path).count() == 360
    v_before = DL._read_log(path)[0]
    DL.optimize_delta(spark, path, where=[("k", "=", 99)])
    assert DL._read_log(path)[0] == v_before, "no-op must not commit"
    with pytest.raises(ValueError, match="table-wide clustering"):
        DL.optimize_delta(spark, path, where=[("k", "=", 1)], zorder_by=["id"])


def test_temporal_object_literals_match_string_semantics(spark, tmpdir):
    """datetime.date / datetime.datetime OBJECT literals must prune and
    match exactly like their string forms on BOTH formats and BOTH
    temporal column types (r6 review #2: the object branches skipped the
    granularity normalization and silently pruned matching files)."""
    import datetime as _dt

    ipath = os.path.join(tmpdir, "ice")
    dpath = os.path.join(tmpdir, "dl")
    df = spark.range(0, 40).select(
        "id",
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 4).cast("int")).alias("d"),
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 4).cast("int"))
        ).alias("ts"),
    )
    IC.write_iceberg(df.coalesce(2), ipath, partition_by=["day(ts)"])
    DL.write_delta(df.coalesce(2), dpath, partition_by=["ts"])
    want = [i for i in range(40) if i % 4 == 1]

    for preds in (
        [("ts", "=", _dt.date(2024, 1, 2))],            # date obj on ts col
        [("ts", "=", _dt.datetime(2024, 1, 2))],        # datetime obj
        [("d", "=", _dt.datetime(2024, 1, 2, 0, 0))],   # datetime obj on date col
        [("d", "=", "2024-01-02T00:00:00")],            # datetime str on date col
    ):
        got_i = sorted(r.id for r in IC.read_iceberg_scan(spark, ipath, preds, ["id"]).collect())
        got_d = sorted(r.id for r in DL.read_delta_scan(spark, dpath, preds, ["id"]).collect())
        assert got_i == want, (preds, "iceberg", got_i[:5])
        assert got_d == want, (preds, "delta", got_d[:5])
    # ranges with date objects on a ts column (unpartitioned bounds path:
    # stage a second unpartitioned table so stats do the pruning)
    ipath2 = os.path.join(tmpdir, "ice2")
    IC.write_iceberg(df.repartitionByRange(4, "ts").sortWithinPartitions("ts"), ipath2)
    got_r = sorted(r.id for r in IC.read_iceberg_scan(
        spark, ipath2, [("ts", ">=", _dt.date(2024, 1, 3))], ["id"]).collect())
    assert got_r == [i for i in range(40) if i % 4 >= 2]
