"""Delta MERGE source-key broadcast gate.

The MERGE path probes and rewrites candidate files via joins against the
source's key frame.  A streaming upsert's source batch can carry tens of
millions of keys; broadcasting that frame unconditionally is the one place
a correct operation dies at cluster scale.  The gate mirrors the Iceberg
twin's DELETE_BROADCAST_MAX (sinks/iceberg.py): below DV_BROADCAST_MAX the
key frame carries an explicit broadcast hint, above it the joins degrade to
shuffled hash/merge joins (AQE is free to re-broadcast at runtime if the
actual build side turns out small — that is the desired behavior, the gate
only removes the unconditional driver-forced hint).

Plan evidence is captured at the two sinks every merge funnels through:
``_write_parts`` (the rewritten/append frame — COW anti-join and MOR
source append) and ``_dv_mask_commit`` (the MOR masked-positions frame's
left-semi join).  The reference has no DML at all (delta protocol pinned
read-only, src/delta_destination.rs:446-458); this is scale hygiene for
this repo's extension surface.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as D


def _table(spark, path, n=2_000):
    df = spark.range(0, n).select(
        "id", (F.col("id") % 7).alias("grp"), (F.col("id") * 2).alias("val")
    ).repartition(3)
    D.write_delta(df, path)


def _source(spark, n=400):
    # half updates (keys 0..199), half inserts (keys 10_000..)
    return spark.range(0, n).select(
        F.when(F.col("id") < 200, F.col("id"))
        .otherwise(F.col("id") + 10_000)
        .alias("id"),
        F.lit(99).alias("grp"),
        (F.col("id") * 3).alias("val"),
    )


def _capture_plans(monkeypatch):
    """Wrap the two data sinks inside merge_delta to record the optimized
    and executed plan of every DataFrame that flows through them."""
    plans: list[tuple[str, str]] = []

    real_parts = D._write_parts
    real_mask = D._dv_mask_commit

    def rec(df):
        qe = df._jdf.queryExecution()
        plans.append(
            (qe.optimizedPlan().toString(), qe.executedPlan().toString())
        )

    def spy_parts(df, *a, **k):
        rec(df)
        return real_parts(df, *a, **k)

    def spy_mask(spark, path, meta, adds, masked, *a, **k):
        rec(masked)
        return real_mask(spark, path, meta, adds, masked, *a, **k)

    monkeypatch.setattr(D, "_write_parts", spy_parts)
    monkeypatch.setattr(D, "_dv_mask_commit", spy_mask)
    return plans


def _hint_count(plans):
    return sum(opt.count("strategy=broadcast") for opt, _ in plans)


@pytest.mark.parametrize("mode", ["copy-on-write", "merge-on-read"])
def test_merge_key_broadcast_gated(spark, tmpdir, monkeypatch, mode):
    path_under = os.path.join(tmpdir, f"under-{mode}")
    path_over = os.path.join(tmpdir, f"over-{mode}")
    _table(spark, path_under)
    _table(spark, path_over)
    src = _source(spark)

    plans_under = _capture_plans(monkeypatch)
    res_under = D.merge_delta(spark, path_under, src, key="id", mode=mode)
    under_hints = _hint_count(plans_under)
    assert under_hints >= 1, "under-threshold merge must hint the key frame"

    plans_under.clear()
    plans_over = plans_under  # same list object, reused for clarity
    monkeypatch.setattr(D, "DV_BROADCAST_MAX", 0)
    res_over = D.merge_delta(spark, path_over, src, key="id", mode=mode)
    over_hints = _hint_count(plans_over)
    assert over_hints < under_hints, (
        "over-threshold merge must drop the key-frame broadcast hint "
        f"(under={under_hints}, over={over_hints})"
    )
    # the shuffled fallback must stay a hash/merge join on the equi-key,
    # never a nested-loop scan of the candidate files
    for _, phys in plans_over:
        assert "BroadcastNestedLoopJoin" not in phys

    # semantics identical under either plan
    assert res_over["updated"] == res_under["updated"] == 200
    assert res_over["inserted"] == res_under["inserted"] == 200
    got = D.read_delta(spark, path_over)
    assert got.count() == 2_000 + 200  # 2000 original, 200 net inserts
    assert (
        got.filter((F.col("id") < 200) & (F.col("grp") != 99)).count() == 0
    ), "matched rows must carry the source image"


def test_merge_cdf_images_gated(spark, tmpdir, monkeypatch):
    """The CDF pre/post/insert image joins reuse the same gate — with CDF
    enabled and the gate forced shut, the change feed is still exact."""
    path = os.path.join(tmpdir, "cdf")
    df = spark.range(0, 500).select(
        "id", (F.col("id") % 7).alias("grp"), (F.col("id") * 2).alias("val")
    )
    D.write_delta(df, path)
    D.enable_change_data_feed(path)
    monkeypatch.setattr(D, "DV_BROADCAST_MAX", 0)
    src = spark.range(0, 50).select(
        "id", F.lit(99).alias("grp"), (F.col("id") * 3).alias("val")
    )
    v0 = D._read_log(path)[0]
    res = D.merge_delta(spark, path, src, key="id")
    assert res["updated"] == 50 and res["inserted"] == 0
    ch = D.read_delta_changes(spark, path, v0)
    kinds = {r["_change_type"]: r["cnt"] for r in
             ch.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()}
    assert kinds.get("update_preimage") == 50
    assert kinds.get("update_postimage") == 50
