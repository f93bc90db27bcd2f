"""Probe: per-query SHUFFLE_HASH hints on the heaviest TPC-H joins
(VERDICT r15 item 7 — the r15 GLOBAL preferSortMergeJoin switch lost its
A/B; the targeted per-join hint and the AQE-threshold-only variant were
never isolated).

Variants, interleaved A/B/C so host drift hits all sides equally:
  a) shipped tpch_q21_like (SMJ where the planner picks it);
  b) q21 with SHUFFLE_HASH hints on the per_order aggregate and orders
     join inputs (forces SHJ for those joins only);
  c) shipped plan + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
     =64MB (AQE rewrites SMJ->SHJ per partition at runtime when the
     post-shuffle partition is small — scale-adaptive: at 100 TB the
     partitions exceed the threshold and the spill-graceful SMJ stays).

Usage: python tools/probe_shj_hint_q21.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def q21_hinted(spark, sf_dir):
    """tpch_q21_like with SHUFFLE_HASH hints on the two shuffle joins —
    same output rows (hints change strategy, never semantics)."""
    from pyspark.sql.window import Window

    from lakehouse_loader_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    per_os = li.groupBy(
        F.col("l_orderkey").alias("po_key"), F.col("l_suppkey").alias("po_supp")
    ).agg(F.max("l_shipdate").alias("s_max"))
    w = Window.partitionBy("po_key").orderBy(F.col("s_max").desc(), F.col("po_supp"))
    ranked = per_os.withColumn("rn", F.row_number().over(w))
    per_order = (
        ranked.groupBy("po_key")
        .agg(
            F.count(F.lit(1)).alias("n_supps"),
            F.max(F.when(F.col("rn") == 1, F.col("s_max"))).alias("m1_max"),
            F.max(F.when(F.col("rn") == 1, F.col("po_supp"))).alias("m1_supp"),
            F.max(F.when(F.col("rn") == 2, F.col("s_max"))).alias("m2_max"),
        )
        .filter(F.col("n_supps") > 1)
    )
    max_other = F.when(
        F.col("l_suppkey") == F.col("m1_supp"), F.col("m2_max")
    ).otherwise(F.col("m1_max"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(per_order.hint("shuffle_hash"), F.col("l_orderkey") == F.col("po_key"))
        .filter(F.col("l_shipdate") >= max_other)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spark = get_spark("probe-shj-hint")
    shipped = REGISTRY["tpch_q21_like"].fn
    thresh_key = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

    def run(fn, thresh="0"):
        spark.conf.set(thresh_key, thresh)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.conf.set(thresh_key, "0")
        return dt

    # result parity first: hinted output must equal shipped output
    a = shipped(spark, sf_dir).collect()
    b = q21_hinted(spark, sf_dir).collect()
    assert a == b, "hinted q21 changed the result!"
    print(f"parity OK ({len(a)} rows)")

    variants = {
        "shipped-smj": lambda: run(shipped),
        "hinted-shj": lambda: run(q21_hinted),
        "aqe-thresh-64m": lambda: run(shipped, "64MB"),
    }
    for v in variants.values():  # warm codegen for each shape
        v()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for k, v in variants.items():
            times[k].append(v())
    for k, ts in times.items():
        print(f"{k}: min={min(ts)} med={sorted(ts)[len(ts)//2]} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
