"""PageRank iteration-depth probe (VERDICT r8 item 7): 8 vs 15 vs 24
supersteps at fixed graph size, with and without lineage checkpointing —
per-superstep wall must stay FLAT when checkpoint_every cuts the composed
lineage (graph.py's :20-24 claim, now executed), and the tol early-exit
must stop a converged run short.  Run: python tools/probe_pagerank_iters.py"""

import json
import time

from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.operators.graph import pagerank

N_EDGES = 400_000


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes = N_EDGES // 10
    e = spark.range(0, N_EDGES).select(
        F.concat(F.lit("n"), (F.xxhash64("id") % n_nodes).cast("string")).alias("src"),
        F.concat(F.lit("n"), (F.xxhash64(F.col("id") + 1) % n_nodes).cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(32).localCheckpoint()
    pagerank(e, iterations=2).count()  # warm up JVM + scratch machinery
    results = []
    for iters, ck in (
        (10, None), (10, 5), (30, None), (30, 5), (50, None), (50, 5)
    ):
        t0 = time.time()
        n = pagerank(e, iterations=iters, checkpoint_every=ck).count()
        wall = time.time() - t0
        results.append(
            {
                "iterations": iters,
                "checkpoint_every": ck,
                "nodes": n,
                "wall_s": round(wall, 2),
                "per_superstep_s": round(wall / iters, 3),
            }
        )
        print(json.dumps(results[-1]))
    # tol early-exit: a converged graph stops well before the budget
    t0 = time.time()
    pagerank(e, iterations=500, tol=1e-2, checkpoint_every=5).count()
    results.append({"tol": 1e-2, "budget": 500, "wall_s": round(time.time() - t0, 2)})
    print(json.dumps(results[-1]))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
