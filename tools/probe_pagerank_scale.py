"""PageRank scale probe: edge set scaled 1x -> 5x -> 25x, measuring wall
growth per power-iteration superstep.  The operator's claim (operators/
graph.py) is linear work in |edges| per iteration — each superstep is one
shuffle join on src + one keyed aggregate on dst, nothing global — so wall
should grow sublinearly-to-linearly in edges at fixed parallelism, and the
plan must stay cartesian-free at every scale.
Run: python tools/probe_pagerank_scale.py"""

import json
import time

from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.operators.graph import pagerank

BASE_EDGES = 400_000  # 1x ~ the sf0.1 trade graph's edge count magnitude


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
    results = []
    for mult in (1, 5, 25):
        n_edges = BASE_EDGES * mult
        n_nodes = n_edges // 10  # keep mean degree fixed at ~10 (web-like)
        # deterministic synthetic graph, undirected so no sinks
        e = spark.range(0, n_edges).select(
            F.concat(F.lit("n"), (F.xxhash64("id") % n_nodes).cast("string")).alias("src"),
            F.concat(F.lit("n"), (F.xxhash64(F.col("id") + 1) % n_nodes).cast("string")).alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        e = e.repartition(32).localCheckpoint()  # pay generation once, probe the operator
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = pagerank(e, iterations=8)
            n = out.count()
            walls.append(time.time() - t0)
        plan = pagerank(e, iterations=8)._jdf.queryExecution().executedPlan().toString()
        results.append(
            {
                "mult": mult,
                "edges": n_edges * 2,
                "nodes_ranked": n,
                "wall_best_s": round(min(walls), 3),
                "cartesian_free": "CartesianProduct" not in plan
                and "BroadcastNestedLoopJoin" not in plan,
            }
        )
        print(json.dumps(results[-1]))
    r1, r25 = results[0], results[-1]
    print(
        json.dumps(
            {
                "edge_growth": r25["edges"] / r1["edges"],
                "wall_growth": round(r25["wall_best_s"] / r1["wall_best_s"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
