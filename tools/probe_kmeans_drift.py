"""Idle A/B probe for the embedding_kmeans_clusters drift (VERDICT r15
item 4): the driver read 1.31s at r14 and ~1.8-1.9s in every r15
measurement including idle, and the drift predates the r15 optimization
half.  This probe times the query end-to-end AND phase-by-phase against
an arbitrary checkout, so interleaving it across two worktrees (HEAD vs
fb09df0, the r14 verdict commit) attributes the drift to a phase:

  train    = train_ivf_centroids_sampled (TakeOrdered collect + local Lloyd)
  assign   = kmeans_assign + join + materialize_shared scratch write
  consume  = the declared query's final pass over the scratch artifact
             (inertia agg + SQL SSE + crossJoin + count)
  full     = the registry function, timed exactly like bench.py

Usage: python tools/probe_kmeans_drift.py <repo_root> [n_reps]
Prints one JSON line per rep plus a min-summary; run it alternately
against two checkouts at idle and compare mins.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded
    from lakehouse_loader_spark import operators as O
    from lakehouse_loader_spark.operators import similarity as S
    from lakehouse_loader_spark.queries.extensions import load_table

    _ensure_loaded()
    spark = get_spark("probe-kmeans-drift")
    spec = REGISTRY["embedding_kmeans_clusters"]

    # warmup: codegen + python workers (same role as bench.py's warm sweep)
    spec.fn(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    results: dict[str, list[float]] = {"full": [], "train": [], "assign": []}
    for rep in range(N):
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).count()
        full = time.perf_counter() - t0
        spark.catalog.clearCache()

        emb = load_table(spark, SF_DIR, "embeddings")
        t0 = time.perf_counter()
        cents = S.train_ivf_centroids_sampled(emb, n_centroids=8, n_iters=5)
        train = time.perf_counter() - t0
        t0 = time.perf_counter()
        assigned = S.kmeans_assign(emb, cents)
        from pyspark.sql import functions as F

        per = O.materialize_shared(
            assigned.join(emb.select("vec_id", "embedding"), "vec_id").select(
                "vec_id", (F.col("dist") * F.col("dist")).alias("dsq")
            ),
            "probe-kmeans",
        )
        per.count()
        assign = time.perf_counter() - t0
        spark.catalog.clearCache()
        results["full"].append(round(full, 3))
        results["train"].append(round(train, 3))
        results["assign"].append(round(assign, 3))
        print(
            json.dumps(
                {"rep": rep, "full": round(full, 3), "train": round(train, 3), "assign": round(assign, 3)}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "repo": REPO,
                "mins": {k: min(v) for k, v in results.items()},
                "all": results,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
