"""Probe: staging/scratch write width — repartition(n_out) (r16) vs
coalesce(n_out) (r15) — VERDICT r15 item 2's "measured no worse at sf0.1"
evidence.  Toggles SPARK_GRAFT_STAGING_WRITE (read per write by
operators._staged_write) and times, interleaved A/B in ONE session:

- embedding_kmeans_clusters (pays a materialize_shared write per call);
- a fresh dedup shingle staging build (session cache cleared per run).

Usage: python tools/probe_staging_width.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded
    from lakehouse_loader_spark.queries import staging as ST

    _ensure_loaded()
    spark = get_spark("probe-staging-width")

    def run_kmeans() -> float:
        t0 = time.perf_counter()
        REGISTRY["embedding_kmeans_clusters"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_shingles() -> float:
        if hasattr(spark, "_lhl_dedup_staging"):
            spark._lhl_dedup_staging.clear()  # force a fresh build
        t0 = time.perf_counter()
        ST.staged_doc_shingles(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    results = {
        "kmeans": {"repartition": [], "coalesce": []},
        "shingles": {"repartition": [], "coalesce": []},
    }
    for mode in ("repartition", "coalesce"):  # warm both codegen shapes
        os.environ["SPARK_GRAFT_STAGING_WRITE"] = mode
        run_kmeans()
        run_shingles()
    for _ in range(reps):
        for mode in ("repartition", "coalesce"):
            os.environ["SPARK_GRAFT_STAGING_WRITE"] = mode
            results["kmeans"][mode].append(run_kmeans())
            results["shingles"][mode].append(run_shingles())
    os.environ.pop("SPARK_GRAFT_STAGING_WRITE", None)
    for probe, modes in results.items():
        for mode, ts in modes.items():
            print(f"{probe:9s} {mode:12s} min={min(ts)} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
