"""Benchmark harness: run the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end including the action (count-style
materialization of every result row) but excluding session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spark = get_spark("lakehouse-bench")

    # Warm the JVM + parquet footers once with the flagship query so
    # per-query timings measure the plan, not session warmup.
    REGISTRY["tpch_q1_like"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # Materialize every output row on the executors without
        # collecting results to the driver.
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "declared_queries_total_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
