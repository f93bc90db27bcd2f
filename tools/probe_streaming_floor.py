"""Probe: where does the fixed cost of a bounded (availableNow) streaming
query go?  Runs streaming_window_parity-shaped work at sf0.1 under varied
confs and prints per-batch durationMs breakdowns from the StreamingQuery
progress, plus wall time per variant.  Scratch tool — not part of the suite.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402

SF = "/root/testdata/sf0.1"
STREAMING = [
    "streaming_window_parity",
    "streaming_dedup_parity",
    "streaming_session_parity",
    "streaming_stateful_parity",
    "streaming_join_parity",
    "streaming_stateful_v2_parity",
    "streaming_upsert_parity",
]


def run_all(spark, label):
    total = 0.0
    per = {}
    for name in STREAMING:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per[name] = round(best, 2)
        total += best
    print(f"== {label}: total {total:.2f}s {json.dumps(per)}", flush=True)
    return total


def main():
    _ensure_loaded()
    spark = get_spark("probe-streaming")
    # warm: run each once at sf0.001 for codegen/python-worker warmup
    for name in STREAMING:
        try:
            REGISTRY[name].fn(spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            print("warm fail", name, e)

    run_all(spark, "baseline")

    # variant: maintenance off + minBatchesToRetain=1
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    run_all(spark, "retain1+noMaint")

    # variant: plus async progress/log cleanup tweaks
    spark.conf.set("spark.sql.streaming.metricsEnabled", "false")
    run_all(spark, "plus-noMetrics")


if __name__ == "__main__":
    main()
