"""Dump per-micro-batch durationMs breakdowns for one availableNow run of
the windowed aggregation at sf0.1 — where does the wall time actually go?
Scratch tool."""
from __future__ import annotations

import json
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402
from lakehouse_loader_spark.queries.extensions import _staged_event_files  # noqa: E402
from lakehouse_loader_spark.streaming.events import (  # noqa: E402
    read_event_stream,
    windowed_event_agg,
)

SF = "/root/testdata/sf0.1"


def run_once(spark, label, files_per_trigger=2, parts=None):
    staged = _staged_event_files(spark, SF, "dedup", lambda ev: ev.repartition(4))
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    if parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    sink = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        windowed_event_agg(read_event_stream(spark, staged, files_per_trigger))
        .writeStream.trigger(availableNow=True)
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    q.awaitTermination(300)
    wall = time.perf_counter() - t0
    spark.conf.set("spark.sql.shuffle.partitions", prior)
    n = spark.table(sink).count()
    print(f"\n== {label}: wall {wall:.2f}s rows {n}")
    for p in q.recentProgress:
        d = p["durationMs"]
        print(
            f"  batch {p['batchId']}: rows {p['numInputRows']:6d} total"
            f" {sum(d.values()):6d}ms {json.dumps(d)}"
        )
        for so in p.get("stateOperators", []):
            keep = {k: so[k] for k in (
                "operatorName", "commitTimeMs", "numShufflePartitions",
                "numStateStoreInstances") if k in so}
            print(f"    state: {keep}")
    return wall


def main():
    _ensure_loaded()
    spark = get_spark("probe-batches")
    run_once(spark, "warm", 2)  # warm codegen
    run_once(spark, "fpt2-parts32", 2)
    run_once(spark, "fpt2-parts8", 2, parts=8)
    run_once(spark, "fpt4-parts8(one batch)", 4, parts=8)
    run_once(spark, "fpt2-parts2", 2, parts=2)


if __name__ == "__main__":
    main()
