"""Probe: shuffled-hash-join vs sort-merge on the TPC-H-shaped family (r15).

Guide §3.1: `spark.sql.join.preferSortMergeJoin=false` lets the planner
pick SHJ when its size conditions hold (no sort on either side);
`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold` additionally
lets AQE rewrite SMJ->SHJ at runtime per partition size.  Times each
variant over the whole tpch_* family in ONE session (runtime-settable
confs), interleaved A/B/A/B so host drift hits both sides equally.

Usage: python tools/probe_shj_tpch.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spark = get_spark("probe-shj")
    names = sorted(n for n in REGISTRY if n.startswith("tpch_"))

    CONFS = {
        "smj (shipped)": {
            "spark.sql.join.preferSortMergeJoin": "true",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
        },
        "shj": {
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
        },
    }

    def run_family() -> float:
        t0 = time.perf_counter()
        for n in names:
            REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        return round(time.perf_counter() - t0, 3)

    # warm both variants (codegen differs per join strategy)
    for label, confs in CONFS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        run_family()

    totals: dict[str, list[float]] = {k: [] for k in CONFS}
    for _ in range(reps):
        for label, confs in CONFS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            totals[label].append(run_family())
    for label, ts in totals.items():
        print(f"{label}: min={min(ts)} runs={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
