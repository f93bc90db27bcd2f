"""Probe: dedup_ngram_jaccard staged-prefix parallelism variants (r15).

The staged rarity/shingle scans pack into 1-2 splits (openCostInBytes),
so the whole PPJoin candidate+verify chain runs on 1-2 tasks behind
broadcast joins.  Times the shipped query vs spread variants, same box,
interleaved runs.  Usage: python tools/probe_ngram_spread.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.operators import dedup as D
    from lakehouse_loader_spark.operators import spread
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded
    from lakehouse_loader_spark.queries.staging import (
        staged_doc_shingles,
        staged_rarity_ranked,
    )

    _ensure_loaded()
    spark = get_spark("probe-ngram-spread")
    load = spark.read.parquet

    docs = load(os.path.join(sf_dir, "documents.parquet"))

    def current():
        return D.ngram_jaccard_pairs(
            docs,
            threshold=0.5,
            shingled=staged_doc_shingles(spark, sf_dir),
            ranked=staged_rarity_ranked(spark, sf_dir),
        )

    def spread_ranked():
        return D.ngram_jaccard_pairs(
            docs,
            threshold=0.5,
            shingled=staged_doc_shingles(spark, sf_dir),
            ranked=spread(staged_rarity_ranked(spark, sf_dir)),
        )

    def spread_both():
        return D.ngram_jaccard_pairs(
            docs,
            threshold=0.5,
            shingled=spread(staged_doc_shingles(spark, sf_dir)),
            ranked=spread(staged_rarity_ranked(spark, sf_dir)),
        )

    def inline():  # pre-a0f3195 shape: rarity rebuilt per call
        return D.ngram_jaccard_pairs(
            docs, threshold=0.5, shingled=staged_doc_shingles(spark, sf_dir)
        )

    variants = {
        "current": current,
        "spread_ranked": spread_ranked,
        "spread_both": spread_both,
        "inline": inline,
    }
    # warm: build staged artifacts + codegen
    for name, fn in variants.items():
        n = fn().count()
        print(f"# warm {name}: {n} rows", file=sys.stderr)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} runs={ts}")

    # equality check: spread must not change results
    base = {tuple(r) for r in current().collect()}
    for name in ("spread_ranked", "spread_both"):
        got = {tuple(r) for r in variants[name]().collect()}
        assert got == base, f"{name} changed results!"
    print("results identical across variants")
    spark.stop()


if __name__ == "__main__":
    main()
