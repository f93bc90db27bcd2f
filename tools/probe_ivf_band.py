"""A/B: similarity_ivf_topk band attribution at sf0.1 — the r14 verdict's
one weak mark (official 6.07s warm vs r13 2.54s / r8-steady 2.10s, with no
committed idle twin).

Times N trials of the FULL registered query (staged index pre-built, so
trial times are the warm steady state the band describes) and decomposes
one trial into its three stages:
  A. staged_ivf_index hit (cache read only)
  B. ivf_ann_topk probing + exact ranking
  C. brute_force_topk recall baseline + recall frame   == rest of query
Stamps 1-min loadavg per trial so a loaded-host band is visible in the raw
output.  Scratch tool (probe_mor_band.py shape)."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("TRIALS", "5"))


def main():
    spark = get_spark("probe-ivf-band")
    spark.sparkContext.setLogLevel("ERROR")
    from lakehouse_loader_spark.queries.extensions import similarity_ivf_topk

    # first run: index build + JIT warmup (NOT the band number)
    t0 = time.monotonic()
    similarity_ivf_topk(spark, SF).collect()
    first = time.monotonic() - t0
    print(f"first(build+warm) {first:.2f}s load={os.getloadavg()[0]:.1f}")

    times = []
    for i in range(TRIALS):
        t0 = time.monotonic()
        n = len(similarity_ivf_topk(spark, SF).collect())
        dt = time.monotonic() - t0
        times.append(dt)
        print(f"trial {i} {dt:.2f}s rows={n} load={os.getloadavg()[0]:.1f}")
    print(
        f"warm median {statistics.median(times):.2f}s "
        f"min {min(times):.2f}s max {max(times):.2f}s"
    )

    # decomposition of one warm run
    from pyspark.sql import functions as F

    from lakehouse_loader_spark.catalog import load_table
    from lakehouse_loader_spark.operators import similarity as S
    from lakehouse_loader_spark.queries.extensions import _ann_recall_frame
    from lakehouse_loader_spark.queries.staging import staged_ivf_index

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)

    t0 = time.monotonic()
    inv, cents = staged_ivf_index(spark, SF)
    inv.count()
    t_stage = time.monotonic() - t0

    t0 = time.monotonic()
    ann = S.ivf_ann_topk(emb, q, k=10, indexed=inv, centroids=cents)
    ann.collect()
    t_ann = time.monotonic() - t0

    t0 = time.monotonic()
    brute = S.brute_force_topk(emb, q, k=10)
    _ann_recall_frame(q, brute, ann, k=10, perq_floor=0.2, avg_floor=0.4).collect()
    t_recall = time.monotonic() - t0
    print(
        f"decomp: staged_hit {t_stage:.2f}s ann_search {t_ann:.2f}s "
        f"brute+recall {t_recall:.2f}s load={os.getloadavg()[0]:.1f}"
    )


if __name__ == "__main__":
    main()
