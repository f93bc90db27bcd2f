"""A/B: per-row vs batch-vectorized fixed-dim vector UDFs (r13 verdict
item #2) — the LSH bucketing and IVF assignment passes that build the ANN
indexes over the whole corpus.

Times N trials of the corpus index-build pass at sf0.1 (60k embeddings,
dim 64) under BOTH implementations, inlined here so the probe measures the
same session, same data, same Arrow batching:
  A. per-row `vs.map(one)` matmuls (the pre-r14 shape)
  B. one stacked matmul per Arrow batch (similarity.with_lsh_buckets /
     staging nearest1 after r14)
Stamps 1-min loadavg per trial.  Scratch tool.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.operators.similarity import _hyperplanes  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("TRIALS", "3"))
DIM, N_TABLES, PPT = 64, 8, 4


def main():
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark = get_spark()
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    # the test corpora are tiny (2k vectors at sf0.1) — replicate to get
    # Arrow batches at the size a real corpus scan produces, so the probe
    # measures the per-batch constant factor, not job-launch overhead
    reps = int(os.environ.get("REPS", "100"))
    emb = emb.crossJoin(
        spark.range(reps).select(F.col("id").alias("__rep"))
    ).repartition(32)
    n = emb.count()

    planes = np.array(_hyperplanes(DIM, N_TABLES * PPT), dtype=np.float64).T
    weights = np.tile(1 << np.arange(PPT), N_TABLES)
    table_of = np.repeat(np.arange(N_TABLES), PPT)

    @pandas_udf("array<struct<table_id:int,bucket:int>>")
    def perrow(vs: pd.Series) -> pd.Series:
        def one(v):
            signs = (np.asarray(v, dtype=np.float64) @ planes) > 0
            buckets = np.zeros(N_TABLES, dtype=np.int64)
            np.add.at(buckets, table_of, signs * weights)
            return [{"table_id": int(t), "bucket": int(b)} for t, b in enumerate(buckets)]

        return vs.map(one)

    @pandas_udf("array<struct<table_id:int,bucket:int>>")
    def batched(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack(vs.to_numpy()).astype(np.float64)
        signs = (m @ planes) > 0
        buckets = (signs.reshape(len(vs), N_TABLES, PPT) * (1 << np.arange(PPT))).sum(axis=2)
        return pd.Series(
            [[{"table_id": int(t), "bucket": int(b)} for t, b in enumerate(row)] for row in buckets]
        )

    def run(udf):
        t0 = time.monotonic()
        emb.withColumn("lsh_key", F.explode(udf(F.col("embedding")))).select(
            F.sum(F.col("lsh_key.bucket")).alias("s")
        ).collect()
        return time.monotonic() - t0

    # equality check first: same bucket sums
    sa = emb.withColumn("k", F.explode(perrow(F.col("embedding")))).select(
        F.sum("k.bucket"), F.sum("k.table_id")
    ).collect()[0]
    sb = emb.withColumn("k", F.explode(batched(F.col("embedding")))).select(
        F.sum("k.bucket"), F.sum("k.table_id")
    ).collect()[0]
    print(f"equal: {tuple(sa) == tuple(sb)}  ({tuple(sa)} vs {tuple(sb)})")

    for label, udf in [("A per-row", perrow), ("B batched", batched)]:
        ts = []
        for _ in range(TRIALS):
            load = os.getloadavg()[0]
            t = run(udf)
            ts.append(t)
            print(f"  {label}: {t:.2f}s  (load {load:.1f})")
        print(f"{label}: median {statistics.median(ts):.2f}s over {n} rows")

    # --- IVF assignment (scalar output, the fully-vectorizable case) ---
    cents = np.array(_hyperplanes(DIM, 16), dtype=np.float64)
    cent_mat = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T

    @pandas_udf("int")
    def ivf_perrow(vs: pd.Series) -> pd.Series:
        def one(v):
            x = np.asarray(v, dtype=np.float64)
            return int(np.argmax((x / np.linalg.norm(x)) @ cent_mat))

        return vs.map(one)

    @pandas_udf("int")
    def ivf_batched(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype="int32")
        m = np.stack(vs.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series((m @ cent_mat).argmax(axis=1).astype("int32"))

    def run_ivf(udf):
        t0 = time.monotonic()
        emb.select(F.sum(udf(F.col("embedding"))).alias("s")).collect()
        return time.monotonic() - t0

    ia = emb.select(F.sum(ivf_perrow(F.col("embedding")))).collect()[0][0]
    ib = emb.select(F.sum(ivf_batched(F.col("embedding")))).collect()[0][0]
    print(f"ivf equal: {ia == ib}  ({ia} vs {ib})")
    for label, udf in [("A ivf per-row", ivf_perrow), ("B ivf batched", ivf_batched)]:
        ts = []
        for _ in range(TRIALS):
            load = os.getloadavg()[0]
            t = run_ivf(udf)
            ts.append(t)
            print(f"  {label}: {t:.2f}s  (load {load:.1f})")
        print(f"{label}: median {statistics.median(ts):.2f}s over {n} rows")


if __name__ == "__main__":
    main()
