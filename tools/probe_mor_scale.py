"""MOR-read scale probe (VERDICT r7 item 3): both table formats, delete
set scaled 25x ACROSS the broadcast gate, measuring (a) the plan choice
flips from broadcast-hinted to shuffled anti-join at DELETE_BROADCAST_MAX /
DV_BROADCAST_MAX, and (b) read wall grows sublinearly in the delete-set
size.  Run: python tools/probe_mor_scale.py"""

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.sinks import delta as D
from lakehouse_loader_spark.sinks import iceberg as IC

N = 10_000_000  # base rows; 1x delete = 200k rows, 25x = 5M (> 4M gate)


def hinted(df):
    return "strategy=broadcast" in df._jdf.queryExecution().optimizedPlan().toString()


def timed(f):
    t0 = time.time()
    out = f()
    return out, time.time() - t0


def best_of(f, n=3):
    return min(timed(f)[1] for _ in range(n))


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
    base = spark.range(0, N).select(
        "id", (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("v")
    )
    results = []
    for fmt in ("delta", "iceberg", "iceberg-dv"):
        for label, pred, frac in (("1x", "id % 50 = 0", 0.02), ("25x", "id % 2 = 0", 0.5)):
            d = tempfile.mkdtemp()
            t = os.path.join(d, "t")
            if fmt == "delta":
                D.write_delta(base.repartition(8), t)
                D.delete_from_delta(spark, t, pred, mode="merge-on-read")
                reader = lambda: D.read_delta(spark, t)  # noqa: E731
            elif fmt == "iceberg-dv":
                IC.write_iceberg(base.repartition(8), t)
                IC.delete_from_iceberg(spark, t, pred, strategy="merge-on-read-dv")
                reader = lambda: IC.read_iceberg(spark, t)  # noqa: E731
            else:
                IC.write_iceberg(base.repartition(8), t)
                IC.delete_from_iceberg(spark, t, pred, strategy="merge-on-read")
                reader = lambda: IC.read_iceberg(spark, t)  # noqa: E731
            df = reader()
            n_del = int(N * frac)
            wall = best_of(lambda: reader().count())
            cnt = df.count()
            assert cnt == N - n_del, (cnt, N - n_del)
            results.append(
                {
                    "format": fmt,
                    "deletes": n_del,
                    "label": label,
                    "broadcast_hinted": hinted(df),
                    "read_wall_best3_s": round(wall, 2),
                    "rows_read": cnt,
                }
            )
            print(json.dumps(results[-1]))
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
