"""Row-id read scale probe (r9): both formats' row-id read surfaces
(`read_delta_with_row_ids` / `read_iceberg_with_row_ids`) with the live
FILE COUNT scaled 25x, measuring (a) the id map stays a broadcast join
(it is one row per file — metadata-sized at any table size), and (b) the
row-id overhead versus the plain read stays a small constant factor (the
map probe + one projected add are map-side; no extra shuffle appears).
Run: python tools/probe_rowid_scale.py"""

import json
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.sinks import delta as D
from lakehouse_loader_spark.sinks import iceberg as IC

N = 4_000_000  # rows per dataset (files scale, row count fixed)


def timed(f):
    t0 = time.time()
    out = f()
    return out, time.time() - t0


def best_of(f, n=3):
    return min(timed(f)[1] for _ in range(n))


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
    results = []
    for fmt in ("delta", "iceberg"):
        for label, files in (("1x", 8), ("25x", 200)):
            base = spark.range(0, N).select(
                "id", (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("v")
            ).repartition(files)
            root = tempfile.mkdtemp(prefix=f"rowid_{fmt}_{label}_")
            t = f"{root}/t"
            if fmt == "delta":
                D.write_delta(base, t)
                D.enable_row_tracking(t)
                plain = lambda: D.read_delta(spark, t).count()  # noqa: E731
                withids = lambda: D.read_delta_with_row_ids(spark, t).count()  # noqa: E731
                pstr = plan(D.read_delta_with_row_ids(spark, t))
            else:
                IC.write_iceberg(base, t)
                IC.enable_row_lineage_iceberg(t)
                plain = lambda: IC.read_iceberg(spark, t).count()  # noqa: E731
                withids = lambda: IC.read_iceberg_with_row_ids(spark, t).count()  # noqa: E731
                pstr = plan(IC.read_iceberg_with_row_ids(spark, t))
            w_plain = best_of(plain)
            w_ids = best_of(withids)
            bcast = "BroadcastHashJoin" in pstr
            shuffles = pstr.count("Exchange") - pstr.count("BroadcastExchange")
            results.append(
                {
                    "fmt": fmt,
                    "scale": label,
                    "files": files,
                    "plain_s": round(w_plain, 3),
                    "with_ids_s": round(w_ids, 3),
                    "overhead": round(w_ids / max(w_plain, 1e-9), 2),
                    "id_map_broadcast": bcast,
                    "non_broadcast_exchanges": shuffles,
                }
            )
            print(json.dumps(results[-1]))
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
