"""MERGE/upsert scale probe (VERDICT r8 item 2): source key set scaled
25x ACROSS the broadcast gate on both formats, measuring (a) the key-frame
broadcast hint disappears above DV_BROADCAST_MAX / DELETE_BROADCAST_MAX
(counted by intercepting F.broadcast during the merge — the gate simply
skips the call), (b) no BroadcastNestedLoopJoin ever appears in the data
plans, and (c) merge wall grows SUBLINEARLY in the source size (25x keys
must cost well under 25x wall — the work is dominated by the candidate
scan, not the key frame).  Run: python tools/probe_merge_scale.py"""

import json
import os
import shutil
import tempfile
import time

import pyspark.sql.functions as _pf
from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.sinks import delta as D
from lakehouse_loader_spark.sinks import iceberg as IC

N = 10_000_000  # base rows; 1x source = 400k keys, 25x = 10M (> 4M gate)


class BroadcastSpy:
    def __init__(self):
        self.real = _pf.broadcast
        self.calls = 0
        self.plans = []

    def __enter__(self):
        def counting(df):
            self.calls += 1
            return self.real(df)

        _pf.broadcast = counting
        return self

    def __exit__(self, *exc):
        _pf.broadcast = self.real


def source(spark, n_keys):
    # half updates (even ids inside the table), half inserts (beyond N)
    half = n_keys // 2
    return spark.range(0, n_keys).select(
        F.when(F.col("id") < half, F.col("id") * 2)
        .otherwise(N + F.col("id"))
        .alias("id"),
        (F.col("id") % 997).alias("k"),
        (F.col("id") * 3).alias("v"),
    )


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
    for fmt, mode in (
        ("delta", "copy-on-write"),
        ("delta", "merge-on-read"),
        ("iceberg", "copy-on-write"),
    ):
        for label, n_keys in (("1x", 400_000), ("25x", 10_000_000)):
            d = tempfile.mkdtemp()
            t = os.path.join(d, "t")
            if fmt == "delta":
                D.write_delta(base.repartition(8), t)
            else:
                IC.write_iceberg(base.repartition(8), t)
            src = source(spark, n_keys)
            with BroadcastSpy() as spy:
                t0 = time.time()
                if fmt == "delta":
                    res = D.merge_delta(spark, t, src, key="id", mode=mode)
                    total = D.read_delta(spark, t).count()
                else:
                    res = IC.merge_iceberg(spark, t, src, key="id")
                    total = IC.read_iceberg(spark, t).count()
                wall = time.time() - t0
            assert res["updated"] == n_keys // 2, res
            assert res["inserted"] == n_keys - n_keys // 2, res
            assert total == N + res["inserted"], (total, res)
            results.append(
                {
                    "format": fmt,
                    "mode": mode,
                    "label": label,
                    "source_keys": n_keys,
                    "broadcast_calls": spy.calls,
                    "merge_wall_s": round(wall, 2),
                    "rows_after": total,
                }
            )
            print(json.dumps(results[-1]))
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
