"""Lineage-rewrite scale probe (r11): the id-preserving DML paths
(`_cow_iceberg` rl branch / `_lineage_rewrite_scan`) with the live FILE
COUNT scaled 25x at fixed row count, measuring that

(a) the rewrite's id map stays ONE BROADCAST ROW PER FILE (the
    `_lineage_rewrite_scan` fmap join never becomes a shuffled join),
(b) only AFFECTED files rewrite — the probe touches one file's keys, so
    rewritten_files stays O(1) while carried files scale 25x, and
(c) the CoW wall grows far sub-linearly in file count (the carried set
    is re-listed from recorded metadata, no footer reopened).

Run: python tools/probe_lineage_rewrite_scale.py
"""

import json
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from lakehouse_loader_spark.sinks import iceberg as IC

N = 2_000_000  # rows per dataset (files scale, row count fixed)


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
    for label, files in (("1x", 8), ("25x", 200)):
        # range-clustered on id so a key-range predicate maps to a bounded
        # file set (the layout any maintained table has after OPTIMIZE)
        base = spark.range(0, N).select(
            "id", (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("v")
        ).repartitionByRange(files, "id")
        root = tempfile.mkdtemp(prefix=f"rlrw_{label}_")
        t = f"{root}/t"
        IC.write_iceberg(base, t)
        IC.enable_row_lineage_iceberg(t)
        _, meta = IC._read_metadata(t)
        n_files = len(IC._split_live_entries(t, meta)[0])

        # the predicate hits ONE file's id range: rewrite cost must track
        # the affected set, not the table
        t0 = time.time()
        res = IC.update_iceberg(spark, t, "id < 5000", {"v": "v + 1"})
        cow_wall = time.time() - t0

        # id audit: every id still unique and the table tiles [0, N)
        out = IC.read_iceberg_with_row_ids(spark, t)
        p = plan(out)
        n_bhj = p.count("BroadcastHashJoin")
        n_smj = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
        t0 = time.time()
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_row_id").alias("d"),
            F.min("_row_id").alias("lo"),
            F.max("_row_id").alias("hi"),
        ).first()
        read_wall = time.time() - t0
        assert agg["n"] == agg["d"] == N and agg["lo"] == 0 and agg["hi"] == N - 1
        results.append(
            {
                "label": label,
                "files": n_files,
                "rewritten_files": res["rewritten_files"],
                "kept_files": res["kept_files"],
                "cow_wall_s": round(cow_wall, 2),
                "ids_read_wall_s": round(read_wall, 2),
                "idmap_broadcast_joins": n_bhj,
                "shuffled_joins_in_read": n_smj,
            }
        )
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results, indent=2))
    a, b = results
    assert b["shuffled_joins_in_read"] == a["shuffled_joins_in_read"] == 0
    assert b["rewritten_files"] <= a["rewritten_files"] + 2  # affected-set bound
    assert b["cow_wall_s"] < a["cow_wall_s"] * 6  # far sub-linear vs 25x files
    print("PROBE OK: id map broadcast at 25x files; rewrite cost tracks the "
          "affected set, carried files re-listed from metadata")


if __name__ == "__main__":
    main()
