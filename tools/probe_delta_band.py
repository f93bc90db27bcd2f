"""A/B: delta loader throughput with and without the 122,880-row-group
cap (reference physical-layout parity, delta_destination.rs:43) at sf0.1 —
attributing the r11 601k->548k delta_rows_per_sec band (verdict item #4).
Runs N alternating trials of write_delta on lineitem and prints medians.
Scratch tool."""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.sinks import delta as delta_mod  # noqa: E402
from lakehouse_loader_spark.sinks.delta import write_delta  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("TRIALS", "5"))


def main():
    spark = get_spark("probe-delta-band")
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    n = li.count()
    # warm: one throwaway write
    tmp0 = tempfile.mkdtemp(prefix="warm_")
    write_delta(li, os.path.join(tmp0, "t"))
    shutil.rmtree(tmp0)

    results = {"capped": [], "uncapped": []}
    orig = delta_mod.__dict__  # cap lives in session.MAX_ROW_GROUP_SIZE import
    import lakehouse_loader_spark.session as sess

    for trial in range(TRIALS):
        for mode in ("capped", "uncapped"):
            sess_val = 122_880 if mode == "capped" else 2**31 - 1
            sess.MAX_ROW_GROUP_SIZE = sess_val
            tmp = tempfile.mkdtemp(prefix=f"ab_{mode}_")
            t0 = time.perf_counter()
            write_delta(li, os.path.join(tmp, "t"))
            dt = time.perf_counter() - t0
            results[mode].append(dt)
            shutil.rmtree(tmp)
            print(f"trial {trial} {mode}: {dt:.3f}s ({n/dt:,.0f} rows/s)", flush=True)
    sess.MAX_ROW_GROUP_SIZE = 122_880
    for mode, runs in results.items():
        med = statistics.median(runs)
        print(
            f"== {mode}: median {med:.3f}s ({n/med:,.0f} rows/s),"
            f" min {min(runs):.3f}s ({n/min(runs):,.0f} rows/s)"
        )


if __name__ == "__main__":
    main()
