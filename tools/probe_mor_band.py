"""A/B: iceberg merged-read (MOR) throughput decomposition at sf0.1 —
attributing the r12 `iceberg_mor_read_rps` 352k official vs its 406-489k
historical band (verdict item #3, "what's wrong" #3).

Builds the EXACT bench table state (equality-delete 1000 orderkeys +
position-delete l_quantity<2 + 50k append) once, then times N trials of:
  A. plain scan of the same files, no delete application (ceiling)
  B. scan + position-delete anti-join only
  C. full merged read (pos + equality deletes)      == bench metric
Also stamps 1-min loadavg per trial so a loaded-host band is visible in
the raw output.  Scratch tool."""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from lakehouse_loader_spark import get_spark  # noqa: E402
from lakehouse_loader_spark.sinks import iceberg as ice  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("TRIALS", "5"))


def main():
    spark = get_spark("probe-mor-band")
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    tmp = tempfile.mkdtemp(prefix="mor_band_")
    path = os.path.join(tmp, "t")
    try:
        ice.write_iceberg(li, path)
        keys = li.select("l_orderkey").distinct().limit(1000)
        ice.equality_delete_iceberg(spark, path, keys)
        ice.delete_from_iceberg(
            spark, path, "l_quantity < 2", strategy="merge-on-read"
        )
        ice.write_iceberg(li.limit(50_000), path, append=True)

        _, meta = ice._read_metadata(path)
        from lakehouse_loader_spark.sinks.iceberg import (
            _apply_pos_deletes,
            _extended_read_schema,
            _resolve_historical,
            _split_live_entries,
            _with_row_positions,
            iceberg_to_schema,
        )

        schema = iceberg_to_schema(meta["schemas"][meta["current-schema-id"]])
        data_entries, delete_entries, partitioned = _split_live_entries(
            path, meta, None
        )
        files = [ice._abs_file(path, d["file_path"]) for d in data_entries]
        read_schema = _extended_read_schema(meta, schema)

        def plain():
            return spark.read.schema(read_schema).parquet(*files).count()

        def pos_only():
            scan = _with_row_positions(
                spark.read.schema(read_schema), files, read_schema
            )
            scan = _resolve_historical(scan, meta, schema)
            return _apply_pos_deletes(spark, scan, path, delete_entries).count()

        def full():
            return ice.read_iceberg(spark, path).count()

        n_full = full()  # warm all three plan shapes + footers
        pos_only()
        plain()
        print(f"merged rows: {n_full}", flush=True)

        results = {"plain": [], "pos_only": [], "full": []}
        for trial in range(TRIALS):
            for mode, fn in (("plain", plain), ("pos_only", pos_only), ("full", full)):
                t0 = time.perf_counter()
                n = fn()
                dt = time.perf_counter() - t0
                results[mode].append(dt)
                print(
                    f"trial {trial} {mode}: {dt:.3f}s ({n/dt:,.0f} rows/s) "
                    f"load={os.getloadavg()[0]:.1f}",
                    flush=True,
                )
        for mode, runs in results.items():
            med = statistics.median(runs)
            print(
                f"== {mode}: median {med:.3f}s ({n_full/med:,.0f} rows/s),"
                f" min {min(runs):.3f}s ({n_full/min(runs):,.0f} rows/s)"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
