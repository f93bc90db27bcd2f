"""A/B the media decode consumer over the two staged-payload layouts
(r16 regression hunt: full-sweep jpeg wall 0.95s with coalesce-staged
payloads vs 2.13s with repartition-staged — same rows, same consumer).

Builds BOTH artifacts once, then times the identical consumer plan over
each, interleaved, min/med of N.  Run:
    python tools/probe_media_staging_layout.py [n_reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.operators import multimodal as M
    from lakehouse_loader_spark.catalog import load_table

    spark = get_spark("probe-media-layout")
    docs = load_table(spark, SF_DIR, "documents")
    synth = M.synthesize_media_jpeg(docs)

    paths = {}
    for mode in ("coalesce", "repartition"):
        p = f"/tmp/probe_media_{mode}"
        shaped = synth.coalesce(8) if mode == "coalesce" else synth.repartition(8)
        shaped.write.mode("overwrite").parquet(p)
        paths[mode] = p
        import glob
        import os

        files = sorted(glob.glob(p + "/*.parquet"))
        sizes = [os.path.getsize(f) for f in files]
        print(f"{mode}: {len(files)} files, sizes={sizes}")

    def consume(path: str) -> float:
        scan = spark.read.parquet(path).repartition(
            spark.sparkContext.defaultParallelism
        )
        decoded = M.decode_media_features(scan)
        t0 = time.perf_counter()
        decoded.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both
    for mode, p in paths.items():
        consume(p)
    results: dict[str, list[float]] = {m: [] for m in paths}
    for _ in range(n_reps):
        for mode, p in paths.items():
            spark.sparkContext.setJobDescription(f"decode over {mode}")
            results[mode].append(consume(p))
    for mode, ts in results.items():
        ts = sorted(ts)
        print(
            f"{mode}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
