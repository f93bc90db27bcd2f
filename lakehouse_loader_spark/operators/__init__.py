"""Scale-out extension operators (SURVEY.md §2c) — dedup, similarity search,
text analysis, multimodal columns, as-of join.

Design rule for every operator here: express the computation as
joins/aggregations/windows over partitioned data — never a driver-side
collect — so the same code runs at 100 TB on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrives in too
    few partitions (e.g. one small parquet file ⇒ one task ⇒ one core).

    CPU-heavy per-row operators (shingling, signatures, decode) call this
    first: the repartition shuffle costs O(data) but unlocks N-way
    parallelism.  At 100 TB inputs already have thousands of partitions and
    this is a no-op."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
