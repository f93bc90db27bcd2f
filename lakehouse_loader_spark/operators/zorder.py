"""Z-order (Morton) clustering key for multi-dimensional data skipping.

A single-column sort (optimize_delta's ``sort_by``) gives tight per-file
min/max stats on ONE column; predicates on any other column still read
every file.  Z-ordering interleaves the bits of several columns' ranks so
that files cover small hyper-rectangles of the key space — per-file stats
stay tight on EVERY clustered column, and prune_files_by_stats skips on
whichever column the query filters (the same reason Delta Lake's OPTIMIZE
ZORDER BY exists; the reference left even single-column pre-write sorting
as a TODO, src/lib.rs:202).

Scale shape: rank boundaries come from approxQuantile — one distributed
pass returning a CONSTANT-size boundary list (≤2^bits-1 doubles per
column) to the driver; bucket assignment + bit interleave are pure JVM
expressions, and the final layout is one repartitionByRange shuffle on the
z-key.  Nothing is proportional to data size on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # 256 quantile buckets per column


def _bucketize(df: DataFrame, col: str, bits: int) -> tuple[DataFrame, str]:
    """Equal-depth bucket index (0..2^bits-1) for ``col`` via approximate
    quantile boundaries + pyspark.ml Bucketizer (JVM-side assignment).
    Nulls land in the top bucket (handleInvalid='keep')."""
    from pyspark.ml.feature import Bucketizer

    tmp = f"__zin_{col}"
    out = f"__zbucket_{col}"
    n_buckets = 1 << bits
    df = df.withColumn(tmp, F.col(col).cast("double"))
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(tmp, probes, 1.0 / (4 * n_buckets))
    # strictly-increasing splits (duplicates collapse for skewed data —
    # fewer distinct buckets, still a valid coarser z-curve)
    inner = sorted(set(bounds))
    splits = [float("-inf"), *inner, float("inf")]
    bucketizer = Bucketizer(
        splits=splits, inputCol=tmp, outputCol=out, handleInvalid="keep"
    )
    bucketed = bucketizer.transform(df).drop(tmp)
    # handleInvalid='keep' assigns nulls the EXTRA index len(splits)-1,
    # which can be 2^bits — its low `bits` bits are all zero, so nulls
    # would alias to bucket 0 in the interleave (clustering with the
    # column MINIMUM and widening low-end file stats).  Clamp into the top
    # real bucket instead: nulls cluster with the largest values.
    top = (1 << bits) - 1
    bucketed = bucketed.withColumn(out, F.least(F.col(out), F.lit(float(top))))
    return bucketed, out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS, key_col: str = "__zorder"
) -> DataFrame:
    """Append the interleaved-bits z-key over ``cols``.

    bit b of column c lands at position b*len(cols)+c — the classic Morton
    interleave, built as a flat JVM shift/or expression (no UDF)."""
    buckets: list[str] = []
    for c in cols:
        df, out = _bucketize(df, c, bits)
        buckets.append(out)
    ncols = len(cols)
    z: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        for ci, bc in enumerate(buckets):
            bit = F.shiftrightunsigned(F.col(bc).cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + ci))
    return df.withColumn(key_col, z).drop(*buckets)


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Re-layout ``df`` into ``n_files`` range-partitions of the z-curve,
    sorted within each — the write-side of OPTIMIZE ZORDER BY.  Each output
    file then covers one compact z-range ⇒ tight min/max stats on every
    clustered column."""
    keyed = with_zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_files, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
