"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join handling covers sort-merge joins; these helpers cover the
remaining hot-key cases (extreme single-key skew in aggregations and
broadcast-infeasible joins) with the classic two-phase salt/unsalt pattern.
Results are exactly equal to the unsalted plan — only the shuffle layout
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY key without a single hot-key reducer:
    phase 1 dedups (key, value) within (key, salt) partitions — the salt is
    derived from the VALUE hash, so the same value always lands in the same
    salt bucket and cross-bucket double-counting is impossible; phase 2 sums
    per-bucket distinct counts."""
    salted = df.select(
        key, value, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("__salt")
    )
    phase1 = salted.groupBy(key, "__salt").agg(F.countDistinct(value).alias("__part"))
    return phase1.groupBy(key).agg(F.sum("__part").cast("bigint").alias("n_distinct"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join resilient to hot keys on the big side: the big side
    gets a random-ish salt from a row hash; the small side is exploded
    n_salts× so every (key, salt) bucket finds its match.  Use when the
    small side is too big to broadcast but the big side has hot keys."""
    # monotonically_increasing_id spreads IDENTICAL duplicate rows of a hot
    # key across salts (a content hash would send them all to one bucket,
    # defeating the fan-out for the most common hot-key shape)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_exploded, [key, "__salt"]).drop("__salt")
