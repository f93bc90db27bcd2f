"""Bucketed tables: pre-shuffled, co-located storage for repeated joins.

The 100 TB pattern for join-heavy pipelines: pay the shuffle ONCE at write
(hash-bucket + sort by the join key), then every subsequent equi-join on the
bucket key is shuffle-free — both sides' bucket i land on the same task.
This is the Spark-native analog of the reference's TODO about pre-write
sorting (src/lib.rs:202), taken to its conclusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed parquet
    table.  ``n_buckets`` should be sized so one bucket of the LARGER join
    side fits an executor's memory at the target scale."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst elides
    both Exchange nodes (verify with .explain — no shuffle feeds the
    SortMergeJoin)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
