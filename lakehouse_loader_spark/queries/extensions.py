"""Extension query surface — SURVEY.md §2c (E1-E4) plus the training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Every operator here is expressed as scale-out primitives (joins / aggs /
windows / LSH banding) — no driver-side collection — per the 100 TB design
rule.  Implementations live in ``lakehouse_loader_spark.operators.*``; this
module registers the declared-query entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_loader_spark.catalog import load_table
from lakehouse_loader_spark.queries import query


# --------------------------------------------------------------------------
# E1 exact dedup: deterministic group-by-content keep-min-id
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT MD5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY MD5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text), keep lowest doc_id.
    One shuffle on the 128-bit hash — uniform keys, no skew at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
