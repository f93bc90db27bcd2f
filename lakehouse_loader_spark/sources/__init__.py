"""Source readers: parquet files and Postgres-over-JDBC, covering the
reference's two source families (R1-R6)."""

from lakehouse_loader_spark.sources.readers import (
    postgres_jdbc_options,
    read_parquet_source,
    read_postgres_query,
)

__all__ = ["postgres_jdbc_options", "read_parquet_source", "read_postgres_query"]
