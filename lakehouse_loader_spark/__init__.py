"""PySpark-native analytics engine with the query and data-processing
capabilities of splitgraph/lakehouse-loader, built Spark-first.

The reference (see SURVEY.md) is a Rust ELT loader that delegates all
relational computation to Postgres and commits Arrow batches as Delta/Iceberg
tables.  This package makes both halves native:

- ``sources``   — parquet / JDBC readers (reference: src/pg_arrow_source.rs,
  src/lib.rs:91-96)
- ``queries``   — the relational query surface the reference outsources to
  Postgres via its ``-q`` SQL string (src/lib.rs:39-40), expressed as
  DataFrame/Spark-SQL plans optimized by Catalyst
- ``sinks``     — Delta transaction-log commit + write-mode/schema-alignment
  semantics (reference: src/delta_destination.rs, src/iceberg_destination.rs)
- ``operators`` — scale-out extension operators (dedup, similarity search,
  text analysis, multimodal columns, as-of join)
- ``streaming`` — Structured Streaming over the events table
"""

from lakehouse_loader_spark.session import get_spark
from lakehouse_loader_spark.catalog import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
