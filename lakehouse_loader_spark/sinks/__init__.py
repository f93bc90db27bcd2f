"""Transactional table sinks with the reference loader's semantics:
write-mode matrix (R15), positional schema alignment (R12), Delta
transaction-log commits (R9), Iceberg-style versioned metadata with
optimistic concurrency (R11, R14, R16).
"""

from lakehouse_loader_spark.sinks.modes import WriteMode, resolve_write_mode
from lakehouse_loader_spark.sinks.alignment import check_schema_aligned, SchemaAlignmentError
from lakehouse_loader_spark.sinks.object_store import (
    apply_object_store_conf,
    object_store_hadoop_conf,
)

__all__ = [
    "WriteMode",
    "resolve_write_mode",
    "check_schema_aligned",
    "SchemaAlignmentError",
    "apply_object_store_conf",
    "object_store_hadoop_conf",
]
