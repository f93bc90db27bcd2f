"""Positional, rename-tolerant schema alignment for appends.

Reference semantics (src/iceberg_destination.rs:87-115, tests at 389-553):
appended data must have the SAME NUMBER of fields, in the SAME ORDER, with
IDENTICAL types; field NAMES are ignored (renames are compatible); a
nullable incoming field may NOT land on a required target field, but a
required incoming field may land on a nullable one (widening allowed).

Spark's own append resolution is by-name — this validator deliberately
reproduces the reference's by-position contract at the engine level.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaAlignmentError(ValueError):
    pass


def check_schema_aligned(incoming: T.StructType, target: T.StructType) -> None:
    """Raise SchemaAlignmentError unless ``incoming`` can append onto
    ``target`` positionally."""
    if len(incoming.fields) != len(target.fields):
        raise SchemaAlignmentError(
            f"field count mismatch: incoming {len(incoming.fields)} vs "
            f"target {len(target.fields)}"
        )
    for i, (src, dst) in enumerate(zip(incoming.fields, target.fields)):
        if src.dataType != dst.dataType:
            raise SchemaAlignmentError(
                f"type mismatch at position {i}: incoming "
                f"{src.dataType.simpleString()} ({src.name}) vs target "
                f"{dst.dataType.simpleString()} ({dst.name})"
            )
        if src.nullable and not dst.nullable:
            raise SchemaAlignmentError(
                f"nullability violation at position {i}: nullable incoming "
                f"field {src.name} cannot append onto required target field "
                f"{dst.name}"
            )
