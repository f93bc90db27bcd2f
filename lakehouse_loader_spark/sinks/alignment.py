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


def merge_schemas(target: T.StructType, incoming: T.StructType) -> T.StructType:
    """By-NAME schema-evolution merge for opt-in evolved appends (engine
    extension — the reference's positional contract above rejects any
    added field, iceberg_destination.rs:96-99).

    Rules (the Delta ``mergeSchema`` / Iceberg add-column semantics):

    - a column present in both must have the IDENTICAL type; its merged
      nullability is the wider of the two
    - a target column absent from ``incoming`` stays, forced nullable —
      the new data files have no values for it, so reads of them yield null
    - an ``incoming`` column absent from the target is APPENDED (in
      incoming order) as nullable — pre-evolution files yield null for it

    Raises SchemaAlignmentError on a type conflict; never drops a column.
    """
    by_name = {f.name: f for f in incoming.fields}
    merged: list[T.StructField] = []
    for dst in target.fields:
        src = by_name.pop(dst.name, None)
        if src is None:
            merged.append(T.StructField(dst.name, dst.dataType, True, dst.metadata))
            continue
        if src.dataType != dst.dataType:
            raise SchemaAlignmentError(
                f"type conflict on column {dst.name!r}: incoming "
                f"{src.dataType.simpleString()} vs target "
                f"{dst.dataType.simpleString()} (evolution adds columns, "
                "never retypes them — cast before appending)"
            )
        merged.append(
            T.StructField(dst.name, dst.dataType, dst.nullable or src.nullable, dst.metadata)
        )
    for src in incoming.fields:
        if src.name in by_name:
            merged.append(T.StructField(src.name, src.dataType, True, src.metadata))
    return T.StructType(merged)


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
