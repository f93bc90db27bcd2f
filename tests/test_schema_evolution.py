"""By-name schema evolution on append (engine extension; the reference's
positional alignment rejects any added field, iceberg_destination.rs:96-99).

Covers the merge rules (add column, omitted column forced nullable, type
conflict), the Delta metaData-action evolution, and the Iceberg
schema-id/field-id bookkeeping."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_loader_spark.sinks import alignment as AL
from lakehouse_loader_spark.sinks import delta as DL
from lakehouse_loader_spark.sinks import iceberg as IC


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="evolve_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# -- merge_schemas unit rules ----------------------------------------------


def test_merge_adds_new_columns_in_incoming_order():
    target = _s(("a", T.LongType(), True), ("b", T.StringType(), True))
    incoming = _s(
        ("z", T.DoubleType(), True), ("a", T.LongType(), True), ("y", T.IntegerType(), True)
    )
    merged = AL.merge_schemas(target, incoming)
    assert [f.name for f in merged.fields] == ["a", "b", "z", "y"]
    # appended columns are nullable regardless of incoming nullability
    assert all(f.nullable for f in merged.fields if f.name in ("z", "y"))


def test_merge_forces_omitted_and_widened_columns_nullable():
    target = _s(("a", T.LongType(), False), ("b", T.StringType(), False))
    # 'b' omitted -> new files read it as null -> must become nullable;
    # 'a' arrives nullable on a required target -> widens to nullable
    incoming = _s(("a", T.LongType(), True))
    merged = AL.merge_schemas(target, incoming)
    assert merged["a"].nullable and merged["b"].nullable
    # identical schemas merge to themselves (no spurious evolution)
    again = AL.merge_schemas(merged, merged)
    assert again.json() == merged.json()


def test_merge_rejects_type_conflict():
    target = _s(("a", T.LongType(), True))
    incoming = _s(("a", T.StringType(), True))
    with pytest.raises(AL.SchemaAlignmentError, match="type conflict"):
        AL.merge_schemas(target, incoming)


# -- Delta: evolved append --------------------------------------------------


def _base_df(spark):
    return spark.range(0, 10).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _extra_df(spark):
    return spark.range(10, 15).select(
        F.col("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )


def test_delta_append_without_merge_still_positional(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_base_df(spark), t)
    with pytest.raises(AL.SchemaAlignmentError):
        DL.write_delta(_extra_df(spark), t, append=True)


def test_delta_evolved_append_adds_column(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_base_df(spark), t)
    meta_id_before = json.loads(
        open(os.path.join(t, "_delta_log", f"{0:020d}.json")).readline()
    )
    DL.write_delta(_extra_df(spark), t, append=True, merge_schema=True)

    schema = DL.table_schema(t)
    assert [f.name for f in schema.fields] == ["id", "name", "score"]
    back = DL.read_delta(spark, t)
    assert back.count() == 15
    # pre-evolution rows read the new column as null; new rows carry values
    assert back.filter(F.col("score").isNull()).count() == 10
    assert back.filter(F.col("id") == 12).select("score").collect()[0][0] == 18.0
    # table identity is preserved across the schema change
    _, meta, _ = DL._read_log(t)
    v0_meta = DL._read_log(t, as_of_version=1)[1]
    assert meta["id"] == v0_meta["id"]
    # time travel to before the evolution sees the original 2-column schema
    old = DL.read_delta(spark, t, version=1)
    assert old.columns == ["id", "name"] and old.count() == 10


def test_delta_evolved_append_with_omitted_column(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    # all-nullable table: the omitted-column append then needs NO widening
    nullable = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    DL.write_delta(spark.createDataFrame(_extra_df(spark).collect(), nullable), t)
    DL.write_delta(_base_df(spark), t, append=True, merge_schema=True)  # no score
    back = DL.read_delta(spark, t)
    assert back.count() == 15
    assert back.filter(F.col("score").isNull()).count() == 10
    # schema unchanged -> no new metaData action was committed
    with open(os.path.join(t, "_delta_log", f"{2:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh]
    assert not any("metaData" in a for a in actions)


def test_delta_evolved_append_widens_nullability_of_omitted_required(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_extra_df(spark), t)  # score is required (computed non-null)
    assert not DL.table_schema(t)["score"].nullable
    DL.write_delta(_base_df(spark), t, append=True, merge_schema=True)  # omits score
    # the omission is a real schema change: score must now read as nullable
    assert DL.table_schema(t)["score"].nullable
    assert DL.read_delta(spark, t).filter(F.col("score").isNull()).count() == 10


def test_delta_evolved_append_type_conflict_fails(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_base_df(spark), t)
    bad = spark.range(0, 3).select(F.col("id").cast("string"), F.lit("x").alias("name"))
    with pytest.raises(AL.SchemaAlignmentError, match="type conflict"):
        DL.write_delta(bad, t, append=True, merge_schema=True)


# -- Iceberg: evolved append ------------------------------------------------


def test_iceberg_evolved_append_bookkeeping(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_base_df(spark), t)
    _, meta0 = IC._read_metadata(t)
    ids0 = {f["name"]: f["id"] for f in meta0["schemas"][meta0["current-schema-id"]]["fields"]}

    IC.write_iceberg(_extra_df(spark), t, append=True, evolve_schema=True)
    _, meta1 = IC._read_metadata(t)
    cur = meta1["schemas"][meta1["current-schema-id"]]
    ids1 = {f["name"]: f["id"] for f in cur["fields"]}
    # existing columns keep their field ids; the new one takes a fresh id
    assert {k: ids1[k] for k in ids0} == ids0
    assert ids1["score"] == max(ids0.values()) + 1
    assert cur["schema-id"] == meta1["current-schema-id"] == 1
    assert meta1["last-column-id"] == ids1["score"]
    # the old schema stays in the history at its original index
    assert meta1["schemas"][0] == meta0["schemas"][meta0["current-schema-id"]]

    back = IC.read_iceberg(spark, t)
    assert [f.name for f in back.schema.fields] == ["id", "name", "score"]
    assert back.count() == 15
    assert back.filter(F.col("score").isNull()).count() == 10
    assert back.filter(F.col("id") == 12).select("score").collect()[0][0] == 18.0


def test_iceberg_evolved_append_noop_keeps_schema_id(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_base_df(spark), t)
    IC.write_iceberg(_base_df(spark), t, append=True, evolve_schema=True)
    _, meta = IC._read_metadata(t)
    assert meta["current-schema-id"] == 0 and len(meta["schemas"]) == 1
    assert IC.read_iceberg(spark, t).count() == 20


def test_iceberg_plain_append_still_rejects_added_column(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    IC.write_iceberg(_base_df(spark), t)
    with pytest.raises(AL.SchemaAlignmentError):
        IC.write_iceberg(_extra_df(spark), t, append=True)
