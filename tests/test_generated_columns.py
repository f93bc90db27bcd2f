"""Delta generated columns (writer feature `generatedColumns`): generation
expressions stored in the schemaString, absent columns computed on every
write, provided values validated against the expression, protocol emitted
in the table-features form, legacy-v4 foreign tables writable iff CDF is
off."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


def _src(spark, lo=0, n=10):
    return spark.range(lo, lo + n).select(
        "id", F.timestamp_seconds(F.col("id") * 86_400 + 1_600_000_000).alias("ts")
    )


GEN = {"d": "CAST(ts AS DATE)"}


def test_create_computes_missing_generated_column(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, generated_columns=GEN)
    back = DL.read_delta(spark, t)
    assert "d" in back.columns
    bad = back.filter(F.col("d") != F.col("ts").cast("date")).count()
    assert bad == 0
    assert DL.table_generated_columns(t) == GEN
    proto = DL.table_protocol(t)
    assert proto["minWriterVersion"] == 7
    assert "generatedColumns" in proto["writerFeatures"]


def test_append_computes_and_validates(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, generated_columns=GEN)
    # append WITHOUT the generated column: computed
    DL.write_delta(_src(spark, lo=10), t, append=True)
    back = DL.read_delta(spark, t)
    assert back.count() == 20
    assert back.filter(F.col("d") != F.col("ts").cast("date")).count() == 0
    # append WITH a correct value: accepted
    ok = _src(spark, lo=20).withColumn("d", F.col("ts").cast("date"))
    DL.write_delta(ok, t, append=True)
    # append WITH a wrong value: refused loudly
    bad = _src(spark, lo=30).withColumn("d", F.lit("1999-01-01").cast("date"))
    with pytest.raises(DL.ConstraintViolationError, match="generated_d"):
        DL.write_delta(bad, t, append=True)
    assert DL.read_delta(spark, t).count() == 30


def test_partition_by_generated_column(spark, tmpdir):
    # the classic use: hidden date partitioning derived from a timestamp
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark, n=6), t, generated_columns=GEN, partition_by=["d"])
    assert DL.read_delta(spark, t).count() == 6
    files = DL._read_log(t)[2]
    assert all(a.get("partitionValues", {}).get("d") for a in files.values())


def test_update_cannot_break_generation(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, generated_columns=GEN)
    with pytest.raises(DL.ConstraintViolationError, match="generated_d"):
        DL.update_delta(spark, t, "id = 1", {"d": "DATE'1999-01-01'"})
    # updating the SOURCE column alone violates too (d no longer matches) —
    # this engine validates rather than silently recomputing
    with pytest.raises(DL.ConstraintViolationError, match="generated_d"):
        DL.update_delta(spark, t, "id = 1", {"ts": "ts + INTERVAL 2 DAYS"})


def test_generated_column_must_be_primitive(spark, tmpdir):
    with pytest.raises(ValueError, match="primitive"):
        DL.write_delta(
            spark.range(3).select("id"),
            os.path.join(tmpdir, "t2"),
            generated_columns={"a": "array(id)"},
        )


def _force_legacy_v4(path: str) -> None:
    """Rewrite v0's protocol to the legacy (1,4) encoding delta-spark uses
    for generated-column tables."""
    v0 = DL._version_file(path, 0)
    lines = []
    with open(v0) as fh:
        for line in fh:
            a = json.loads(line)
            if "protocol" in a:
                a["protocol"] = {"minReaderVersion": 1, "minWriterVersion": 4}
            lines.append(json.dumps(a))
    with open(v0, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_foreign_legacy_v4_table_writable(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, generated_columns=GEN)
    _force_legacy_v4(t)
    DL.write_delta(_src(spark, lo=10), t, append=True)  # computed + accepted
    back = DL.read_delta(spark, t)
    assert back.count() == 20
    assert back.filter(F.col("d") != F.col("ts").cast("date")).count() == 0
    # with CDF enabled, v4 stays writable (since r8 this engine writes
    # _change_data files on DML) — a DELETE must carry cdc actions
    v0 = DL._version_file(t, 0)
    lines = []
    with open(v0) as fh:
        for line in fh:
            a = json.loads(line)
            if "metaData" in a:
                a["metaData"]["configuration"]["delta.enableChangeDataFeed"] = "true"
            lines.append(json.dumps(a))
    with open(v0, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    DL.write_delta(_src(spark, lo=30), t, append=True)
    res = DL.delete_from_delta(spark, t, "id = 30")
    assert res["deleted_rows"] == 1
    latest = DL._read_log(t)[0]
    with open(DL._version_file(t, latest)) as fh:
        assert any('"cdc"' in ln for ln in fh)


def test_constraint_upgrade_keeps_generated_feature(spark, tmpdir):
    """add_check_constraint on a generated-column table must MERGE into the
    features form, not downgrade it (the r7 ADVICE class of bug)."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_src(spark), t, generated_columns=GEN)
    DL.add_check_constraint(t, "pos", "id >= 0")
    proto = DL.table_protocol(t)
    assert proto["minWriterVersion"] == 7
    assert {"generatedColumns", "checkConstraints"} <= set(proto["writerFeatures"])
    DL.write_delta(_src(spark, lo=10), t, append=True)
    assert DL.read_delta(spark, t).count() == 20
