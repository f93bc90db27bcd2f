"""Delta CHECK constraints: metadata round-trip, protocol bump, and
enforcement across append / UPDATE / MERGE write paths."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="constr_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )


@pytest.fixture()
def table(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark, 0, 50), t)
    DL.add_check_constraint(t, "v_nonneg", "v >= 0")
    return t


def test_constraint_metadata_and_protocol(spark, table):
    assert DL.table_constraints(table) == {"v_nonneg": "v >= 0"}
    DL.check_table_constraints(spark, table)  # current rows qualify
    # the constraint commit bumps the writer protocol to 3
    with open(os.path.join(table, "_delta_log", f"{2:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 3}]
    with pytest.raises(ValueError, match="already exists"):
        DL.add_check_constraint(table, "v_nonneg", "v >= 0")


def test_append_enforcement(spark, table):
    bad = spark.range(0, 5).select(F.col("id"), F.lit(-1.0).alias("v"))
    with pytest.raises(DL.ConstraintViolationError, match="v_nonneg"):
        DL.write_delta(bad, table, append=True)
    # the refused append committed nothing
    assert DL.read_delta(spark, table).count() == 50
    DL.write_delta(_df(spark, 50, 60), table, append=True)
    assert DL.read_delta(spark, table).count() == 60


def test_null_counts_as_violation(spark, table):
    nully = spark.range(0, 3).select(
        F.col("id"), F.lit(None).cast("double").alias("v")
    )
    with pytest.raises(DL.ConstraintViolationError, match="3 rows"):
        DL.write_delta(nully, table, append=True)


def test_update_and_merge_enforcement(spark, table):
    with pytest.raises(DL.ConstraintViolationError):
        DL.update_delta(spark, table, "id = 7", {"v": "-5.0"})
    # a DELETE can never violate
    DL.delete_from_delta(spark, table, "id = 7")
    src = spark.range(0, 4).select(F.col("id"), F.lit(-2.0).alias("v"))
    with pytest.raises(DL.ConstraintViolationError):
        DL.merge_delta(spark, table, src, "id")
    ok = spark.range(0, 4).select(F.col("id"), F.lit(3.0).alias("v"))
    DL.merge_delta(spark, table, ok, "id")
    got = DL.read_delta(spark, table)
    assert got.filter("v < 0").count() == 0


def test_drop_constraint_unblocks(spark, table):
    DL.drop_check_constraint(table, "v_nonneg")
    assert DL.table_constraints(table) == {}
    bad = spark.range(100, 105).select(F.col("id"), F.lit(-1.0).alias("v"))
    DL.write_delta(bad, table, append=True)
    assert DL.read_delta(spark, table).filter("v < 0").count() == 5
    with pytest.raises(ValueError, match="no constraint"):
        DL.drop_check_constraint(table, "v_nonneg")


def test_constraint_survives_checkpoint(spark, table):
    DL.write_checkpoint(table)
    # replay now seeds from the checkpoint parquet: configuration (and so
    # the constraint) must round-trip through it
    assert DL.table_constraints(table) == {"v_nonneg": "v >= 0"}
    bad = spark.range(0, 2).select(F.col("id"), F.lit(-9.0).alias("v"))
    with pytest.raises(DL.ConstraintViolationError):
        DL.write_delta(bad, table, append=True)


# -- protocol guards --------------------------------------------------------


def _bump_protocol(t, reader, writer, reader_features=None, writer_features=None):
    log = os.path.join(t, "_delta_log")
    latest = max(int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json"))
    proto = {"minReaderVersion": reader, "minWriterVersion": writer}
    if reader_features is not None:
        proto["readerFeatures"] = reader_features
    if writer_features is not None:
        proto["writerFeatures"] = writer_features
    with open(os.path.join(log, f"{latest + 1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": proto}) + "\n")
        fh.write(json.dumps({"commitInfo": {"operation": "UPGRADE"}}) + "\n")


def test_reader_version_guard(spark, tmpdir):
    """Reader v2 (column mapping, r8-implemented for name mode) now READS;
    v3 tables demanding features this engine lacks are refused; v3 tables
    demanding only deletionVectors/columnMapping are not."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark, 0, 10), t)
    _bump_protocol(t, reader=2, writer=5)
    # mapping mode 'none': the reader-2 bump alone no longer blocks reads
    assert DL.read_delta(spark, t).count() == 10
    _bump_protocol(
        t, reader=3, writer=7,
        reader_features=["deletionVectors", "typeWidening"],
        writer_features=["deletionVectors", "typeWidening"],
    )
    with pytest.raises(DL.UnsupportedProtocolError, match="typeWidening"):
        DL.read_delta(spark, t)
    with pytest.raises(DL.UnsupportedProtocolError):
        DL.read_delta_changes(spark, t, 0)
    with pytest.raises(DL.UnsupportedProtocolError):
        DL.delete_from_delta(spark, t, "id = 1")


def test_writer_version_guard_read_still_works(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark, 0, 10), t)
    _bump_protocol(
        t, reader=1, writer=7, writer_features=["clustering-ta"]
    )  # a writer feature we lack (rowTracking/clustering implemented r9)
    assert DL.read_delta(spark, t).count() == 10  # reading is fine
    with pytest.raises(DL.UnsupportedProtocolError, match="clustering-ta"):
        DL.write_delta(_df(spark, 10, 12), t, append=True)
    with pytest.raises(DL.UnsupportedProtocolError):
        DL.optimize_delta(spark, t)


def test_checkpoint_preserves_bumped_protocol(spark, table):
    """add_check_constraint bumps minWriter to 3; a checkpoint written
    afterwards must carry that protocol, not a downgraded (1,1)."""
    DL.write_checkpoint(table)
    assert DL.table_protocol(table) == {"minReaderVersion": 1, "minWriterVersion": 3}


def test_iceberg_format_version_guard(spark, tmpdir):
    from lakehouse_loader_spark.sinks import iceberg as IC

    t = os.path.join(tmpdir, "it")
    IC.write_iceberg(_df(spark, 0, 10), t)
    v, meta = IC._read_metadata(t)
    # v3 is SUPPORTED since the deletion-vector work (r8) — a plain v3
    # table reads fine; v4 (unknown) still refuses per the forward-compat
    # rule, and v3 feature subsets this engine lacks refuse specifically
    # (tests/test_iceberg_dv.py::test_v3_tables_with_unimplemented_defaults_refused)
    meta["format-version"] = 3
    with open(os.path.join(t, "metadata", f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(v + 1))
    assert IC.read_iceberg(spark, t).count() == 10
    meta["format-version"] = 4
    with open(os.path.join(t, "metadata", f"v{v + 2}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(v + 2))
    with pytest.raises(RuntimeError, match="format-version 4"):
        IC.read_iceberg(spark, t)
