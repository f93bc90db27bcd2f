"""Delta in-commit timestamps (writer feature `inCommitTimestamps`):
strictly-monotonic commitInfo.inCommitTimestamp as the first action of
every commit, enablement provenance, and ICT-based time travel."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from lakehouse_loader_spark.sinks import delta as DL


def _df(spark, lo=0, n=10):
    return spark.range(lo, lo + n).select(F.col("id"))


def _commits(path):
    """[(version, first_action_key, ict)] for every commit."""
    out = []
    logdir = DL._log_dir(path)
    for f in sorted(f for f in os.listdir(logdir) if f.endswith(".json")):
        v = int(f.split(".")[0])
        with open(os.path.join(logdir, f)) as fh:
            lines = [json.loads(ln) for ln in fh]
        first = next(iter(lines[0]))
        ict = next(
            (a["commitInfo"].get("inCommitTimestamp") for a in lines if "commitInfo" in a),
            None,
        )
        out.append((v, first, ict))
    return out


def test_creation_time_ict_monotonic_and_first(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark), t, in_commit_timestamps=True)
    DL.write_delta(_df(spark, lo=10), t, append=True)
    DL.delete_from_delta(spark, t, "id = 3")
    commits = _commits(t)
    assert len(commits) >= 4
    assert all(first == "commitInfo" for _, first, _ in commits)
    icts = [ict for _, _, ict in commits]
    assert all(i is not None for i in icts)
    assert icts == sorted(icts) and len(set(icts)) == len(icts)  # strictly increasing
    proto = DL.table_protocol(t)
    assert "inCommitTimestamps" in proto["writerFeatures"]


def test_enable_on_existing_table(spark, tmpdir):
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark), t)
    assert _commits(t)[-1][2] is None  # no ICT before enablement
    DL.enable_in_commit_timestamps(t)
    DL.write_delta(_df(spark, lo=10), t, append=True)
    commits = _commits(t)
    enable_v = int(
        DL._read_log(t)[1]["configuration"]["delta.inCommitTimestampEnablementVersion"]
    )
    assert commits[enable_v][2] is not None
    post = [ict for v, _, ict in commits if v >= enable_v]
    assert all(i is not None for i in post) and post == sorted(post)


def test_ict_survives_clock_skew(spark, tmpdir, monkeypatch):
    """A wall clock that jumps BACKWARD must not break monotonicity: the
    next ICT is prev + 1."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark), t, in_commit_timestamps=True)
    real_time = time.time
    monkeypatch.setattr(DL.time, "time", lambda: real_time() - 3600)
    DL.write_delta(_df(spark, lo=10), t, append=True)
    monkeypatch.setattr(DL.time, "time", real_time)
    icts = [ict for _, _, ict in _commits(t)]
    assert icts == sorted(icts) and len(set(icts)) == len(icts)


def test_time_travel_uses_ict_not_mtime(spark, tmpdir):
    """Back-date every commit FILE's mtime (an object-store copy scenario):
    AS OF must still resolve by the recorded in-commit timestamps."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark), t, in_commit_timestamps=True)
    DL.write_delta(_df(spark, lo=10), t, append=True)
    commits = _commits(t)
    v1_ict = commits[1][2]
    logdir = DL._log_dir(t)
    for f in os.listdir(logdir):  # clobber mtimes to 1970
        os.utime(os.path.join(logdir, f), (0, 0))
    assert DL.version_as_of(t, v1_ict) == 1
    assert DL.version_as_of(t, commits[-1][2]) == commits[-1][0]
    with pytest.raises(ValueError):
        DL.version_as_of(t, v1_ict - 10)


def test_foreign_ict_table_writable(spark, tmpdir):
    """A writer-7 table claiming inCommitTimestamps is writable (the
    feature is in SUPPORTED_WRITER_FEATURES) and our appends keep the
    invariant."""
    t = os.path.join(tmpdir, "t")
    DL.write_delta(_df(spark), t, in_commit_timestamps=True)
    DL.write_delta(_df(spark, lo=10), t, append=True)
    assert DL.read_delta(spark, t).count() == 20


class TestTimestampNtzFeature:
    def test_ntz_schema_declares_feature_at_creation(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        df = spark.range(5).select(
            "id", F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("ts")
        )
        DL.write_delta(df, t)
        proto = DL.table_protocol(t)
        assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
        assert "timestampNtz" in proto["readerFeatures"]
        assert "timestampNtz" in proto["writerFeatures"]
        assert DL.read_delta(spark, t).count() == 5

    def test_plain_schema_stays_legacy(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        DL.write_delta(spark.range(5).select("id"), t)
        assert DL.table_protocol(t) == {"minReaderVersion": 1, "minWriterVersion": 1}

    def test_evolving_in_ntz_upgrades_protocol(self, spark, tmpdir):
        t = os.path.join(tmpdir, "t")
        DL.write_delta(spark.range(5).select("id"), t)
        evolved = spark.range(5, 10).select(
            "id", F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("ts")
        )
        DL.write_delta(evolved, t, append=True, merge_schema=True)
        proto = DL.table_protocol(t)
        assert "timestampNtz" in (proto.get("readerFeatures") or [])
        assert DL.read_delta(spark, t).count() == 10
