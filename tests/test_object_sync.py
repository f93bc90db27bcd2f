"""Table → object-store sync over the executed wire (sinks/object_sync.py):
real Delta/Iceberg tables written by the sinks round-trip through the
loopback S3 and Azure services — data files under the multipart policy,
commits via conditional create in version order — and read back
identical.  The engine-level twin of the reference's upload flow
(delta_destination.rs:70-160, :434-441)."""

from __future__ import annotations

import os

import pytest

from lakehouse_loader_spark.sinks import azureblob as AZ
from lakehouse_loader_spark.sinks import object_sync as SY
from lakehouse_loader_spark.sinks import s3http as S3
from tests.azure_server import make_server as make_azure
from tests.s3_server import make_server as make_s3


@pytest.fixture(scope="module")
def s3c():
    srv, state, endpoint = make_s3()
    yield S3.S3Client(endpoint, "AKTEST", "sk-test"), state
    srv.shutdown()


@pytest.fixture(scope="module")
def azc():
    srv, state, endpoint = make_azure(account="devacct")
    yield AZ.AzureBlobClient(endpoint, "devacct", state.key), state
    srv.shutdown()


def _df(spark, lo=0, n=500):
    return spark.range(lo, lo + n).selectExpr(
        "id", "id % 7 as k", "cast(id * 1.5 as double) as v"
    )


def test_delta_roundtrip_through_s3(spark, tmpdir, s3c):
    from lakehouse_loader_spark.sinks import delta as DL

    client, _state = s3c
    t = os.path.join(str(tmpdir), "dl")
    DL.write_delta(_df(spark), t)
    DL.delete_from_delta(spark, t, "id % 10 = 3", mode="merge-on-read")
    DL.write_delta(_df(spark, 500), t, append=True)

    res = SY.sync_table(t, client, "bkt", "tables/dl")
    # the delta sink's two-commit initial layout + delete + append = 4
    assert res["commits"] == 4 and res["uploaded"] > 0

    back = os.path.join(str(tmpdir), "dl_back")
    assert SY.fetch_table(client, "bkt", "tables/dl", back) > 0
    want = {r["id"]: r["v"] for r in DL.read_delta(spark, t).collect()}
    got = {r["id"]: r["v"] for r in DL.read_delta(spark, back).collect()}
    assert got == want and len(got) == 950


def test_iceberg_roundtrip_through_azure(spark, tmpdir, azc):
    from lakehouse_loader_spark.sinks import iceberg as IC

    client, _state = azc
    t = os.path.join(str(tmpdir), "ice")
    IC.write_iceberg(_df(spark), t)
    IC.delete_from_iceberg(spark, t, "id % 10 = 4", strategy="merge-on-read")
    IC.write_iceberg(_df(spark, 500), t, append=True)

    res = SY.sync_table(t, client, "ctr", "tables/ice")
    assert res["commits"] == 3

    back = os.path.join(str(tmpdir), "ice_back")
    SY.fetch_table(client, "ctr", "tables/ice", back)
    want = {r["id"]: r["v"] for r in IC.read_iceberg(spark, t).collect()}
    got = {r["id"]: r["v"] for r in IC.read_iceberg(spark, back).collect()}
    assert got == want and len(got) == 950


def test_incremental_push_skips_existing(spark, tmpdir, s3c):
    from lakehouse_loader_spark.sinks import delta as DL

    client, _state = s3c
    t = os.path.join(str(tmpdir), "inc")
    DL.write_delta(_df(spark), t)
    first = SY.sync_table(t, client, "bkt", "tables/inc")
    assert first["skipped"] == 0
    # idempotent re-push: every data file skipped by key, every commit
    # verified byte-identical through the conditional-create loser path
    again = SY.sync_table(t, client, "bkt", "tables/inc")
    assert again["commits"] == 0
    assert again["skipped"] >= first["uploaded"] + first["commits"] - 1
    # append → only the new objects move
    DL.write_delta(_df(spark, 500), t, append=True)
    inc = SY.sync_table(t, client, "bkt", "tables/inc")
    assert inc["commits"] == 1 and 0 < inc["uploaded"] <= first["uploaded"]


def test_diverged_remote_refused(spark, tmpdir, s3c):
    from lakehouse_loader_spark.sinks import delta as DL

    client, _state = s3c
    a = os.path.join(str(tmpdir), "fork_a")
    b = os.path.join(str(tmpdir), "fork_b")
    DL.write_delta(_df(spark), a)
    DL.write_delta(_df(spark, 1000), b)  # different history, same version 0
    SY.sync_table(a, client, "bkt", "tables/fork")
    with pytest.raises(SY.RemoteLogDiverged):
        SY.sync_table(b, client, "bkt", "tables/fork")


def test_version_order_and_multipart_policy(spark, tmpdir, s3c):
    """Commits land in ascending version order (a reader listing the
    remote log mid-push never sees N+1 before N), and a >5 MiB data file
    goes up through the multipart path."""
    from lakehouse_loader_spark.sinks import delta as DL

    client, state = s3c
    t = os.path.join(str(tmpdir), "big")
    # >5 MiB single parquet: ~216B of per-row randomness x 60k rows
    # (snappy can't shrink distinct uuids, so the file stays ~13 MB)
    df = spark.range(60_000).selectExpr(
        "id", "concat(uuid(), uuid(), uuid(), uuid(), uuid(), uuid()) as pad"
    ).coalesce(1)
    DL.write_delta(df, t)
    parts_before = state.part_puts
    DL.write_delta(df.limit(10), t, append=True)

    order: list[str] = []
    orig = type(client).put_object

    def spy(self, bucket, key, data, **kw):
        if "_delta_log" in key and key.endswith(".json"):
            order.append(key)
        return orig(self, bucket, key, data, **kw)

    type(client).put_object = spy
    try:
        SY.sync_table(t, client, "bkt", "tables/big")
    finally:
        type(client).put_object = orig
    versions = [int(k.split("/")[-1].split(".")[0]) for k in order]
    # two-commit initial layout + the append
    assert versions == sorted(versions) == [0, 1, 2]
    assert state.part_puts > parts_before  # big file took the multipart path


def test_cli_push_pull_table(spark, tmpdir, s3c, monkeypatch):
    """The push-table / pull-table subcommands drive object_sync through
    the env-credentialed client factory — no SparkSession is built for
    these pure-IO commands."""
    from lakehouse_loader_spark.cli import do_main
    from lakehouse_loader_spark.sinks import delta as DL

    client, _state = s3c
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKTEST")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk-test")
    t = os.path.join(str(tmpdir), "clidl")
    DL.write_delta(_df(spark, 0, 120), t)
    ep = f"http://127.0.0.1:{client.port}"
    do_main(["push-table", t, "bkt", "tables/cli", "--store", "s3", "--endpoint", ep])
    back = os.path.join(str(tmpdir), "clidl_back")
    do_main(["pull-table", back, "bkt", "tables/cli", "--store", "s3", "--endpoint", ep])
    assert DL.read_delta(spark, back).count() == 120

def test_incremental_iceberg_repush_updates_hint(spark, tmpdir, s3c):
    """metadata/version-hint.text is MUTABLE: after new commits, an
    incremental re-push must re-put it (basename-matched hint), or the
    remote hint keeps pointing at the OLD snapshot and a restore silently
    reads stale data."""
    from lakehouse_loader_spark.sinks import iceberg as IC

    client, _state = s3c
    t = os.path.join(str(tmpdir), "ice_inc")
    IC.write_iceberg(_df(spark), t)
    SY.sync_table(t, client, "bkt", "tables/ice_inc")

    IC.write_iceberg(_df(spark, 500), t, append=True)
    inc = SY.sync_table(t, client, "bkt", "tables/ice_inc")
    assert inc["commits"] == 1

    hint_key = "tables/ice_inc/metadata/version-hint.text"
    with open(os.path.join(t, "metadata", "version-hint.text"), "rb") as fh:
        assert client.get_object("bkt", hint_key) == fh.read()

    back = os.path.join(str(tmpdir), "ice_inc_back")
    SY.fetch_table(client, "bkt", "tables/ice_inc", back)
    assert IC.read_iceberg(spark, back).count() == 1000


def test_truncated_remote_payload_repaired(spark, tmpdir, s3c):
    """A remote data file whose SIZE differs from local (truncated earlier
    push) is re-uploaded, not skipped by key — immutable keys make the
    repair safe."""
    from lakehouse_loader_spark.sinks import delta as DL

    client, state = s3c
    t = os.path.join(str(tmpdir), "trunc")
    DL.write_delta(_df(spark), t)
    SY.sync_table(t, client, "bkt", "tables/trunc")

    victim = next(
        (b, k) for (b, k) in state.objects
        if b == "bkt" and k.startswith("tables/trunc/") and k.endswith(".parquet")
    )
    whole = state.objects[victim]
    state.objects[victim] = whole[: len(whole) // 2]

    res = SY.sync_table(t, client, "bkt", "tables/trunc")
    assert res["repaired"] == 1 and res["commits"] == 0
    assert state.objects[victim] == whole

    back = os.path.join(str(tmpdir), "trunc_back")
    SY.fetch_table(client, "bkt", "tables/trunc", back)
    want = {r["id"]: r["v"] for r in DL.read_delta(spark, t).collect()}
    got = {r["id"]: r["v"] for r in DL.read_delta(spark, back).collect()}
    assert got == want


def test_s3_list_pagination(s3c):
    """list_objects follows IsTruncated/NextContinuationToken to a
    COMPLETE listing (real S3 pages at 1000 keys) and returns sizes."""
    client, state = s3c
    for i in range(10):
        client.put_object("bkt", f"pgn/k{i:02d}", b"x" * (i + 1))
    state.default_max_keys = 3
    try:
        got = client.list_objects("bkt", prefix="pgn/")
    finally:
        state.default_max_keys = 1000
    assert got == [(f"pgn/k{i:02d}", i + 1) for i in range(10)]


def test_azure_list_pagination(azc):
    """list_objects follows NextMarker to a COMPLETE listing (real Azure
    pages at 5000 blobs) and returns Content-Length sizes."""
    client, state = azc
    for i in range(10):
        client.put_object("ctr", f"pgn/b{i:02d}", b"y" * (i + 1))
    state.default_maxresults = 4
    try:
        got = client.list_objects("ctr", prefix="pgn/")
    finally:
        state.default_maxresults = 5000
    assert got == [(f"pgn/b{i:02d}", i + 1) for i in range(10)]
