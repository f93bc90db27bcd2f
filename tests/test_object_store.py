"""Object-store conf assembly contract (R8/R10): scheme-keyed env pickup
and multipart policy must mirror the reference's CompatObjectStore
(delta_destination.rs:232-390, constants :43-46) — unit-tested offline,
no cloud or connector jar needed."""

from __future__ import annotations

import pytest

from lakehouse_loader_spark.sinks import object_store as OS


def test_reference_multipart_constants():
    # delta_destination.rs:45-46
    assert OS.PARTITION_FILE_MIN_PART_SIZE == 5 * 1024 * 1024
    assert OS.PARTITION_FILE_UPLOAD_MAX_CONCURRENCY == 2


def test_scheme_detection():
    assert OS.url_scheme("/tmp/x") is None
    assert OS.url_scheme("relative/x") is None
    assert OS.url_scheme("s3://b/k") == "s3"
    assert OS.url_scheme("abfss://c@a.dfs.core.windows.net/p") == "abfss"


def test_env_pickup_is_scheme_keyed(monkeypatch):
    """object_store_keys_from_env parity (delta_destination.rs:244-250):
    s3* → AWS_*, gs → GOOGLE_*, az family → AZURE_*, else nothing; keys
    lowercased."""
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ak")
    monkeypatch.setenv("GOOGLE_APPLICATION_CREDENTIALS", "/g.json")
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT_KEY", "zk")
    s3 = OS.object_store_env("s3")
    # every AWS_* var is picked up (the host may export others, e.g.
    # AWS_CA_BUNDLE — the reference's predicate is prefix-based too)
    assert s3["aws_access_key_id"] == "ak"
    assert all(k.startswith("aws_") for k in s3)
    assert "google_application_credentials" not in s3
    assert OS.object_store_env("s3a") == s3
    assert OS.object_store_env("gs") == {
        "google_application_credentials": "/g.json"
    }
    for az in ("az", "adl", "azure", "abfs", "abfss"):
        assert OS.object_store_env(az) == {"azure_storage_account_key": "zk"}
    assert OS.object_store_env("http") == {}


def test_s3_conf_assembly(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ak")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "tok")
    monkeypatch.setenv("AWS_ENDPOINT_URL", "http://minio:9000")
    monkeypatch.setenv("AWS_REGION", "us-east-2")
    conf = OS.object_store_hadoop_conf("s3://bucket/table")
    assert conf == {
        "fs.s3a.multipart.size": str(5 * 1024 * 1024),
        "fs.s3a.fast.upload.active.blocks": "2",
        "fs.s3a.access.key": "ak",
        "fs.s3a.secret.key": "sk",
        "fs.s3a.session.token": "tok",
        "fs.s3a.endpoint": "http://minio:9000",
        "fs.s3a.endpoint.region": "us-east-2",
    }


def test_azure_key_is_account_qualified(monkeypatch):
    """The ABFS driver only reads fs.azure.account.key.<account>.dfs.core.
    windows.net; a generic fs.azure.account.key is ignored (ADVICE r04).
    The account comes from the abfss URL authority, falling back to
    AZURE_STORAGE_ACCOUNT for short authorities."""
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT_KEY", "zk")
    monkeypatch.delenv("AZURE_STORAGE_ACCOUNT", raising=False)
    conf = OS.object_store_hadoop_conf("abfss://c@myacct.dfs.core.windows.net/p")
    assert conf == {"fs.azure.account.key.myacct.dfs.core.windows.net": "zk"}
    # short authority + env account
    monkeypatch.setenv("AZURE_STORAGE_ACCOUNT", "envacct")
    conf = OS.object_store_hadoop_conf("abfss://container@envhost/p")
    assert conf == {"fs.azure.account.key.envacct.dfs.core.windows.net": "zk"}
    # underivable account must fail loudly, not emit a dead generic key
    monkeypatch.delenv("AZURE_STORAGE_ACCOUNT")
    with pytest.raises(ValueError, match="storage account"):
        OS.object_store_hadoop_conf("abfss://container@envhost/p")


def test_uri_normalization_only_touches_path_param(tmp_path):
    """accepts_file_uris must normalize ONLY the table-location parameter —
    URI-shaped DATA values (bounds, column cells) pass through untouched
    (ADVICE r04: prune_files_by_stats(path, 'url', 'http://a', 'http://z')
    raised, and 'file:///x' bounds were silently rewritten)."""
    from lakehouse_loader_spark.sinks.delta import prune_files_by_stats
    from lakehouse_loader_spark.sinks.staging import accepts_file_uris

    # a URL-typed bound must not raise or be rewritten
    with pytest.raises(FileNotFoundError):
        # table path resolves (file:// normalized); bounds stay verbatim
        prune_files_by_stats(
            f"file://{tmp_path}/absent", "url", "http://a", "http://z"
        )

    seen = {}

    @accepts_file_uris
    def probe(path: str, lo, hi):
        seen.update(path=path, lo=lo, hi=hi)

    probe(f"file://{tmp_path}/t", "file:///keep-me", "s3://also-keep")
    assert seen == {
        "path": f"{tmp_path}/t",
        "lo": "file:///keep-me",
        "hi": "s3://also-keep",
    }


def test_local_paths_get_no_conf():
    assert OS.object_store_hadoop_conf("/tmp/t") == {}
    assert OS.object_store_hadoop_conf("file:///tmp/t") == {}


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError, match="scheme"):
        OS.object_store_hadoop_conf("ftp://host/t")


def test_apply_to_session_sets_hadoop_conf(spark, monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ak2")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk2")
    applied = OS.apply_object_store_conf(spark, "s3a://bucket/t")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v
    assert OS.apply_object_store_conf(spark, "/tmp/t") == {}
