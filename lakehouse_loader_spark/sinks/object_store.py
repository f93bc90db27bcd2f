"""Object-store configuration assembly (R8/R10).

The reference's CompatObjectStore resolves cloud credentials from the
environment keyed by the table URL's scheme and uploads partition files as
multipart PUTs (src/delta_destination.rs:232-390; env pickup
``object_store_keys_from_env`` :244-250; multipart constants :43-46 —
min part size 5 MiB, upload concurrency 2).

Spark's analog is the Hadoop filesystem layer: the same decisions are
expressed as ``fs.<scheme>.*`` configuration, applied to the session before
the write.  This module assembles that configuration the same way the
reference does — scheme-keyed pickup of ``AWS_*`` / ``GOOGLE_*`` /
``AZURE_*`` environment variables plus the reference's multipart sizing —
as a pure dict so it is unit-testable without any cloud.  No connector jars
ship in this container, so ``apply_object_store_conf`` is the only
side-effecting step and is a no-op for bare/``file://`` paths.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession

# Reference constants (delta_destination.rs:43-46)
PARTITION_FILE_MIN_PART_SIZE = 5 * 1024 * 1024  # ≥5 MiB multipart parts
PARTITION_FILE_UPLOAD_MAX_CONCURRENCY = 2

_SCHEME_ALIASES = {
    "s3": "s3a",  # Hadoop's maintained S3 connector
    "s3a": "s3a",
    "gs": "gs",
    "az": "abfss",
    "adl": "abfss",
    "azure": "abfss",
    "abfs": "abfss",
    "abfss": "abfss",
}


def url_scheme(url: str) -> str | None:
    """Scheme of ``url`` if it is a URI, else None (bare path)."""
    parsed = urlparse(url)
    return parsed.scheme if "://" in url else None


def object_store_env(scheme: str) -> dict[str, str]:
    """Scheme-keyed environment pickup, mirroring the reference's
    object_store_keys_from_env (delta_destination.rs:244-250): S3 reads
    ``AWS_*``, GCS reads ``GOOGLE_*``, Azure reads ``AZURE_*``; anything
    else gets nothing.  Keys are lowercased like the reference does."""
    prefixes = {
        "s3": "AWS_",
        "s3a": "AWS_",
        "gs": "GOOGLE_",
        "az": "AZURE_",
        "adl": "AZURE_",
        "azure": "AZURE_",
        "abfs": "AZURE_",
        "abfss": "AZURE_",
    }
    prefix = prefixes.get(scheme)
    if prefix is None:
        return {}
    return {
        k.lower(): v for k, v in os.environ.items() if k.startswith(prefix)
    }


def object_store_hadoop_conf(url: str) -> dict[str, str]:
    """Hadoop configuration for writing to ``url``'s object store: the
    reference's credential pickup and multipart upload policy re-expressed
    as ``fs.*`` settings.  Empty for local/bare paths."""
    scheme = url_scheme(url)
    if scheme is None or scheme == "file":
        return {}
    if scheme not in _SCHEME_ALIASES:
        raise ValueError(f"unsupported object-store scheme {scheme!r} in {url!r}")
    hadoop_scheme = _SCHEME_ALIASES[scheme]
    env = object_store_env(scheme)
    conf: dict[str, str] = {}
    if hadoop_scheme == "s3a":
        # multipart policy (delta_destination.rs:43-46): ≥5 MiB parts,
        # bounded upload concurrency
        conf["fs.s3a.multipart.size"] = str(PARTITION_FILE_MIN_PART_SIZE)
        conf["fs.s3a.fast.upload.active.blocks"] = str(
            PARTITION_FILE_UPLOAD_MAX_CONCURRENCY
        )
        if "aws_access_key_id" in env:
            conf["fs.s3a.access.key"] = env["aws_access_key_id"]
        if "aws_secret_access_key" in env:
            conf["fs.s3a.secret.key"] = env["aws_secret_access_key"]
        if "aws_session_token" in env:
            conf["fs.s3a.session.token"] = env["aws_session_token"]
        if "aws_endpoint_url" in env:
            conf["fs.s3a.endpoint"] = env["aws_endpoint_url"]
        if "aws_region" in env:
            conf["fs.s3a.endpoint.region"] = env["aws_region"]
    elif hadoop_scheme == "gs":
        if "google_application_credentials" in env:
            conf["fs.gs.auth.service.account.json.keyfile"] = env[
                "google_application_credentials"
            ]
    elif hadoop_scheme == "abfss":
        if "azure_storage_account_key" in env:
            # The ABFS driver only reads the ACCOUNT-QUALIFIED key
            # (fs.azure.account.key.<account>.dfs.core.windows.net) — a
            # generic fs.azure.account.key is ignored and would never
            # authenticate.  The account comes from the abfss URL authority
            # (abfss://container@account.dfs.core.windows.net/...), or from
            # AZURE_STORAGE_ACCOUNT when the URL uses a short authority.
            host = urlparse(url).hostname or ""
            account = None
            if host.endswith(".dfs.core.windows.net"):
                account = host[: -len(".dfs.core.windows.net")]
                # authority may be container@account.dfs.core.windows.net;
                # urlparse puts the container@ part in username, so hostname
                # is already just account.dfs.core.windows.net
            elif "azure_storage_account" in env:
                account = env["azure_storage_account"]
            if account:
                conf[f"fs.azure.account.key.{account}.dfs.core.windows.net"] = env[
                    "azure_storage_account_key"
                ]
            else:
                raise ValueError(
                    "cannot derive the storage account for the ABFS key: "
                    f"url {url!r} has no *.dfs.core.windows.net authority and "
                    "AZURE_STORAGE_ACCOUNT is unset"
                )
    return conf


def apply_object_store_conf(spark: SparkSession, url: str) -> dict[str, str]:
    """Apply ``object_store_hadoop_conf(url)`` to the session's Hadoop
    configuration; returns what was applied (empty for local paths).
    Executing a write additionally needs the connector jar
    (hadoop-aws / gcs-connector / hadoop-azure) on the classpath — none
    ships in this container, so cloud writes stay untestable here, but the
    configuration contract is pinned by tests."""
    conf = object_store_hadoop_conf(url)
    if conf:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in conf.items():
            hconf.set(k, v)
    return conf
