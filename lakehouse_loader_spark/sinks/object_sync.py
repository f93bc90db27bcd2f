"""Table → object-store synchronization over the executed wire clients —
the engine-level twin of the reference's main upload flow
(record_batches_to_object_store + Delta log commit,
delta_destination.rs:70-160, :434-441): data files stream up under the
multipart policy (≥5 MiB parts, bounded concurrency), then the table's
COMMIT FILES land via conditional create IN VERSION ORDER, so a reader
listing the remote log never observes version N+1 before N and two
concurrent pushes of the same version resolve to exactly one winner.

Client-agnostic: any of the three executed clients (s3http.S3Client,
s3http.GcsXmlClient, azureblob.AzureBlobClient) satisfies the duck type
(``upload_file`` / ``put_object(if_none_match=)`` / ``get_object`` /
``list_keys`` / ``list_objects`` — the last returning complete paginated
``(key, size)`` pairs; sizes drive the payload-repair check in
``sync_table``).

Scale posture: this is the reference-parity SINGLE-NODE path (the
reference is a single-process loader; it buffers temp partition files
and uploads them whole).  On a cluster the same tables are written
directly to the store by executors through the Hadoop connectors
(object_store.apply_object_store_conf); this module is the loader /
sync / disaster-recovery shape, and its memory stays bounded at
concurrency × part size because uploads stream from disk.

Sync is INCREMENTAL and idempotent: immutable objects (data files,
manifests, checkpoints) already present remotely are skipped by key —
re-pushing a table after an append uploads only the new files plus the
new commits; a diverged remote commit (same version, different bytes)
fails loudly instead of being silently overwritten.
"""

from __future__ import annotations

import os

from lakehouse_loader_spark.sinks.azureblob import (
    BlobAlreadyExists as _BlobAlreadyExists,
)
from lakehouse_loader_spark.sinks.s3http import (
    S3PreconditionFailed as _S3PreconditionFailed,
)


class RemoteLogDiverged(Exception):
    """The remote table has a DIFFERENT commit at a version we hold —
    the local and remote histories forked; refuse to mix them."""


def _is_commit_file(rel: str) -> bool:
    """Files that define log ORDER and must go up sequentially via
    conditional create: Delta ``_delta_log/<v>.json`` and Iceberg
    ``metadata/v<v>.metadata.json``."""
    parts = rel.split("/")
    if len(parts) == 2 and parts[0] == "_delta_log" and parts[1].endswith(".json"):
        stem = parts[1][: -len(".json")]
        return stem.isdigit()
    if (
        len(parts) == 2
        and parts[0] == "metadata"
        and parts[1].endswith(".metadata.json")
        and parts[1].startswith("v")
    ):
        return parts[1][1:].split(".")[0].isdigit()
    return False


def _is_hint_file(rel: str) -> bool:
    """Mutable pointer files, uploaded LAST as plain puts (they may move
    backward only if a concurrent pusher raced, and both race losers
    already failed at the conditional commit step).  Matched by BASENAME:
    the Iceberg hint lives at ``metadata/version-hint.text`` — a
    root-only match would classify it as immutable payload and an
    incremental re-push would skip it, leaving the remote pointing at the
    OLD snapshot."""
    base = rel.split("/")[-1]
    return base == "version-hint.text" or base == "_last_checkpoint"


def _commit_version(rel: str) -> int:
    name = rel.split("/")[1]
    return int(name.split(".")[0].lstrip("v"))


def sync_table(table_path: str, store, bucket: str, prefix: str) -> dict:
    """Push the local Delta or Iceberg table at ``table_path`` to
    ``store`` under ``bucket/prefix``.  Three passes:

    1. immutable payload (data parquet, Avro manifests/manifest lists,
       delete files, checkpoints, CRCs): ``upload_file`` with the
       multipart policy, skipping keys already present remotely WITH a
       matching size (size mismatch → repair re-upload);
    2. commit files in ascending version order via conditional create —
       an existing remote commit is verified byte-identical (idempotent
       re-push) or :class:`RemoteLogDiverged` is raised;
    3. hint/pointer files as plain puts (always re-put: they are the
       MUTABLE part of the table — version-hint.text / _last_checkpoint
       move forward on every commit).

    Returns {"uploaded": n, "skipped": n, "commits": n, "repaired": n}.
    """
    table_path = os.path.abspath(table_path)
    if not os.path.isdir(table_path):
        raise FileNotFoundError(f"no table directory at {table_path}")
    prefix = prefix.strip("/")

    payload: list[str] = []
    commits: list[str] = []
    hints: list[str] = []
    for root, _dirs, files in os.walk(table_path):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), table_path).replace(
                os.sep, "/"
            )
            if rel.split("/")[0].startswith(".staging-"):
                continue
            if _is_commit_file(rel):
                commits.append(rel)
            elif _is_hint_file(rel):
                hints.append(rel)
            else:
                payload.append(rel)

    remote_sizes = dict(store.list_objects(bucket, prefix=f"{prefix}/"))
    uploaded = skipped = repaired = 0
    for rel in sorted(payload):
        key = f"{prefix}/{rel}"
        local = os.path.join(table_path, rel)
        if key in remote_sizes:
            # immutable keys are only skippable when the remote SIZE
            # matches — a truncated earlier push must be repaired, not
            # silently accepted forever (re-upload is safe: same content
            # under the same immutable key)
            if remote_sizes[key] == os.path.getsize(local):
                skipped += 1
                continue
            repaired += 1
        store.upload_file(bucket, key, local)
        uploaded += 1

    n_commits = 0
    for rel in sorted(commits, key=_commit_version):
        key = f"{prefix}/{rel}"
        with open(os.path.join(table_path, rel), "rb") as fh:
            data = fh.read()
        try:
            store.put_object(bucket, key, data, if_none_match=True)
            n_commits += 1
        except (_S3PreconditionFailed, _BlobAlreadyExists):
            remote = store.get_object(bucket, key)
            if remote != data:
                raise RemoteLogDiverged(
                    f"remote {key} differs from local commit "
                    f"(local {len(data)}B, remote {len(remote)}B); "
                    "the histories forked — refuse to mix"
                ) from None
            skipped += 1

    for rel in sorted(hints):
        key = f"{prefix}/{rel}"
        with open(os.path.join(table_path, rel), "rb") as fh:
            store.put_object(bucket, key, fh.read())
        uploaded += 1

    return {
        "uploaded": uploaded,
        "skipped": skipped,
        "commits": n_commits,
        "repaired": repaired,
    }


def fetch_table(store, bucket: str, prefix: str, dest: str) -> int:
    """Materialize a synced table back to a local directory (the restore
    half of the DR shape); returns the number of objects fetched.  Used
    by the tests to prove the round-trip reads back identical."""
    prefix = prefix.strip("/")
    keys = store.list_keys(bucket, prefix=f"{prefix}/")
    for key in keys:
        rel = key[len(prefix) + 1 :]
        target = os.path.join(dest, rel.replace("/", os.sep))
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "wb") as fh:
            fh.write(store.get_object(bucket, key))
    return len(keys)
