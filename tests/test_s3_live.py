"""EXECUTED object-store proof (SURVEY §2 R8/R10) — no SDK, no connector
jar, no docker: a loopback stdlib S3 server (tests/s3_server.py) with
independent SigV4 re-derivation, driven by the pure-stdlib client
(sinks/s3http.py).  The reference's multipart policy (≥5 MiB parts,
upload concurrency 2, delta_destination.rs:43-46) and conditional-PUT
commit are exercised over a real HTTP wire, not just assembled as conf.
"""

from __future__ import annotations

import threading

import pytest

from lakehouse_loader_spark.sinks import s3http as S3
from lakehouse_loader_spark.sinks.object_store import (
    PARTITION_FILE_MIN_PART_SIZE,
    PARTITION_FILE_UPLOAD_MAX_CONCURRENCY,
)
from tests.s3_server import make_server

MIB = 1024 * 1024


@pytest.fixture(scope="module")
def s3env():
    srv, state, endpoint = make_server()
    client = S3.S3Client(endpoint, "AKTEST", "sk-test")
    yield client, state
    srv.shutdown()


def _payload(n: int) -> bytes:
    # deterministic non-repeating bytes so reassembly order errors show
    return bytes((i * 31 + (i >> 8) * 7) % 256 for i in range(n))


def test_put_get_roundtrip_and_sigv4_enforced(s3env):
    client, state = s3env
    data = _payload(10_000)
    etag = client.put_object("bkt", "dir/a.parquet", data)
    assert etag.strip('"')
    assert client.get_object("bkt", "dir/a.parquet") == data
    assert client.list_keys("bkt", prefix="dir/") == ["dir/a.parquet"]
    # a client with the wrong secret must be rejected by the server's
    # independent signature re-derivation
    bad = S3.S3Client(f"http://127.0.0.1:{client.port}", "AKTEST", "WRONG")
    with pytest.raises(S3.S3Error) as ei:
        bad.put_object("bkt", "x", b"payload")
    assert ei.value.status == 403
    # tampered payload (sha mismatch) is also rejected — replay protection
    assert ("bkt", "x") not in state.objects


def test_small_file_single_put_large_file_multipart(s3env):
    client, state = s3env
    small = _payload(3 * MIB)
    res = client.upload("bkt", "small.bin", small)
    assert res == {"parts": 1, "multipart": False}
    assert client.get_object("bkt", "small.bin") == small

    big = _payload(12 * MIB)  # → 5 MiB + 5 MiB + 2 MiB
    state.max_active_parts = 0
    res = client.upload("bkt", "big.bin", big)
    assert res == {"parts": 3, "multipart": True}
    assert client.get_object("bkt", "big.bin") == big
    # the reference's policy, observed on the wire: bounded concurrency
    assert 1 <= state.max_active_parts <= PARTITION_FILE_UPLOAD_MAX_CONCURRENCY
    assert state.part_puts >= 3


def test_server_enforces_entity_too_small(s3env):
    """The server implements S3's REAL minimum-part rule, so a client that
    sliced parts below 5 MiB could not complete — proving the policy is
    load-bearing, not decorative."""
    client, _state = s3env
    uid = client.create_multipart("bkt", "tiny-parts.bin")
    e1 = client.upload_part("bkt", "tiny-parts.bin", uid, 1, b"x" * 1024)
    e2 = client.upload_part("bkt", "tiny-parts.bin", uid, 2, b"y" * 1024)
    with pytest.raises(S3.S3Error) as ei:
        client.complete_multipart("bkt", "tiny-parts.bin", uid, [(1, e1.strip('"')), (2, e2.strip('"'))])
    assert ei.value.code == "EntityTooSmall"
    client.abort_multipart("bkt", "tiny-parts.bin", uid)
    with pytest.raises(S3.S3Error):
        client.get_object("bkt", "tiny-parts.bin")


def test_client_part_size_floor():
    c = S3.S3Client("http://127.0.0.1:1", "a", "b")
    with pytest.raises(ValueError, match="minimum"):
        c.upload("b", "k", b"x", part_size=1024)
    assert PARTITION_FILE_MIN_PART_SIZE == 5 * MIB


def test_failed_upload_aborts_no_orphan_parts(s3env):
    client, state = s3env

    class Boom(S3.S3Client):
        def upload_part(self, *a, **k):
            raise RuntimeError("network died")

    boom = Boom(f"http://127.0.0.1:{client.port}", "AKTEST", "sk-test")
    with pytest.raises(RuntimeError):
        boom.upload("bkt", "doomed.bin", _payload(11 * MIB))
    assert not state.uploads  # aborted server-side, nothing orphaned
    with pytest.raises(S3.S3Error):
        client.get_object("bkt", "doomed.bin")


def test_conditional_put_commit_exactly_one_winner(s3env):
    """The sinks' optimistic-commit primitive over the wire: N racing
    writers conditional-PUT the same log version; exactly one wins, the
    rest observe PreconditionFailed (the signal to re-read and retry)."""
    client, _state = s3env
    lock = S3.S3CommitLock(client, "tbl", "_delta_log")
    results: list[str] = []
    barrier = threading.Barrier(4)

    def racer(i: int) -> None:
        barrier.wait()
        try:
            lock.commit(7, f"writer-{i}".encode())
            results.append(f"win-{i}")
        except S3.S3PreconditionFailed:
            results.append(f"lose-{i}")

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wins = [r for r in results if r.startswith("win")]
    assert len(wins) == 1 and len(results) == 4
    winner = int(wins[0].split("-")[1])
    assert lock.read(7) == f"writer-{winner}".encode()
    # a later version is independent
    lock.commit(8, b"next")
    assert lock.read(8) == b"next"


def test_parquet_part_file_through_s3(s3env, spark, tmpdir):
    """End-to-end shape: a real Spark-written parquet part uploads through
    the multipart path and reads back byte-identical — the partition-file
    upload the reference does (delta_destination.rs:232-390)."""
    import glob
    import os

    client, _state = s3env
    df = spark.range(0, 200_000).selectExpr("id", "id * 2 as v")
    out = os.path.join(str(tmpdir), "p")
    df.coalesce(1).write.parquet(out)
    part = glob.glob(os.path.join(out, "*.parquet"))[0]
    with open(part, "rb") as fh:
        raw = fh.read()
    client.upload("bkt", "tables/t/part-0.parquet", raw)
    assert client.get_object("bkt", "tables/t/part-0.parquet") == raw


# ---------------------------------------------------------------------------
# GCS mode (R10): the same loopback server re-derives GCS's XML-API V4
# variant (GOOG4-HMAC-SHA256, <date>/auto/storage/goog4_request scope,
# x-goog-* headers) — turning the GOOGLE_* pickup from asserted conf into
# an executed wire path.  Path-style URLs, exactly the
# storage.googleapis.com/<bucket>/<key> interop layout.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gcsenv(monkeypatch_module):
    srv, state, endpoint = make_server(access_key="GOOGTEST", secret_key="gk-test")
    monkeypatch_module.setenv("GOOGLE_HMAC_KEY_ID", "GOOGTEST")
    monkeypatch_module.setenv("GOOGLE_HMAC_SECRET", "gk-test")
    client = S3.GcsXmlClient.from_env(endpoint)
    yield client, state
    srv.shutdown()


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


class TestGcsMode:
    def test_env_pickup_and_roundtrip_goog4_verified(self, gcsenv):
        client, state = gcsenv
        assert client.region == "auto" and client.SIG_SERVICE == "storage"
        data = _payload(10_000)
        client.put_object("bkt", "dir/a.parquet", data)
        assert client.get_object("bkt", "dir/a.parquet") == data
        assert client.list_keys("bkt", prefix="dir/") == ["dir/a.parquet"]
        # the server ACCEPTED GOOG4 signatures (re-derived independently,
        # goog4_request terminator enforced) — not silently AWS4
        assert state.algorithms_seen == {"GOOG4-HMAC-SHA256"}

    def test_wrong_secret_rejected(self, gcsenv):
        client, state = gcsenv
        bad = S3.GcsXmlClient(f"http://127.0.0.1:{client.port}", "GOOGTEST", "WRONG")
        with pytest.raises(S3.S3Error) as ei:
            bad.put_object("bkt", "x", b"payload")
        assert ei.value.status == 403
        assert ("bkt", "x") not in state.objects

    def test_cross_algorithm_terminator_enforced(self, gcsenv):
        """An AWS4-scoped request signed with the GCS key chain must fail:
        the server pins the terminator to the algorithm (no mix-and-match
        downgrade)."""
        client, _state = gcsenv

        class Franken(S3.GcsXmlClient):
            SIG_TERMINATOR = "aws4_request"  # wrong for GOOG4

        f = Franken(f"http://127.0.0.1:{client.port}", "GOOGTEST", "gk-test")
        with pytest.raises(S3.S3Error) as ei:
            f.put_object("bkt", "y", b"p")
        assert ei.value.status == 403

    def test_multipart_policy_over_gcs(self, gcsenv):
        """The reference's multipart sizing (>=5 MiB parts, concurrency 2)
        rides unchanged over the GCS profile — XML-API multipart uploads
        are S3-wire-compatible."""
        client, state = gcsenv
        big = _payload(11 * MIB)
        res = client.upload("bkt", "big.bin", big)
        assert res == {"parts": 3, "multipart": True}
        assert client.get_object("bkt", "big.bin") == big
        assert state.max_active_parts <= PARTITION_FILE_UPLOAD_MAX_CONCURRENCY

    def test_conditional_put_over_gcs(self, gcsenv):
        """GCS supports if-none-match conditional creates on the XML API —
        the table-format commit primitive works identically."""
        client, _state = gcsenv
        lock = S3.S3CommitLock(client, "tbl", "_delta_log")
        lock.commit(1, b"first")
        with pytest.raises(S3.S3PreconditionFailed):
            lock.commit(1, b"second")
        assert lock.read(1) == b"first"
