"""EXECUTED Azure Blob object-store proof (SURVEY §2 R8/R10) — the third
wire path beside S3 (test_s3_live.py) and GCS: a loopback stdlib Blob
service (tests/azure_server.py) with independent Shared Key
re-derivation, driven by the pure-stdlib client (sinks/azureblob.py).
The reference's multipart policy (≥5 MiB parts, upload concurrency 2)
maps onto Put Block / Put Block List, and the conditional-create commit
maps onto If-None-Match: * → 409 BlobAlreadyExists."""

from __future__ import annotations

import threading

import pytest

from lakehouse_loader_spark.sinks import azureblob as AZ
from lakehouse_loader_spark.sinks.object_store import (
    PARTITION_FILE_UPLOAD_MAX_CONCURRENCY,
)
from tests.azure_server import make_server

MIB = 1024 * 1024


@pytest.fixture(scope="module")
def azenv(monkeypatch_module):
    srv, state, endpoint = make_server(account="devacct")
    monkeypatch_module.setenv("AZURE_STORAGE_ACCOUNT", "devacct")
    monkeypatch_module.setenv("AZURE_STORAGE_ACCOUNT_KEY", state.key)
    client = AZ.AzureBlobClient.from_env(endpoint)
    yield client, state
    srv.shutdown()


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def _payload(n: int) -> bytes:
    return bytes((i * 31 + (i >> 8) * 7) % 256 for i in range(n))


def test_env_pickup_roundtrip_sharedkey_enforced(azenv):
    client, state = azenv
    data = _payload(10_000)
    client.put_blob("ctr", "dir/a.parquet", data)
    assert client.get_blob("ctr", "dir/a.parquet") == data
    assert client.list_blobs("ctr", prefix="dir/") == ["dir/a.parquet"]
    # wrong account key → the server's independent re-derivation rejects
    import base64
    import hashlib

    bad_key = base64.b64encode(hashlib.sha256(b"WRONG").digest()).decode()
    bad = AZ.AzureBlobClient(
        f"http://127.0.0.1:{client.port}", "devacct", bad_key
    )
    with pytest.raises(AZ.AzureError) as ei:
        bad.put_blob("ctr", "x", b"payload")
    assert ei.value.status == 403
    assert ("ctr", "x") not in state.blobs


def test_small_single_put_large_blocks(azenv):
    client, state = azenv
    small = _payload(3 * MIB)
    assert client.upload("ctr", "small.bin", small) == {
        "parts": 1,
        "multipart": False,
    }
    assert client.get_blob("ctr", "small.bin") == small
    big = _payload(11 * MIB)
    assert client.upload("ctr", "big.bin", big) == {"parts": 3, "multipart": True}
    assert client.get_blob("ctr", "big.bin") == big
    # committed block lists leave no staged blocks behind
    assert ("ctr", "big.bin") not in state.blocks


def test_block_list_order_defines_content(azenv):
    """Put Block List commits blocks IN LIST ORDER regardless of upload
    order — the reassembly contract the multipart path relies on."""
    client, _state = azenv
    import base64

    a, b = _payload(100), _payload(200)[::-1]
    ida = base64.b64encode(b"blk-a").decode()
    idb = base64.b64encode(b"blk-b").decode()
    client.put_block("ctr", "ordered.bin", idb, b)
    client.put_block("ctr", "ordered.bin", ida, a)
    client.put_block_list("ctr", "ordered.bin", [ida, idb])
    assert client.get_blob("ctr", "ordered.bin") == a + b


def test_conditional_create_exactly_one_winner(azenv):
    client, _state = azenv
    lock = AZ.AzureCommitLock(client, "tbl", "_delta_log")
    results: list[str] = []
    barrier = threading.Barrier(4)

    def racer(i: int) -> None:
        barrier.wait()
        try:
            lock.commit(7, f"writer-{i}".encode())
            results.append(f"win-{i}")
        except AZ.BlobAlreadyExists:
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
    lock.commit(8, b"next")
    assert lock.read(8) == b"next"


def test_delete_and_missing(azenv):
    client, _state = azenv
    client.put_blob("ctr", "gone.bin", b"x")
    client.delete_blob("ctr", "gone.bin")
    with pytest.raises(AZ.AzureError) as ei:
        client.get_blob("ctr", "gone.bin")
    assert ei.value.status == 404
    assert PARTITION_FILE_UPLOAD_MAX_CONCURRENCY == 2  # reference constant pinned


def test_sas_token_mode_roundtrip(azenv):
    """Query-param account-SAS auth (no Authorization header, key never in
    the client): mint with the key holder's generate_account_sas, drive
    put/get/list/delete through the SAS-credentialed client, server
    re-derives the SAS signature independently."""
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"
    sas = AZ.generate_account_sas("devacct", state.key, permissions="rwdlc")
    client = AZ.AzureBlobClient(ep, "devacct", sas_token=sas)
    assert client.key is None  # the account key never enters SAS mode

    client.put_object("sasctr", "a/b.txt", b"hello-sas")
    assert client.get_object("sasctr", "a/b.txt") == b"hello-sas"
    assert client.list_objects("sasctr", prefix="a/") == [("a/b.txt", 9)]
    client.delete_blob("sasctr", "a/b.txt")
    with pytest.raises(AZ.AzureError):
        client.get_object("sasctr", "a/b.txt")


def test_sas_permissions_and_expiry_enforced(azenv):
    """The loopback rejects: a read-only SAS attempting PUT, an expired
    SAS, and a forged signature — all 403 AuthenticationFailed."""
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"

    read_only = AZ.AzureBlobClient(
        ep, "devacct", sas_token=AZ.generate_account_sas(
            "devacct", state.key, permissions="rl")
    )
    keyed.put_object("sasctr2", "x.txt", b"payload")
    assert read_only.get_object("sasctr2", "x.txt") == b"payload"
    with pytest.raises(AZ.AzureError) as ei:
        read_only.put_object("sasctr2", "y.txt", b"nope")
    assert ei.value.status == 403

    expired = AZ.AzureBlobClient(
        ep, "devacct", sas_token=AZ.generate_account_sas(
            "devacct", state.key, expiry="2000-01-01T00:00:00Z")
    )
    with pytest.raises(AZ.AzureError) as ei:
        expired.get_object("sasctr2", "x.txt")
    assert ei.value.status == 403

    forged = AZ.AzureBlobClient(
        ep, "devacct", sas_token=AZ.generate_account_sas(
            "devacct", state.key.swapcase(), permissions="rwdlc")
    )
    with pytest.raises(AZ.AzureError) as ei:
        forged.get_object("sasctr2", "x.txt")
    assert ei.value.status == 403


def test_sas_from_env_wins_over_key(monkeypatch_module, azenv):
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"
    from urllib.parse import urlencode

    token = urlencode(AZ.generate_account_sas("devacct", state.key))
    monkeypatch_module.setenv("AZURE_STORAGE_SAS_TOKEN", token)
    try:
        client = AZ.AzureBlobClient.from_env(ep)
        assert client.sas is not None and client.key is None
        client.put_object("sasctr3", "env.txt", b"via-env-sas")
        assert client.get_object("sasctr3", "env.txt") == b"via-env-sas"
    finally:
        monkeypatch_module.delenv("AZURE_STORAGE_SAS_TOKEN", raising=False)


def test_user_delegation_sas_end_to_end(azenv):
    """AAD-backed user-delegation SAS, the mode orgs that forbid account
    keys mandate (VERDICT r12 missing #2), executed over the wire with
    NO storage key anywhere in the data path: client-credentials token
    grant -> user delegation key exchange -> delegation-key-signed
    service SAS -> blob ops, each leg independently verified loopback
    (token/secret check, bearer check, 24-field string-to-sign
    re-derivation under the minted key)."""
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"

    # 1. AAD client-credentials grant (loopback authority on the server)
    token = AZ.aad_client_credentials_token(
        f"{ep}/__aad", state.aad_tenant, state.aad_client_id,
        state.aad_client_secret,
    )
    with pytest.raises(AZ.AzureError, match="401"):
        AZ.aad_client_credentials_token(
            f"{ep}/__aad", state.aad_tenant, state.aad_client_id, "wrong"
        )

    # 2. exchange the bearer for a user delegation key
    udk = AZ.request_user_delegation_key(ep, token)
    assert udk["signed_service"] == "b" and udk["value"]
    with pytest.raises(AZ.AzureError, match="403"):
        AZ.request_user_delegation_key(ep, "forged-bearer")

    # 3. container-scoped SAS signed with the delegation key
    sas = AZ.generate_user_delegation_sas(
        "devacct", "udctr", udk, permissions="racwdl"
    )
    client = AZ.AzureBlobClient(ep, "devacct", sas_token=sas)
    assert client.key is None
    client.put_object("udctr", "d/a.txt", b"hello-udk")
    assert client.get_object("udctr", "d/a.txt") == b"hello-udk"
    assert client.list_objects("udctr", prefix="d/") == [("d/a.txt", 9)]
    client.delete_blob("udctr", "d/a.txt")

    # container scoping: the SAS is for udctr — another container fails
    # the signature (canonicalized resource differs)
    keyed.put_object("otherctr", "x.txt", b"x")
    with pytest.raises(AZ.AzureError) as ei:
        client.get_object("otherctr", "x.txt")
    assert ei.value.status == 403

    # permission enforcement: read-only delegation SAS refuses PUT
    ro = AZ.AzureBlobClient(
        ep, "devacct",
        sas_token=AZ.generate_user_delegation_sas(
            "devacct", "udctr", udk, permissions="rl"),
    )
    keyed.put_object("udctr", "ro.txt", b"payload")
    assert ro.get_object("udctr", "ro.txt") == b"payload"
    with pytest.raises(AZ.AzureError) as ei:
        ro.put_object("udctr", "nope.txt", b"x")
    assert ei.value.status == 403

    # expired SAS refuses even with a valid signature
    import datetime as _dt

    past = (
        _dt.datetime.now(_dt.timezone.utc) - _dt.timedelta(seconds=5)
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    stale = AZ.AzureBlobClient(
        ep, "devacct",
        sas_token=AZ.generate_user_delegation_sas(
            "devacct", "udctr", udk, permissions="racwdl", expiry=past),
    )
    with pytest.raises(AZ.AzureError) as ei:
        stale.get_object("udctr", "ro.txt")
    assert ei.value.status == 403

    # a forged delegation-key value signs a SAS the server rejects
    fake = dict(udk, value=AZ.base64.b64encode(b"\x00" * 32).decode())
    forged = AZ.AzureBlobClient(
        ep, "devacct",
        sas_token=AZ.generate_user_delegation_sas(
            "devacct", "udctr", fake, permissions="racwdl"),
    )
    with pytest.raises(AZ.AzureError) as ei:
        forged.get_object("udctr", "ro.txt")
    assert ei.value.status == 403


def test_user_delegation_sas_blob_scoped(azenv):
    """sr=b scopes the SAS to ONE blob: that blob round-trips, a sibling
    in the same container fails the canonicalized-resource signature."""
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"
    token = AZ.aad_client_credentials_token(
        f"{ep}/__aad", state.aad_tenant, state.aad_client_id,
        state.aad_client_secret,
    )
    udk = AZ.request_user_delegation_key(ep, token)
    sas = AZ.generate_user_delegation_sas(
        "devacct", "bscope", udk, permissions="rcw", blob="one.txt"
    )
    client = AZ.AzureBlobClient(ep, "devacct", sas_token=sas)
    client.put_object("bscope", "one.txt", b"only-me")
    assert client.get_object("bscope", "one.txt") == b"only-me"
    keyed.put_object("bscope", "two.txt", b"sibling")
    with pytest.raises(AZ.AzureError) as ei:
        client.get_object("bscope", "two.txt")
    assert ei.value.status == 403


def test_user_delegation_sas_directory_scoped(azenv):
    """sr=d + sdd (the HNS/ADLS-Gen2 directory scope): blobs strictly
    under the signed directory round-trip; a sibling directory, a blob AT
    the directory's own depth, and a tampered sdd all fail the
    independently re-derived signature/scope checks."""
    keyed, state = azenv
    ep = f"http://{keyed.host}:{keyed.port}"
    token = AZ.aad_client_credentials_token(
        f"{ep}/__aad", state.aad_tenant, state.aad_client_id,
        state.aad_client_secret,
    )
    udk = AZ.request_user_delegation_key(ep, token)
    sas = AZ.generate_user_delegation_sas(
        "devacct", "dscope", udk, permissions="rcw", directory="logs/2024"
    )
    assert ("sdd", "2") in sas and ("sr", "d") in sas
    client = AZ.AzureBlobClient(ep, "devacct", sas_token=sas)
    client.put_object("dscope", "logs/2024/a/x.txt", b"deep")
    assert client.get_object("dscope", "logs/2024/a/x.txt") == b"deep"
    client.put_object("dscope", "logs/2024/y.txt", b"direct-child")
    # sibling directory: prefix rebuilt at depth 2 differs -> HMAC fails
    keyed.put_object("dscope", "logs/2025/z.txt", b"sibling")
    with pytest.raises(AZ.AzureError) as ei:
        client.get_object("dscope", "logs/2025/z.txt")
    assert ei.value.status == 403
    # a blob AT the directory depth (not strictly below) is out of scope
    keyed.put_object("dscope", "logs/2024", b"at-depth")
    with pytest.raises(AZ.AzureError):
        client.get_object("dscope", "logs/2024")
    # tampered sdd: the rebuilt prefix changes, so the signature fails
    shallow = [("sdd", "1") if k == "sdd" else (k, v) for k, v in sas]
    bad = AZ.AzureBlobClient(ep, "devacct", sas_token=shallow)
    with pytest.raises(AZ.AzureError):
        bad.get_object("dscope", "logs/2024/y.txt")
    # blob + directory together is a caller error
    with pytest.raises(ValueError):
        AZ.generate_user_delegation_sas(
            "devacct", "dscope", udk, blob="b", directory="d"
        )
