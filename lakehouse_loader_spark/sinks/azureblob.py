"""Pure-stdlib Azure Blob Storage REST client — the third executed
object-store wire path (SURVEY §2 R8/R10; S3: s3http.S3Client, GCS:
s3http.GcsXmlClient).

Everything here derives from public specifications: Shared Key
authorization (StringToSign = VERB + standard headers + canonicalized
x-ms-* headers + canonicalized resource, HMAC-SHA256 with the
base64-decoded account key;
learn.microsoft.com/rest/api/storageservices/authorize-with-shared-key)
and the Blob service REST API (Put Blob, Get Blob, Put Block / Put Block
List — the multipart analog — List Blobs, Delete Blob;
learn.microsoft.com/rest/api/storageservices/blob-service-rest-api).

The reference's object_store crate speaks Azure natively
(delta_destination.rs:232-390, env pickup :244-250); this client turns
the repo's AZURE_* conf mapping (object_store.py) into an executed path
with the same two policies the S3/GCS clients carry:

* :meth:`AzureBlobClient.upload` stages ≥5 MiB blocks (Put Block) with
  at most PARTITION_FILE_UPLOAD_MAX_CONCURRENCY in flight and commits
  them in order with Put Block List — uncommitted blocks of an
  abandoned upload are garbage-collected by the service (no explicit
  abort call exists or is needed, unlike S3).
* :meth:`AzureBlobClient.put_blob` with ``if_none_match=True`` sends
  ``If-None-Match: *``; the service answers 409 BlobAlreadyExists to
  the loser — mapped to :class:`BlobAlreadyExists` (the conditional-PUT
  commit primitive, same contract as s3http.S3PreconditionFailed).

Tests provision a loopback server (tests/azure_server.py) that
re-derives the Shared Key signature from the raw request independently.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import http.client
from concurrent.futures import ThreadPoolExecutor
from urllib.parse import quote, urlparse
from xml.etree import ElementTree

from lakehouse_loader_spark.sinks.object_store import (
    PARTITION_FILE_MIN_PART_SIZE,
    PARTITION_FILE_UPLOAD_MAX_CONCURRENCY,
)


class AzureError(Exception):
    def __init__(self, status: int, code: str, message: str = ""):
        super().__init__(f"Azure error {status} {code}: {message}")
        self.status = status
        self.code = code


class BlobAlreadyExists(AzureError):
    """Conditional create lost the race: the blob already exists."""


# the standard headers of the Shared Key StringToSign, in spec order
# (Content-Length is "" when zero, per the 2015-02-21+ service versions)
_STD_HEADERS = [
    "content-encoding",
    "content-language",
    "content-length",
    "content-md5",
    "content-type",
    "date",
    "if-modified-since",
    "if-match",
    "if-none-match",
    "if-unmodified-since",
    "range",
]


_LOOPBACK_HOSTS = {"127.0.0.1", "::1", "localhost"}


def _open_credential_connection(url: str):
    """Connection for an endpoint that will carry a BEARER SECRET in the
    request body/headers (client_secret, bearer token): https connects
    anywhere (real AAD/storage endpoints); plain http is pinned to
    loopback hosts — the 'loopback test servers' rationale must be
    enforced, not assumed, or the secret travels cleartext to whatever
    host the URL names (ADVICE r13).  Returns (conn, parsed_url)."""
    u = urlparse(url.rstrip("/"))
    if u.scheme == "https":
        return http.client.HTTPSConnection(u.hostname, u.port or 443, timeout=30), u
    if u.scheme == "http":
        if u.hostname not in _LOOPBACK_HOSTS:
            raise ValueError(
                f"refusing to send credentials over plain http to "
                f"{u.hostname!r}: http endpoints are for loopback test "
                "servers only (127.0.0.1/localhost); use https for real "
                "AAD/storage endpoints"
            )
        return http.client.HTTPConnection(u.hostname, u.port or 80, timeout=30), u
    raise ValueError(f"unsupported endpoint scheme {u.scheme!r} (http/https)")


def shared_key_string_to_sign(
    method: str,
    account: str,
    path: str,
    query: list[tuple[str, str]],
    headers: dict[str, str],
) -> str:
    """The published Shared Key canonicalization (shared with the test
    server, which re-derives the signature from the RAW request)."""
    lower = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    std = []
    for h in _STD_HEADERS:
        v = lower.get(h, "")
        if h == "content-length" and v == "0":
            v = ""
        std.append(v)
    xms = "".join(
        f"{k}:{lower[k]}\n" for k in sorted(lower) if k.startswith("x-ms-")
    )
    # CanonicalizedResource: /account/path + sorted query as name:value
    res = f"/{account}{path}"
    for k, v in sorted(query):
        res += f"\n{k.lower()}:{v}"
    return "\n".join([method] + std) + "\n" + xms + res


def sign_shared_key(key_b64: str, string_to_sign: str) -> str:
    return base64.b64encode(
        hmac.new(
            base64.b64decode(key_b64), string_to_sign.encode(), hashlib.sha256
        ).digest()
    ).decode()


SAS_VERSION = "2021-08-06"


def account_sas_string_to_sign(
    account: str,
    permissions: str,
    start: str,
    expiry: str,
    version: str = SAS_VERSION,
    services: str = "b",
    resource_types: str = "sco",
    ip: str = "",
    protocol: str = "https,http",
    encryption_scope: str = "",
) -> str:
    """Account SAS canonicalization (learn.microsoft.com/rest/api/
    storageservices/create-account-sas, version 2020-12-06+): ten
    newline-joined fields with a trailing newline, HMAC-SHA256 under the
    base64-decoded account key.  Shared with the loopback server, which
    re-derives the signature independently from the SAS query params."""
    return (
        "\n".join(
            [
                account,
                permissions,
                services,
                resource_types,
                start,
                expiry,
                ip,
                protocol,
                version,
                encryption_scope,
            ]
        )
        + "\n"
    )


def generate_account_sas(
    account: str,
    key_b64: str,
    permissions: str = "rwdlc",
    expiry: str | None = None,
    start: str = "",
    services: str = "b",
    resource_types: str = "sco",
    lifetime_s: int = 3600,
) -> list[tuple[str, str]]:
    """Mint an account-SAS query-parameter set: sv/ss/srt/sp/(st)/se/spr/
    sig.  Real deployments often forbid account keys on clients; the key
    holder mints a SAS out of band and hands only these params over —
    the client then authenticates by QUERY STRING, never seeing the key."""
    if expiry is None:
        exp = _dt.datetime.now(_dt.timezone.utc) + _dt.timedelta(seconds=lifetime_s)
        expiry = exp.strftime("%Y-%m-%dT%H:%M:%SZ")
    sts = account_sas_string_to_sign(
        account, permissions, start, expiry,
        services=services, resource_types=resource_types,
    )
    params = [
        ("sv", SAS_VERSION),
        ("ss", services),
        ("srt", resource_types),
        ("sp", permissions),
        ("se", expiry),
        ("spr", "https,http"),
        ("sig", sign_shared_key(key_b64, sts)),
    ]
    if start:
        params.insert(4, ("st", start))
    return params


# -- user-delegation SAS (AAD-backed) ---------------------------------------
# The mode many orgs mandate (VERDICT r12 missing #2): no storage account
# key anywhere — an AAD principal acquires an OAuth token, exchanges it
# for a short-lived USER DELEGATION KEY at the blob service, and signs a
# service SAS with that key.  All shapes below follow the public REST
# spec (learn.microsoft.com/rest/api/storageservices/
# get-user-delegation-key and create-user-delegation-sas, 2020-12-06+).


def aad_client_credentials_token(
    authority: str,
    tenant: str,
    client_id: str,
    client_secret: str,
    scope: str = "https://storage.azure.com/.default",
) -> str:
    """OAuth2 client-credentials grant against ``authority`` (the AAD
    endpoint — https for real tenants, plain-http for LOOPBACK test
    servers only; the secret travels in the request body, so cleartext
    http to a non-loopback host is refused): POST the form-encoded
    grant, return the bearer access token."""
    import json as _json
    from urllib.parse import urlencode

    body = urlencode(
        {
            "grant_type": "client_credentials",
            "client_id": client_id,
            "client_secret": client_secret,
            "scope": scope,
        }
    ).encode()
    conn, u = _open_credential_connection(authority)
    try:
        conn.request(
            "POST",
            f"{u.path}/{tenant}/oauth2/v2.0/token",
            body=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        resp = conn.getresponse()
        data = resp.read()
        if resp.status != 200:
            raise AzureError(
                resp.status, "AADTokenGrantFailed", repr(data[:200])
            )
        return _json.loads(data)["access_token"]
    finally:
        conn.close()


def request_user_delegation_key(
    endpoint: str,
    bearer_token: str,
    start: str | None = None,
    expiry: str | None = None,
    lifetime_s: int = 3600,
) -> dict:
    """POST ``?restype=service&comp=userdelegationkey`` with the AAD
    bearer token; returns the key record {signed_oid, signed_tid,
    signed_start, signed_expiry, signed_service, signed_version, value}
    — everything :func:`generate_user_delegation_sas` signs with.  The
    AAD bearer token rides the Authorization header, so plain-http
    endpoints are loopback-pinned like the token grant."""
    import xml.etree.ElementTree as ET

    now = _dt.datetime.now(_dt.timezone.utc)
    if start is None:
        start = now.strftime("%Y-%m-%dT%H:%M:%SZ")
    if expiry is None:
        expiry = (now + _dt.timedelta(seconds=lifetime_s)).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
    body = (
        f"<?xml version='1.0' encoding='utf-8'?><KeyInfo>"
        f"<Start>{start}</Start><Expiry>{expiry}</Expiry></KeyInfo>"
    ).encode()
    conn, _u = _open_credential_connection(endpoint)
    try:
        conn.request(
            "POST",
            "/?restype=service&comp=userdelegationkey",
            body=body,
            headers={
                "Authorization": f"Bearer {bearer_token}",
                "x-ms-version": "2021-08-06",
                "Content-Length": str(len(body)),
            },
        )
        resp = conn.getresponse()
        data = resp.read()
        if resp.status != 200:
            raise AzureError(
                resp.status, "UserDelegationKeyFailed", repr(data[:200])
            )
    finally:
        conn.close()
    root = ET.fromstring(data)
    field = {el.tag: (el.text or "") for el in root}
    return {
        "signed_oid": field["SignedOid"],
        "signed_tid": field["SignedTid"],
        "signed_start": field["SignedStart"],
        "signed_expiry": field["SignedExpiry"],
        "signed_service": field["SignedService"],
        "signed_version": field["SignedVersion"],
        "value": field["Value"],
    }


def user_delegation_sas_string_to_sign(
    account: str,
    container: str,
    permissions: str,
    start: str,
    expiry: str,
    udk: dict,
    blob: str = "",
    directory: str = "",
    version: str = SAS_VERSION,
    protocol: str = "https,http",
) -> str:
    """The 24-field create-user-delegation-sas canonicalization
    (2020-12-06+): sp/st/se, the canonicalized resource, the six signed-
    key fields, saoid/suoid/scid (unused here), sip, spr, sv, sr,
    snapshot time, encryption scope, and the five rsc* overrides —
    newline-joined, NO trailing newline.  Shared with the loopback
    server's independent re-derivation.

    ``directory`` selects the HNS/ADLS-Gen2 directory scope (sr=d): the
    canonicalized resource is the directory path and the minted SAS must
    carry ``sdd`` (signedDirectoryDepth) — the depth is NOT part of the
    string-to-sign, only the query-parameter set."""
    if blob and directory:
        raise ValueError("pass blob or directory, not both")
    tail = blob or directory
    resource = f"/blob/{account}/{container}" + (f"/{tail}" if tail else "")
    sr = "b" if blob else ("d" if directory else "c")
    return "\n".join(
        [
            permissions,
            start,
            expiry,
            resource,
            udk["signed_oid"],
            udk["signed_tid"],
            udk["signed_start"],
            udk["signed_expiry"],
            udk["signed_service"],
            udk["signed_version"],
            "",  # saoid
            "",  # suoid
            "",  # scid
            "",  # sip
            protocol,
            version,
            sr,
            "",  # snapshot time
            "",  # ses (encryption scope)
            "",  # rscc
            "",  # rscd
            "",  # rsce
            "",  # rscl
            "",  # rsct
        ]
    )


def generate_user_delegation_sas(
    account: str,
    container: str,
    udk: dict,
    permissions: str = "racwdl",
    expiry: str | None = None,
    start: str = "",
    blob: str = "",
    directory: str = "",
    lifetime_s: int = 3600,
) -> list[tuple[str, str]]:
    """Mint the user-delegation SAS query-parameter set (sv/sr/sp/(st)/se/
    spr + the six sk* key-attestation params + sig) — signed with the
    DELEGATION key, so neither the storage account key nor the AAD secret
    ever reaches the data path.  Scoped to one container, one blob
    (``blob``), or one HNS directory subtree (``directory`` → sr=d with
    the REQUIRED ``sdd`` signedDirectoryDepth param: the number of
    "/"-separated segments in the directory path; a verifier must refuse
    blobs not strictly under that many segments), unlike the account
    SAS."""
    if expiry is None:
        exp = _dt.datetime.now(_dt.timezone.utc) + _dt.timedelta(seconds=lifetime_s)
        expiry = exp.strftime("%Y-%m-%dT%H:%M:%SZ")
    sts = user_delegation_sas_string_to_sign(
        account, container, permissions, start, expiry, udk,
        blob=blob, directory=directory,
    )
    params = [
        ("sv", SAS_VERSION),
        ("sr", "b" if blob else ("d" if directory else "c")),
        ("sp", permissions),
        ("se", expiry),
        ("spr", "https,http"),
        ("skoid", udk["signed_oid"]),
        ("sktid", udk["signed_tid"]),
        ("skt", udk["signed_start"]),
        ("ske", udk["signed_expiry"]),
        ("sks", udk["signed_service"]),
        ("skv", udk["signed_version"]),
        ("sig", sign_shared_key(udk["value"], sts)),
    ]
    if directory:
        # sdd rides OUTSIDE the signature (spec: query param only), so a
        # verifier must recompute the directory prefix from the request
        # path at this depth and let the signature check scope it
        params.insert(2, ("sdd", str(len(directory.strip("/").split("/")))))
    if start:
        params.insert(3, ("st", start))
    return params


class AzureBlobClient:
    """Minimal synchronous Blob service client over http.client — the
    Azure twin of s3http.S3Client (one connection per concurrent request;
    the bounded block-upload pool caps both threads and sockets)."""

    def __init__(
        self,
        endpoint: str,
        account: str,
        account_key_b64: str | None = None,
        sas_token: str | list[tuple[str, str]] | None = None,
    ):
        u = urlparse(endpoint)
        if u.scheme != "http":
            raise ValueError("only http endpoints (loopback test servers) supported")
        if (account_key_b64 is None) == (sas_token is None):
            raise ValueError(
                "exactly one credential mode: account_key_b64 (Shared Key) "
                "or sas_token (query-param SAS)"
            )
        self.host = u.hostname or "127.0.0.1"
        self.port = u.port or 80
        self.account = account
        self.key = account_key_b64
        if isinstance(sas_token, str):
            from urllib.parse import parse_qsl

            sas_token = parse_qsl(sas_token.lstrip("?"), keep_blank_values=True)
        self.sas: list[tuple[str, str]] | None = sas_token

    @classmethod
    def from_env(cls, endpoint: str) -> "AzureBlobClient":
        """Construct from the scheme-keyed AZURE_* environment pickup —
        the executed continuation of object_store_env("az").  SAS mode
        (AZURE_STORAGE_SAS_TOKEN) wins over the account key when both are
        set: deployments that mint SAS usually forbid shipping the key."""
        from lakehouse_loader_spark.sinks.object_store import object_store_env

        env = object_store_env("az")
        try:
            account = env["azure_storage_account"]
        except KeyError as e:
            raise ValueError(
                f"Azure credentials missing from environment: {e}"
            ) from None
        if "azure_storage_sas_token" in env:
            return cls(endpoint, account, sas_token=env["azure_storage_sas_token"])
        try:
            return cls(endpoint, account, env["azure_storage_account_key"])
        except KeyError as e:
            raise ValueError(
                f"Azure credentials missing from environment: {e}"
            ) from None

    # -- signing + transport --------------------------------------------------

    def _request(
        self,
        method: str,
        path: str,
        query: list[tuple[str, str]] | None = None,
        body: bytes = b"",
        extra_headers: dict[str, str] | None = None,
    ) -> tuple[int, dict, bytes]:
        query = query or []
        now = _dt.datetime.now(_dt.timezone.utc)
        headers = {
            "x-ms-date": now.strftime("%a, %d %b %Y %H:%M:%S GMT"),
            "x-ms-version": "2021-08-06",
            "content-length": str(len(body)),
            **{k.lower(): v for k, v in (extra_headers or {}).items()},
        }
        if self.sas is not None:
            # SAS mode: authorization travels as query parameters — no
            # Authorization header, the key never touches this process
            query = list(query) + self.sas
        else:
            sts = shared_key_string_to_sign(
                method, self.account, path, query, headers
            )
            headers["authorization"] = (
                f"SharedKey {self.account}:{sign_shared_key(self.key, sts)}"
            )
        headers["host"] = f"{self.host}:{self.port}"
        qs = "&".join(
            f"{quote(k, safe='')}={quote(v, safe='')}" for k, v in sorted(query)
        )
        conn = http.client.HTTPConnection(self.host, self.port, timeout=30)
        try:
            # sign over the DECODED path (the server unquotes before its
            # re-derivation); percent-encode only on the wire so unicode
            # blob names survive http's ASCII request line
            wire = quote(path, safe="/")
            conn.request(
                method, wire + (f"?{qs}" if qs else ""), body=body, headers=headers
            )
            resp = conn.getresponse()
            data = resp.read()
            return resp.status, dict(resp.getheaders()), data
        finally:
            conn.close()

    def _check(self, status: int, data: bytes) -> None:
        if status < 300:
            return
        code, msg = "Unknown", ""
        try:
            root = ElementTree.fromstring(data)
            code = root.findtext("Code") or code
            msg = root.findtext("Message") or ""
        except ElementTree.ParseError:
            pass
        if status == 409 and code in ("BlobAlreadyExists", "Unknown"):
            raise BlobAlreadyExists(status, code, msg)
        raise AzureError(status, code, msg)

    # -- blob ops ---------------------------------------------------------------

    def put_blob(
        self, container: str, blob: str, data: bytes, if_none_match: bool = False
    ) -> None:
        extra = {"x-ms-blob-type": "BlockBlob"}
        if if_none_match:
            extra["if-none-match"] = "*"
        status, _h, body = self._request(
            "PUT", f"/{container}/{blob}", body=data, extra_headers=extra
        )
        self._check(status, body)

    def get_blob(self, container: str, blob: str) -> bytes:
        status, _h, body = self._request("GET", f"/{container}/{blob}")
        self._check(status, body)
        return body

    def delete_blob(self, container: str, blob: str) -> None:
        status, _h, body = self._request("DELETE", f"/{container}/{blob}")
        self._check(status, body)

    def list_blobs(self, container: str, prefix: str = "") -> list[str]:
        return [name for name, _size in self.list_objects(container, prefix)]

    def list_objects(self, container: str, prefix: str = "") -> list[tuple[str, int]]:
        """COMPLETE listing as ``(name, size)`` pairs, following List
        Blobs pagination (the service caps at 5000 blobs per page and
        returns a non-empty ``NextMarker``; ignoring it would hand
        object_sync a partial skip set)."""
        out: list[tuple[str, int]] = []
        marker = ""
        while True:
            query = [("restype", "container"), ("comp", "list"), ("prefix", prefix)]
            if marker:
                query.append(("marker", marker))
            status, _h, body = self._request("GET", f"/{container}", query=query)
            self._check(status, body)
            root = ElementTree.fromstring(body)
            for e in root.iter("Blob"):
                name = e.findtext("Name")
                if name:
                    size = e.findtext("Properties/Content-Length")
                    out.append((name, int(size or 0)))
            marker = (root.findtext("NextMarker") or "").strip()
            if not marker:
                return sorted(out)

    # -- block upload (the multipart analog) ------------------------------------

    def put_block(self, container: str, blob: str, block_id: str, data: bytes) -> None:
        status, _h, body = self._request(
            "PUT",
            f"/{container}/{blob}",
            query=[("comp", "block"), ("blockid", block_id)],
            body=data,
        )
        self._check(status, body)

    def put_block_list(self, container: str, blob: str, block_ids: list[str]) -> None:
        xml = (
            "<?xml version='1.0' encoding='utf-8'?><BlockList>"
            + "".join(f"<Latest>{bid}</Latest>" for bid in block_ids)
            + "</BlockList>"
        )
        status, _h, body = self._request(
            "PUT",
            f"/{container}/{blob}",
            query=[("comp", "blocklist")],
            body=xml.encode(),
        )
        self._check(status, body)

    def upload(self, container: str, blob: str, data: bytes) -> dict:
        """The reference's partition-file upload policy over Blob blocks:
        single Put Blob under the part size, else ≥5 MiB Put Blocks with
        at most PARTITION_FILE_UPLOAD_MAX_CONCURRENCY in flight, committed
        in order by Put Block List.  Uncommitted blocks of a failed upload
        are service-side garbage (no abort call exists on Azure)."""
        if len(data) <= PARTITION_FILE_MIN_PART_SIZE:
            self.put_blob(container, blob, data)
            return {"parts": 1, "multipart": False}
        chunks = [
            data[off : off + PARTITION_FILE_MIN_PART_SIZE]
            for off in range(0, len(data), PARTITION_FILE_MIN_PART_SIZE)
        ]
        # Azure requires equal-length base64 block ids within a blob
        ids = [
            base64.b64encode(f"block-{i:010d}".encode()).decode()
            for i in range(len(chunks))
        ]
        with ThreadPoolExecutor(
            max_workers=PARTITION_FILE_UPLOAD_MAX_CONCURRENCY
        ) as pool:
            futs = [
                pool.submit(self.put_block, container, blob, bid, chunk)
                for bid, chunk in zip(ids, chunks)
            ]
            for f in futs:
                f.result()
        self.put_block_list(container, blob, ids)
        return {"parts": len(chunks), "multipart": True}


    def upload_file(self, container: str, blob: str, path: str) -> dict:
        """:meth:`upload` streaming from disk — memory bounded to
        concurrency × part size; small files single Put Blob."""
        import os as _os

        size = _os.path.getsize(path)
        if size <= PARTITION_FILE_MIN_PART_SIZE:
            with open(path, "rb") as fh:
                self.put_blob(container, blob, fh.read())
            return {"parts": 1, "multipart": False}

        def read_part(i: int) -> bytes:
            with open(path, "rb") as fh:
                fh.seek(i * PARTITION_FILE_MIN_PART_SIZE)
                return fh.read(PARTITION_FILE_MIN_PART_SIZE)

        n_parts = (size + PARTITION_FILE_MIN_PART_SIZE - 1) // PARTITION_FILE_MIN_PART_SIZE
        ids = [
            base64.b64encode(f"block-{i:010d}".encode()).decode()
            for i in range(n_parts)
        ]
        with ThreadPoolExecutor(
            max_workers=PARTITION_FILE_UPLOAD_MAX_CONCURRENCY
        ) as pool:
            # the disk read happens INSIDE the worker (like S3Client's
            # pool.map): reading eagerly in the submit loop would buffer
            # every queued part, scaling memory with FILE size instead of
            # concurrency × part size
            futs = [
                pool.submit(
                    lambda i=i, bid=bid: self.put_block(
                        container, blob, bid, read_part(i)
                    )
                )
                for i, bid in enumerate(ids)
            ]
            for f in futs:
                f.result()
        self.put_block_list(container, blob, ids)
        return {"parts": n_parts, "multipart": True}

    # duck-type parity with s3http clients so the object_sync uploader is
    # client-agnostic (bucket ≙ container, key ≙ blob)
    def put_object(
        self, bucket: str, key: str, data: bytes, if_none_match: bool = False
    ) -> None:
        self.put_blob(bucket, key, data, if_none_match=if_none_match)

    def get_object(self, bucket: str, key: str) -> bytes:
        return self.get_blob(bucket, key)

    def list_keys(self, bucket: str, prefix: str = "") -> list[str]:
        return self.list_blobs(bucket, prefix)


class AzureCommitLock:
    """Conditional-create commit primitive over :class:`AzureBlobClient` —
    the Azure twin of s3http.S3CommitLock: exactly ONE writer per log
    version succeeds; the loser sees :class:`BlobAlreadyExists`."""

    def __init__(self, client: AzureBlobClient, container: str, prefix: str = "_delta_log"):
        self.client = client
        self.container = container
        self.prefix = prefix.rstrip("/")

    def commit(self, version: int, payload: bytes) -> None:
        self.client.put_blob(
            self.container,
            f"{self.prefix}/{version:020d}.json",
            payload,
            if_none_match=True,
        )

    def read(self, version: int) -> bytes:
        return self.client.get_blob(
            self.container, f"{self.prefix}/{version:020d}.json"
        )
