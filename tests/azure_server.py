"""Loopback Azure Blob service (stdlib http.server) for the executed
object-store tests: re-derives the Shared Key signature INDEPENDENTLY
from the raw request (learn.microsoft.com/rest/api/storageservices/
authorize-with-shared-key), stores blobs/blocks in memory, enforces the
conditional-create (If-None-Match: *) race with 409 BlobAlreadyExists,
and implements Put Block / Put Block List ordering semantics."""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlparse
from xml.etree import ElementTree
from xml.sax.saxutils import escape as xml_escape

from lakehouse_loader_spark.sinks.azureblob import (
    account_sas_string_to_sign,
    shared_key_string_to_sign,
    sign_shared_key,
)


class AzureState:
    def __init__(self, account: str, key_b64: str):
        self.account = account
        self.key = key_b64
        self.blobs: dict[tuple[str, str], bytes] = {}
        # (container, blob) -> {block_id: bytes} staged, uncommitted
        self.blocks: dict[tuple[str, str], dict[str, bytes]] = {}
        self.lock = threading.Lock()
        # page size List Blobs uses when the client sends no maxresults
        # (real Azure caps at 5000); tests shrink it to exercise NextMarker
        self.default_maxresults = 5000
        # AAD side (user-delegation SAS e2e): a client-credentials app
        # registration and the bearer its token grant issues
        import secrets as _secrets
        import uuid as _uuid

        self.aad_tenant = str(_uuid.uuid4())
        self.aad_client_id = str(_uuid.uuid4())
        self.aad_client_secret = _secrets.token_hex(16)
        self.aad_bearer = _secrets.token_hex(24)
        self.aad_oid = str(_uuid.uuid4())
        # (oid, tid) -> delegation key record minted by POST
        # ?comp=userdelegationkey; the SAS verifier looks the key up by
        # the sk* attestation params
        self.udks: dict[tuple[str, str], dict] = {}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    state: AzureState  # set by make_server

    def log_message(self, *a):  # quiet
        pass

    def _error(self, status: int, code: str, message: str = "") -> None:
        body = (
            f"<?xml version='1.0'?><Error><Code>{code}</Code>"
            f"<Message>{message}</Message></Error>"
        ).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _ok(self, body: bytes = b"", status: int = 200) -> None:
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _verify_sig(self) -> bool:
        auth = self.headers.get("Authorization") or ""
        if not auth:
            return self._verify_sas()
        if not auth.startswith("SharedKey "):
            return False
        try:
            account, sig = auth[len("SharedKey "):].split(":", 1)
        except ValueError:
            return False
        if account != self.state.account:
            return False
        u = urlparse(self.path)
        query = parse_qsl(u.query, keep_blank_values=True)
        headers = {
            k: v for k, v in self.headers.items() if k.lower() != "authorization"
        }
        sts = shared_key_string_to_sign(
            self.command, account, unquote(u.path), query, headers
        )
        want = sign_shared_key(self.state.key, sts)
        return hmac.compare_digest(want, sig)

    # permission letter an account SAS must carry per verb/operation
    _SAS_PERMS = {"GET": "r", "HEAD": "r", "PUT": "w", "DELETE": "d"}

    def _verify_sas(self) -> bool:
        """Account-SAS validation, re-derived INDEPENDENTLY from the SAS
        query params + the account key (create-account-sas spec): check
        the signature, the validity window, and the permission letter the
        verb needs ('l' for List Blobs)."""
        import datetime as _dt

        u = urlparse(self.path)
        q = dict(parse_qsl(u.query, keep_blank_values=True))
        if "sig" not in q:
            return False
        if "skoid" in q:
            return self._verify_user_delegation_sas(u, q)
        sts = account_sas_string_to_sign(
            self.state.account,
            q.get("sp", ""),
            q.get("st", ""),
            q.get("se", ""),
            version=q.get("sv", ""),
            services=q.get("ss", ""),
            resource_types=q.get("srt", ""),
            protocol=q.get("spr", ""),
        )
        if not hmac.compare_digest(
            sign_shared_key(self.state.key, sts), q["sig"]
        ):
            return False
        now = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        if q.get("se", "") <= now:  # expired (ISO-8601 Z strings sort)
            return False
        if q.get("st") and q["st"] > now:  # not yet valid
            return False
        if "b" not in q.get("ss", ""):
            return False
        needed = (
            "l"
            if q.get("comp") == "list"
            else self._SAS_PERMS.get(self.command, "?")
        )
        return needed in q.get("sp", "")

    def _verify_user_delegation_sas(self, u, q) -> bool:
        """User-delegation SAS validation, re-derived INDEPENDENTLY: look
        the delegation key up by its sk* attestation params, rebuild the
        24-field string-to-sign from the REQUEST (canonicalized resource
        from the path, everything else from the query), HMAC under the
        stored key value, then check windows / permission / resource
        scope."""
        import datetime as _dt

        udk = self.state.udks.get((q.get("skoid", ""), q.get("sktid", "")))
        if udk is None:
            return False
        if (
            udk["signed_start"] != q.get("skt")
            or udk["signed_expiry"] != q.get("ske")
            or udk["signed_service"] != q.get("sks")
            or udk["signed_version"] != q.get("skv")
        ):
            return False
        parts = unquote(u.path).lstrip("/").split("/", 1)
        container = parts[0]
        blob = parts[1] if len(parts) > 1 else ""
        sr = q.get("sr", "")
        # the 24-field string-to-sign, re-derived INDEPENDENTLY of the
        # library (learn.microsoft.com/rest/api/storageservices/
        # create-user-delegation-sas, 2020-12-06+) — importing the
        # library's canonicalization here would make the e2e test blind
        # to a field-order/canonicalization bug (ADVICE r13; the Shared
        # Key verifier re-derives the same way)
        resource = f"/blob/{self.state.account}/{container}"
        if sr == "b" and blob:
            resource += f"/{blob}"
        elif sr == "d":
            # directory scope (HNS): sdd names how many path segments the
            # SIGNED directory has; rebuild that prefix from the REQUEST
            # path and let the signature check scope it (a blob outside
            # the signed directory rebuilds a different prefix and the
            # HMAC fails).  sdd itself is unsigned, but tampering with it
            # changes the rebuilt prefix, which also fails the HMAC.  The
            # blob must sit STRICTLY BELOW the directory (more segments
            # than sdd); container ops (list) have no blob path to scope
            # and are refused under sr=d.
            if not q.get("sdd", "").isdigit() or not blob:
                return False
            depth = int(q["sdd"])
            segs = blob.split("/")
            if depth < 1 or len(segs) <= depth:
                return False
            resource += "/" + "/".join(segs[:depth])
        sts = "\n".join(
            [
                q.get("sp", ""),           # signedPermissions
                q.get("st", ""),           # signedStart
                q.get("se", ""),           # signedExpiry
                resource,                  # canonicalizedResource
                udk["signed_oid"],         # signedKeyObjectId
                udk["signed_tid"],         # signedKeyTenantId
                udk["signed_start"],       # signedKeyStart
                udk["signed_expiry"],      # signedKeyExpiry
                udk["signed_service"],     # signedKeyService
                udk["signed_version"],     # signedKeyVersion
                "",                        # signedAuthorizedUserObjectId
                "",                        # signedUnauthorizedUserObjectId
                "",                        # signedCorrelationId
                "",                        # signedIP
                q.get("spr", ""),          # signedProtocol
                q.get("sv", ""),           # signedVersion
                q.get("sr", ""),           # signedResource
                "",                        # signedSnapshotTime
                "",                        # signedEncryptionScope
                "",                        # rscc
                "",                        # rscd
                "",                        # rsce
                "",                        # rscl
                "",                        # rsct
            ]
        )
        want = base64.b64encode(
            hmac.new(
                base64.b64decode(udk["value"]), sts.encode("utf-8"), hashlib.sha256
            ).digest()
        ).decode()
        if not hmac.compare_digest(want, q["sig"]):
            return False
        now = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        if q.get("se", "") <= now or (q.get("st") and q["st"] > now):
            return False
        if udk["signed_expiry"] <= now:  # the KEY itself expired
            return False
        needed = (
            "l"
            if q.get("comp") == "list"
            else self._SAS_PERMS.get(self.command, "?")
        )
        if needed not in q.get("sp", ""):
            return False
        # sr=b scopes to ONE blob, sr=d to one directory subtree: a
        # container operation (or an out-of-scope blob) fails the
        # signature above because the canonicalized resource differs —
        # nothing more to check here
        return sr in ("b", "c", "d")

    def do_POST(self):
        body = self._read_body()
        u = urlparse(self.path)
        q = dict(parse_qsl(u.query, keep_blank_values=True))
        # AAD token endpoint (loopback authority): /__aad/{tenant}/oauth2/v2.0/token
        if u.path.startswith("/__aad/"):
            from urllib.parse import parse_qs

            form = {k: v[0] for k, v in parse_qs(body.decode()).items()}
            tenant = u.path.split("/")[2]
            if (
                tenant != self.state.aad_tenant
                or form.get("grant_type") != "client_credentials"
                or form.get("client_id") != self.state.aad_client_id
                or form.get("client_secret") != self.state.aad_client_secret
            ):
                return self._error(401, "invalid_client")
            import json as _json

            return self._ok(
                _json.dumps(
                    {
                        "access_token": self.state.aad_bearer,
                        "token_type": "Bearer",
                        "expires_in": 3600,
                    }
                ).encode()
            )
        if q.get("comp") == "userdelegationkey":
            auth = self.headers.get("Authorization") or ""
            if auth != f"Bearer {self.state.aad_bearer}":
                return self._error(403, "AuthenticationFailed", "bearer required")
            try:
                root = ElementTree.fromstring(body)
                start = root.findtext("Start") or ""
                expiry = root.findtext("Expiry") or ""
            except ElementTree.ParseError:
                return self._error(400, "InvalidXmlDocument")
            import secrets as _secrets

            udk = {
                "signed_oid": self.state.aad_oid,
                "signed_tid": self.state.aad_tenant,
                "signed_start": start,
                "signed_expiry": expiry,
                "signed_service": "b",
                "signed_version": "2021-08-06",
                "value": base64.b64encode(_secrets.token_bytes(32)).decode(),
            }
            self.state.udks[(udk["signed_oid"], udk["signed_tid"])] = udk
            xml = (
                "<?xml version='1.0' encoding='utf-8'?><UserDelegationKey>"
                f"<SignedOid>{udk['signed_oid']}</SignedOid>"
                f"<SignedTid>{udk['signed_tid']}</SignedTid>"
                f"<SignedStart>{udk['signed_start']}</SignedStart>"
                f"<SignedExpiry>{udk['signed_expiry']}</SignedExpiry>"
                f"<SignedService>{udk['signed_service']}</SignedService>"
                f"<SignedVersion>{udk['signed_version']}</SignedVersion>"
                f"<Value>{udk['value']}</Value>"
                "</UserDelegationKey>"
            ).encode()
            return self._ok(xml)
        return self._error(400, "UnsupportedOperation")

    def _route(self):
        u = urlparse(self.path)
        parts = unquote(u.path).lstrip("/").split("/", 1)
        container = parts[0]
        blob = parts[1] if len(parts) > 1 else ""
        q = dict(parse_qsl(u.query, keep_blank_values=True))
        return container, blob, q

    def do_PUT(self):
        body = self._read_body()
        if not self._verify_sig():
            return self._error(403, "AuthenticationFailed")
        container, blob, q = self._route()
        key = (container, blob)
        with self.state.lock:
            if q.get("comp") == "block":
                bid = q.get("blockid", "")
                if not bid:
                    return self._error(400, "MissingRequiredQueryParameter")
                self.state.blocks.setdefault(key, {})[bid] = body
                return self._ok(status=201)
            if q.get("comp") == "blocklist":
                try:
                    root = ElementTree.fromstring(body)
                except ElementTree.ParseError:
                    return self._error(400, "InvalidXmlDocument")
                staged = self.state.blocks.get(key, {})
                out = bytearray()
                for el in root:
                    bid = el.text or ""
                    if bid not in staged:
                        return self._error(400, "InvalidBlockList")
                    out.extend(staged[bid])
                self.state.blobs[key] = bytes(out)
                self.state.blocks.pop(key, None)
                return self._ok(status=201)
            # Put Blob
            if self.headers.get("If-None-Match") == "*" and key in self.state.blobs:
                return self._error(409, "BlobAlreadyExists")
            if self.headers.get("x-ms-blob-type") != "BlockBlob":
                return self._error(400, "MissingRequiredHeader", "x-ms-blob-type")
            self.state.blobs[key] = body
            return self._ok(status=201)

    def do_GET(self):
        self._read_body()
        if not self._verify_sig():
            return self._error(403, "AuthenticationFailed")
        container, blob, q = self._route()
        if q.get("comp") == "list":
            prefix = q.get("prefix", "")
            names = sorted(
                b
                for (c, b) in self.state.blobs
                if c == container and b.startswith(prefix)
            )
            marker = q.get("marker", "")
            if marker:
                names = [n for n in names if n > marker]
            maxresults = int(q.get("maxresults", str(self.state.default_maxresults)))
            page, rest = names[:maxresults], names[maxresults:]
            next_marker = xml_escape(page[-1]) if rest else ""
            xml = (
                "<?xml version='1.0'?><EnumerationResults><Blobs>"
                + "".join(
                    f"<Blob><Name>{xml_escape(n)}</Name><Properties>"
                    f"<Content-Length>{len(self.state.blobs[(container, n)])}"
                    "</Content-Length></Properties></Blob>"
                    for n in page
                )
                + f"</Blobs><NextMarker>{next_marker}</NextMarker>"
                + "</EnumerationResults>"
            ).encode()
            return self._ok(xml)
        data = self.state.blobs.get((container, blob))
        if data is None:
            return self._error(404, "BlobNotFound")
        return self._ok(data)

    def do_DELETE(self):
        self._read_body()
        if not self._verify_sig():
            return self._error(403, "AuthenticationFailed")
        container, blob, _q = self._route()
        if self.state.blobs.pop((container, blob), None) is None:
            return self._error(404, "BlobNotFound")
        return self._ok(status=202)


def make_server(account: str = "devacct", key_b64: str | None = None):
    if key_b64 is None:
        key_b64 = base64.b64encode(
            hashlib.sha256(b"loopback-azure-key").digest()
        ).decode()
    state = AzureState(account, key_b64)
    handler = type("BoundHandler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state, f"http://127.0.0.1:{srv.server_address[1]}"
