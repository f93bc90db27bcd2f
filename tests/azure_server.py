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
