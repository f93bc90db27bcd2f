"""Loopback S3-compatible server (stdlib http.server) for the executed
object-store tests — the S3 twin of the self-provisioned PostgreSQL in
test_pgwire_live.py.

Implements just enough of the S3 REST API to exercise the client's
policies, with real protocol enforcement:

* SigV4 verification on EVERY request: the signature is re-derived from
  the RAW request line + headers (not trusted from the client's code
  path) — a mis-canonicalized request 403s.
* PutObject honors ``If-None-Match: *`` with 412 PreconditionFailed — the
  conditional-create commit primitive.
* Multipart: initiate / upload-part / complete / abort, with S3's real
  EntityTooSmall rule (every part except the last must be ≥5 MiB) and
  ETag verification at complete time.
* Concurrency probe: the server tracks the maximum number of part
  uploads simultaneously in flight (each part sleeps briefly so overlap
  is observable) — pinning the client's bounded-concurrency policy.
"""

from __future__ import annotations

import hashlib
import hmac
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlparse
from xml.etree import ElementTree
from xml.sax.saxutils import escape as xml_escape

from lakehouse_loader_spark.sinks.s3http import (
    canonical_request,
    sigv4_signing_key,
)

MIN_PART = 5 * 1024 * 1024
PART_SLEEP_S = 0.05  # makes concurrent part uploads observable


class S3State:
    def __init__(self, access_key: str, secret_key: str):
        self.access_key = access_key
        self.secret_key = secret_key
        self.objects: dict[tuple[str, str], bytes] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.upload_target: dict[str, tuple[str, str]] = {}
        self.lock = threading.Lock()
        self.active_parts = 0
        self.max_active_parts = 0
        self.part_puts = 0
        # page size ListObjectsV2 uses when the client sends no max-keys
        # (real S3 caps at 1000); tests shrink it to exercise pagination
        self.default_max_keys = 1000
        # signature algorithms seen on ACCEPTED requests, so GCS-mode tests
        # can prove the GOOG4 wire path executed (not silently AWS4)
        self.algorithms_seen: set[str] = set()


# (algorithm prefix, key prefix, expected terminator, sha header) — the
# server re-derives both AWS SigV4 and GCS's XML-API V4 variant, like
# storage.googleapis.com's interop endpoint accepts both
_SIG_PROFILES = {
    "AWS4-HMAC-SHA256": ("AWS4", "aws4_request", "x-amz-content-sha256", "x-amz-date"),
    "GOOG4-HMAC-SHA256": ("GOOG4", "goog4_request", "x-goog-content-sha256", "x-goog-date"),
}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    state: S3State  # set by make_server

    def log_message(self, *a):  # quiet
        pass

    # -- plumbing -------------------------------------------------------------

    def _xml_error(self, status: int, code: str, message: str = "") -> None:
        body = (
            f"<Error><Code>{code}</Code><Message>{message}</Message></Error>"
        ).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _ok(self, body: bytes = b"", headers: dict | None = None, status: int = 200):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _verify_sig(self, body: bytes) -> bool:
        """Re-derive the V4 signature from the RAW request — AWS SigV4 or
        GCS's GOOG4 variant, selected by the Authorization algorithm."""
        auth = self.headers.get("Authorization") or ""
        algorithm = auth.split(" ", 1)[0]
        profile = _SIG_PROFILES.get(algorithm)
        if profile is None:
            return False
        key_prefix, terminator, sha_header, date_header = profile
        fields = dict(
            kv.strip().split("=", 1) for kv in auth[len(algorithm) + 1:].split(",")
        )
        cred = fields.get("Credential", "").split("/")
        if len(cred) != 5 or cred[0] != self.state.access_key:
            return False
        _ak, date, region, service, term = cred
        if term != terminator:
            return False
        signed = fields.get("SignedHeaders", "").split(";")
        u = urlparse(self.path)
        query = parse_qsl(u.query, keep_blank_values=True)
        headers = {h: self.headers.get(h, "") for h in signed}
        payload_sha = self.headers.get(sha_header, "")
        if payload_sha != hashlib.sha256(body).hexdigest():
            return False
        cr, _ = canonical_request(
            self.command, unquote(u.path), query, headers, payload_sha
        )
        sts = "\n".join(
            [
                algorithm,
                self.headers.get(date_header, ""),
                f"{date}/{region}/{service}/{terminator}",
                hashlib.sha256(cr.encode()).hexdigest(),
            ]
        )
        want = hmac.new(
            sigv4_signing_key(
                self.state.secret_key, date, region, service, key_prefix, terminator
            ),
            sts.encode(),
            hashlib.sha256,
        ).hexdigest()
        ok = hmac.compare_digest(want, fields.get("Signature", ""))
        if ok:
            self.state.algorithms_seen.add(algorithm)
        return ok

    def _route(self):
        u = urlparse(self.path)
        parts = unquote(u.path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        q = dict(parse_qsl(u.query, keep_blank_values=True))
        return bucket, key, q

    # -- verbs ----------------------------------------------------------------

    def do_PUT(self):
        body = self._read_body()
        if not self._verify_sig(body):
            return self._xml_error(403, "SignatureDoesNotMatch")
        bucket, key, q = self._route()
        st = self.state
        if "partNumber" in q and "uploadId" in q:
            uid, pn = q["uploadId"], int(q["partNumber"])
            with st.lock:
                if uid not in st.uploads:
                    return self._xml_error(404, "NoSuchUpload")
                st.active_parts += 1
                st.max_active_parts = max(st.max_active_parts, st.active_parts)
                st.part_puts += 1
            try:
                time.sleep(PART_SLEEP_S)
                etag = hashlib.md5(body).hexdigest()
                with st.lock:
                    st.uploads[uid][pn] = body
            finally:
                with st.lock:
                    st.active_parts -= 1
            return self._ok(headers={"ETag": f'"{etag}"'})
        with st.lock:
            if self.headers.get("If-None-Match") == "*" and (bucket, key) in st.objects:
                return self._xml_error(
                    412, "PreconditionFailed", "object already exists"
                )
            st.objects[(bucket, key)] = body
        return self._ok(headers={"ETag": f'"{hashlib.md5(body).hexdigest()}"'})

    def do_GET(self):
        if not self._verify_sig(b""):
            return self._xml_error(403, "SignatureDoesNotMatch")
        bucket, key, q = self._route()
        st = self.state
        if not key:  # ListObjectsV2 (paginated: max-keys + continuation-token)
            prefix = q.get("prefix", "")
            keys = sorted(
                k for (b, k) in st.objects if b == bucket and k.startswith(prefix)
            )
            token = q.get("continuation-token", q.get("marker", ""))
            if token:
                keys = [k for k in keys if k > token]
            max_keys = int(q.get("max-keys", str(st.default_max_keys)))
            page, rest = keys[:max_keys], keys[max_keys:]
            entries = "".join(
                f"<Contents><Key>{xml_escape(k)}</Key>"
                f"<Size>{len(st.objects[(bucket, k)])}</Size></Contents>"
                for k in page
            )
            if rest:
                tail = (
                    "<IsTruncated>true</IsTruncated>"
                    f"<NextContinuationToken>{xml_escape(page[-1])}"
                    "</NextContinuationToken>"
                )
            else:
                tail = "<IsTruncated>false</IsTruncated>"
            xml = f"<ListBucketResult>{entries}{tail}</ListBucketResult>"
            return self._ok(xml.encode(), {"Content-Type": "application/xml"})
        data = st.objects.get((bucket, key))
        if data is None:
            return self._xml_error(404, "NoSuchKey")
        return self._ok(data)

    def do_POST(self):
        body = self._read_body()
        if not self._verify_sig(body):
            return self._xml_error(403, "SignatureDoesNotMatch")
        bucket, key, q = self._route()
        st = self.state
        if "uploads" in q:  # initiate
            uid = uuid.uuid4().hex
            with st.lock:
                st.uploads[uid] = {}
                st.upload_target[uid] = (bucket, key)
            xml = (
                f"<InitiateMultipartUploadResult><Bucket>{bucket}</Bucket>"
                f"<Key>{key}</Key><UploadId>{uid}</UploadId>"
                "</InitiateMultipartUploadResult>"
            )
            return self._ok(xml.encode(), {"Content-Type": "application/xml"})
        if "uploadId" in q:  # complete
            uid = q["uploadId"]
            with st.lock:
                if uid not in st.uploads:
                    return self._xml_error(404, "NoSuchUpload")
                parts = st.uploads[uid]
            try:
                req = [
                    (
                        int(p.findtext("PartNumber")),
                        (p.findtext("ETag") or "").strip('"'),
                    )
                    for p in ElementTree.fromstring(body).iter("Part")
                ]
            except ElementTree.ParseError:
                return self._xml_error(400, "MalformedXML")
            assembled = b""
            for i, (pn, etag) in enumerate(sorted(req)):
                data = parts.get(pn)
                if data is None or hashlib.md5(data).hexdigest() != etag:
                    return self._xml_error(400, "InvalidPart", f"part {pn}")
                # S3's real rule: every part except the last must be >=5MiB
                if i < len(req) - 1 and len(data) < MIN_PART:
                    return self._xml_error(
                        400, "EntityTooSmall", f"part {pn} is {len(data)} bytes"
                    )
                assembled += data
            with st.lock:
                st.objects[st.upload_target[uid]] = assembled
                del st.uploads[uid]
                del st.upload_target[uid]
            return self._ok(
                b"<CompleteMultipartUploadResult/>",
                {"Content-Type": "application/xml"},
            )
        return self._xml_error(400, "InvalidRequest")

    def do_DELETE(self):
        if not self._verify_sig(b""):
            return self._xml_error(403, "SignatureDoesNotMatch")
        bucket, key, q = self._route()
        st = self.state
        if "uploadId" in q:  # abort
            with st.lock:
                st.uploads.pop(q["uploadId"], None)
                st.upload_target.pop(q["uploadId"], None)
            return self._ok(status=204)
        with st.lock:
            st.objects.pop((bucket, key), None)
        return self._ok(status=204)


def make_server(access_key: str = "AKTEST", secret_key: str = "sk-test"):
    """Start a loopback S3 server on a free port; returns
    (server, state, endpoint_url).  Call server.shutdown() when done."""
    state = S3State(access_key, secret_key)
    handler = type("Handler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state, f"http://127.0.0.1:{srv.server_address[1]}"
