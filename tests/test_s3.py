"""S3 range reader + SigV4 signing.

Three layers of evidence:
1. The signer reproduces the EXACT signature AWS publishes for its
   SigV4 worked example (docs: "Example: Signature Calculations") —
   an external golden, not a self-check.
2. A live localhost S3-protocol server verifies every request's
   signature with an INDEPENDENT verifier written from the spec in
   this file (separate code path from the client's signer).
3. End-to-end: CogReader windowed reads over s3:// move only the
   byte ranges the window touches.
"""

import hashlib
import hmac
import threading
import urllib.parse

import numpy as np
import pytest

from geotrellis_server_spark.sources.s3 import (
    S3Credentials,
    S3RangeReader,
    parse_s3_uri,
    sign_v4,
)

CREDS = S3Credentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")


def test_sigv4_matches_aws_published_example():
    """AWS's own SigV4 worked example (GET iam.amazonaws.com ListUsers,
    20150830, us-east-1) — the published signature is the golden."""
    auth = sign_v4(
        "GET", "iam.amazonaws.com", "/",
        {"Action": "ListUsers", "Version": "2010-05-08"},
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8",
         "x-amz-date": "20150830T123600Z"},
        hashlib.sha256(b"").hexdigest(),
        "us-east-1", "iam", CREDS, "20150830T123600Z",
    )
    assert auth == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_parse_s3_uri():
    assert parse_s3_uri("s3://bkt/a/b/c.tif") == ("bkt", "a/b/c.tif")
    with pytest.raises(ValueError):
        parse_s3_uri("http://bkt/key")
    with pytest.raises(ValueError):
        parse_s3_uri("s3://bkt")


# --- independent server-side verifier (written from the spec, NOT by
# calling the client's sign_v4 — a shared algorithmic slip in canonical
# formatting would still fool it, but any asymmetry can't) -------------


def _verify_sigv4(method, path, headers, secret):
    auth = headers["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 ")
    fields = dict(p.split("=", 1) for p in auth[17:].split(", "))
    scope = fields["Credential"].split("/", 1)[1]
    date, region, service, _ = scope.split("/")
    signed = fields["SignedHeaders"].split(";")
    canon_headers = ""
    for name in signed:
        canon_headers += f"{name}:{' '.join(headers[name].split())}\n"
    cq = ""  # the reader never sends query params
    creq = "\n".join([
        method, urllib.parse.quote(path, safe="-._~/"), cq, canon_headers,
        ";".join(signed), headers["x-amz-content-sha256"],
    ])
    sts = "\n".join([
        "AWS4-HMAC-SHA256", headers["x-amz-date"], scope,
        hashlib.sha256(creq.encode()).hexdigest(),
    ])
    k = ("AWS4" + secret).encode()
    for part in (date, region, service, "aws4_request"):
        k = hmac.new(k, part.encode(), hashlib.sha256).digest()
    want = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
    return hmac.compare_digest(want, fields["Signature"])


def _serve_s3(bucket: str, objects: dict[str, bytes], secret: str):
    """Minimal path-style S3 endpoint: HEAD/GET with Range, verifying
    each request's SigV4 signature server-side."""
    import http.server
    import socketserver

    stats = {"requests": 0, "bytes_served": 0, "bad_auth": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _object(self):
            parts = self.path.lstrip("/").split("/", 1)
            if len(parts) != 2 or parts[0] != bucket:
                return None
            return objects.get(parts[1])

        def _check(self):
            stats["requests"] += 1
            hdrs = {k.lower(): v for k, v in self.headers.items()}
            hdrs["Authorization"] = self.headers.get("Authorization", "")
            if not hdrs["Authorization"] or not _verify_sigv4(
                    self.command, self.path, hdrs, secret):
                stats["bad_auth"] += 1
                self.send_response(403)
                self.end_headers()
                return False
            return True

        def do_HEAD(self):
            if not self._check():
                return
            body = self._object()
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            if not self._check():
                return
            body = self._object()
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, b = rng[6:].split("-")
                a, b = int(a), min(int(b), len(body) - 1)
                part = body[a : b + 1]
                self.send_response(206)
                self.send_header("Content-Range", f"bytes {a}-{b}/{len(body)}")
            else:
                part = body
                self.send_response(200)
            self.send_header("Content-Length", str(len(part)))
            self.end_headers()
            self.wfile.write(part)
            stats["bytes_served"] += len(part)

    srv = socketserver.TCPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], stats


def test_s3_reader_against_live_verified_server():
    blob = bytes(range(256)) * 64
    srv, port, stats = _serve_s3("bkt", {"data/blob.bin": blob},
                                 CREDS.secret_key)
    try:
        rr = S3RangeReader(
            "bkt", "data/blob.bin",
            endpoint=f"http://127.0.0.1:{port}", creds=CREDS,
        )
        assert rr.total_size() == len(blob)
        assert rr.read(0, 4) == b"\x00\x01\x02\x03"
        assert rr.read(1000, 10) == blob[1000:1010]
        assert stats["bad_auth"] == 0 and stats["requests"] >= 3
    finally:
        srv.shutdown()


def test_s3_reader_rejected_without_signature():
    blob = b"x" * 100
    srv, port, stats = _serve_s3("bkt", {"k": blob}, CREDS.secret_key)
    try:
        rr = S3RangeReader("bkt", "k", endpoint=f"http://127.0.0.1:{port}",
                           creds=S3Credentials("AKIDEXAMPLE", "WRONG"))
        with pytest.raises(Exception):
            rr.total_size()
        assert stats["bad_auth"] == 1
    finally:
        srv.shutdown()


def test_cog_windowed_read_over_s3():
    """CogReader through s3:// — tiled windowed reads fetch a fraction
    of the object, each request signed and server-verified."""
    from geotrellis_server_spark.sources.cog import CogReader
    from geotrellis_server_spark.sources.gtiff import encode_geotiff
    from geotrellis_server_spark.sources.rangereader import (
        CachingRangeReader,
    )

    rng = np.random.default_rng(8)
    a = rng.random((512, 1024))  # 4 MiB f8 page
    blob = encode_geotiff(a, (0, 0, 1024, 512), 3857, tile=(64, 64))
    srv, port, stats = _serve_s3("rasters", {"cog/page.tif": blob},
                                 CREDS.secret_key)
    try:
        rr = S3RangeReader("rasters", "cog/page.tif",
                           endpoint=f"http://127.0.0.1:{port}", creds=CREDS)
        cr = CogReader(CachingRangeReader(rr))
        win = cr.read_window(0, 100, 160, 300, 360)
        assert (win == a[100:160, 300:360]).all()
        assert stats["bad_auth"] == 0
        assert stats["bytes_served"] < len(blob) / 4  # ranged, not full
    finally:
        srv.shutdown()


def test_open_range_reader_s3_scheme(monkeypatch):
    blob = b"hello s3 world" * 10
    srv, port, stats = _serve_s3("b", {"k.bin": blob}, "sk")
    try:
        monkeypatch.setenv("AWS_ENDPOINT_URL", f"http://127.0.0.1:{port}")
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ak")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk")
        from geotrellis_server_spark.sources.rangereader import (
            open_range_reader,
        )

        rr = open_range_reader("s3://b/k.bin", cached=False)
        assert rr.total_size() == len(blob)
        assert rr.read(6, 2) == b"s3"
        assert stats["bad_auth"] == 0
    finally:
        srv.shutdown()
