"""S3 range reader — AWS Signature Version 4 over stdlib HTTP.

The reference reads COGs straight from object storage (GeoTrellis
``S3RangeReader`` behind ``GeoTiffRasterSource``); this module is that
access path without an SDK: the S3 REST protocol is public (ranged
``GET``/``HEAD`` on ``/{bucket}/{key}``) and request signing is the
published AWS SigV4 algorithm (HMAC-SHA256 chain over a canonical
request — docs.aws.amazon.com/general/latest/gr/sigv4_signing.html),
both implementable with ``hashlib``/``hmac``/``urllib`` alone.

- ``S3RangeReader``: RangeReader over ``s3://bucket/key``. Anonymous
  for public buckets; SigV4-signed when credentials are present (env
  ``AWS_ACCESS_KEY_ID``/``AWS_SECRET_ACCESS_KEY``/``AWS_SESSION_TOKEN``
  or explicit). ``endpoint`` overrides the AWS URL for MinIO/localstack
  style path-addressed stores (also read from ``AWS_ENDPOINT_URL``).
- ``sign_v4``: the signing core, exposed for testing — verified against
  a spec-independent verifier in tests/test_s3.py and exercised
  end-to-end against a live localhost S3-protocol server.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import os
import urllib.parse
import urllib.request
from dataclasses import dataclass

_ALGO = "AWS4-HMAC-SHA256"
_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


@dataclass(frozen=True)
class S3Credentials:
    access_key: str
    secret_key: str
    session_token: str | None = None

    @staticmethod
    def from_env() -> "S3Credentials | None":
        ak = os.environ.get("AWS_ACCESS_KEY_ID")
        sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
        if not ak or not sk:
            return None
        return S3Credentials(ak, sk, os.environ.get("AWS_SESSION_TOKEN"))


def _uri_encode(s: str, *, keep_slash: bool = False) -> str:
    safe = "-._~" + ("/" if keep_slash else "")
    return urllib.parse.quote(s, safe=safe)


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sign_v4(
    method: str,
    host: str,
    path: str,
    query: dict[str, str],
    headers: dict[str, str],
    payload_hash: str,
    region: str,
    service: str,
    creds: S3Credentials,
    amz_date: str,
) -> str:
    """Return the ``Authorization`` header value for one request.

    ``headers`` must already contain every header to be signed (host,
    x-amz-date, x-amz-content-sha256, range when present...).
    ``amz_date`` is ``YYYYMMDDTHHMMSSZ``."""
    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}" for k, v in sorted(query.items())
    )
    lower = {k.lower().strip(): " ".join(v.split()) for k, v in headers.items()}
    lower["host"] = host
    signed_names = ";".join(sorted(lower))
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    canonical_request = "\n".join([
        method,
        _uri_encode(path, keep_slash=True) or "/",
        canonical_query,
        canonical_headers,
        signed_names,
        payload_hash,
    ])
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        _ALGO,
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode()).hexdigest(),
    ])
    k = _hmac(b"AWS4" + creds.secret_key.encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return (
        f"{_ALGO} Credential={creds.access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={signature}"
    )


class S3RangeReader:
    """RangeReader over one S3 object. ``total_size`` is a signed HEAD;
    ``read`` is a signed ranged GET — a window read over a 100 GB COG
    moves only the tiles it touches, exactly like the HTTP reader."""

    def __init__(
        self,
        bucket: str,
        key: str,
        *,
        endpoint: str | None = None,
        region: str | None = None,
        creds: S3Credentials | None = None,
        timeout: float = 30.0,
    ):
        self.bucket = bucket
        self.key = key.lstrip("/")
        self.region = region or os.environ.get(
            "AWS_REGION", os.environ.get("AWS_DEFAULT_REGION", "us-east-1"))
        endpoint = endpoint or os.environ.get("AWS_ENDPOINT_URL")
        if endpoint:
            # MinIO/localstack-style path addressing on a custom endpoint
            u = urllib.parse.urlparse(endpoint)
            self._scheme = u.scheme or "https"
            self._host = u.netloc
            self._path = f"{u.path.rstrip('/')}/{bucket}/{self.key}"
        else:
            self._scheme = "https"
            self._host = f"{bucket}.s3.{self.region}.amazonaws.com"
            self._path = f"/{self.key}"
        self.creds = creds if creds is not None else S3Credentials.from_env()
        self.timeout = timeout
        self._size: int | None = None

    # -- request plumbing ---------------------------------------------------

    def _request(self, method: str, extra_headers: dict[str, str]):
        amz_date = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ")
        headers = {
            "x-amz-date": amz_date,
            "x-amz-content-sha256": _EMPTY_SHA256,
            **extra_headers,
        }
        if self.creds and self.creds.session_token:
            headers["x-amz-security-token"] = self.creds.session_token
        if self.creds:
            headers["Authorization"] = sign_v4(
                method, self._host, self._path, {}, headers,
                _EMPTY_SHA256, self.region, "s3", self.creds, amz_date,
            )
        url = f"{self._scheme}://{self._host}{_uri_encode(self._path, keep_slash=True)}"
        req = urllib.request.Request(url, headers=headers, method=method)
        return urllib.request.urlopen(req, timeout=self.timeout)

    def total_size(self) -> int:
        if self._size is None:
            with self._request("HEAD", {}) as resp:
                cl = resp.headers.get("Content-Length")
                if cl is None:
                    raise ValueError(
                        f"no Content-Length for s3://{self.bucket}/{self.key}")
                self._size = int(cl)
        return self._size

    def read(self, offset: int, length: int) -> bytes:
        rng = f"bytes={offset}-{offset + length - 1}"
        with self._request("GET", {"Range": rng}) as resp:
            if resp.status != 206:
                raise ValueError(
                    f"S3 endpoint did not honor Range (HTTP {resp.status})")
            return resp.read()


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """``s3://bucket/key/with/slashes`` → (bucket, key)."""
    u = urllib.parse.urlparse(uri)
    if u.scheme != "s3" or not u.netloc or not u.path.lstrip("/"):
        raise ValueError(f"not an s3://bucket/key URI: {uri}")
    return u.netloc, u.path.lstrip("/")
