"""S3-compatible ObjectStore over plain REST — the optional real-cloud
backend for the manifest protocol.

The reference ships cloud clients for its object_store abstraction
(object_store/src/aws.rs); this is the same 5-method surface
(`objstore.ObjectStore`) spoken directly to any S3-compatible endpoint
(AWS S3, MinIO, Ceph RGW, GCS's XML/interop layer) with nothing but the
standard library:

- conditional writes: ``PUT`` with ``If-None-Match: *`` (create-only)
  and ``If-Match: <etag>`` (CAS replace) — AWS added both in 2024; MinIO
  and Ceph honor them.  A 412 Precondition Failed maps to the protocol's
  "CAS lost" (returns None), exactly like the in-memory double.
- listings: ``ListObjectsV2`` with continuation tokens; etags ride the
  response, so ``list_with_etags`` (and therefore the manifest
  ``version()`` probe) is metadata-priced: ceil(n/1000) round trips.
- auth: AWS Signature V4 (the public spec: HMAC-SHA256 over the
  canonical request), implemented inline; anonymous endpoints skip it.

Endpoint style is path-style (``https://host/bucket/key``) — the form
every S3-compatible store accepts.  TLS or not comes from the endpoint
URL.  No SDK dependency: the protocol needs five verbs and one signing
algorithm, all documented publicly.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from influxdb_iox_spark.sources.objstore import ObjectStore

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


class S3RequestError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"S3 request failed: HTTP {status}: {body[:300]}")
        self.status = status


class SigV4Signer:
    """AWS Signature Version 4 (public spec, 'AWS4-HMAC-SHA256')."""

    def __init__(self, access_key: str, secret_key: str, region: str, service: str = "s3"):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.service = service

    def sign(
        self,
        method: str,
        url: str,
        headers: dict,
        payload_sha256: str,
        now: "_dt.datetime | None" = None,
    ) -> dict:
        u = urllib.parse.urlsplit(url)
        now = now or _dt.datetime.now(_dt.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        out = dict(headers)
        out["x-amz-date"] = amz_date
        out["x-amz-content-sha256"] = payload_sha256
        out["host"] = u.netloc

        canonical_query = "&".join(
            f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
            for k, v in sorted(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        )
        signed_names = sorted(k.lower() for k in out)
        canonical_headers = "".join(
            f"{k}:{str(out[_orig(out, k)]).strip()}\n" for k in signed_names
        )
        signed_headers = ";".join(signed_names)
        canonical_request = "\n".join(
            [
                method,
                # the URL path arrives ALREADY percent-encoded (_url
                # quotes the key); S3-style SigV4 signs the once-encoded
                # path AS-IS — re-quoting would turn %20 into %2520 and
                # 403 every key containing a space/%/+ (review finding)
                u.path or "/",
                canonical_query,
                canonical_headers,
                signed_headers,
                payload_sha256,
            ]
        )
        scope = f"{datestamp}/{self.region}/{self.service}/aws4_request"
        string_to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                amz_date,
                scope,
                hashlib.sha256(canonical_request.encode()).hexdigest(),
            ]
        )
        key = f"AWS4{self.secret_key}".encode()
        for part in (datestamp, self.region, self.service, "aws4_request"):
            key = hmac.new(key, part.encode(), hashlib.sha256).digest()
        signature = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()
        out["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        )
        return out


def _orig(d: dict, lower: str) -> str:
    for k in d:
        if k.lower() == lower:
            return k
    raise KeyError(lower)


class S3RestObjectStore(ObjectStore):
    """ObjectStore over S3 REST.  ``endpoint`` like ``http://host:9000``;
    keys live under ``<bucket>/<prefix><key>``."""

    def __init__(
        self,
        endpoint: str,
        bucket: str,
        prefix: str = "",
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
        timeout: float = 30.0,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.prefix = prefix
        self.timeout = timeout
        self.signer = (
            SigV4Signer(access_key, secret_key, region)
            if access_key and secret_key
            else None
        )

    # -- plumbing ----------------------------------------------------------
    def _url(self, key: str = "", query: str = "") -> str:
        path = f"/{self.bucket}"
        if key:
            path += "/" + urllib.parse.quote(self.prefix + key, safe="/-_.~")
        return self.endpoint + path + (f"?{query}" if query else "")

    def _request(
        self,
        method: str,
        url: str,
        data: bytes | None = None,
        headers: dict | None = None,
        ok: tuple = (200,),
        tolerate: tuple = (),
    ):
        """(status, headers, body) for expected statuses; raises
        S3RequestError otherwise.  ``tolerate`` statuses return with an
        empty body untouched (404 on GET, 412 on conditional PUT)."""
        headers = dict(headers or {})
        payload_sha = hashlib.sha256(data or b"").hexdigest() if data else _EMPTY_SHA256
        if self.signer is not None:
            headers = self.signer.sign(method, url, headers, payload_sha)
        req = urllib.request.Request(url, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            if e.code in tolerate:
                return e.code, dict(e.headers), b""
            raise S3RequestError(e.code, e.read().decode(errors="replace"))

    @staticmethod
    def _etag(headers: dict) -> str:
        for k, v in headers.items():
            if k.lower() == "etag":
                return v.strip('"')
        raise S3RequestError(0, "response carried no ETag header")

    # -- ObjectStore -------------------------------------------------------
    def put(self, key, data, *, if_not_exists=False, if_match=None):
        headers = {}
        if if_not_exists:
            headers["If-None-Match"] = "*"
        if if_match is not None:
            headers["If-Match"] = f'"{if_match}"'
        status, h, _ = self._request(
            "PUT", self._url(key), data=bytes(data), headers=headers,
            ok=(200,), tolerate=(412, 409),
        )
        if status in (412, 409):  # precondition failed / concurrent create
            return None
        return self._etag(h)

    def get(self, key):
        status, h, body = self._request(
            "GET", self._url(key), ok=(200,), tolerate=(404,)
        )
        if status == 404:
            return None
        return body, self._etag(h)

    def head(self, key):
        try:
            status, h, _ = self._request(
                "HEAD", self._url(key), ok=(200,), tolerate=(404,)
            )
        except S3RequestError as e:  # some stores 403 anonymous HEAD misses
            if e.status == 403:
                return None
            raise
        return None if status == 404 else self._etag(h)

    def _list_pages(self, prefix: str):
        token = None
        while True:
            q = "list-type=2&prefix=" + urllib.parse.quote(
                self.prefix + prefix, safe=""
            )
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token, safe="")
            _, _, body = self._request("GET", self._url(query=q))
            root = ET.fromstring(body)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            for c in root.findall(f"{ns}Contents"):
                k = c.find(f"{ns}Key").text or ""
                etag = (c.find(f"{ns}ETag").text or "").strip('"')
                yield k[len(self.prefix):], etag
            trunc = root.find(f"{ns}IsTruncated")
            if trunc is None or (trunc.text or "").lower() != "true":
                return
            token = root.find(f"{ns}NextContinuationToken").text

    def list(self, prefix):
        return sorted(k for k, _ in self._list_pages(prefix))

    def list_with_etags(self, prefix):
        return sorted(self._list_pages(prefix))

    def delete(self, key, *, if_match=None):
        if if_match is None:
            self._request(
                "DELETE", self._url(key), ok=(200, 204), tolerate=(404,)
            )
            return None
        # Conditional delete (round 16): If-Match per AWS conditional
        # requests.  Same honesty note as the conditional put — an
        # S3-compatible store that silently ignores If-Match degrades to
        # an unconditional delete; verify enforcement before trusting it.
        status, _, _ = self._request(
            "DELETE", self._url(key),
            headers={"If-Match": f'"{if_match}"'},
            ok=(200, 204), tolerate=(404, 409, 412),
        )
        return status in (200, 204)
