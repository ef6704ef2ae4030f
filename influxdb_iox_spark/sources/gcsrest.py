"""GCS ObjectStore over the JSON API — the GCP twin of s3rest.py.

The reference ships a GCS client for its object_store abstraction
(object_store/src/gcp.rs); this speaks the same 5-method surface
(`objstore.ObjectStore`) to the public GCS JSON API with nothing but
the standard library:

- conditional writes: media upload with ``ifGenerationMatch=0``
  (create-only) / ``ifGenerationMatch=<gen>`` (CAS replace) — GCS's
  native put-if-absent / put-if-match; HTTP 412 maps to the protocol's
  "CAS lost" (returns None), exactly like the in-memory double.  The
  object **generation** plays the etag role (monotone per key, which is
  stronger than an opaque etag and all the protocol needs).
- listings: ``GET /storage/v1/b/{bucket}/o?prefix=`` with pageToken
  paging; generations ride the items, so ``list_with_etags`` (and the
  manifest ``version()`` probe) is metadata-priced.
- auth: OAuth2 bearer token via a caller-supplied string or zero-arg
  callable (metadata-server and service-account flows both reduce to
  "produce a token"); anonymous endpoints (fake-gcs-server, the test
  stub) skip it.

``endpoint`` overrides the API root (default the public
``https://storage.googleapis.com``) so emulators and stubs work — the
same escape hatch gcp.rs exposes via its endpoint setting.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from influxdb_iox_spark.sources.objstore import ObjectStore


class GcsRequestError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"GCS request failed: HTTP {status}: {body[:300]}")
        self.status = status


class GcsRestObjectStore(ObjectStore):
    """ObjectStore over the GCS JSON API.  ``endpoint`` like
    ``http://127.0.0.1:9023`` (emulator) or the public API root; keys
    live under ``<bucket>/<prefix><key>``."""

    def __init__(
        self,
        bucket: str,
        prefix: str = "",
        endpoint: str = "https://storage.googleapis.com",
        token: "str | None" = None,
        token_provider=None,
        timeout: float = 30.0,
    ):
        self.bucket = bucket
        self.prefix = prefix
        self.endpoint = endpoint.rstrip("/")
        self.token = token
        self.token_provider = token_provider
        self.timeout = timeout

    # -- plumbing ----------------------------------------------------------
    def _headers(self) -> dict:
        tok = self.token_provider() if self.token_provider else self.token
        return {"Authorization": f"Bearer {tok}"} if tok else {}

    def _request(
        self,
        method: str,
        url: str,
        data: bytes | None = None,
        ok: tuple = (200,),
        tolerate: tuple = (),
    ):
        req = urllib.request.Request(
            url, data=data, headers=self._headers(), method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            if e.code in tolerate:
                return e.code, dict(e.headers), b""
            raise GcsRequestError(e.code, e.read().decode(errors="replace"))

    def _obj_url(self, key: str, query: str = "") -> str:
        enc = urllib.parse.quote(self.prefix + key, safe="")
        return (
            f"{self.endpoint}/storage/v1/b/{self.bucket}/o/{enc}"
            + (f"?{query}" if query else "")
        )

    # -- ObjectStore -------------------------------------------------------
    def put(self, key, data, *, if_not_exists=False, if_match=None):
        q = {
            "uploadType": "media",
            "name": self.prefix + key,
        }
        if if_not_exists:
            q["ifGenerationMatch"] = "0"
        if if_match is not None:
            # GCS preconditions are numeric generations; an etag that
            # isn't one (a foreign or corrupted token) can never match,
            # so it loses the CAS without a round trip
            if not str(if_match).isdigit():
                return None
            q["ifGenerationMatch"] = str(if_match)
        url = (
            f"{self.endpoint}/upload/storage/v1/b/{self.bucket}/o?"
            + urllib.parse.urlencode(q)
        )
        status, _, body = self._request(
            "POST", url, data=bytes(data), ok=(200,), tolerate=(412,)
        )
        if status == 412:  # generation precondition failed: CAS lost
            return None
        return str(json.loads(body)["generation"])

    def get(self, key):
        status, h, body = self._request(
            "GET", self._obj_url(key, "alt=media"), ok=(200,), tolerate=(404,)
        )
        if status == 404:
            return None
        gen = next(
            (v for k, v in h.items() if k.lower() == "x-goog-generation"),
            None,
        )
        if gen is None:
            # emulators that drop the header: one metadata round trip
            gen = self.head(key)
        return body, str(gen)

    def head(self, key):
        status, _, body = self._request(
            "GET", self._obj_url(key, "alt=json"), ok=(200,), tolerate=(404,)
        )
        if status == 404:
            return None
        return str(json.loads(body)["generation"])

    def _list_pages(self, prefix: str):
        token = None
        while True:
            q = {"prefix": self.prefix + prefix}
            if token:
                q["pageToken"] = token
            url = (
                f"{self.endpoint}/storage/v1/b/{self.bucket}/o?"
                + urllib.parse.urlencode(q)
            )
            _, _, body = self._request("GET", url)
            doc = json.loads(body)
            for item in doc.get("items", []):
                yield (
                    item["name"][len(self.prefix):],
                    str(item["generation"]),
                )
            token = doc.get("nextPageToken")
            if not token:
                return

    def list(self, prefix):
        return sorted(k for k, _ in self._list_pages(prefix))

    def list_with_etags(self, prefix):
        return sorted(self._list_pages(prefix))

    def delete(self, key, *, if_match=None):
        if if_match is None:
            self._request(
                "DELETE", self._obj_url(key), ok=(200, 204), tolerate=(404,)
            )
            return None
        # Conditional delete (round 16): generation-fenced via
        # ifGenerationMatch — long-standing first-class GCS semantics.
        if not str(if_match).isdigit():
            return False  # non-generation token can never match (put's rule)
        status, _, _ = self._request(
            "DELETE",
            self._obj_url(key, "ifGenerationMatch=" + str(if_match)),
            ok=(200, 204), tolerate=(404, 412),
        )
        return status in (200, 204)
