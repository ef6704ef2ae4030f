"""Azure Blob ObjectStore over plain REST — the Azure twin of s3rest.py.

The reference ships an Azure client for its object_store abstraction
(object_store/src/azure.rs); this speaks the same 5-method surface
(`objstore.ObjectStore`) to the public Blob service REST API with
nothing but the standard library:

- conditional writes: Put Blob with ``If-None-Match: *`` (create-only)
  and ``If-Match: <etag>`` (CAS replace).  Azure answers 409
  (BlobAlreadyExists) / 412 (Precondition Failed) respectively — both
  map to the protocol's "CAS lost" (returns None), exactly like the
  in-memory double.
- listings: ``List Blobs`` (``restype=container&comp=list``) with
  NextMarker paging; etags ride ``Properties/Etag``, so
  ``list_with_etags`` (and the manifest ``version()`` probe) is
  metadata-priced.
- auth: either a SAS token (appended to every URL's query — the
  simplest production path) or the account SharedKey scheme (HMAC-SHA256
  over the canonicalized request, public spec 'Authorize with Shared
  Key'); anonymous endpoints (Azurite with public containers, the test
  stub) skip both.

``endpoint`` like ``http://127.0.0.1:10000/devstoreaccount1`` (Azurite)
or ``https://<account>.blob.core.windows.net``.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from influxdb_iox_spark.sources.objstore import ObjectStore


class AzureRequestError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"Azure request failed: HTTP {status}: {body[:300]}")
        self.status = status


class SharedKeySigner:
    """Blob-service SharedKey (public spec: 'Authorize with Shared Key')."""

    def __init__(self, account: str, key_b64: str):
        self.account = account
        self.key = base64.b64decode(key_b64)

    def sign(self, method: str, url: str, headers: dict, content_len: int) -> dict:
        u = urllib.parse.urlsplit(url)
        out = dict(headers)
        out["x-ms-date"] = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%a, %d %b %Y %H:%M:%S GMT"
        )
        out["x-ms-version"] = out.get("x-ms-version", "2021-08-06")
        ms_headers = "".join(
            f"{k.lower()}:{str(out[k]).strip()}\n"
            for k in sorted(out, key=str.lower)
            if k.lower().startswith("x-ms-")
        )
        # canonicalized resource: /account/path + sorted query k:v lines
        res = f"/{self.account}{u.path}"
        q = urllib.parse.parse_qs(u.query, keep_blank_values=True)
        for k in sorted(q):
            res += f"\n{k.lower()}:{','.join(sorted(q[k]))}"
        string_to_sign = "\n".join(
            [
                method,
                "",  # Content-Encoding
                "",  # Content-Language
                str(content_len) if content_len else "",
                "",  # Content-MD5
                out.get("Content-Type", ""),
                "",  # Date (x-ms-date used instead)
                out.get("If-Modified-Since", ""),
                out.get("If-Match", ""),
                out.get("If-None-Match", ""),
                out.get("If-Unmodified-Since", ""),
                "",  # Range
                ms_headers + res,
            ]
        )
        sig = base64.b64encode(
            hmac.new(self.key, string_to_sign.encode(), hashlib.sha256).digest()
        ).decode()
        out["Authorization"] = f"SharedKey {self.account}:{sig}"
        return out


class AzureRestObjectStore(ObjectStore):
    """ObjectStore over Azure Blob REST.  Keys live under
    ``<container>/<prefix><key>`` as block blobs."""

    def __init__(
        self,
        endpoint: str,
        container: str,
        prefix: str = "",
        account: str | None = None,
        account_key: str | None = None,
        sas_token: str | None = None,
        timeout: float = 30.0,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.container = container
        self.prefix = prefix
        self.timeout = timeout
        self.sas = sas_token.lstrip("?") if sas_token else None
        self.signer = (
            SharedKeySigner(account, account_key)
            if account and account_key
            else None
        )

    # -- plumbing ----------------------------------------------------------
    def _url(self, key: str = "", query: str = "") -> str:
        path = f"/{self.container}"
        if key:
            path += "/" + urllib.parse.quote(self.prefix + key, safe="/-_.~")
        parts = [p for p in (query, self.sas) if p]
        return self.endpoint + path + ("?" + "&".join(parts) if parts else "")

    def _request(
        self,
        method: str,
        url: str,
        data: bytes | None = None,
        headers: dict | None = None,
        ok: tuple = (200,),
        tolerate: tuple = (),
    ):
        headers = dict(headers or {})
        if self.signer is not None:
            headers = self.signer.sign(
                method, url, headers, len(data) if data else 0
            )
        req = urllib.request.Request(
            url, data=data, headers=headers, method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            if e.code in tolerate:
                return e.code, dict(e.headers), b""
            raise AzureRequestError(e.code, e.read().decode(errors="replace"))

    @staticmethod
    def _etag(headers: dict) -> str:
        for k, v in headers.items():
            if k.lower() == "etag":
                return v.strip('"')
        raise AzureRequestError(0, "response carried no ETag header")

    # -- ObjectStore -------------------------------------------------------
    def put(self, key, data, *, if_not_exists=False, if_match=None):
        headers = {"x-ms-blob-type": "BlockBlob"}
        if if_not_exists:
            headers["If-None-Match"] = "*"
        if if_match is not None:
            headers["If-Match"] = f'"{if_match}"'
        status, h, _ = self._request(
            "PUT", self._url(key), data=bytes(data), headers=headers,
            ok=(201,), tolerate=(409, 412),
        )
        if status in (409, 412):  # BlobAlreadyExists / precondition failed
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
        status, h, _ = self._request(
            "HEAD", self._url(key), ok=(200,), tolerate=(404,)
        )
        return None if status == 404 else self._etag(h)

    def _list_pages(self, prefix: str):
        marker = None
        while True:
            q = "restype=container&comp=list&prefix=" + urllib.parse.quote(
                self.prefix + prefix, safe=""
            )
            if marker:
                q += "&marker=" + urllib.parse.quote(marker, safe="")
            _, _, body = self._request("GET", self._url(query=q))
            root = ET.fromstring(body)
            for b in root.findall("./Blobs/Blob"):
                name = b.findtext("Name") or ""
                etag = (b.findtext("./Properties/Etag") or "").strip('"')
                yield name[len(self.prefix):], etag
            marker = root.findtext("NextMarker")
            if not marker:
                return

    def list(self, prefix):
        return sorted(k for k, _ in self._list_pages(prefix))

    def list_with_etags(self, prefix):
        return sorted(self._list_pages(prefix))

    def delete(self, key, *, if_match=None):
        if if_match is None:
            self._request(
                "DELETE", self._url(key), ok=(200, 202), tolerate=(404,)
            )
            return None
        # Conditional delete (round 16): Delete Blob honors If-Match —
        # first-class Azure semantics (412 on etag mismatch).
        status, _, _ = self._request(
            "DELETE", self._url(key),
            headers={"If-Match": f'"{if_match}"'},
            ok=(200, 202), tolerate=(404, 409, 412),
        )
        return status in (200, 202)
