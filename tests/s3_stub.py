"""In-process S3-compatible stub server (stdlib only) for exercising
S3RestObjectStore: conditional PUT (If-None-Match:*/If-Match → 412),
GET/HEAD with ETags, DELETE, and paged ListObjectsV2 with continuation
tokens (page size deliberately small so listings >PAGE keys exercise the
token loop).  All object mutations are atomic under one lock — the
atomicity a real object store provides per key.
"""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape

PAGE = 100


class S3Stub:
    def __init__(self, bucket: str = "test-bucket"):
        self.bucket = bucket
        self.objects: dict[str, tuple[bytes, str]] = {}
        self.lock = threading.Lock()
        self._etag_counter = 0
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()

    def _next_etag(self) -> str:
        self._etag_counter += 1
        return f"se{self._etag_counter}"


def _make_handler(stub: S3Stub):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _key(self):
            path = urllib.parse.urlsplit(self.path)
            parts = path.path.lstrip("/").split("/", 1)
            if parts[0] != stub.bucket:
                return None, None
            key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
            return key, urllib.parse.parse_qs(path.query)

        def _reply(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD" and body:
                self.wfile.write(body)

        def do_PUT(self):
            key, _ = self._key()
            if key is None:
                self._reply(404, b"<Error><Code>NoSuchBucket</Code></Error>")
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            with stub.lock:
                cur = stub.objects.get(key)
                if self.headers.get("If-None-Match") == "*" and cur is not None:
                    self._reply(412)
                    return
                want = self.headers.get("If-Match")
                if want is not None and (
                    cur is None or cur[1] != want.strip('"')
                ):
                    self._reply(412)
                    return
                etag = stub._next_etag()
                stub.objects[key] = (data, etag)
            self._reply(200, headers=[("ETag", f'"{etag}"')])

        def do_GET(self):
            key, query = self._key()
            if key is None:
                self._reply(404, b"<Error><Code>NoSuchBucket</Code></Error>")
                return
            if query and "list-type" in query:
                self._list(query)
                return
            with stub.lock:
                cur = stub.objects.get(key)
            if cur is None:
                self._reply(404, b"<Error><Code>NoSuchKey</Code></Error>")
                return
            self._reply(200, cur[0], headers=[("ETag", f'"{cur[1]}"')])

        def do_HEAD(self):
            key, _ = self._key()
            if key is None:
                self._reply(404)
                return
            with stub.lock:
                cur = stub.objects.get(key)
            if cur is None:
                self._reply(404)
                return
            self._reply(200, headers=[("ETag", f'"{cur[1]}"')])

        def do_DELETE(self):
            key, _ = self._key()
            if key is None:
                self._reply(404)
                return
            if_match = self.headers.get("If-Match")
            with stub.lock:
                if if_match is not None:
                    cur = stub.objects.get(key)
                    if cur is None:
                        self._reply(404)
                        return
                    if if_match.strip('"') != cur[1]:
                        self._reply(412)
                        return
                stub.objects.pop(key, None)
            self._reply(204)

        def _list(self, query):
            prefix = (query.get("prefix") or [""])[0]
            token = (query.get("continuation-token") or [None])[0]
            with stub.lock:
                keys = sorted(
                    k for k in stub.objects if k.startswith(prefix)
                )
                if token:
                    keys = [k for k in keys if k > token]
                page, rest = keys[:PAGE], keys[PAGE:]
                items = [(k, stub.objects[k][1]) for k in page]
            parts = ["<?xml version='1.0'?><ListBucketResult>"]
            for k, etag in items:
                parts.append(
                    f"<Contents><Key>{escape(k)}</Key>"
                    f'<ETag>"{etag}"</ETag></Contents>'
                )
            parts.append(
                f"<IsTruncated>{'true' if rest else 'false'}</IsTruncated>"
            )
            if rest:
                parts.append(
                    f"<NextContinuationToken>{escape(page[-1])}"
                    "</NextContinuationToken>"
                )
            parts.append("</ListBucketResult>")
            self._reply(200, "".join(parts).encode())

    return Handler
