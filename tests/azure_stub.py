"""In-process Azure Blob REST stub (stdlib only) for AzureRestObjectStore:
Put Blob with If-None-Match:*/If-Match preconditions (409/412 on
failure, the real service's codes), GET/HEAD with ETags, DELETE, and
List Blobs with NextMarker paging (page size deliberately small so
listings >PAGE keys exercise the marker loop).  All object mutations
are atomic under one lock."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape

PAGE = 100


class AzureStub:
    def __init__(self, container: str = "test-container"):
        self.container = container
        self.objects: dict[str, tuple[bytes, str]] = {}
        self.lock = threading.Lock()
        self._etag_counter = 0
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()

    def _next_etag(self) -> str:
        self._etag_counter += 1
        return f"az{self._etag_counter}"


def _make_handler(stub: AzureStub):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _key(self):
            u = urllib.parse.urlsplit(self.path)
            parts = u.path.lstrip("/").split("/", 1)
            if parts[0] != stub.container:
                return None, None
            key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
            return key, urllib.parse.parse_qs(u.query)

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
            if not key:
                self._reply(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            with stub.lock:
                cur = stub.objects.get(key)
                if self.headers.get("If-None-Match") == "*" and cur is not None:
                    # the real service: 409 BlobAlreadyExists
                    self._reply(409)
                    return
                want = self.headers.get("If-Match")
                if want is not None and (
                    cur is None or cur[1] != want.strip('"')
                ):
                    self._reply(412)
                    return
                etag = stub._next_etag()
                stub.objects[key] = (data, etag)
            self._reply(201, headers=[("ETag", f'"{etag}"')])

        def do_GET(self):
            key, query = self._key()
            if key is None:
                self._reply(404)
                return
            if query and "comp" in query:
                self._list(query)
                return
            with stub.lock:
                cur = stub.objects.get(key)
            if cur is None:
                self._reply(404)
                return
            self._reply(200, cur[0], headers=[("ETag", f'"{cur[1]}"')])

        def do_HEAD(self):
            key, _ = self._key()
            with stub.lock:
                cur = stub.objects.get(key) if key else None
            if cur is None:
                self._reply(404)
                return
            self._reply(200, headers=[("ETag", f'"{cur[1]}"')])

        def do_DELETE(self):
            key, _ = self._key()
            if not key:
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
                existed = stub.objects.pop(key, None) is not None
            self._reply(202 if existed else 404)

        def _list(self, query):
            prefix = (query.get("prefix") or [""])[0]
            marker = (query.get("marker") or [None])[0]
            with stub.lock:
                keys = sorted(
                    k for k in stub.objects if k.startswith(prefix)
                )
                if marker:
                    keys = [k for k in keys if k > marker]
                page, rest = keys[:PAGE], keys[PAGE:]
                items = [(k, stub.objects[k][1]) for k in page]
            parts = ["<?xml version='1.0'?><EnumerationResults><Blobs>"]
            for k, etag in items:
                parts.append(
                    f"<Blob><Name>{escape(k)}</Name>"
                    f'<Properties><Etag>"{etag}"</Etag></Properties></Blob>'
                )
            parts.append("</Blobs>")
            if rest:
                parts.append(f"<NextMarker>{escape(page[-1])}</NextMarker>")
            parts.append("</EnumerationResults>")
            self._reply(200, "".join(parts).encode())

    return Handler
