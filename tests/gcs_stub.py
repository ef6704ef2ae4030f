"""In-process GCS JSON-API stub (stdlib only) for GcsRestObjectStore:
media upload with ifGenerationMatch preconditions (0 = create-only,
N = CAS replace; mismatch → 412), media/metadata GET with generations,
DELETE, and paged object listings with pageToken (page size deliberately
small so listings >PAGE keys exercise the token loop).  All object
mutations are atomic under one lock."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PAGE = 100


class GcsStub:
    def __init__(self, bucket: str = "test-bucket"):
        self.bucket = bucket
        self.objects: dict[str, tuple[bytes, int]] = {}  # key -> (data, gen)
        self.lock = threading.Lock()
        self._gen_counter = 0
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

    def _next_gen(self) -> int:
        self._gen_counter += 1
        return self._gen_counter


def _make_handler(stub: GcsStub):
    obj_root = f"/storage/v1/b/{stub.bucket}/o"
    upload_root = f"/upload/storage/v1/b/{stub.bucket}/o"

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _reply(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if self.command != "HEAD" and body:
                self.wfile.write(body)

        def do_POST(self):
            u = urllib.parse.urlsplit(self.path)
            if u.path != upload_root:
                self._reply(404)
                return
            q = urllib.parse.parse_qs(u.query)
            key = (q.get("name") or [None])[0]
            if key is None:
                self._reply(400)
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            want = (q.get("ifGenerationMatch") or [None])[0]
            with stub.lock:
                cur = stub.objects.get(key)
                if want is not None:
                    have = cur[1] if cur is not None else 0
                    if int(want) != have:
                        self._reply(412)
                        return
                gen = stub._next_gen()
                stub.objects[key] = (data, gen)
            body = json.dumps({"name": key, "generation": str(gen)}).encode()
            self._reply(200, body)

        def do_GET(self):
            u = urllib.parse.urlsplit(self.path)
            q = urllib.parse.parse_qs(u.query)
            if u.path == obj_root:  # listing
                self._list(q)
                return
            if not u.path.startswith(obj_root + "/"):
                self._reply(404)
                return
            key = urllib.parse.unquote(u.path[len(obj_root) + 1:])
            with stub.lock:
                cur = stub.objects.get(key)
            if cur is None:
                self._reply(404)
                return
            if (q.get("alt") or ["json"])[0] == "media":
                self._reply(
                    200, cur[0], headers=[("x-goog-generation", str(cur[1]))]
                )
            else:
                body = json.dumps(
                    {"name": key, "generation": str(cur[1])}
                ).encode()
                self._reply(200, body)

        def do_DELETE(self):
            u = urllib.parse.urlsplit(self.path)
            if not u.path.startswith(obj_root + "/"):
                self._reply(404)
                return
            key = urllib.parse.unquote(u.path[len(obj_root) + 1:])
            q = urllib.parse.parse_qs(u.query)
            want_gen = (q.get("ifGenerationMatch") or [None])[0]
            with stub.lock:
                if want_gen is not None:
                    cur = stub.objects.get(key)
                    if cur is None:
                        self._reply(404)
                        return
                    if str(cur[1]) != want_gen:
                        self._reply(412)
                        return
                existed = stub.objects.pop(key, None) is not None
            self._reply(204 if existed else 404)

        def _list(self, q):
            prefix = (q.get("prefix") or [""])[0]
            token = (q.get("pageToken") or [None])[0]
            with stub.lock:
                keys = sorted(
                    k for k in stub.objects if k.startswith(prefix)
                )
                if token:
                    keys = [k for k in keys if k > token]
                page, rest = keys[:PAGE], keys[PAGE:]
                items = [
                    {"name": k, "generation": str(stub.objects[k][1])}
                    for k in page
                ]
            doc = {"items": items}
            if rest:
                doc["nextPageToken"] = page[-1]
            self._reply(200, json.dumps(doc).encode())

    return Handler
