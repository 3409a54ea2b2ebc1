"""In-process Elasticsearch HTTP fake — the ES analogue of
sources/kafka_wire.FakeKafkaBroker: a real HTTP server speaking the two
endpoints ElasticsearchSink uses, so the sink's REAL urllib transport
can be exercised end-to-end (sniff + gzipped _bulk bytes) in
environments with no ES server. Dev tier only; the production tier is
a real cluster (the sink's default transport needs nothing else).

Endpoints (elasticsearch_output.go:356-387 sniff, :514-570 bulk):

- ``GET /_nodes/_all/http`` — node discovery; responds with the
  constructor's ``nodes`` map.
- ``POST /_bulk`` — NDJSON bulk; gunzips request bodies like the real
  server (the sink gzips by default), answers per-item verdicts from
  ``item_scripts`` (a queue of per-request status lists; when exhausted
  every doc succeeds) with the whole response wrapped in
  ``bulk_status``.

Every request (path, raw-after-gunzip body, gzip flag) is recorded in
``requests`` for assertions — tests and examples read the captured
bulk bodies to verify exactly what the sink put on the wire.
"""

from __future__ import annotations


class FakeElasticsearchHTTP:
    def __init__(self, nodes: dict | None = None, item_scripts=None,
                 bulk_status: int = 200):
        import http.server
        import threading

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self, status, payload: bytes):
                self.send_response(status)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _handle(self):
                import gzip
                import json

                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                gz = self.headers.get("Content-Encoding") == "gzip"
                if gz:
                    body = gzip.decompress(body)
                server.requests.append(
                    {"path": self.path, "body": body, "gzip": gz}
                )
                if self.path.startswith("/_nodes"):
                    self._respond(200, json.dumps({"nodes": server.nodes}).encode())
                    return
                if self.path == "/_bulk":
                    ndocs = len(body.decode().strip().split("\n")) // 2
                    statuses = (
                        server.item_scripts.pop(0)
                        if server.item_scripts
                        else [200] * ndocs
                    )
                    items = [{"index": {"status": s}} for s in statuses]
                    errors = any(s >= 300 for s in statuses)
                    self._respond(
                        server.bulk_status,
                        json.dumps({"errors": errors, "items": items}).encode(),
                    )
                    return
                self._respond(400, b"unknown endpoint")

            do_GET = _handle
            do_POST = _handle

            def log_message(self, *a):
                pass

        self.nodes = nodes or {}
        self.item_scripts = list(item_scripts or [])
        self.bulk_status = bulk_status
        self.requests: list[dict] = []
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()

    # -- assertion helpers ------------------------------------------------

    def bulk_docs(self) -> list[dict]:
        """Every SOURCE document received across all /_bulk requests, in
        arrival order (the odd NDJSON lines; action lines are the even
        ones)."""
        import json

        docs = []
        for req in self.requests:
            if req["path"] != "/_bulk":
                continue
            lines = req["body"].decode().strip().split("\n")
            docs.extend(json.loads(line) for line in lines[1::2])
        return docs
