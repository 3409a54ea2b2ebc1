"""Streaming observability — the analogue of the reference's prometheus
counters (/root/reference/topology/prom_counter.go:68-92) on Spark's
StreamingQueryListener.

Counters exposed: input rows, processed rows/sec, batch durations, state
rows — per query, pulled from the engine's own progress events instead of
hand-maintained atomics. ``attach(spark)`` registers the listener; counters
are readable from ``PipelineMetrics.snapshot()`` and optionally printed as
one JSON line per micro-batch (the Dot-output-style throughput eyeball).
"""

from __future__ import annotations

import json
import sys
import threading

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetrics(StreamingQueryListener):
    def __init__(self, echo: bool = False):
        self.echo = echo
        self._lock = threading.Lock()
        self._by_query: dict[str, dict] = {}
        self._counters: dict[str, int] = {}

    # -- listener hooks ----------------------------------------------------
    def onQueryStarted(self, event):
        with self._lock:
            self._by_query[str(event.id)] = {"name": event.name, "batches": 0,
                                             "input_rows": 0, "last": {}}

    def onQueryProgress(self, event):
        p = event.progress
        snap = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_sec": round(p.processedRowsPerSecond or 0.0, 1),
            "duration_ms": p.durationMs.get("triggerExecution")
            if isinstance(p.durationMs, dict)
            else None,
        }
        observed = {}
        for name, row in (p.observedMetrics or {}).items():
            # per-item: a foreign observation (user df.observe without an
            # "events" field) must not abort the pipeline's own counters
            try:
                observed[name] = int(row["events"])
            except (KeyError, TypeError, ValueError):
                continue
        with self._lock:
            q = self._by_query.setdefault(str(p.id), {"name": p.name, "batches": 0,
                                                      "input_rows": 0, "last": {}})
            q["batches"] += 1
            q["input_rows"] += p.numInputRows or 0
            q["last"] = snap
            # per-filter prometheus_counter events (df.observe name → count)
            for name, n in observed.items():
                self._counters[name] = self._counters.get(name, 0) + n
        if self.echo:
            print(json.dumps({"query": p.name or str(p.id), **snap}), file=sys.stderr)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- API ---------------------------------------------------------------
    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self._by_query.items()}

    def counters(self) -> dict[str, int]:
        with self._lock:
            return dict(self._counters)

    def prometheus_text(self) -> str:
        """Prometheus exposition format — what the reference serves on its
        --prometheus addr (gohangout.go:139-146, promhttp.Handler)."""
        lines = [
            "# HELP gohangout_input_rows_total rows ingested per streaming query",
            "# TYPE gohangout_input_rows_total counter",
        ]
        snap = self.snapshot()
        for qid, v in snap.items():
            label = (v.get("name") or qid).replace('"', "")
            lines.append(f'gohangout_input_rows_total{{query="{label}"}} {v["input_rows"]}')
        lines += [
            "# HELP gohangout_batches_total micro-batches executed per query",
            "# TYPE gohangout_batches_total counter",
        ]
        for qid, v in snap.items():
            label = (v.get("name") or qid).replace('"', "")
            lines.append(f'gohangout_batches_total{{query="{label}"}} {v["batches"]}')
        counters = self.counters()
        if counters:
            lines += [
                "# HELP gohangout_filter_events_total events counted by per-filter prometheus_counter",
                "# TYPE gohangout_filter_events_total counter",
            ]
            for name in sorted(counters):
                safe = name.replace('"', "")
                lines.append(
                    f'gohangout_filter_events_total{{counter="{safe}"}} {counters[name]}'
                )
        return "\n".join(lines) + "\n"


def attach(spark, echo: bool = False) -> PipelineMetrics:
    m = PipelineMetrics(echo=echo)
    spark.streams.addListener(m)
    return m


def serve_prometheus(metrics: PipelineMetrics, addr: str = "127.0.0.1:0"):
    """Serve ``/metrics`` for the given PipelineMetrics on a daemon thread —
    the analogue of ``gohangout --prometheus host:port``. Returns the
    HTTPServer (``.server_address`` has the bound port; ``.shutdown()``
    stops it)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    host, _, port = addr.rpartition(":")

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/metrics":
                self.send_response(404)
                self.end_headers()
                return
            body = metrics.prometheus_text().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer((host or "0.0.0.0", int(port)), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
