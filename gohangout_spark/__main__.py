"""CLI — the analogue of ``gohangout --config config.yml``
(/root/reference/gohangout.go:133-159).

    python -m gohangout_spark --config pipeline.yml [--streaming]
        [--trigger-seconds N] [--checkpoint DIR] [--cpus N]

``--worker`` is accepted for config compatibility and ignored: Spark's task
parallelism (source partitions × cores) replaces gohangout workers.
"""

from __future__ import annotations

import argparse
import sys


def _install_stop_handlers():
    """SIGTERM/SIGINT → a threading.Event (internal/signal/signal.go)."""
    import signal as _signal
    import threading

    stop_evt = threading.Event()
    for s in (_signal.SIGTERM, _signal.SIGINT):
        _signal.signal(s, lambda *_: stop_evt.set())
    return stop_evt


def _run_until_signal(queries) -> None:
    """Graceful shutdown parity (internal/signal/signal.go → inputs.stop(),
    gohangout.go:155-158): on SIGTERM/SIGINT stop every streaming query —
    offsets/state are checkpointed, so a restart resumes without loss —
    then return so the process exits 0 instead of dying mid-batch."""
    stop_evt = _install_stop_handlers()
    while not stop_evt.is_set() and any(q.isActive for q in queries):
        stop_evt.wait(1.0)
    for q in queries:
        if q.isActive:
            q.stop()
    for q in queries:
        q.awaitTermination()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gohangout-spark")
    ap.add_argument("--config", required=True, help="YAML pipeline config (path or URL)")
    ap.add_argument("--streaming", action="store_true", help="run as Structured Streaming")
    ap.add_argument(
        "--available-now",
        action="store_true",
        help="streaming backfill: process everything available (checkpointed, "
        "rate-limited micro-batches), then exit — resumable via --checkpoint",
    )
    ap.add_argument("--trigger-seconds", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    ap.add_argument("--worker", type=int, default=None, help="ignored (reference compat)")
    ap.add_argument(
        "--reload",
        action="store_true",
        help="watch the config file and restart the pipeline on change "
        "(gohangout --reload; streaming only)",
    )
    ap.add_argument(
        "--prometheus",
        default=None,
        metavar="HOST:PORT",
        help="serve /metrics in Prometheus format (gohangout --prometheus)",
    )
    args = ap.parse_args(argv)

    from gohangout_spark import get_spark
    from gohangout_spark.pipeline import Pipeline, run_streaming_with_reload

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark("gohangout-spark", master=master)
    if args.prometheus:
        from gohangout_spark.streaming.observability import attach, serve_prometheus

        serve_prometheus(attach(spark), args.prometheus)
    if args.streaming:
        if args.reload:
            stop = _install_stop_handlers()
            run_streaming_with_reload(
                spark,
                args.config,
                trigger_seconds=args.trigger_seconds,
                checkpoint=args.checkpoint,
                stop_flag=stop,
            )
        else:
            queries = Pipeline.from_config(args.config).run_streaming(
                spark,
                trigger_seconds=args.trigger_seconds,
                checkpoint=args.checkpoint,
                available_now=args.available_now,
            )
            if args.available_now:
                for q in queries:
                    q.awaitTermination()
            else:
                _run_until_signal(queries)
    else:
        Pipeline.from_config(args.config).run_batch(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
