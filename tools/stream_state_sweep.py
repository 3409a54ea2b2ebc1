"""Streaming STATE sweep (VERDICT r8 #6): measure state-store rows and
per-batch wall for the two stateful-streaming shapes whose scale killer
is state growth — gap-session windows and the stream-stream interval
join — at sf0.1 and at the derived 100x events corpus.

The batch families have wall-time sweeps (scale_sweep.py); what those
cannot show is whether STREAMING state stays bounded by the watermark
horizon instead of growing with total stream length. This sweep runs
each shape as a real writeStream over time-ordered epoch files at a
TIGHT watermark (2 days against a ~30-day corpus, so eviction must
fire continuously) and reads the state-operator metrics Spark reports
per micro-batch (numRowsTotal / numRowsUpdated / numRowsRemoved):

- scale-safe evidence = peak state rows << input rows, rows REMOVED > 0
  (the watermark is actually evicting), and peak state at 100x growing
  ~with per-horizon density (more users in the same time span), NOT
  with corpus length;
- a missing eviction (removed == 0 at a tight watermark) or peak state
  ~= input rows flags the unbounded-state class.

    PYTHONPATH=. python tools/stream_state_sweep.py [out_dir]

Reuses scale_sweep.py's derived 100x events parquet (built on demand).
Epochs are cut by TIME (8 contiguous ts ranges) so event time advances
across batches the way a live stream's does — the operating point where
watermark eviction does real work (the replay GATES deliberately use
out-of-order mod-id epochs + no-evict watermarks, the correctness
limiting case; this sweep is the capacity limiting case).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.io import ensure_event_time, load_table
from tools.scale_sweep import build_derived

N_EPOCHS = 8
WATERMARK = "2 days"


def write_time_epochs(df, ts_col: str, base: str, in_dir: str, n: int = N_EPOCHS):
    """n single-file parquet batches cut by contiguous event-time ranges,
    mtime-ordered for maxFilesPerTrigger=1 delivery (the time-ordered
    twin of workload._write_epoch_files)."""
    os.makedirs(in_dir, exist_ok=True)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    lo, hi = df.agg(F.min(sec), F.max(sec)).first()
    cuts = [lo + (hi - lo + 1) * k // n for k in range(n + 1)]
    for k in range(n):
        tmp = f"{base}/tmp_{k}"
        df.filter((sec >= cuts[k]) & (sec < cuts[k + 1])).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        shutil.move(part, f"{in_dir}/batch_{k}.parquet")
        os.utime(f"{in_dir}/batch_{k}.parquet", (1_000_000 + k, 1_000_000 + k))


def state_metrics(query):
    """-> (peak_total, final_total, sum_removed, sum_updated) across the
    run's state operators, from the per-batch progress feed."""
    peak = final = removed = updated = 0
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        total = sum(o.get("numRowsTotal", 0) for o in ops)
        peak = max(peak, total)
        final = total
        removed += sum(o.get("numRowsRemoved", 0) for o in ops)
        updated += sum(o.get("numRowsUpdated", 0) for o in ops)
    return peak, final, removed, updated


def run_session_windows(spark, ev, label):
    base = tempfile.mkdtemp(prefix=f"state_sweep_sess_{label}_")
    in_dir = f"{base}/in"
    try:
        n_in = ev.count()
        write_time_epochs(ev.select("event_id", "user_id", "ts"), "ts", base, in_dir)
        stream = (
            spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        agg = (
            stream.withWatermark("ts", WATERMARK)
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.time()
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        q.processAllAvailable()
        wall = time.time() - t0
        peak, final, removed, updated = state_metrics(q)
        q.stop()
        q.awaitTermination()
        return n_in, wall, peak, final, removed, updated
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_interval_join(spark, ev, label):
    base = tempfile.mkdtemp(prefix=f"state_sweep_join_{label}_")
    try:
        sides = {}
        n_in = 0
        for kind in ("purchase", "click"):
            d = f"{base}/in_{kind}"
            side = ev.where(F.col("event_type") == kind).select(
                "event_id", "user_id", "ts"
            )
            n_in += side.count()
            write_time_epochs(side, "ts", f"{base}/tmp_{kind}", d)
            sides[kind] = d
        schema = "event_id bigint, user_id bigint, ts timestamp"
        purch = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sides["purchase"])
            .withWatermark("ts", WATERMARK)
        )
        clicks = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sides["click"])
            .withColumnRenamed("ts", "cts")
            .withColumnRenamed("event_id", "click_id")
            .withColumnRenamed("user_id", "cuser")
            .withWatermark("cts", WATERMARK)
        )
        joined = purch.join(
            clicks,
            (purch["user_id"] == clicks["cuser"])
            & (clicks["cts"] >= purch["ts"] - F.expr("INTERVAL 6 HOURS"))
            & (clicks["cts"] <= purch["ts"]),
        )
        t0 = time.time()
        q = (
            joined.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        q.processAllAvailable()
        wall = time.time() - t0
        peak, final, removed, updated = state_metrics(q)
        q.stop()
        q.awaitTermination()
        return n_in, wall, peak, final, removed, updated
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_derived"
    spark = get_spark("stream-state-sweep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_derived(spark, "/root/testdata/sf0.1", out_dir)

    small = ensure_event_time(load_table(spark, "/root/testdata/sf0.1", "events"), "ts")
    big = ensure_event_time(
        spark.read.parquet(os.path.join(out_dir, "events.parquet")), "ts"
    )

    print(f"watermark={WATERMARK}, epochs={N_EPOCHS} (time-ordered)")
    print("| op | scale | input rows | wall s | peak state | final state "
          "| removed | updated |")
    print("|---|---|---|---|---|---|---|---|")
    for name, runner in (
        ("session_window_30m", run_session_windows),
        ("interval_join_6h", run_interval_join),
    ):
        for label, ev in (("sf0.1", small), ("100x", big)):
            n_in, wall, peak, final, removed, updated = runner(spark, ev, label)
            print(
                f"| {name} | {label} | {n_in} | {wall:.1f} | {peak} "
                f"| {final} | {removed} | {updated} |"
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
