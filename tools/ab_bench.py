"""Interleaved A/B timing harness for optimization evidence on a noisy box.

Cross-run wall-clock on this machine swings 2x with tenant load, so
before/after pairs from separate sessions are meaningless. This harness
times VARIANTS of a plan inside ONE Spark session, interleaved
(A,B,A,B,...) with a JVM GC before each sample, and reports per-variant
medians — machine drift hits both variants equally.

Usage: a caller script registers variants as {name: fn(spark, sf_dir) -> DF}
and calls run_ab(variants, rounds=5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_ab(variants: dict, rounds: int = 5, sf_dir: str | None = None, spark=None):
    from gohangout_spark import get_spark

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = spark or get_spark("gohangout-spark-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: one pass of every variant (JIT, parquet footers, codegen)
    for name, fn in variants.items():
        force(fn(spark, sf_dir))

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            spark._jvm.System.gc()
            t0 = time.time()
            force(fn(spark, sf_dir))
            samples[name].append(round(time.time() - t0, 3))

    out = {
        n: {"median": round(statistics.median(v), 3), "samples": v}
        for n, v in samples.items()
    }
    print(json.dumps(out))
    return out
