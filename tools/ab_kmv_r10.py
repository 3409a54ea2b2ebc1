"""Interleaved A/B: kmv_distinct_users with the r10 distinct-before-window
kmv_table (HEAD) vs the r9 window-first shape (reconstructed inline) —
ADVICE r9 (bounded exchange volume under duplication).

Usage: python tools/ab_kmv_r10.py [rounds]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from ab_bench import run_ab

from gohangout_spark.functions.sketch import kmv_estimate, kmv_hash
from gohangout_spark.io import load_table, rebalance_for_compute
from gohangout_spark.workload import QUERIES


def kmv_new(spark, sf_dir):
    return QUERIES["kmv_distinct_users"][0](spark, sf_dir)


def _kmv_table_r9(df, col, group_cols=(), *, k=64):
    from pyspark.sql import Window

    gcols = list(group_cols)
    key = F.col(col).cast("string")
    src = df.where(key.isNotNull()).select(*gcols, kmv_hash(F.col(col)).alias("h"))
    w = Window.partitionBy(*(gcols or [F.lit(1)])).orderBy("h")
    return (
        src.withColumn("__dr", F.dense_rank().over(w))
        .where(F.col("__dr") <= k)
        .drop("__dr")
        .dropDuplicates(gcols + ["h"])
    )


def kmv_old(spark, sf_dir):
    ev = rebalance_for_compute(load_table(spark, sf_dir, "events"), spark).where(
        F.col("user_id").isNotNull()
    )
    sk = _kmv_table_r9(ev, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_dv"))
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("kth").cast("long").alias("kth"),
        F.col("dv_est").cast("long").alias("dv_est"),
        F.col("exact_dv").cast("long").alias("exact_dv"),
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"old": kmv_old, "new": kmv_new}, rounds=rounds)
