"""A/B evidence for sharing ONE distinct (event_type, user_id) pass
between kmv_distinct_users' sketch and exact-verification branches.

HEAD: kmv_table(ev) and ev.groupBy.countDistinct(user_id) are planned as
      two INDEPENDENT subtrees — 2 corpus scans + 2 round-robin
      rebalance exchanges (executed-plan audit r10), even though the
      sketch is dedup-insensitive and countDistinct internally reduces
      to distinct (group, value) pairs anyway.
SHARED: du = distinct (event_type, user_id) computed once; the sketch is
      kmv_table(du) (identical synopsis — bottom-k distinct hashes don't
      see duplicates; the pre_distinct identity test pins this) and
      exact_dv = du.groupBy(event_type).count(). One corpus scan, one
      corpus-wide exchange, both consumers riding it.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kmv_shared.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def shared_kmv(spark, sf_dir):
    from gohangout_spark.functions.sketch import kmv_estimate, kmv_table
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _events

    ev = rebalance_for_compute(_events(spark, sf_dir), spark).where(
        F.col("user_id").isNotNull()
    )
    # state kmv_table's internal cast-notnull filter ONCE before the
    # distinct (data no-op) so the sketch branch's pushed copy collapses
    # and both consumers' subtrees canonicalize equal (the r9 exchange-
    # sharing trick)
    du = (
        ev.where(F.col("user_id").cast("string").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    sk = kmv_table(du, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_dv"))
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("kth").cast("long").alias("kth"),
        F.col("dv_est").cast("long").alias("dv_est"),
        F.col("exact_dv").cast("long").alias("exact_dv"),
    )


def head_kmv(spark, sf_dir):
    from gohangout_spark.functions.sketch import kmv_estimate, kmv_table
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _events

    ev = rebalance_for_compute(_events(spark, sf_dir), spark).where(
        F.col("user_id").isNotNull()
    )
    sk = kmv_table(ev, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_dv")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("kth").cast("long").alias("kth"),
        F.col("dv_est").cast("long").alias("dv_est"),
        F.col("exact_dv").cast("long").alias("exact_dv"),
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-kmv-shared")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(tuple(r) for r in head_kmv(spark, sf_dir).collect())
    b_df = shared_kmv(spark, sf_dir)
    b = sorted(tuple(r) for r in b_df.collect())
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    print(
        "shared final plan: scans",
        final.count("Scan parquet"),
        "RR",
        final.count("Exchange RoundRobin"),
        "reuse",
        final.count("ReusedExchange"),
    )
    run_ab({"head": head_kmv, "shared": shared_kmv}, rounds, sf_dir=sf_dir, spark=spark)
