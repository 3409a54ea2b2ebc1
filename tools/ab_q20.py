"""A/B evidence for a window-shaped tpch_q20.

HEAD: per = (partkey, suppkey) agg; tot = per re-aggregated per partkey;
      per JOIN tot — Catalyst plans the join's two inputs as two
      INDEPENDENT copies of the lineitem⋈named subtree (initial plan:
      2 lineitem scans, SortMergeJoin; AQE reuses only the named-part
      broadcast at runtime).
WIN:  tot is a grouped total OVER per itself, so compute it as
      sum(qty) OVER (PARTITION BY l_partkey) riding per's output — the
      lineitem⋈named scan + partial agg runs ONCE, the window's exchange
      carries only (partkey, suppkey, qty) aggregate rows, and the
      SortMergeJoin disappears. qty values are sums of integer-valued
      l_quantity (exact in double), so the window total is bit-identical
      to the join total regardless of accumulation order.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q20.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def window_q20(spark, sf_dir):
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    named = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    per = (
        li.join(F.broadcast(named), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per.withColumn("total_qty", F.sum("qty").over(w))
        .where(F.col("qty") >= 0.1 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return sup.join(
        F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def head_q20(spark, sf_dir):
    # the pre-r10 shape, inlined verbatim (workload.py now carries window)
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    named = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    per = (
        li.join(F.broadcast(named), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = per.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        per.join(tot, "l_partkey")
        .where(F.col("qty") >= 0.1 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return sup.join(
        F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-q20")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(tuple(r) for r in head_q20(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in window_q20(spark, sf_dir).collect())
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    run_ab({"head": head_q20, "window": window_q20}, rounds, sf_dir=sf_dir, spark=spark)
