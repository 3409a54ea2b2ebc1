"""A/B record for a one-scan tpch_q4 shape — REJECTED (scale-negative).

HEAD: late order keys distinct'd from li⋈orders(quarter), then orders
      scanned a SECOND time for the semi join (executed plan: 2 orders
      scans, 3 hash exchanges).
ONE:  carry o_orderpriority through the first join and distinct
      (o_orderkey, o_orderpriority) — orders scans 2 -> 1, semi join
      gone, at the cost of one priority STRING widening every
      distinct-exchange row.

Measured: sf0.1 interleaved 0.762 -> 0.620 s (7/7 pairwise, identical
rows) — but at 100× facts (/tmp/sf1_derived/tpch100) the variant LOST
2.2 -> 2.6 s median (3/3 pairwise, identical rows): at scale the
distinct exchange dominates and the ~15-byte string per key outweighs
the saved dimension-cheap orders scan. Same verdict class as the r10
kneser window-fold — a sf0.1 win that inverts at volume. The two-scan
shape stays in workload.py.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q4.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def onescan_q4(spark, sf_dir):
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def head_q4(spark, sf_dir):
    # the pre-r10 shape, inlined verbatim (workload.py now carries onescan)
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late_keys = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late_keys, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-q4")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(tuple(r) for r in head_q4(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in onescan_q4(spark, sf_dir).collect())
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    run_ab({"head": head_q4, "onescan": onescan_q4}, rounds, sf_dir=sf_dir, spark=spark)
