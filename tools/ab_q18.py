"""A/B evidence for a one-pass tpch_q18 shape.

HEAD: lineitem aggregated to big-order keys -> semi join orders ->
      SECOND lineitem join (fact-fact) -> 4-key groupBy re-sums
      l_quantity per order.
ONE:  the final group is per-order (o_orderkey is a grouping key and
      the customer columns are functionally dependent on it), so the
      re-aggregated sum(l_quantity) IS the per-order total the HAVING
      subquery already computed. Keep that total: aggregate lineitem
      ONCE, filter q > 300, join orders + customer, project round(q, 2).
      lineitem scans 2 -> 1 and the fact-fact join disappears — at
      scale the saved pass is a full corpus scan + shuffle.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q18.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def onepass_q18(spark, sf_dir):
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("__q"), 2).alias("total_qty"),
        )
    )


def head_q18(spark, sf_dir):
    # the pre-r10 shape, inlined verbatim (workload.py now carries onepass)
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    orders_f = orders.join(
        big_orders, F.col("o_orderkey") == F.col("big_okey"), "left_semi"
    )
    joined = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-q18")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(tuple(r) for r in head_q18(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in onepass_q18(spark, sf_dir).collect())
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    run_ab({"head": head_q18, "onepass": onepass_q18}, rounds, sf_dir=sf_dir, spark=spark)
