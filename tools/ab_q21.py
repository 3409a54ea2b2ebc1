"""A/B evidence for a one-pass tpch_q21 shape.

HEAD: late-pairs distinct -> sole-late groupBy -> lineitem SECOND pass
      (semi-restricted) -> countDistinct -> two semi joins.
ONE:  one li JOIN orders(F) pass -> groupBy(orderkey, suppkey) with a
      max(late) flag -> groupBy(orderkey) conditional counts
      (ns = suppliers, nlate = late suppliers, thelate = the unique late
      suppkey when nlate = 1) -> filter ns >= 2 AND nlate = 1 -> supplier
      join -> count per s_name. Algebraically the same double
      correlation: EXISTS other-supplier == ns >= 2, NOT EXISTS
      other-late == nlate == 1 (the probe row itself is late). At scale
      the join's hash(orderkey) output partitioning clusters BOTH
      aggregations (subset-key rule), so the cascade adds no exchange
      after the fact-fact join.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q21.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def onepass_q21(spark, sf_dir):
    from gohangout_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
            ).alias("__late"),
        )
    )
    per_pair = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__any_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__ns"),
        F.sum(F.col("__any_late").cast("int")).alias("__nlate"),
        F.max(F.when(F.col("__any_late"), F.col("l_suppkey"))).alias("l_suppkey"),
    )
    waiting = per_order.where((F.col("__ns") >= 2) & (F.col("__nlate") == 1))
    return (
        waiting.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def head_q21(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["tpch_q21"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-q21")
    spark.sparkContext.setLogLevel("ERROR")
    a = [tuple(r) for r in head_q21(spark, sf_dir).collect()]
    b = [tuple(r) for r in onepass_q21(spark, sf_dir).collect()]
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    run_ab({"head": head_q21, "onepass": onepass_q21}, rounds, sf_dir=sf_dir, spark=spark)
