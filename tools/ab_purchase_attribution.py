"""A/B evidence for a single-scan purchase_attribution.

HEAD: asof_join(purchases, clicks) — the two legs are filtered
      projections of the SAME events parquet, and a union of two
      filtered scans plans as TWO full scans (scans have no reuse
      mechanism; executed-plan audit r10).
ONE:  one scan of event_type IN (purchase, click) emitting the union
      schema directly (role flag + per-role payload via CASE), then the
      IDENTICAL window algebra asof_join uses (same ordering, same
      last-ignorenulls, same null-ts guards). Halves corpus I/O; the
      window exchange — the real mover at scale — is unchanged.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_purchase_attribution.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def onescan_pa(spark, sf_dir):
    from gohangout_spark.workload import _events

    ev = _events(spark, sf_dir)
    u = ev.where(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "event_id"
        ),
        "user_id",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("ts"),
        F.col("ts").alias("__ats"),
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("event_id").alias("click_id")),
        ).alias("__pay"),
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("__r"),
    )
    # null-key right rows match nothing; asof_join drops them pre-union —
    # here they are filtered in place (left rows keep asof_join's
    # behavior: they pass through and match nothing via the window)
    u = u.where(
        (F.col("__r") == 0)
        | (F.col("user_id").isNotNull() & F.col("__ats").isNotNull())
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__ats").asc(), F.col("__r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(
        F.when(F.col("__r") == 1, F.col("__pay")), ignorenulls=True
    ).over(w)
    matched = F.when(F.col("ts").isNotNull(), matched)
    out = u.withColumn("__m", matched).filter(F.col("__r") == 0)
    return out.select("event_id", "user_id", F.col("__m")["click_id"].alias("click_id"))


def head_pa(spark, sf_dir):
    from gohangout_spark.functions.joins import asof_join
    from gohangout_spark.workload import _events

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(purchases, clicks, "user_id", direction="backward")
    return out.select("event_id", "user_id", "click_id")


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-pa")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(
        tuple(-1 if c is None else c for c in r) for r in head_pa(spark, sf_dir).collect()
    )
    b_df = onescan_pa(spark, sf_dir)
    b = sorted(
        tuple(-1 if c is None else c for c in r) for r in b_df.collect()
    )
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    final = b_df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    print("onescan final: scans", final.count("Scan parquet"))
    run_ab({"head": head_pa, "onescan": onescan_pa}, rounds, sf_dir=sf_dir, spark=spark)
