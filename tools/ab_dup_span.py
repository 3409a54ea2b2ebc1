"""A/B evidence for the r9 dup_span_stats single-pass restructure.

OLD: groupBy(whash)→cnt>=2 set + semi-join + per-doc agg + tokenize-again
     join-back (tokenize+explode subtree ran twice, tokenize three times).
NEW: whatever functions.dedup.dup_span_stats currently implements
     (window count over whash; one explode; id-only join-back).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_dup_span.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def old_dup_span(spark, sf_dir):
    from gohangout_spark.functions.dedup import _windows_with_index
    from gohangout_spark.functions.num import round_half_up
    from gohangout_spark.functions.text import tokens
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    w = 5
    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    toks = tokens(F.col("text"))
    winds = docs.select(
        F.col("doc_id"), F.explode(_windows_with_index(toks, w)).alias("win")
    ).select("doc_id", F.col("win.whash").alias("whash"))
    dup = (
        winds.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= 2)
        .select("whash")
    )
    per_doc = (
        winds.join(dup, "whash").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    n_windows = F.greatest(F.size(toks) - (w - 1), F.lit(0))
    base = docs.select(F.col("doc_id"), n_windows.alias("n_windows"))
    out = base.join(per_doc, "doc_id", "left").withColumn(
        "n_dup_windows", F.coalesce(F.col("n_dup_windows"), F.lit(0))
    )
    return out.withColumn(
        "dup_window_ratio",
        F.when(
            F.col("n_windows") > 0,
            round_half_up(F.col("n_dup_windows").cast("double") / F.col("n_windows"), 4),
        ),
    )


def new_dup_span(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["dup_span_stats"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    run_ab({"old_two_explodes": old_dup_span, "new_window_count": new_dup_span}, rounds)
