"""A/B evidence for the r9 kneser_ney_score T-scalar change.

OLD: T = float(bg.count()) — a separate eager job recomputing
     scan -> explode -> doc_bg -> bg before the main job; T rides as a lit.
NEW: T = broadcast 1-row agg cross-joined in-plan (the oracle's `tt` CTE
     shape) — one job total.  (The NEW path is whatever lm.kneser_ney_score
     currently implements; OLD is reconstructed inline here.)

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kneser.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def old_kneser(spark, sf_dir):
    from gohangout_spark.functions.num import round_half_up
    from gohangout_spark.functions.text import tokens
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    length = F.greatest(n - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice("toks", 1, length).alias("v"), F.slice("toks", 2, length).alias("w")
    )
    inst = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.v").alias("v"), F.col("p.w").alias("w")
    )
    doc_bg = inst.groupBy("doc_id", "v", "w").agg(F.count("*").alias("cnt"))
    bg = doc_bg.groupBy("v", "w").agg(F.sum("cnt").alias("c_vw"))
    ctx = bg.groupBy("v").agg(F.sum("c_vw").alias("c_v"), F.count("*").alias("n1_fwd"))
    cont = bg.groupBy("w").agg(F.count("*").alias("n1_back"))
    t_types = float(bg.count())  # the OLD separate job
    d = F.lit(0.75)
    p = (
        F.greatest(F.col("c_vw") - d, F.lit(0.0))
        + d * F.col("n1_fwd") * (F.col("n1_back") / F.lit(t_types))
    ) / F.col("c_v")
    scored = (
        doc_bg.join(bg, ["v", "w"])
        .join(ctx, ["v"])
        .join(cont, ["w"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * -F.log(p)).alias("nll"),
        )
    )
    return (
        base.select("doc_id")
        .join(scored, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            round_half_up(F.exp(F.col("nll") / F.col("n_bigrams")), 4).alias("ppl"),
        )
    )


def new_kneser(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["kneser_ney_perplexity"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    run_ab({"old_count_job": old_kneser, "new_broadcast_t": new_kneser}, rounds)
