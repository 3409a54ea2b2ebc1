"""A/B evidence for the r10 kneser_ney_score two-pass shape.

HEAD: one corpus pass building a (doc,v,w)-keyed exchange (corpus-bigram
      sized) reused by the bg cascade AND the scoring join; ctx/cont/T
      come back as three broadcast joins.
TWO:  the scoring sum over (doc,v,w) groups of cnt*(-ln p) is
      algebraically the sum of -ln p over RAW bigram instances, so the
      per-doc aggregation partial-aggregates SCAN-SIDE (every instance of
      a doc lives in its task) and the corpus-sized exchange disappears:
      pass 1 builds bg = count per (v,w) (vocab-bounded exchange, map-side
      partials) with c_v/n1_fwd/n1_back as windows over it; pass 2
      re-tokenizes, broadcast-joins the enriched bg, and ships ONE row per
      doc through the (doc_id) exchange. Guide 2.3/2.4: shuffle keys and
      vocab-sized synopses, never the corpus.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kneser_twopass.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def twopass_kneser(spark, sf_dir):
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
    inst = inst.where(
        F.col("v").isNotNull() & F.col("w").isNotNull() & F.col("doc_id").isNotNull()
    )
    bg = inst.groupBy("v", "w").agg(F.count("*").alias("c_vw"))
    wv = Window.partitionBy("v")
    ww = Window.partitionBy("w")
    bg2 = bg.select(
        "v",
        "w",
        "c_vw",
        F.sum("c_vw").over(wv).alias("c_v"),
        F.count(F.lit(1)).over(wv).alias("n1_fwd"),
        F.count(F.lit(1)).over(ww).alias("n1_back"),
    )
    t_df = bg.agg(F.count("*").cast("double").alias("__t_types"))
    d = F.lit(0.75)
    p = (
        F.greatest(F.col("c_vw") - d, F.lit(0.0))
        + d * F.col("n1_fwd") * (F.col("n1_back") / F.col("__t_types"))
    ) / F.col("c_v")
    scored = (
        inst.join(F.broadcast(bg2), ["v", "w"])
        .crossJoin(F.broadcast(t_df))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(-F.log(p)).alias("nll"),
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


def head_kneser(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["kneser_ney_perplexity"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    run_ab({"head": head_kneser, "twopass": twopass_kneser}, rounds)
