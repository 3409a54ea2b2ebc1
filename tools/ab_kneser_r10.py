"""A/B evidence for the r10 kneser_ney_score hashed-vocab change.

OLD: the (doc,v,w) exchange and every downstream agg/join key carries the
     word STRINGS, which are never output — only grouped and joined on.
NEW: tokens are hashed to xxhash64 longs scan-side, so the dominant
     exchange and the bg/ctx/cont keyspaces carry 8-byte longs
     (guide section 2.3: narrower types / shuffle keys not payloads).
     Counts — and therefore ppl — are identical unless two distinct
     corpus words collide in xxhash64 (~2^-64 per pair, the same
     accepted class as the n-gram decontamination hash keys).

The OLD path is whatever lm.kneser_ney_score currently implements at
HEAD; NEW is reconstructed inline here until it wins and is folded in.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kneser_r10.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def hashed_kneser(spark, sf_dir):
    from gohangout_spark.functions.num import round_half_up
    from gohangout_spark.functions.text import tokens
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    base = docs.select(
        "doc_id",
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("toks"),
    )
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
    doc_bg = inst.groupBy("doc_id", "v", "w").agg(F.count("*").alias("cnt"))
    bg = doc_bg.groupBy("v", "w").agg(F.sum("cnt").alias("c_vw"))
    ctx = bg.groupBy("v").agg(F.sum("c_vw").alias("c_v"), F.count("*").alias("n1_fwd"))
    _n_rows = F.count(F.when(F.col("c_vw").isNotNull(), F.lit(1)))
    cont = bg.groupBy("w").agg(_n_rows.alias("n1_back"))
    t_df = bg.agg(_n_rows.cast("double").alias("__t_types"))
    d = F.lit(0.75)
    p = (
        F.greatest(F.col("c_vw") - d, F.lit(0.0))
        + d * F.col("n1_fwd") * (F.col("n1_back") / F.col("__t_types"))
    ) / F.col("c_v")
    scored = (
        doc_bg.join(bg, ["v", "w"])
        .join(ctx, ["v"])
        .join(cont, ["w"])
        .crossJoin(F.broadcast(t_df))
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


def head_kneser(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["kneser_ney_perplexity"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = run_ab(
        {"head_strings": head_kneser, "hashed_vocab": hashed_kneser}, rounds
    )
