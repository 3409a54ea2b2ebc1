"""A/B evidence for the r10 kneser_ney_score (v,w)-keyed exchange idea.

HEAD: partial (doc,v,w) agg -> Exchange hash(doc,v,w) -> doc_bg; bg re-aggs
      the reused exchange through its own Exchange hash(v,w); ctx/cont/T
      each re-agg bg's exchange through exchanges on (v)/(w)/single and
      come back as three broadcast joins.
VW:   one Exchange hash(v,w) carries the partial (doc,v,w) rows; doc_bg
      AND bg both ride it (hash(v,w) clusters every (doc,v,w) group and
      every (v,w) group); c_v/n1_fwd/n1_back become windows over bg
      partitioned by v / by w (vocab-sized sorts), so the scoring join
      collapses to ONE broadcast of the enriched bg — guide 2.4 (window
      rides the agg's partitioning) + one big exchange removed.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kneser_vw.py [rounds]

RESULT (r10, recorded NEGATIVE — REVERTED after the scale sweep): at
sf0.1 the rewrite measured a real but small win (interleaved medians
1.765 -> 1.675 s, 9/9 samples pairwise faster; results identical at all
3 SFs; executed plan 9 -> 6 hash exchanges). But the 100x sweep
(tools/scale_sweep.py) showed 129.2 s vs the HEAD shape's 14.2 s
(factor 38x vs 1.7x): at real data volume the two windows full-sort the
now-100x-vocabulary bg table and the enriched-bg join falls out of the
broadcast regime, while HEAD's groupBy branches keep map-side partials
below every exchange. The sf0.1 "win" was trading partial aggregation
for fewer stages on a corpus too small for the partials to matter —
guide §1.2's gotcha clause, measured. HEAD keeps the r9 shape.
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def vw_kneser(spark, sf_dir):
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
    # ONE exchange keyed (v,w): hash(v,w) clusters both the (doc,v,w)
    # groups (a (v,w) subset-key partitioning satisfies the clustering)
    # and the (v,w) groups, so doc_bg and bg share it with no second big
    # exchange
    inst = inst.repartition(F.col("v"), F.col("w"))
    doc_bg = inst.groupBy("doc_id", "v", "w").agg(F.count("*").alias("cnt"))
    bg = doc_bg.groupBy("v", "w").agg(F.sum("cnt").alias("c_vw"))
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
    _n_rows = F.count(F.when(F.col("c_vw").isNotNull(), F.lit(1)))
    t_df = bg.agg(_n_rows.cast("double").alias("__t_types"))
    d = F.lit(0.75)
    p = (
        F.greatest(F.col("c_vw") - d, F.lit(0.0))
        + d * F.col("n1_fwd") * (F.col("n1_back") / F.col("__t_types"))
    ) / F.col("c_v")
    scored = (
        doc_bg.join(F.broadcast(bg2), ["v", "w"])
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
    run_ab({"head": head_kneser, "vw_window": vw_kneser}, rounds)
