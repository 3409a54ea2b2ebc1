"""A/B evidence for the r9 dsir_logweights exchange-reuse restructure.

OLD: cr/ct as two separate aggregations (ct behind a pushed `__tgt` filter)
     + left join + coalesce — three copies of the corpus explode subtree,
     zero ReusedExchange.
NEW: whatever functions.sampling.dsir_logweights currently implements
     (single models agg + canonicalized null filter — one explode + reuse).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_dsir.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def old_dsir(spark, sf_dir):
    from gohangout_spark.functions.num import round_half_up
    from gohangout_spark.functions.text import tokens
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    k = 1024
    id_col = "doc_id"
    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    base = docs.select(
        F.col(id_col), (F.col("lang") == "en").alias("__tgt"), tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    bi = F.zip_with(
        F.slice("toks", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    inst = base.select(
        id_col, "__tgt", F.explode(F.concat("toks", bi)).alias("feat")
    ).select(
        id_col,
        "__tgt",
        (F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("long") % k).alias("bucket"),
    )
    db = inst.groupBy(id_col, "__tgt", "bucket").agg(F.count("*").alias("cnt"))
    cr = db.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
    ct = db.where("__tgt").groupBy("bucket").agg(F.sum("cnt").alias("ct"))
    allb = Window.partitionBy()
    lr = (
        cr.join(ct, ["bucket"], "left")
        .select("bucket", "cr", F.coalesce("ct", F.lit(0)).alias("ct"))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1.0) / (F.sum("ct").over(allb) + k))
                - F.log((F.col("cr") + 1.0) / (F.sum("cr").over(allb) + k))
            ).alias("logr"),
        )
    )
    scored = (
        db.join(F.broadcast(lr), ["bucket"])
        .groupBy(id_col)
        .agg(F.sum("cnt").alias("n_feats"), F.sum(F.col("cnt") * F.col("logr")).alias("__lw"))
    )
    return (
        base.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            round_half_up(F.col("__lw"), 4).alias("logw"),
        )
    )


def new_dsir(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["dsir_importance_weights"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    run_ab({"old_three_subtrees": old_dsir, "new_reused": new_dsir}, rounds)
