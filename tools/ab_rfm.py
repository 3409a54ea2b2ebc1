"""Interleaved A/B: rfm_segments with the r10 single-range-pass
global_ranks_desc (HEAD) vs the r5..r9 three-chained-global_rank shape
(reconstructed inline) — VERDICT r9 #3 (sampling jobs 3 -> 1).

Usage: python tools/ab_rfm.py [rounds]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from ab_bench import run_ab

from gohangout_spark.functions.num import round_half_up
from gohangout_spark.functions.sampling import global_rank
from gohangout_spark.io import load_table
from gohangout_spark.workload import QUERIES


def rfm_new(spark, sf_dir):
    return QUERIES["rfm_segments"][0](spark, sf_dir)


def rfm_old(spark, sf_dir):
    # the pre-r10 shape, verbatim from analytics.rfm_segments@r9
    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", (F.col("value") * 100).cast("long")
    )
    user_col, ts_col, value_col = "user_id", "ts", "cents"
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(user_col)
        .agg(
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(value_col).alias("monetary"),
        )
        .localCheckpoint(eager=True)
    )
    ranked = global_rank(per_user, [F.desc("last_ts"), F.asc(user_col)], "__rk_r")
    ranked = global_rank(ranked, [F.desc("freq"), F.asc(user_col)], "__rk_f")
    ranked = global_rank(ranked, [F.desc("monetary"), F.asc(user_col)], "__rk_m")
    big_n = per_user.count()
    n_tiles = 4

    def tile(rank_col):
        q, r = big_n // n_tiles, big_n % n_tiles
        big = r * (q + 1)
        k = F.col(rank_col)
        return (
            F.when(k <= big, F.floor((k + q) / (q + 1)))
            .otherwise(r + F.floor((k - big + q - 1) / max(q, 1)))
            .cast("int")
        )

    return ranked.select(
        F.col(user_col),
        tile("__rk_r").alias("r"),
        tile("__rk_f").alias("f"),
        tile("__rk_m").alias("m"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ),
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"old": rfm_old, "new": rfm_new}, rounds=rounds)
