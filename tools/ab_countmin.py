"""A/B evidence for the r9 countmin_user_events restructure.

OLD: sketch built from RAW events (md5 probes per event × depth), exact
     counts as a separate aggregation, estimate joined back to exact —
     three passes over events, cast-string null filter blocking reuse.
NEW: whatever the registered query currently implements (weighted
     sketch-from-histogram off the exact counts, carry_cols estimate).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_countmin.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def old_countmin(spark, sf_dir):
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _events

    depth, width = 4, 64
    ev = rebalance_for_compute(_events(spark, sf_dir), spark).where(
        F.col("user_id").isNotNull()
    )

    def probes_for(colname):
        key = F.col(colname).cast("string")
        return F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth"),
                    (
                        F.conv(
                            F.substring(F.md5(F.concat_ws(":", F.lit(str(d)), key)), 1, 8),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )

    key = F.col("user_id").cast("string")
    sk = (
        ev.where(key.isNotNull())
        .select(F.explode(probes_for("user_id")).alias("p"))
        .groupBy(F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probed = exact.select(F.col("user_id"), F.explode(probes_for("user_id")).alias("p")).select(
        "user_id", F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket")
    )
    est = (
        probed.join(F.broadcast(sk), ["depth", "bucket"], "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )
    return exact.join(est, "user_id").select(
        "user_id", "exact_n", F.col("cm_est").cast("long").alias("cm_est")
    )


def new_countmin(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["countmin_user_events"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"old_event_probes": old_countmin, "new_histogram_build": new_countmin}, rounds)
