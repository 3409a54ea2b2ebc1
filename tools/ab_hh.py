"""A/B evidence for the r9 heavy_hitters recount-branch deshuffle.

OLD: caller rebalances the whole events table, and Catalyst's
     PushDownLeftSemiAntiJoin re-plants that round-robin exchange above
     the semi-join — the full corpus crosses a second RR shuffle before
     the recount's partial aggregation.
NEW: the registered query (rebalance moved inside heavy_hitters, candidate
     branch only; the recount rides the scan with map-side combine).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_hh.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def old_double_shuffle(spark, sf_dir):
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _events

    # the pre-r9 shape: both branches descend from the rebalanced corpus
    ev = rebalance_for_compute(_events(spark, sf_dir), spark)
    src = ev.select(F.col("user_id").alias("__v")).where(F.col("__v").isNotNull())
    cands = (
        src.mapInPandas(_mg_closure(65536), src.schema).dropDuplicates(["__v"])
    )
    exact = (
        src.join(F.broadcast(cands), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("__v"))
        .limit(10)
    )
    return exact.select(F.col("__v").alias("user_id"), "n")


def _mg_closure(m):
    def local_candidates(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vals = pdf["__v"].dropna()
            for v, c in vals.value_counts().items():
                if v in counters:
                    counters[v] += int(c)
                elif len(counters) < m:
                    counters[v] = int(c)
                else:
                    dec = min(counters.values())
                    dec = min(dec, int(c))
                    drop = [x for x, cc in counters.items() if cc <= dec]
                    for x in counters:
                        counters[x] -= dec
                    for x in drop:
                        del counters[x]
                    if int(c) > dec:
                        counters[v] = int(c) - dec
        import pandas as pd

        yield pd.DataFrame({"__v": list(counters.keys())})

    return local_candidates


def new_scan_side_recount(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["heavy_hitter_users"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab(
        {
            "old_double_shuffle": old_double_shuffle,
            "new_scan_side_recount": new_scan_side_recount,
        },
        rounds,
    )
