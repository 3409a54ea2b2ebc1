"""A/B evidence for the r9 kmv_table all-JVM restructure.

OLD: mapInPandas local bottom-k per (partition, group) — the whole
     projected corpus crosses the Arrow boundary — then _bottom_k.
NEW: the registered query (dense_rank() <= k window filter; Catalyst's
     InferWindowGroupLimit bounds the exchange per partition, zero
     Python).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_kmv.py [rounds]
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd

from ab_bench import run_ab

from pyspark.sql import functions as F


def _gate(spark, sf_dir, table_fn):
    """The full kmv_distinct_users gate body with kmv_table swapped."""
    from gohangout_spark.functions.sketch import kmv_estimate
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _events

    ev = rebalance_for_compute(_events(spark, sf_dir), spark).where(
        F.col("user_id").isNotNull()
    )
    sk = table_fn(ev, "user_id", ["event_type"], k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_dv")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_kept", "kth", "dv_est", "exact_dv"
    )


def old_kmv_table(df, col, group_cols=(), *, k=64):
    import heapq

    from gohangout_spark.functions.sketch import _bottom_k, kmv_hash

    gcols = list(group_cols)
    key = F.col(col).cast("string")
    src = df.where(key.isNotNull()).select(*gcols, kmv_hash(F.col(col)).alias("h"))

    def local_bottomk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict = {}
        for pdf in batches:
            if gcols:
                groups = [
                    (gk if isinstance(gk, tuple) else (gk,), sub["h"])
                    for gk, sub in pdf.groupby(gcols, sort=False, dropna=False)
                ]
            else:
                groups = [((), pdf["h"])]
            for gk, hs in groups:
                s = best.setdefault(gk, set())
                s.update(int(v) for v in hs.unique())
                if len(s) > k:
                    best[gk] = set(heapq.nsmallest(k, s))
        rows = [gk + (h,) for gk, hs in best.items() for h in sorted(hs)]
        out = pd.DataFrame(rows, columns=gcols + ["h"])
        if out.empty:
            out = pd.DataFrame(
                {c: pd.Series(dtype="object") for c in gcols}
                | {"h": pd.Series(dtype="int64")}
            )
        yield out

    return _bottom_k(src.mapInPandas(local_bottomk, src.schema), gcols, k)


def old_arrow_shape(spark, sf_dir):
    return _gate(spark, sf_dir, old_kmv_table)


def new_native_shape(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["kmv_distinct_users"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"old_arrow_shape": old_arrow_shape, "new_native_shape": new_native_shape}, rounds)
