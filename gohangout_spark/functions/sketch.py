"""Bounded-memory sketch operators: Misra-Gries heavy hitters.

The HLL validation lives in functions.analytics (approx_distinct_report);
this module holds the frequency side. The production problem: "top-k most
frequent values of a column whose domain is huge" — a plain
groupBy(col).count() shuffles O(distinct × partitions) partial rows, which
at 100 TB of URLs/tokens is itself a heavy shuffle. The classic answer is
a two-phase candidate sketch:

1. LOCAL pass (mapInPandas, Arrow): each partition keeps at most ``m``
   Misra-Gries counters. MG guarantee (Misra & Gries 1982): any value with
   partition frequency > n_part/(m+1) survives the partition's counter set,
   so any value with GLOBAL frequency > N/(m+1) appears in at least one
   partition's candidates.
2. EXACT recount of the (≤ m × partitions) candidate values only: the
   corpus is rescanned with a broadcast semi-join — scan-side filter, no
   full-domain shuffle — and the true counts of candidates rank the top-k.

The result is EXACT whenever every true top-k value clears the MG bound —
always true when k ≪ m and the distribution has any skew, and trivially
true when m exceeds the per-partition distinct count (the counters then
degrade gracefully to exact local aggregation).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    m: int = 4096,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``col`` without a
    full-domain count shuffle. Returns (value, n) ordered by (n desc,
    value asc) — deterministic tiebreak. NULLs are not counted (a NULL
    "value" is not a value). See module docstring for the exactness
    condition; raise ``m`` if the domain is huge AND flat.
    """

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vals = pdf["__v"].dropna()
            # batch-level exact counts fold into the MG structure so the
            # counter update runs per DISTINCT value per batch, not per row
            for v, c in vals.value_counts().items():
                if v in counters:
                    counters[v] += int(c)
                elif len(counters) < m:
                    counters[v] = int(c)
                else:
                    dec = min(counters.values())
                    dec = min(dec, int(c))
                    # decrement-all by the smallest involved count — the
                    # batched generalization of MG's decrement step
                    drop = [x for x, cc in counters.items() if cc <= dec]
                    for x in counters:
                        counters[x] -= dec
                    for x in drop:
                        del counters[x]
                    if int(c) > dec:
                        counters[v] = int(c) - dec
        yield pd.DataFrame({"__v": list(counters.keys())})

    src = df.select(F.col(col).alias("__v")).where(F.col("__v").isNotNull())
    cands = (
        src.mapInPandas(local_candidates, src.schema)
        .dropDuplicates(["__v"])
    )
    exact = (
        src.join(F.broadcast(cands), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("__v"))
        .limit(k)
    )
    return exact.select(F.col("__v").alias(col), "n")
