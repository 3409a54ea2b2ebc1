"""Runnable tour of continuous-ingest dedup over the test tables.

    PYTHONPATH=. python examples/incremental_dedup.py [sf_dir]

The production loop an append-only corpus runs on every ingest batch:

  batch 0:  index = minhash_index(batch0)           -> write index parquet
  batch N:  cands = incremental(batchN, index)      -> O(batchN), not O(corpus)
            drop/cluster batchN dups                -> append batchN to corpus
            index = index UNION minhash_index(kept) -> write back

Historical TEXT is never re-read — only the (signature, band-key) index,
~300 bytes/doc. This script simulates three ingest batches from the
documents table and prints what each batch's dedup saw.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.functions.dedup import (
    minhash_index,
    minhash_lsh_candidates_incremental,
)
from gohangout_spark.io import load_table

KW = dict(num_hashes=32, bands=16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    batches = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in zip(cuts, cuts[1:])
    ]

    # batch 0 bootstraps the index (self-dedup via the one-shot path if
    # desired; here we just index it)
    index = minhash_index(batches[0], "text", "doc_id", **KW)
    print(f"batch 0: indexed {index.count()} docs")

    for i, batch in enumerate(batches[1:], start=1):
        cands = minhash_lsh_candidates_incremental(batch, index, **KW).filter(
            F.col("est_jaccard") >= 0.5
        )
        vs_hist = cands.filter("vs_history").count()
        vs_new = cands.filter("NOT vs_history").count()
        print(
            f"batch {i}: {batch.count()} docs -> "
            f"{vs_hist} near-dups vs history, {vs_new} within batch"
        )
        # keep everything for the demo; a real pipeline drops/clusters here,
        # then appends only the KEPT docs' index rows
        index = index.unionByName(minhash_index(batch, "text", "doc_id", **KW))

    print(f"final index: {index.count()} docs "
          f"(~{index.count() * 300 // 1024} KiB at ~300 B/doc)")


if __name__ == "__main__":
    main()
