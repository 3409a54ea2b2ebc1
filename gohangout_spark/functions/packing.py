"""Sequence packing — group documents into token-budgeted packs.

The training-data step after dedup/quality filtering: concatenate documents
into fixed-size context windows with minimal padding. gohangout has no
analogue; this is an LLM-pipeline extension (SURVEY §7 phase 5) built
distributed-first.

Scale shape: packing is inherently SEQUENTIAL (whether doc N opens a new
pack depends on every doc before it), so a single global scan cannot
parallelize. The standard production answer is sharding: documents hash
into ``n_shards`` independent streams, each shard packs sequentially
(exact next-fit in doc-id order) inside one ``applyInPandas`` group, and
all shards run in parallel. Pack identity is the (shard, pack) pair. At
100 TB, n_shards scales with the cluster (thousands); within-shard state
is one integer, and the shuffle is a single hash partitioning by shard.

The within-shard loop is vectorized-adjacent Python over Arrow batches —
a few thousand rows per shard — not a row-at-a-time UDF over the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.functions.num import round_half_up

from gohangout_spark.functions.text import token_count


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document to (shard, pack) under a token budget.

    Next-fit semantics per shard, in ascending id order: a document joins
    the current pack when it fits (fill + n ≤ max_tokens), else it opens a
    new pack. Documents longer than the budget get a pack of their own
    (their successor always opens fresh). Deterministic — the same inputs
    produce the same packing on any cluster layout.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        fill = None
        pack = -1
        for n in pdf["n_tokens"]:
            if fill is not None and fill + n <= max_tokens:
                fill += n
            else:
                pack += 1
                fill = n
            packs.append(pack)
        pdf["pack"] = packs
        return pdf[["doc_id", "shard", "pack", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack_shard, "doc_id long, shard long, pack long, n_tokens long"
    )


def pack_documents_bestfit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing packing per shard: docs sorted by token count
    descending, each placed into the lowest-numbered pack with room, else a
    new pack. Classic FFD guarantee (≤ 11/9·OPT + 1 packs) — measurably
    tighter than next-fit when document lengths vary; next-fit stays the
    oracle-checkable baseline. Same shard/parallelism shape as
    :func:`pack_documents`; deterministic (ties broken by doc_id).

    Not SQL-expressible (per-doc placement depends on every prior
    placement across ALL open packs, not a single running total) → rows-only
    in the correctness gate; invariants (fits budget, fewer-or-equal packs
    than next-fit, layout determinism) are pinned in pytest.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # fill level per open pack
        assigned = []
        for n in pdf["n_tokens"]:
            for i, f in enumerate(fills):
                if f + n <= max_tokens:
                    fills[i] = f + n
                    assigned.append(i)
                    break
            else:
                fills.append(n)
                assigned.append(len(fills) - 1)
        pdf["pack"] = assigned
        return pdf[["doc_id", "shard", "pack", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack_shard, "doc_id long, shard long, pack long, n_tokens long"
    )


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-pack fill statistics — the padding-waste report: one row per
    (shard, pack) with doc count, token total, and utilization."""
    return (
        packed.groupBy("shard", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .withColumn(
            "utilization", round_half_up(F.col("tokens") / F.lit(float(max_tokens)), 4)
        )
    )
