"""Runnable tour of the similarity / dedup stack over the test tables.

    PYTHONPATH=. python examples/similarity_search.py [sf_dir]

Shows the escalation path a real corpus walks as it grows:
exact top-k -> LSH / IVF cells -> PQ compression -> IVF-PQ, plus
SemDeDup-style semantic dedup and JL projection. Each step prints its
row counts; swap `sf_dir` for bigger scale factors.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.functions.similarity import (
    brute_force_topk,
    ivf_pq_topk,
    ivf_topk,
    lsh_topk,
    pq_topk,
    random_projection,
    semantic_dedup,
)
from gohangout_spark.io import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("similarity-tour")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 10)
    print(f"corpus: {emb.count()} vectors, dim {dim}; 10 queries, k=5\n")

    # 1. exact baseline — fine while queries x corpus fits a broadcast scan
    print("brute force:", brute_force_topk(emb, queries, k=5).count(), "rows")

    # 2. hyperplane LSH — bucket join, multi-probe recovers boundary losses
    print(
        "lsh (8 planes, probe 1):",
        lsh_topk(emb, queries, dim=dim, k=5, n_planes=8, multi_probe=1).count(),
        "rows",
    )

    # 3. IVF — each query scans n_probe of n_centroids cells
    print(
        "ivf (16 cells, 3 probes, k-means refined):",
        ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=3, refine_iters=2).count(),
        "rows",
    )

    # 4. PQ — corpus scans as m ints per vector; re-rank restores recall
    print(
        "pq (m=8, 16 codes, rerank 4):",
        pq_topk(emb, queries, dim=dim, m=8, n_codes=16, k=5, rerank=4).count(),
        "rows",
    )

    # 5. the full composition
    print(
        "ivf-pq:",
        ivf_pq_topk(
            emb, queries, dim=dim, n_centroids=16, n_probe=4, m=8, n_codes=16,
            k=5, rerank=4,
        ).count(),
        "rows",
    )

    # 6. JL projection: shrink dims before any of the above
    proj = random_projection(emb, dim=dim, out_dim=16)
    print(
        "projected 16-dim brute force:",
        brute_force_topk(
            proj, proj.filter(F.col("vec_id") < 10), vec_col="embedding_rp", k=5
        ).count(),
        "rows",
    )

    # 7. SemDeDup: cluster-then-prune near-duplicate removal
    survivors = semantic_dedup(emb, threshold=0.95, n_centroids=16)
    print("semantic dedup survivors:", survivors.count(), "of", emb.count())


if __name__ == "__main__":
    main()
