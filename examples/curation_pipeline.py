"""Runnable end-to-end training-data curation pipeline over the test corpus.

    PYTHONPATH=. python examples/curation_pipeline.py [sf_dir] [out_dir]

The full journey a 100 TB crawl takes to become a training mixture, every
stage a library call from this repo, with the funnel printed at each step:

  1. line-wise boilerplate removal       (curation.remove_boilerplate_lines)
  2. Gopher quality gate                 (curation.gopher_rules)
  3. exact dedup, min-id winner          (dedup.exact_dedup)
  4. MinHash+LSH near-dedup, keep the
     BEST-quality copy per cluster       (dedup.minhash_lsh_candidates
                                          + keep_best_per_cluster)
  5. duplicated-span removal             (dedup.remove_dup_spans)
  6. n-gram decontamination              (curation.decontaminate_ngrams)
  7. LM perplexity gate                  (lm.fit_char_bigram_lm
                                          + perplexity_pandas)
  8. leakage-free train/val/test split   (dedup.cluster_aware_split over
                                          a LOWER-threshold cut of the
                                          same LSH candidates — sub-dedup-
                                          threshold near-dups are the ones
                                          still alive to straddle a
                                          holdout boundary)
  9. token-budget mixture per language   (sampling.token_budget_sample)
 10. sequence packing (FFD)              (packing.pack_documents_bestfit)
 11. sharded parquet write               (partitionBy split, pack shard)

The composed semantics of stages 2+3+6+7 are ORACLE-CHECKED end-to-end as
workload query `curation_funnel`; this script is the wide, runnable
version including the stages DuckDB can't express (LSH, packing).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.functions.curation import (
    decontaminate_ngrams,
    gopher_rules,
    remove_boilerplate_lines,
)
from gohangout_spark.functions.dedup import (
    cluster_aware_split,
    exact_dedup,
    keep_best_per_cluster,
    minhash_lsh_candidates,
    remove_dup_spans,
)
from gohangout_spark.functions.lm import fit_char_bigram_lm, perplexity_pandas
from gohangout_spark.functions.packing import pack_documents_bestfit, pack_stats
from gohangout_spark.functions.sampling import token_budget_sample
from gohangout_spark.functions.text import bpe_token_count
from gohangout_spark.io import load_table, rebalance_for_compute


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_out"

    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = rebalance_for_compute(load_table(spark, sf_dir, "documents"), spark)
    print(f"raw corpus:           {docs.count()}")

    # 1. boilerplate (single-line corpus: mostly a no-op, kept for shape)
    bp = remove_boilerplate_lines(docs, min_words=3)
    docs1 = bp.where(F.col("n_kept") > 0).select(
        "doc_id", "lang", F.col("text_clean").alias("text")
    )
    print(f"after boilerplate:    {docs1.count()}")

    # 2. Gopher gate
    docs2 = gopher_rules(docs1).where("gopher_keep").select("doc_id", "lang", "text")
    print(f"after gopher:         {docs2.count()}")

    # 3. exact dedup
    docs3 = exact_dedup(docs2, "text", "doc_id")
    print(f"after exact dedup:    {docs3.count()}")

    # 4. MinHash near-dedup: one LSH candidate pass feeds TWO thresholds —
    #    materialized because both the dedup cut here and the split cut in
    #    stage 8 (plus their downstream actions) consume it. Dedup at
    #    jaccard >= 0.8: keep the LONGEST copy of each duplicate cluster
    #    (the best-quality member, not the first-crawled one).
    cand = minhash_lsh_candidates(
        docs3, text_col="text", id_col="doc_id", materialize=True
    )
    docs4 = keep_best_per_cluster(
        docs3.withColumn("score", F.length("text")),
        cand.where(F.col("jaccard") >= 0.8),
        id_col="doc_id", score_col="score",
    ).drop("score", "cluster_id")
    print(f"after near-dedup:     {docs4.count()}")

    # 5. duplicated-span removal (both copies of any 5-token dup window)
    docs5 = remove_dup_spans(docs4, w=5).select(
        "doc_id", "lang", F.col("text_clean").alias("text")
    )

    # 6. decontamination vs the held-out eval slice
    ev = docs.where(F.col("doc_id") % 37 == 0)
    docs6 = (
        decontaminate_ngrams(docs5.where(F.col("doc_id") % 37 != 0), ev, n=4)
        .where(~F.col("contaminated"))
        .select("doc_id", "lang", "text")
    )
    print(f"after decontam:       {docs6.count()}")

    # 7. LM perplexity gate: drop the worst tertile. The scored frame is
    #    cached before filtering: a predicate on a pandas-UDF column above
    #    this join-bearing lineage gets pushed by Catalyst into an
    #    interpreted context that cannot evaluate Python and crashes
    #    (see lm.perplexity_pandas docstring); caching materializes ppl
    #    into a stored column, and we were about to run two jobs over it
    #    (quantile + filter) anyway.
    model = fit_char_bigram_lm(docs.where(F.col("lang") == "en"))
    scored = perplexity_pandas(docs6, model).cache()
    _, hi = scored.approxQuantile("ppl", [1 / 3, 2 / 3], 1e-3)
    docs7 = scored.where(F.col("ppl") <= hi).select("doc_id", "lang", "text")
    print(f"after ppl gate:       {docs7.count()}  (cutoff {hi:.3f})")

    # 8. leakage-free holdout split at the near-dup-cluster level — at a
    #    LOWER threshold than dedup (0.5 vs 0.8): the >= 0.8 clusters were
    #    already collapsed to one survivor in stage 4, so the pairs that
    #    still matter here are precisely the 0.5-0.8 near-duplicates that
    #    survived dedup; clustering those keeps one from landing in train
    #    while its twin lands in test
    split = cluster_aware_split(
        docs7, cand.where(F.col("jaccard") >= 0.5), id_col="doc_id"
    )
    print("split sizes:")
    for r in split.groupBy("split").count().orderBy("split").collect():
        print(f"    {r['split']}: {r['count']}")
    docs8 = split.where(F.col("split") == "train").select("doc_id", "lang", "text")

    # 9. token-budget mixture: BPE-ish token costs, per-language budgets
    with_tokens = docs8.withColumn("n_bpe", bpe_token_count(F.col("text")))
    budgets = {"en": 12_000, "de": 4_000, "fr": 4_000, "es": 4_000, "zh": 2_000}
    budgeted = token_budget_sample(
        with_tokens, budgets, token_col="n_bpe", source_col="lang"
    )
    kept_tokens = budgeted.groupBy("lang").agg(F.sum("n_bpe").alias("tokens"))
    print("after token budget:")
    for r in kept_tokens.orderBy("lang").collect():
        print(f"    {r.lang}: {r.tokens} tokens")

    # 10. sequence packing (FFD into 512-token sequences)
    packed = pack_documents_bestfit(budgeted, max_tokens=512)
    util = pack_stats(packed, max_tokens=512).agg(
        F.count(F.lit(1)).alias("packs"), F.round(F.avg("utilization"), 4).alias("util")
    ).first()
    print(f"packed:               {util.packs} sequences, mean fill {util.util}")

    # 11. sharded write: reproducible pack-shard layout
    out = packed.join(budgeted.select("doc_id", "lang", "text"), "doc_id")
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    print(f"wrote shards to:      {out_dir}")


if __name__ == "__main__":
    main()
