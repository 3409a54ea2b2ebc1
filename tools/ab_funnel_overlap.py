"""A/B evidence for overlapping curation_funnel's model-fit job with the
clean-subtree computation (guide §2.6: overlap independent jobs).

HEAD: fit_char_bigram_lm runs as its own EAGER driver job (~0.6 s at
      sf0.1) strictly BEFORE the main gate→dedup→decontaminate→score job
      — the box sits on one job's tail while the other waits.
OVR:  identical operators and results; the fit is submitted on a driver
      thread while the main thread materializes the clean survivors via
      localCheckpoint (its own concurrent job). Timed wall becomes
      max(fit, clean) + score instead of fit + (clean + score). The
      composition is unchanged — same stages, same rows; only the job
      schedule differs.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_funnel_overlap.py [rounds] [sf_dir]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def overlap_funnel(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    from gohangout_spark.functions.curation import (
        decontaminate_ngrams,
        gopher_rules,
    )
    from gohangout_spark.functions.dedup import exact_dedup
    from gohangout_spark.functions.lm import fit_char_bigram_lm, perplexity_pandas
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    gated = (
        gopher_rules(docs)
        .where(
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
        )
        .where(F.col("doc_id") % 37 != 0)
        .select("doc_id", "text")
    )
    deduped = exact_dedup(gated, "text", "doc_id")
    clean = decontaminate_ngrams(deduped, ev, n=4).where(~F.col("contaminated"))
    with ThreadPoolExecutor(max_workers=1) as pool:
        fit = pool.submit(fit_char_bigram_lm, docs.where(F.col("lang") == "en"))
        clean_m = clean.select("doc_id", "text").localCheckpoint()
        model = fit.result()
    scored = perplexity_pandas(clean_m, model)
    bucket = (
        F.when(F.col("ppl").isNull(), "tail")
        .when(F.col("ppl") <= 5.5, "head")
        .when(F.col("ppl") <= 5.6, "middle")
        .otherwise("tail")
    )
    return scored.select("doc_id", "ppl", bucket.alias("ppl_bucket"))


def head_funnel(spark, sf_dir):
    # the pre-r10 serial shape, inlined verbatim (workload.py now overlaps)
    from gohangout_spark.functions.curation import (
        decontaminate_ngrams,
        gopher_rules,
    )
    from gohangout_spark.functions.dedup import exact_dedup
    from gohangout_spark.functions.lm import fit_char_bigram_lm, perplexity_pandas
    from gohangout_spark.io import rebalance_for_compute
    from gohangout_spark.workload import _docs

    docs = rebalance_for_compute(_docs(spark, sf_dir), spark)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    gated = (
        gopher_rules(docs)
        .where(
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
        )
        .where(F.col("doc_id") % 37 != 0)
        .select("doc_id", "text")
    )
    deduped = exact_dedup(gated, "text", "doc_id")
    clean = decontaminate_ngrams(deduped, ev, n=4).where(~F.col("contaminated"))
    model = fit_char_bigram_lm(docs.where(F.col("lang") == "en"))
    scored = perplexity_pandas(clean.select("doc_id", "text"), model)
    bucket = (
        F.when(F.col("ppl").isNull(), "tail")
        .when(F.col("ppl") <= 5.5, "head")
        .when(F.col("ppl") <= 5.6, "middle")
        .otherwise("tail")
    )
    return scored.select("doc_id", "ppl", bucket.alias("ppl_bucket"))


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else None
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("ab-funnel-overlap")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(tuple(r) for r in head_funnel(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in overlap_funnel(spark, sf_dir).collect())
    print(f"identical: {a == b} ({len(a)} rows)")
    if a != b:
        sys.exit("results diverge")
    run_ab(
        {"head": head_funnel, "overlap": overlap_funnel},
        rounds,
        sf_dir=sf_dir,
        spark=spark,
    )
