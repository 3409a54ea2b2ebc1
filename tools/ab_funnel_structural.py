"""VERDICT r9 #8: settle the curation_funnel structural question AT SCALE.

The r9 round tried replacing exact_dedup's groupBy(md5)+broadcast-join
shape inside the funnel with a window dedup (row_number over
partitionBy(md5), keep rank 1) and REJECTED it at sf0.1 (3.32 → 5.54 s:
AQE coalesces the ENSURE_REQUIREMENTS md5 exchange to ~1 partition and
serializes the downstream gram explode). The builder's note said the two
shapes converge at 100 TB. This harness runs both funnel variants over
the 100x derived corpus (tools/scale_sweep.py builds it) to test whether
the rejection is scale-robust or an sf0.1 artifact.

    SPARK_GRAFT_CPUS=32 python tools/ab_funnel_structural.py [rounds] [dir]
"""

from __future__ import annotations

import os
import sys

from ab_bench import run_ab

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _funnel(spark, docs, dedup):
    from gohangout_spark.functions.curation import (
        decontaminate_ngrams,
        gopher_rules,
    )
    from gohangout_spark.functions.lm import fit_char_bigram_lm, perplexity_pandas

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
    deduped = dedup(gated)
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


def dedup_join(gated):
    from gohangout_spark.functions.dedup import exact_dedup

    return exact_dedup(gated, "text", "doc_id")


def dedup_window(gated):
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col("doc_id"))
    return (
        gated.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_derived"
    from gohangout_spark import get_spark

    spark = get_spark("ab-funnel-structural")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
    a = _funnel(spark, docs, dedup_join)
    b = _funnel(spark, docs, dedup_window)
    n_a, n_b = a.count(), b.count()
    print(f"rows: join={n_a} window={n_b} equal={n_a == n_b}")
    run_ab(
        {
            "dedup_join_100x": lambda s, d: _funnel(s, docs, dedup_join),
            "dedup_window_100x": lambda s, d: _funnel(s, docs, dedup_window),
        },
        rounds,
        spark=spark,
    )
