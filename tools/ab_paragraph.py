"""A/B evidence for the r9 paragraph_dedup_stats single-pass restructure.

OLD: share = groupBy(phash).count_distinct(id) + paras JOIN share
     (explode computed twice; SortMergeJoin over paragraph-sized sides).
NEW: the registered query (phash-partitioned (phash,doc) pre-agg + window
     count; one explode, no join).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_paragraph.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F


def _nd(spark, sf_dir):
    from gohangout_spark.workload import _docs

    docs = _docs(spark, sf_dir)
    return (
        docs.select((F.col("doc_id") % 100).alias("gid"), "doc_id", "text")
        .groupBy("gid")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s.getField("text"),
                ),
            ).alias("text")
        )
    )


def old_paragraph(spark, sf_dir):
    from gohangout_spark.functions.num import round_half_up

    docs = _nd(spark, sf_dir)
    id_col, text_col, min_shared_docs = "gid", "text", 2
    paras = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), r"\n"), lambda p: F.trim(p)),
                lambda p: p != "",
            )
        ).alias("para"),
    ).select("__id", F.md5(F.col("para")).alias("phash"))
    share = paras.groupBy("phash").agg(F.count_distinct(F.col("__id")).alias("n_docs"))
    per_doc = (
        paras.join(share, "phash")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum((F.col("n_docs") >= min_shared_docs).cast("int")).alias("n_shared"),
        )
    )
    stats = per_doc.select(
        F.col("__id").alias(id_col),
        "n_paras",
        "n_shared",
        round_half_up(F.col("n_shared") / F.col("n_paras"), 4).alias("dup_para_ratio"),
    )
    return (
        docs.select(F.col(id_col))
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            "dup_para_ratio",
        )
    )


def new_paragraph(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["paragraph_dedup_stats"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"old_join_shape": old_paragraph, "new_window_shape": new_paragraph}, rounds)
