"""Runnable tour of the SEVEN-member sketch family over the test tables.

    PYTHONPATH=. python examples/sketch_tour.py [sf_dir]

Every sketch answers one question about a column too big to answer
exactly, in bounded memory, with a merge law that makes the same code
work per-partition, per-day, or per-cluster:

1. Misra-Gries      WHICH values are frequent        (merge: recount)
2. Count-Min        HOW OFTEN is THIS value          (merge: counter sum)
3. HLL (built-in)   HOW MANY distinct                (merge: register max)
4. KMV / theta      HOW MANY distinct, AND set ops   (merge: bottom-k)
5. Log-bucket       WHAT quantiles                   (merge: counter sum)
6. Bloom            IS this value present            (merge: bitmap OR)
7. AMS              HOW BIG is the (self-)join       (merge: z-sum)

Each section prints the sketch estimate next to the exact answer; the
same constructions are hash-gated against DuckDB replays in the
workload (kmv_distinct_users, kmv_cohort_setops, countmin_user_events,
logbucket_value_quantiles, ams_f2_events, ams_join_size,
heavy_hitter_users, bloom_md5_decontaminate) and the CM / log-bucket /
KMV sketches additionally run as STREAMING stores
(streaming/sketch_stream.py) whose drained state equals the one-shot
sketch — see countmin_stream_replay / logbucket_stream_replay /
kmv_stream_replay.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.io import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sketch-tour", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())

    # 1. Misra-Gries: top-5 most active users, no full-domain shuffle
    from gohangout_spark.functions.sketch import heavy_hitters

    print("\n[1] Misra-Gries top-5 users (exact by construction here):")
    heavy_hitters(ev, "user_id", k=5, m=4096).show()

    # 2. Count-Min: per-user frequency estimates from a 4x64 counter table
    from gohangout_spark.functions.sketch import countmin_estimate, countmin_table

    sk = countmin_table(ev, "user_id", depth=4, width=64)
    keys = ev.select("user_id").distinct().limit(5)
    exact = ev.groupBy("user_id").count()
    print("[2] Count-Min (4x64, deliberately collision-heavy) vs exact:")
    countmin_estimate(sk, keys, "user_id", depth=4, width=64).join(
        exact, "user_id"
    ).show()

    # 3. built-in HLL for contrast
    print("[3] HLL distinct users (built-in approx_count_distinct):")
    ev.agg(
        F.approx_count_distinct("user_id").alias("hll"),
        F.countDistinct("user_id").alias("exact"),
    ).show()

    # 4. KMV: distinct count AND the set ops HLL can't do
    from gohangout_spark.functions.sketch import (
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_table,
        kmv_union,
    )

    hi = ev.where(F.col("value") >= 150)
    a = hi.where(F.col("event_type") == "purchase").select("user_id")
    b = hi.where(F.col("event_type") == "click").select("user_id")
    ska, skb = kmv_table(a, "user_id", k=32), kmv_table(b, "user_id", k=32)
    print("[4] KMV k=32: |A| (high-value purchasers), |A ∪ B|, |A ∩ B|:")
    kmv_estimate(ska, k=32).show()
    kmv_estimate(kmv_union(ska, skb, k=32), k=32, out_col="union_est").show()
    kmv_intersect_estimate(ska, skb, k=32).show()

    # 5. log-bucket quantiles: p50/p95/p99 of event values per type
    from gohangout_spark.functions.sketch import logbucket_quantiles, logbucket_table

    print("[5] log-bucket p50/p95/p99 of value*1000 per event_type:")
    hist = logbucket_table(ev, "value", ["event_type"], scale=1000)
    logbucket_quantiles(hist, ["event_type"]).orderBy("event_type").show()

    # 6. Bloom: scan-side membership (the decontamination primitive)
    from gohangout_spark.functions.curation import build_ngram_bloom

    docs = load_table(spark, sf_dir, "documents")
    bloom = build_ngram_bloom(docs.limit(50), n=3, size=(65536, 3))
    set_bits = sum(bin(b).count("1") for b in bytes(bloom.bits))
    print(f"[6] Bloom over 50 docs' 3-grams: m={bloom.m} k={bloom.k}, "
          f"{set_bits} bits set ({100 * set_bits / bloom.m:.1f}% load)")

    # 7. AMS: self-join size + cross join size, from 40-row synopses
    from gohangout_spark.functions.sketch import (
        ams_f2_table,
        ams_f2_estimate,
        ams_join_size_estimate,
    )

    ska_ = ams_f2_table(ev, "user_id", depth=40)
    skp = ams_f2_table(
        ev.where(F.col("event_type") == "purchase"), "user_id", depth=40
    )
    exact_f2 = exact.agg(F.sum(F.col("count") * F.col("count"))).first()[0]
    print("[7] AMS F2 (self-join size) estimate vs exact "
          f"{int(exact_f2):,}:")
    ams_f2_estimate(ska_, depth=40, groups=5).show()
    print("    AMS events⋈purchases join-size estimate:")
    ams_join_size_estimate(ska_, skp, depth=40, groups=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
