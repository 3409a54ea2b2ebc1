"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink (full computation, no
collect-to-driver overhead — measures the plan, not py4j serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# local[N] runs the whole "cluster" in one JVM: 32 task threads sharing the
# driver heap. 8g (the library default) GC-thrashes once the heavier dedup/
# join queries have run; 16g keeps the measured pass steady-state.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

from gohangout_spark import get_spark
from gohangout_spark.workload import QUERIES

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    # round 7: the adapted TPC-H completions (q2/q4/q9/q11/q12/q16/q20/q21
    # re-expressed for the reduced schema — full 22-query suite coverage)
    "tpch_q2",
    "tpch_q4",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    "order_priority_semijoin",
    "segment_topk_rank",
    "grok_extract",
    "etl_pipeline_chain",
    "json_parse",
    "convert_types",
    "link_stats_metric",
    "metric_reduce",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ngram_jaccard_adjacent",
    "embedding_topk",
    "doc_fingerprint",
    "quality_score",
    "lang_id",
    "purchase_attribution",
    "signup_error_window",
    "semantic_dedup_by_label",
    # round 3
    "paragraph_dedup_stats",
    "url_curation",
    "gopher_rules",
    "bm25_search",
    "dup_span_stats",
    "char_lm_perplexity",
    "boilerplate_lines",
    "bloom_decontaminate",
    "curation_funnel",
    # round 4
    "markov_transitions",
    "rfm_segments",
    "lexical_diversity",
    "inverted_index",
    "winnow_fingerprints",
    "salted_heavy_hitters",
    "heavy_hitter_users",
    "quality_classifier_score",
    # round 6 (gate-style queries — minhash_lsh_recall, simhash_md5_neardup,
    # dedup_incremental_recall, bloom_md5_decontaminate — stay out of the
    # headline set by the r5 precedent: their oracle-matching operating
    # points are pinned/recall-1 configurations, not production points;
    # bloom_decontaminate above is the xxhash64 production representative)
    "embedding_lsh_topk",
    "bpe_encode_fixed",
    # round 7 late additions: KN and DSIR are production-shaped corpus
    # ops (cascading vocab aggs / bucket-model broadcast); unigram joins
    # bpe_encode_fixed as the tokenizer-encode representative. The QOI
    # gate stays out like every other multimodal_* fixture query.
    "kneser_ney_perplexity",
    "dsir_importance_weights",
    "unigram_encode_fixed",
    # Count-Min and the log-bucket quantile sketch join the sketch-family
    # representatives (heavy_hitter_users is the MG one);
    # wordpiece_encode_fixed stays out — unigram + bpe already carry the
    # tokenizer-encode shape in the headline set.
    "countmin_user_events",
    "logbucket_value_quantiles",
    # curation_funnel_v2 stays OUT by the r5 recall-1 precedent: its
    # near-dup stage must run the 64x32 recall-1 banding + exact-jaccard
    # verify so the oracle's pair set is provably identical (13.9 s at
    # sf0.1, 4x the next heaviest row — a gate configuration, not the
    # production point; curation_funnel above stays the composition
    # representative)
    # KMV joins as the distinct-count/set-op sketch representative
    # (kmv_cohort_setops stays out: its runtime is dominated by the four
    # exact-cardinality verification columns, a gate artifact).
    "kmv_distinct_users",
    # charset/entropy is a production curation-scan shape; the AMS and
    # bbit GATES stay out (their runtime is dominated by exact-count /
    # exact-jaccard verification columns and all-pairs oracle pair sets)
    "charset_entropy_profile",
    # round 8: the full-PSL registrable-domain scan is the per-domain-cap
    # production shape (InSet codegen, zero shuffle); the mp3 fixture
    # gate and the ticker replay stay out per the multimodal/gate
    # precedent.
    "url_registrable_domain",
    # round 8 late additions stay OUT by existing precedents:
    # cluster_aware_split / dedup_best_per_cluster run the SQL-expressible
    # adjacent-jaccard pair source so recursive CTEs can verify them (the
    # dedup_clusters precedent — production runs the same resolution over
    # LSH pairs, whose cost dedup_minhash_lsh above already represents;
    # scale evidence lives in the cluster_split[cc] 100x sweep), and the
    # three streaming *_replay gates are epoch-protocol fixtures like
    # every other stream replay.
    # round 9: the kafka group/cluster gates (consumer-group resume,
    # eager rebalance, broker failover) are wire-protocol fixtures like
    # kafka_wire_roundtrip_replay — they stay out by the same precedent.
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def _run_isolated(names, sf_dir):
    """One fresh Spark session (subprocess) per query: the in-context series
    consistently reads ~20-40%% above isolated runs from 36-queries-in-one-
    session heap/codegen-cache pressure (VERDICT r3 bench-protocol note).
    Opt in with SPARK_GRAFT_ISOLATED=1; per-query JVM startup is excluded
    from the timing (the child times only the measured pass)."""
    import subprocess

    timings = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_ISOLATED": "", "SPARK_GRAFT_SF_DIR": sf_dir},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"# {name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        timings[name] = json.loads(line[-1])["queries"][name]
        print(f"# {name} (isolated): {timings[name]}s", file=sys.stderr)
    return timings


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    names = sys.argv[1:] or HEADLINE
    if os.environ.get("SPARK_GRAFT_ISOLATED"):
        timings = _run_isolated(names, sf_dir)
        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_isolated",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                }
            )
        )
        return

    spark = get_spark("gohangout-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup pass: JVM JIT, parquet footers, codegen caches — measured pass
    # reflects steady-state throughput, not first-query startup
    for name in names:
        force(QUERIES[name][0](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name][0]
        # JVM GC between measured queries: late-session numbers otherwise
        # inflate 2-3x from accumulated heap pressure (r2 drift root cause
        # was this same effect through a different leak) — the GC makes
        # per-query numbers reproducible regardless of position in the run
        spark._jvm.System.gc()
        t0 = time.time()
        force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
