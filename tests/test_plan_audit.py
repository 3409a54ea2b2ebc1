"""Whole-workload physical-plan audit: the 100 TB guardrail.

Every workload query's executed plan is checked for join shapes that do not
survive scale. CartesianProduct is never acceptable. BroadcastNestedLoopJoin
is acceptable ONLY where the broadcast side is provably tiny and the shape
is the intended design — each whitelisted query documents why. A new query
that accidentally plans a theta join fails here before it ever reaches the
driver gate.
"""

from gohangout_spark.workload import QUERIES

SF = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin allowed: broadcast side is small BY CONSTRUCTION
BNLJ_OK = {
    # deliberate O(n²) exact baseline the LSH variant is recall-tested against
    "embedding_neardup_exact",
    # brute-force ANN baseline: query block broadcast, corpus streams
    "embedding_topk",
    # same broadcast-query shape over the int8-compressed corpus projection
    "embedding_q8_topk",
    # same brute-force shape over the JL-projected (16-dim) vectors
    "embedding_rp_topk",
    # PQ ADC scan: same broadcast-query shape, but the corpus side is the
    # compressed (id, codes) projection — m ints per row, not the vectors
    "embedding_pq_topk",
    # PQ limiting-case hash gate: same ADC broadcast-query scan as
    # embedding_pq_topk, run at rerank >= corpus so the output must equal
    # brute force; broadcast side is still only the 10-query block
    "embedding_pq_exact_rerank",
    # avg(c_acctbal) scalar subquery: a 1-row broadcast
    "tpch_q22",
    # benchmark snippet list (KBs) broadcast for substring containment —
    # no equi-key exists for substring matching
    "decontaminate_docs",
    # fuzzy join's short-string block: all-pairs over values shorter than
    # q*(k+1) chars — a universe bounded by construction, broadcast side
    "fuzzy_name_pairs",
}


def test_no_scale_killer_joins(spark):
    offenders = {}
    for name, (fn, _) in sorted(QUERIES.items()):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "BroadcastNestedLoopJoin (not whitelisted)"
    assert not offenders, offenders
