"""Interleaved A/B: curation_funnel with the r9 bound-tokenizer n-gram
builder (HEAD) vs the unbound pre-e98822b expression shape — VERDICT r9 #2
(the driver measured 0.809x on the touched path while the r9 interleaved
A/B said 1.05x; both cannot be right, so re-measure isolated).

Usage: python tools/ab_funnel.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab  # noqa: F401  (path bootstrap)

import gohangout_spark.functions.curation as cur
from gohangout_spark.workload import QUERIES

_orig = cur._word_ngrams


def _unbound(col, n, hashed, bound=True):
    return _orig(col, n, hashed, bound=False)


def funnel_bound(spark, sf_dir):
    return QUERIES["curation_funnel"][0](spark, sf_dir)


def funnel_unbound(spark, sf_dir):
    cur._word_ngrams = _unbound
    try:
        return QUERIES["curation_funnel"][0](spark, sf_dir)
    finally:
        cur._word_ngrams = _orig


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab({"bound": funnel_bound, "unbound": funnel_unbound}, rounds=rounds)
