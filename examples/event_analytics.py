"""Runnable tour of the event-analytics operators over the test tables.

    PYTHONPATH=. python examples/event_analytics.py [sf_dir]

The downstream-of-ETL analyses a gohangout user runs on the event stream
this engine produces — all aggregate/equi-join shaped, all oracle-checked
in the workload:

  1. sessionize            per-event session ids (gap-based)
  2. transition_matrix     Markov next-action model
  3. top_event_sequences   most common 3-step paths
  4. funnel_conversion     ordered view->click->purchase funnel
  5. cohort_retention      weekly signup-cohort retention
  6. rfm_segments          recency/frequency/monetary quartiles
  7. zscore_anomalies      per-type outlier events
  8. heavy_hitters         exact top users via Misra-Gries candidates
  9. approx_distinct_report HLL sketch validated against exact counts
"""

from __future__ import annotations

import sys

from gohangout_spark import get_spark
from gohangout_spark.functions.analytics import (
    approx_distinct_report,
    cohort_retention,
    funnel_conversion,
    rfm_segments,
    sessionize,
    top_event_sequences,
    transition_matrix,
    zscore_anomalies,
)
from gohangout_spark.functions.sketch import heavy_hitters
from gohangout_spark.io import load_table, rebalance_for_compute


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")
    ev = rebalance_for_compute(load_table(spark, sf_dir, "events"), spark)

    print("== sessionize (5 rows)")
    sessionize(ev).select("event_id", "user_id", "session_idx").show(5)

    print("== markov transitions")
    transition_matrix(ev).orderBy("src", "dst").show(30, truncate=False)

    print("== top 3-step sequences")
    top_event_sequences(ev, k=10, length=3).show(truncate=False)

    print("== funnel view -> click -> purchase")
    funnel_conversion(ev, ["view", "click", "purchase"]).show()

    print("== weekly cohort retention (first 10)")
    cohort_retention(ev).show(10)

    print("== RFM segments (5 rows)")
    rfm_segments(ev).show(5)

    print("== z-score anomalies (5 rows)")
    zscore_anomalies(ev).show(5)

    print("== heavy-hitter users (Misra-Gries + exact recount)")
    heavy_hitters(ev, "user_id", k=10).show()

    print("== HLL distinct validation")
    approx_distinct_report(ev).show()


if __name__ == "__main__":
    main()
