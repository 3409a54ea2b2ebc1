"""Classic event-analytics operators: anomaly flagging, funnel
conversion, cohort retention.

The reference is a log/event ETL engine; these are the three analyses its
users run downstream of it, expressed Spark-first so the whole loop stays
in one system. All are aggregate+equi-join shaped (no windows over
unpartitioned data, no theta joins) and fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_anomalies(
    events: DataFrame,
    *,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    threshold: float = 2.5,
) -> DataFrame:
    """Events whose value is ≥ ``threshold`` sample standard deviations
    from their group's mean. One combiner-reduced groupBy builds the
    per-group (mean, stddev) table — O(groups) rows, broadcast back —
    then flagging is scan-side. The z-score is rounded to 3 decimals
    BEFORE thresholding so the cut is reproducible across engines."""
    stats = events.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    joined = events.join(F.broadcast(stats), group_col)
    z = F.round((F.col(value_col) - F.col("__mu")) / F.col("__sigma"), 3)
    return (
        joined.withColumn("zscore", z)
        .where(F.abs(F.col("zscore")) >= threshold)
        .select(id_col, group_col, value_col, "zscore")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: for each step k, the number of users
    who performed steps[0..k] in order (each step strictly AFTER their
    earliest qualifying time for the previous step — the standard
    first-touch funnel). Returns (step, stage, n_users).

    Shape: one filtered min-aggregate + one equi-join on the user per
    step — k small and fixed, every join keyed on user_id, partial
    aggregation everywhere. No per-user event arrays are materialized,
    so a power user with millions of events costs no more than anyone
    else (the collect_list formulation would skew on exactly that user).
    Each stage's tiny (user, first-ts) frame is persisted before its
    count so stage k's action re-reads stage k-1's result instead of
    replaying the whole chain (un-persisted lineage would scan events
    k(k+1)/2 times).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    prev = None
    reached = []
    for step in steps:
        ev = events.where(F.col(type_col) == step)
        if prev is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            cur = (
                ev.join(prev.select(user_col, F.col("__t").alias("__pt")), user_col)
                .where(F.col(ts_col) > F.col("__pt"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        cur = cur.persist()
        reached.append(cur)
        prev = cur
    spark = events.sparkSession
    counts = [r.count() for r in reached]
    for r in reached:
        r.unpersist()
    return spark.createDataFrame(
        [(s, i + 1, c) for i, (s, c) in enumerate(zip(steps, counts))],
        "step string, stage int, n_users long",
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_offset) the number of
    cohort users active that week. Three combiner-reduced aggregates +
    one equi-join on the user — the retention triangle any analytics UI
    draws. cohort_week is emitted as a date STRING for cross-engine hash
    stability."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cw")
    )
    active = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("__aw")
    ).distinct()
    joined = active.join(first, user_col)
    offset = (F.datediff(F.col("__aw"), F.col("__cw")) / 7).cast("int")
    return (
        joined.select(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-user session index to every event (gap-based: a pause
    longer than ``gap_minutes`` starts a new session) — the per-event
    complement to F.session_window's per-session aggregates. One
    user-partitioned window pass (lag + running sum of break flags);
    windows are PARTITIONED by user, so parallelism is per-user and no
    global sort exists. Returns events + session_idx (1-based)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # NTZ timestamps (tz-naive parquet under Spark 4) cannot cast to long
    # directly — route through timestamp (session tz is pinned UTC)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    prev_sec = prev.cast("timestamp").cast("long")
    brk = (prev.isNull() | (sec - prev_sec > gap_minutes * 60)).cast("int")
    return events.withColumn(
        "session_idx",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
