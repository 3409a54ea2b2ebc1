"""Table profiling — the ANALYZE primitive a data pipeline runs before
trusting a new source: per-column counts, null counts, exact distinct
counts, min/max, in ONE pass over the data.

Shape: a single aggregate row computes every statistic (count / null-sum /
countDistinct / min / max per column). Multiple exact countDistinct
aggregates plan through Spark's Expand operator — one scan, rows
multiplied by the number of profiled columns map-side, all partials
combiner-reduced. For very wide tables at extreme scale, profile column
groups separately or switch ``exact_distinct=False`` to HLL sketches
(approx_count_distinct — one pass, no Expand). The bounded single agg row
is then melted driver-side into one row per column (O(cols) work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA = (
    "column string, n_rows long, n_null long, n_distinct long, min_s string, max_s string"
)


def profile(
    df: DataFrame, cols: list[str] | None = None, *, exact_distinct: bool = True
) -> DataFrame:
    """One-pass column profile; returns one row per column with total /
    null / distinct counts and min/max rendered as strings (uniform
    schema across column types). Distinct counts ignore NULLs (SQL
    COUNT(DISTINCT) semantics)."""
    cols = cols or df.columns
    spark = df.sparkSession
    aggs = []
    for c in cols:
        col = F.col(f"`{c}`")
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__null"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__nd"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs).first()
    out = [
        (
            c,
            row[f"{c}__n"],
            row[f"{c}__null"],
            row[f"{c}__nd"],
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return spark.createDataFrame(out, PROFILE_SCHEMA)
