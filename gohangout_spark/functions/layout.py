"""Data-layout operators: Z-order clustering for multi-column file skipping.

The 100 TB problem this solves: parquet scans prune row groups / files via
min-max statistics, but a sort layout serves only its LEADING column — a
table sorted by `ts` answers `user_id = X` by reading everything. Z-ordering
interleaves the bits of several columns into one sort key so every file
covers a small HYPERCUBE of the key space: min-max ranges stay tight on ALL
zordered columns at once, and predicates on any of them skip most files
(the same layout trick Delta/Iceberg OPTIMIZE ZORDER applies; public
algorithm — Morton order).

Everything here is scan-side expression codegen + ONE range shuffle; the
min/max normalization bounds ride a broadcast 1-row aggregate, so building
the layout is a single pass with no driver-side action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize_to_bits(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by min-max scaling (constant
    columns map to 0; NULL maps to 0 — NULLs cluster together at the
    origin, which keeps their stats tight too)."""
    span = (mx - mn).cast("double")
    scaled = F.when(
        span > 0,
        ((col.cast("double") - mn.cast("double")) / span) * ((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.coalesce(F.round(scaled).cast("long"), F.lit(0))


def zorder_key(cols: list[str], bits: int = 16) -> "tuple":
    """INTERNAL — see :func:`zorder_layout`. Returns (needed agg exprs,
    key-builder) so the bounds aggregate is built once for all columns."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))

    def build(df_cols_prefix: str = "") -> Column:
        ncols = len(cols)
        parts = []
        for j, c in enumerate(cols):
            norm = _normalize_to_bits(
                F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
            )
            # spread bit i of column j to position i*ncols + j (Morton)
            for i in range(bits):
                parts.append(
                    F.shiftleft(
                        F.shiftright(norm, i).bitwiseAND(F.lit(1)), i * ncols + j
                    )
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.bitwiseOR(p)
        return out

    return aggs, build


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_partitions: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` re-laid-out in Z-order over ``cols``: rows are
    range-partitioned and sorted by the interleaved-bit (Morton) key, then
    the helper key is dropped — write the result with
    ``.write.parquet(...)`` and every produced file covers a compact
    hypercube of the column space, so min-max row-group pruning works for
    predicates on ANY of the zordered columns (test_scale quantifies the
    per-file range shrinkage vs a linear sort).

    Shape: one broadcast 1-row bounds aggregate (lazy — no driver action),
    one range exchange on the z-key, an in-partition sort. ``bits`` per
    column bounds key size (16 bits x up to 4 cols stays in a long).
    """
    if not cols:
        raise ValueError("zorder_layout needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds a 64-bit key; lower bits"
        )
    aggs, build = zorder_key(cols, bits)
    bounds = df.agg(*aggs)
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn("__z", build())
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    laid = (
        keyed.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[c for pair in cols for c in (f"__mn_{pair}", f"__mx_{pair}")])
    )
    return laid
