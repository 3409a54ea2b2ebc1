"""Numeric helpers shared by the query library.

``round_half_up`` exists because cross-engine oracle checks cannot rely on
``round()``: DuckDB changed double-rounding behavior across versions
(half-to-even vs half-away), while Spark's ``F.round`` is HALF_UP — so a
ratio that lands exactly on a .5 boundary (e.g. ``1/32 * 10000 = 312.5``)
hashes differently depending on the oracle engine's build.  Computing
``floor(x * 10^k + 0.5) / 10^k`` instead is a pure IEEE-double expression
that both engines evaluate bit-identically: multiplication, addition,
``floor`` and division are all deterministic, so the result is independent
of any engine's rounding-mode choice.  The matching oracle-side SQL is
``floor(x * 1eK + 0.5) / 1eK.0``.

Semantics vs ``F.round``: identical for non-negative inputs (both are
half-up); for negatives this rounds half toward +inf where ``F.round``
rounds half away from zero — observable only when ``x*10^k`` is EXACTLY a
half-integer double, which for the continuous quantities we round (zscores,
perplexities) cannot occur, and for integer ratios is precisely the case
where engine-deterministic behavior is required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int) -> Column:
    """Engine-deterministic half-up rounding of a double column.

    Returns ``floor(col * 10^digits + 0.5) / 10^digits`` as a DOUBLE.
    NULL propagates. Mirror in oracle SQL as
    ``floor(x * 1e{digits} + 0.5) / 1e{digits}`` so both engines produce
    the bit-identical IEEE value regardless of their ``round()`` mode.
    """
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
