"""Split filter — positional field extraction.

Mirrors /root/reference/filter/split_filter.go:88-124: split ``src`` on ``sep``
(literal; ``maxSplit`` like Go SplitN; optionally a dynamic per-event
separator field), assign parts positionally to ``fields``, ``trim``,
``ignore_blank``; fails when fewer parts than fields.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect


class Split(Filter):
    def __init__(
        self,
        src: str,
        sep: str,
        fields: list[str],
        max_split: int = -1,
        trim: str | None = None,
        ignore_blank: bool = True,
        dynamic_sep: bool = False,
    ):
        self.src = src
        self.sep = sep
        self.fields = fields
        self.max_split = max_split
        self.trim = trim
        self.ignore_blank = ignore_blank
        self.dynamic_sep = dynamic_sep

    def build(self, df: DataFrame) -> FilterEffect:
        src = field_col(self.src, df).cast("string")
        if self.dynamic_sep:
            # per-event separator read from a field (split_filter.go dynamicSep)
            sep_col = F.regexp_replace(
                field_col(self.sep, df).cast("string"), r"([.*+?^${}()|\[\]\\])", r"\\$1"
            )
            # the reference always applies maxSplit (strings.SplitN,
            # split_filter.go:106) — the dynamic path is no exception, so the
            # last field keeps the unsplit remainder when maxSplit==len(fields)
            parts = F.split(src, sep_col, self.max_split)
        else:
            parts = F.split(src, re.escape(self.sep), self.max_split)
        eff = FilterEffect()
        ok = src.isNotNull() & (F.size(parts) >= len(self.fields))
        for i, fname in enumerate(self.fields):
            v = F.element_at(parts, i + 1)
            if self.trim:
                v = F.btrim(v, F.lit(self.trim))
            if self.ignore_blank:
                v = F.when(v != "", v)
            eff.assignments[fname] = F.when(ok, v)
        eff.success = F.coalesce(ok, F.lit(False))
        return eff
