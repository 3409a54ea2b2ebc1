"""KV filter — split src into key/value pairs.

Mirrors /root/reference/filter/kv.go:80-113: split ``src`` on ``field_split``,
each token on ``value_split`` (first occurrence only), optional ``trim`` /
``trim_key`` character sets, ``include``/``exclude`` key filters, optional
``target``.

Spark realization: ``str_to_map`` + ``transform_keys``/``map_filter`` — all
built-in higher-order functions, no UDF. Without ``target`` the listed
``include`` keys become top-level string columns (fixed-schema root merge).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect


class KV(Filter):
    def __init__(
        self,
        src: str,
        field_split: str,
        value_split: str,
        trim: str | None = None,
        trim_key: str | None = None,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        target: str | None = None,
    ):
        if not target and not include:
            raise ValueError("KV: need target or include in a fixed schema")
        self.src = src
        self.field_split = field_split
        self.value_split = value_split
        self.trim = trim
        self.trim_key = trim_key
        self.include = include or []
        self.exclude = exclude or []
        self.target = target

    def build(self, df: DataFrame) -> FilterEffect:
        # duplicate keys must overwrite (kv.go:96-111 last-wins), not crash
        df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        src = field_col(self.src, df).cast("string")
        # str_to_map delimiters are regexes; the reference splits literally
        m = F.str_to_map(
            src,
            F.lit(re.escape(self.field_split)),
            F.lit(re.escape(self.value_split)),
        )
        if self.trim_key:
            m = F.transform_keys(m, lambda k, v: _trim_chars(k, self.trim_key))
        if self.trim:
            m = F.transform_values(m, lambda k, v: _trim_chars(v, self.trim))
        if self.include:
            m = F.map_filter(m, lambda k, v: k.isin(self.include))
        if self.exclude:
            m = F.map_filter(m, lambda k, v: ~k.isin(self.exclude))

        eff = FilterEffect()
        if self.target:
            eff.assignments[self.target] = m
        else:
            for k in self.include:
                if k in self.exclude:
                    continue
                eff.assignments[k] = F.element_at(m, F.lit(k))
        # failure when any token lacks the value separator (kv.go:96-99
        # sets success=false on len(SplitN(kv, value_split, 2)) != 2 but
        # keeps processing the remaining tokens — same here: the map
        # assignment above is not gated on full success)
        tokens_ok = F.forall(
            F.split(src, re.escape(self.field_split)),
            lambda t: t.contains(self.value_split),
        )
        eff.success = F.coalesce(src.isNotNull() & tokens_ok, F.lit(False))
        # partially-malformed input still writes its parseable pairs, but a
        # MISSING src writes nothing (kv.go:93 returns before any set)
        eff.assign_on_failure = src.isNotNull()
        return eff


def _trim_chars(col, chars: str):
    return F.btrim(col, F.lit(chars))
