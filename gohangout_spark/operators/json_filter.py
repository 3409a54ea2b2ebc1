"""Json filter — parse a JSON-string field into the event.

Mirrors /root/reference/filter/json.go:62-123: parse ``field``; merge into the
event root or under ``target``; ``include``/``exclude`` key filters;
``overwrite``.

Fixed-schema mapping: with a ``schema`` (DDL string) the parse is a typed
``from_json``; without one the payload parses as ``map<string,string>``.
Root-merge materializes the listed ``include`` keys (or schema fields) as
top-level columns — a schema-less root-merge of arbitrary keys cannot exist in
a fixed schema, so either ``target``, ``schema`` or ``include`` must be given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect


class Json(Filter):
    def __init__(
        self,
        field: str,
        target: str | None = None,
        schema: str | None = None,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        overwrite: bool = True,
    ):
        if not (target or schema or include):
            raise ValueError("Json: need target, schema or include in a fixed schema")
        self.field = field
        self.target = target
        self.schema = schema
        self.include = include or []
        self.exclude = exclude or []
        self.overwrite = overwrite

    def build(self, df: DataFrame) -> FilterEffect:
        src = field_col(self.field, df).cast("string")
        eff = FilterEffect()

        if self.schema:
            from pyspark.sql.types import StructType

            parsed = F.from_json(src, self.schema)
            keys = [f.name for f in StructType.fromDDL(self.schema).fields]
        else:
            parsed = F.from_json(src, "map<string,string>")
            keys = list(self.include)

        if self.include:
            keys = [k for k in keys if k in self.include]
        if self.exclude:
            keys = [k for k in keys if k not in self.exclude]

        ok = src.isNotNull() & parsed.isNotNull()
        if self.target:
            if self.include or self.exclude:
                if self.schema:
                    kept = F.struct(*[parsed.getItem(k).alias(k) for k in keys])
                else:
                    kept = F.map_filter(parsed, lambda k, _: _key_kept(k, self.include, self.exclude))
                eff.assignments[self.target] = kept
            else:
                eff.assignments[self.target] = parsed
        else:
            for k in keys:
                new = parsed.getItem(k)
                if not self.overwrite:
                    new = F.coalesce(field_col(k, df), new)
                eff.assignments[k] = new
        eff.success = F.coalesce(ok, F.lit(False))
        return eff


def _key_kept(k, include: list[str], exclude: list[str]):
    cond = F.lit(True)
    if include:
        cond = k.isin(include)
    if exclude:
        cond = cond & ~k.isin(exclude)
    return cond
