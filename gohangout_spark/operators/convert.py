"""Convert filter — per-field type casts with failure handling.

Mirrors /root/reference/filter/convert.go:215-237 (apply) and :23-106
(converters): targets int/uint/float/bool/string/array(int)/array(float),
options remove_if_fail / setto_if_fail / setto_if_nil.

Semantics notes vs Go:
- Go ``strconv.ParseInt`` rejects "12.3"; Spark's lax string→long cast
  truncates, so int casts are guarded by an integer regex to keep the
  reference's failure semantics.
- In a fixed schema the column type changes for ALL rows; rows skipped by an
  if-guard get ``old.cast(target)`` (best-effort) rather than keeping the
  original dynamic type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect

_INT_RE = r"^[+-]?\d+$"
_UINT_RE = r"^\+?\d+$"


def _cast(col: Column, to: str) -> tuple[Column, str]:
    """Return (converted, spark_type). Failed conversions yield NULL."""
    if to == "int":
        s = F.trim(col.cast("string"))
        return F.when(s.rlike(_INT_RE), s.try_cast("long")).otherwise(
            F.lit(None).cast("long")
        ), "long"
    if to == "uint":
        s = F.trim(col.cast("string"))
        return F.when(s.rlike(_UINT_RE), s.try_cast("long")).otherwise(
            F.lit(None).cast("long")
        ), "long"
    if to == "float":
        return col.cast("string").try_cast("double"), "double"
    if to == "bool":
        return F.trim(col.cast("string")).try_cast("boolean"), "boolean"
    if to == "string":
        return col.cast("string"), "string"
    if to == "array(int)":
        return _cast_array(col, "long"), "array<bigint>"
    if to == "array(float)":
        return _cast_array(col, "double"), "array<double>"
    raise ValueError(f"Convert: unknown target type {to!r}")


def _cast_array(col: Column, elem: str) -> Column:
    # array source -> element-wise cast; string source -> parse "[1,2]" JSON
    parsed = F.when(
        col.cast("string").startswith("["),
        F.from_json(col.cast("string"), f"array<{elem}>"),
    ).otherwise(F.lit(None).cast(f"array<{elem}>"))
    return parsed


class Convert(Filter):
    def __init__(self, fields: dict):
        # fields: {path: {to: ..., remove_if_fail: bool, setto_if_fail: v,
        #                 setto_if_nil: v}}
        self.fields = fields

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        ok_cols: list[Column] = []
        for path, spec in self.fields.items():
            to = spec["to"]
            src = field_col(path, df)
            # array columns skip the string-cast path
            try:
                dtype = df.select(src.alias("_c")).schema[0].dataType.simpleString()
            except Exception:
                dtype = "string"
            if to.startswith("array(") and dtype.startswith("array"):
                elem = "long" if to == "array(int)" else "double"
                converted, sptype = F.transform(src, lambda x: x.try_cast(elem)), f"array<{elem}>"
            else:
                converted, sptype = _cast(src, to)

            failed = src.isNotNull() & converted.isNull()
            value = converted
            if "setto_if_fail" in spec:
                value = F.when(failed, F.lit(spec["setto_if_fail"]).cast(sptype)).otherwise(
                    converted
                )
            elif spec.get("remove_if_fail"):
                value = converted  # failed -> NULL == removed
            if "setto_if_nil" in spec:
                value = F.when(
                    src.isNull(), F.lit(spec["setto_if_nil"]).cast(sptype)
                ).otherwise(value)

            eff.assignments[path] = value
            # rows skipped by an if-guard keep a best-effort cast of the old
            # value; string→array is not castable, so arrays fall back to the
            # converted expression itself
            if sptype.startswith("array") and not dtype.startswith("array"):
                eff.otherwise[path] = converted
            else:
                eff.otherwise[path] = src.try_cast(sptype)
            handled = "setto_if_fail" in spec or spec.get("remove_if_fail", False)
            if not handled:
                ok_cols.append(~failed)
        if ok_cols:
            acc = ok_cols[0]
            for c in ok_cols[1:]:
                acc = acc & c
            eff.success = acc
        return eff
