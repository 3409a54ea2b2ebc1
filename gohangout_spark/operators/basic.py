"""Simple projection filters: Add, Remove, Rename, Drop, Lowercase,
Uppercase, Gsub, Replace, URLDecode.

All compile to built-in Column expressions — zero UDFs, fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.expr.render import compile_render
from gohangout_spark.operators.base import Filter, FilterEffect


class Add(Filter):
    """Set k -> rendered v per field (/root/reference/filter/add.go:58-64).

    ``overwrite: false`` keeps an existing non-null value
    (coalesce(old, new)).

    Note: all renders resolve against the box's INPUT — a field added in the
    same Add cannot be referenced by a sibling field (use two Add filters).
    The reference iterates a Go map, so same-box self-reference is
    nondeterministic there too; we make it deterministically input-scoped."""

    def __init__(self, fields: dict, overwrite: bool = True):
        self.fields = fields
        self.overwrite = overwrite

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        for path, spec in self.fields.items():
            rendered = compile_render(spec, df, bare_is_field=False)
            if not self.overwrite:
                rendered = F.coalesce(field_col(path, df), rendered)
            eff.assignments[path] = rendered
        return eff


class Remove(Filter):
    """Delete listed fields (/root/reference/filter/remove.go:50-55)."""

    def __init__(self, fields: list[str]):
        self.fields = fields

    def build(self, df: DataFrame) -> FilterEffect:
        return FilterEffect(deletions=list(self.fields))


class Rename(Filter):
    """Read src, set dst, delete src (/root/reference/filter/rename.go:61-70)."""

    def __init__(self, fields: dict):
        self.fields = fields

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        for src, dst in self.fields.items():
            eff.assignments[dst] = field_col(src, df)
            eff.deletions.append(src)
        return eff


class Drop(Filter):
    """Drop the event (/root/reference/filter/drop.go:20-22); combined with
    the box's ``if`` it is a selective delete = ``df.filter(~cond)``."""

    def build(self, df: DataFrame) -> FilterEffect:
        return FilterEffect(drop_row=F.lit(True))


class _CaseFilter(Filter):
    fn = staticmethod(F.lower)

    def __init__(self, fields: list[str]):
        self.fields = fields

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        for path in self.fields:
            eff.assignments[path] = self.fn(field_col(path, df).cast("string"))
        return eff


class Lowercase(_CaseFilter):
    """/root/reference/filter/lowercase.go:59-72"""

    fn = staticmethod(F.lower)


class Uppercase(_CaseFilter):
    """/root/reference/filter/uppercase.go:58-74"""

    fn = staticmethod(F.upper)


class Gsub(Filter):
    """Per-field regex replace-all (/root/reference/filter/gsub.go:81-98).

    fields: list of {field, src, repl} (repl may use $1 group refs)."""

    def __init__(self, fields: list[dict]):
        self.specs = [(f["field"], f["src"], f.get("repl", "")) for f in fields]

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        for path, src, repl in self.specs:
            eff.assignments[path] = F.regexp_replace(
                field_col(path, df).cast("string"), src, repl
            )
        return eff


class Replace(Filter):
    """Per-field literal strings.Replace
    (/root/reference/filter/replace_filter.go:111-126).

    fields: the reference's map shape ``{field: [old, new, count?]}``
    (replace_filter.go ReplaceFilterConfig) or a list of
    ``[field, old, new, count?]``. count == -1 replaces all (built-in
    replace()); count == n replaces the FIRST n occurrences exactly like Go
    strings.Replace — expressed as ``concat_ws(new, split(s, quote(old),
    n+1))``: the bounded split keeps everything after the n-th occurrence in
    the last part."""

    def __init__(self, fields):
        if isinstance(fields, dict):
            fields = [[k, *v] for k, v in fields.items()]
        self.specs = []
        for spec in fields:
            path, old, new = spec[0], spec[1], spec[2]
            count = spec[3] if len(spec) > 3 else -1
            if count == 0 or count < -1:
                raise ValueError("Replace: count must be -1 (all) or a positive n")
            self.specs.append((path, old, new, int(count)))

    def build(self, df: DataFrame) -> FilterEffect:
        import re

        eff = FilterEffect()
        for path, old, new, count in self.specs:
            col = field_col(path, df).cast("string")
            if count == -1:
                eff.assignments[path] = F.replace(col, F.lit(old), F.lit(new))
            else:
                parts = F.split(col, re.escape(old), count + 1)
                # concat_ws maps a NULL array to "" — keep null in, null out
                eff.assignments[path] = F.when(
                    col.isNotNull(), F.concat_ws(new, parts)
                )
        return eff


class URLDecode(Filter):
    """url.QueryUnescape listed fields
    (/root/reference/filter/url_decode.go:42-63). Malformed input keeps the
    original value (try_url_decode), matching the reference's ignore-error
    behavior."""

    def __init__(self, fields: list[str]):
        self.fields = fields

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        for path in self.fields:
            col = field_col(path, df).cast("string")
            eff.assignments[path] = F.coalesce(F.try_url_decode(col), col)
        return eff
