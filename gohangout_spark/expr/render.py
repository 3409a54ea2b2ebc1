"""Value renders → Column compiler.

The reference renders values for add_fields / sink index names / message keys
via several syntaxes (/root/reference/value_render/value_render.go:28-56):

- field refs (bare / bracket / jsonpath)          → paths.field_col
- ES index pattern ``web-%{appid}-%{+2006.01.02}``
  (/root/reference/value_render/index_render.go:68-153)
  → concat(lit, col, date_format(@timestamp, fmt))
- Go template ``{{.first}}.{{.last}}``
  (/root/reference/value_render/template_value_render.go:41-158)
  → concat of column refs for the dot-field subset (sprig long tail
  unsupported; would be a pandas-UDF fallback)
- anything else → literal
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.dateformat import go_layout_to_java
from gohangout_spark.expr.paths import _BRACKET_RE, _JSONPATH_RE, field_col

_INDEX_PART = re.compile(r"%\{([^}]+)\}")
_TEMPLATE_PART = re.compile(r"\{\{\s*\.([A-Za-z0-9_.\-]+)\s*\}\}")


def _is_field_ref(s: str) -> bool:
    return bool(_BRACKET_RE.match(s)) or bool(_JSONPATH_RE.match(s))


def compile_render(
    value, df: DataFrame | None = None, ts_field: str = "@timestamp", bare_is_field: bool = True
) -> Column:
    """Compile a render spec to a Column.

    ``bare_is_field`` mirrors GetValueRender2 vs GetValueRender
    (value_render.go:68-74): in add_fields the *value* side treats a bare word
    as a literal unless it looks like a reference; field-name sides treat bare
    words as one-level fields.
    """
    if not isinstance(value, str):
        return F.lit(value)
    s = value
    if _is_field_ref(s):
        return field_col(s, df)
    if "%{" in s:
        return _compile_index_pattern(s, df, ts_field)
    if "{{" in s:
        return _compile_template(s, df)
    if bare_is_field and re.fullmatch(r"[A-Za-z_@][A-Za-z0-9_@.\-]*", s or "") and (
        df is None or s in df.columns
    ):
        return field_col(s, df)
    return F.lit(s)


def _compile_index_pattern(s: str, df: DataFrame | None, ts_field: str) -> Column:
    """``web-%{appid}-%{+2006.01.02}`` → concat(lit,col,date_format(...))."""
    cols: list[Column] = []
    pos = 0
    for m in _INDEX_PART.finditer(s):
        if m.start() > pos:
            cols.append(F.lit(s[pos : m.start()]))
        inner = m.group(1)
        if inner.startswith("+"):
            fmt = go_layout_to_java(inner[1:])
            cols.append(F.date_format(field_col(ts_field, df), fmt))
        else:
            cols.append(field_col(inner, df).cast("string"))
        pos = m.end()
    if pos < len(s):
        cols.append(F.lit(s[pos:]))
    return cols[0] if len(cols) == 1 else F.concat(*cols)


_ANY_ACTION = re.compile(r"\{\{\s*(.*?)\s*\}\}", re.S)


def _compile_template(s: str, df: DataFrame | None) -> Column:
    """``{{.a}}-{{.b.c}}`` and the reference's custom template functions
    (template_value_render.go:41-158): now, timestamp, plus/minus/multiply/
    divide/mod, upper/lower/trim/title. Unknown actions raise."""
    cols: list[Column] = []
    pos = 0
    for m in _ANY_ACTION.finditer(s):
        if m.start() > pos:
            cols.append(F.lit(s[pos : m.start()]))
        cols.append(_compile_action(m.group(1), df).cast("string"))
        pos = m.end()
    if pos < len(s):
        cols.append(F.lit(s[pos:]))
    return cols[0] if len(cols) == 1 else F.concat(*cols)


def _compile_action(expr: str, df: DataFrame | None) -> Column:
    """One template action → Column."""
    parts = expr.split()
    if not parts:
        raise ValueError("empty template action")
    head = parts[0]
    if head.startswith("."):
        if len(parts) > 1:
            raise ValueError(f"unsupported template pipeline: {expr!r}")
        path = "".join(f"[{p}]" for p in head[1:].split("."))
        return field_col(path, df)
    args = [_action_arg(a, df) for a in parts[1:]]
    if head == "now":
        return F.current_timestamp()
    if head == "timestamp":
        return F.unix_timestamp(F.current_timestamp())
    if head in ("plus", "minus", "multiply", "divide", "mod"):
        if len(args) != 2:
            raise ValueError(f"{head} needs 2 args: {expr!r}")
        a, b = (c.cast("double") for c in args)
        out = {
            "plus": a + b,
            "minus": a - b,
            "multiply": a * b,
            "divide": a / b,
            "mod": a % b,
        }[head]
        return out
    if head in ("upper", "lower", "trim", "title"):
        if len(args) != 1:
            raise ValueError(f"{head} needs 1 arg: {expr!r}")
        fn = {"upper": F.upper, "lower": F.lower, "trim": F.trim, "title": F.initcap}[head]
        return fn(args[0].cast("string"))
    raise ValueError(f"unsupported template function {head!r} in {expr!r}")


def _action_arg(tok: str, df: DataFrame | None) -> Column:
    if tok.startswith("."):
        path = "".join(f"[{p}]" for p in tok[1:].split("."))
        return field_col(path, df)
    if tok.startswith('"') and tok.endswith('"'):
        return F.lit(tok[1:-1])
    try:
        return F.lit(int(tok))
    except ValueError:
        pass
    try:
        return F.lit(float(tok))
    except ValueError:
        raise ValueError(f"bad template argument {tok!r}")
