from gohangout_spark.expr.paths import field_col, parse_field, set_field, delete_field
from gohangout_spark.expr.conditions import compile_condition, compile_conditions
from gohangout_spark.expr.dateformat import go_layout_to_java
from gohangout_spark.expr.render import compile_render

__all__ = [
    "field_col",
    "parse_field",
    "set_field",
    "delete_field",
    "compile_condition",
    "compile_conditions",
    "go_layout_to_java",
    "compile_render",
]
