"""FilterBox — the shared guard / post-process contract every filter obeys.

Mirrors /root/reference/topology/filter.go:69-110:
- all ``if`` conditions must pass, else the filter is skipped for that row;
- on per-row success: apply ``add_fields`` then ``remove_fields``;
- on per-row failure: append ``failtag`` to the ``tags`` field.

Spark realization: one conditional projection per box —
``when(cond & success, new_value).otherwise(old_value)`` per touched column —
so a box is a single narrow ``select`` that Catalyst folds into whole-stage
codegen. No UDFs, no row loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gohangout_spark.expr.conditions import compile_conditions
from gohangout_spark.expr.paths import delete_field, field_col, parse_field, set_field
from gohangout_spark.expr.render import compile_render


@dataclass
class FilterEffect:
    """What a filter wants to do to the DataFrame, declaratively.

    assignments: field-path -> new value Column (expressions over the INPUT df)
    deletions:   field paths removed on success
    success:     per-row success Column (None = always succeeds), mirrors the
                 bool returned by Filter() in topology/filter.go:14-16
    drop_row:    rows to remove entirely (Drop filter semantics)
    """

    assignments: dict[str, Column] = field(default_factory=dict)
    deletions: list[str] = field(default_factory=list)
    success: Column | None = None
    drop_row: Column | None = None
    # per-path override of the not-applied branch — needed when the filter
    # changes the column TYPE (e.g. Convert): rows skipped by the if-guard
    # cannot keep the old type in a fixed-schema column, so the filter
    # supplies e.g. old.cast(target) here.
    otherwise: dict[str, Column] = field(default_factory=dict)


class Filter:
    """Base class: subclasses declare their effect against an input df."""

    def build(self, df: DataFrame) -> FilterEffect:  # pragma: no cover
        raise NotImplementedError

    # Filters that restructure the plan (aggregations, nested chains)
    # override apply() wholesale instead of build().
    plan_level = False

    def apply_plan(self, df: DataFrame, box: "FilterBox") -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class FilterBox:
    def __init__(
        self,
        flt: Filter,
        ifs: list[str] | None = None,
        add_fields: dict | None = None,
        remove_fields: list[str] | None = None,
        fail_tag: str | None = None,
        tags_field: str = "tags",
        ts_field: str = "@timestamp",
    ):
        self.filter = flt
        self.ifs = ifs or []
        self.add_fields = add_fields or {}
        self.remove_fields = remove_fields or []
        self.fail_tag = fail_tag
        self.tags_field = tags_field
        self.ts_field = ts_field

    def apply(self, df: DataFrame) -> DataFrame:
        if self.filter.plan_level:
            return self.filter.apply_plan(df, self)

        cond = compile_conditions(self.ifs, df, self.ts_field)
        effect = self.filter.build(df)

        if effect.drop_row is not None:
            # Drop-with-if = selective delete (filter/drop.go:20-22)
            return df.filter(~(cond & effect.drop_row))

        unconditional = not self.ifs and effect.success is None
        success = effect.success if effect.success is not None else F.lit(True)
        eff = cond & success

        # Build ONE projection: every expression references the ORIGINAL df,
        # so per-row success / failtag logic sees pre-transform values (the
        # reference applies Filter() then post-processes the same event).
        top_assign: dict[str, Column] = {}
        nested_assign: list[tuple[str, Column]] = []
        top_drop: set[str] = set()
        nested_drop: list[str] = []

        def assign(path: str, new_col: Column, otherwise: Column | None):
            segs = parse_field(path)
            top = str(segs[0])
            if len(segs) == 1:
                if otherwise is not None:
                    value = F.when(eff, new_col).otherwise(otherwise)
                elif top in df.columns:
                    value = F.when(eff, new_col).otherwise(F.col(f"`{top}`"))
                else:
                    value = F.when(eff, new_col)
                top_assign[top] = value
            else:
                old = otherwise
                if old is None:
                    old = field_col(path, df) if top in df.columns else F.lit(None)
                nested_assign.append((path, F.when(eff, new_col).otherwise(old)))

        # 1. filter's own assignments
        for path, new_col in effect.assignments.items():
            assign(path, new_col, effect.otherwise.get(path))
        # 2. post-process on success: add_fields then remove_fields
        #    (topology/filter.go:76-86)
        for path, spec in self.add_fields.items():
            rendered = compile_render(spec, df, self.ts_field, bare_is_field=False)
            assign(path, rendered, None)
        for path in list(self.remove_fields) + list(effect.deletions):
            segs = parse_field(path)
            if unconditional:
                if len(segs) == 1:
                    top_drop.add(str(segs[0]))
                    top_assign.pop(str(segs[0]), None)
                else:
                    nested_drop.append(path)
            else:
                assign(path, F.lit(None), None)

        # 3. failure: append failtag to tags (topology/filter.go:87-94)
        if self.fail_tag is not None and effect.success is not None:
            failed = cond & ~F.coalesce(success, F.lit(False))
            existing = (
                field_col(self.tags_field, df)
                if self.tags_field in df.columns
                else F.lit(None).cast(T.ArrayType(T.StringType()))
            )
            tagged = F.array_union(
                F.coalesce(existing, F.array().cast(T.ArrayType(T.StringType()))),
                F.array(F.lit(self.fail_tag)),
            )
            top_assign[self.tags_field] = F.when(failed, tagged).otherwise(existing)

        select_cols: list[Column] = []
        for c in df.columns:
            if c in top_drop:
                continue
            if c in top_assign:
                select_cols.append(top_assign.pop(c).alias(c))
            else:
                select_cols.append(F.col(f"`{c}`"))
        for c, expr in top_assign.items():
            select_cols.append(expr.alias(c))
        out = df.select(*select_cols)
        for path, expr in nested_assign:
            out = set_field(out, path, expr)
        for path in nested_drop:
            out = delete_field(out, path)
        return out

    @staticmethod
    def _cond_assign(
        out: DataFrame,
        src: DataFrame,
        path: str,
        new_col: Column,
        eff: Column,
        otherwise: Column | None = None,
    ) -> DataFrame:
        segs = parse_field(path)
        top = str(segs[0])
        if len(segs) == 1:
            if otherwise is not None:
                value = F.when(eff, new_col).otherwise(otherwise)
            elif top in out.columns:
                value = F.when(eff, new_col).otherwise(F.col(f"`{top}`"))
            else:
                value = F.when(eff, new_col)
            return out.withColumn(top, value)
        old = otherwise
        if old is None:
            old = field_col(path, out) if top in out.columns else F.lit(None)
        return set_field(out, path, F.when(eff, new_col).otherwise(old))


class Chain:
    """An ordered list of FilterBoxes compiled over a DataFrame —
    the analogue of the ProcessorNode linked list
    (/root/reference/topology/processor.go:31-46), except Catalyst sees the
    whole chain as one logical plan and optimizes across boxes."""

    def __init__(self, boxes: list[FilterBox]):
        self.boxes = boxes

    def apply(self, df: DataFrame) -> DataFrame:
        for box in self.boxes:
            df = box.apply(df)
        return df
