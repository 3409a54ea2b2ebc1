"""Translate filter — dictionary lookup source → target.

Mirrors /root/reference/filter/translate.go:121-131 (apply) and :37-73
(YAML dict load; the reference also背ground-refreshes every
``refresh_interval`` s — in Spark that maps to reloading per ``foreachBatch``
micro-batch, wired in streaming/runner).

Scale design: small dicts compile to a literal in-plan map (zero shuffle,
fully codegen'd); large dicts become a **broadcast hash join** against a dict
DataFrame — never a shuffle join, since the dict is the small side by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterBox, FilterEffect

_LITERAL_MAP_MAX = 10_000


class Translate(Filter):
    def __init__(
        self,
        source: str,
        target: str,
        dictionary: dict | None = None,
        dictionary_path: str | None = None,
        refresh_interval: int | None = None,  # streaming: reload per micro-batch
    ):
        self.refresh_interval = refresh_interval
        self.dictionary_path = dictionary_path
        self._next_refresh: float | None = None
        if dictionary is None:
            if not dictionary_path:
                raise ValueError("Translate: need dictionary or dictionary_path")
            dictionary = self._load_path()
            if refresh_interval:
                import time

                self._next_refresh = time.monotonic() + refresh_interval
        self.source = source
        self.target = target
        self.dictionary = dictionary

    def _load_path(self) -> dict:
        import yaml

        with open(self.dictionary_path) as f:
            return yaml.safe_load(f) or {}

    def maybe_refresh(self, now: float | None = None) -> bool:
        """Reload the dictionary file when ``refresh_interval`` has elapsed —
        the streaming runner calls this at every micro-batch boundary, the
        Spark analogue of the reference's background refresh goroutine
        (filter/translate.go:108-116). Returns True when a reload happened."""
        if not (self.refresh_interval and self.dictionary_path):
            return False
        import time

        now = time.monotonic() if now is None else now
        if self._next_refresh is not None and now < self._next_refresh:
            return False
        self.dictionary = self._load_path()
        self._next_refresh = now + self.refresh_interval
        return True

    def _value_type(self) -> str | None:
        """Common Spark type of the dict values, or None → stringify.
        BOTH lookup paths use this, so the target column's type never
        depends on whether the dict crossed the broadcast threshold."""
        kinds = {type(v) for v in self.dictionary.values()}
        for py, spark_t in ((bool, "boolean"), (int, "long"), (float, "double"), (str, "string")):
            if kinds == {py}:
                return spark_t
        return None

    # Small dict: in-plan literal map.
    def build(self, df: DataFrame) -> FilterEffect:
        if len(self.dictionary) > _LITERAL_MAP_MAX:
            raise RuntimeError("large dict handled by apply_plan")
        vt = self._value_type()
        entries = []
        for k, v in self.dictionary.items():
            entries.append(F.lit(str(k)))
            # cast to the shared type so e.g. int values are bigint here
            # exactly as the broadcast path's typed schema makes them
            entries.append(F.lit(str(v)) if vt is None else F.lit(v).cast(vt))
        m = F.create_map(*entries)
        looked_up = F.element_at(m, field_col(self.source, df).cast("string"))
        eff = FilterEffect()
        eff.assignments[self.target] = looked_up
        eff.success = looked_up.isNotNull()  # lookup miss = failure path
        return eff

    @property
    def plan_level(self) -> bool:  # type: ignore[override]
        return len(self.dictionary) > _LITERAL_MAP_MAX

    def apply_plan(self, df: DataFrame, box: FilterBox) -> DataFrame:
        """Broadcast-join path for big dictionaries — same box contract as
        the literal-map path: the join replaces the in-plan map lookup, and
        the shared FilterBox stage (via __box_eff/__box_failed markers)
        handles if-guard, keep-old-on-miss, nested targets, add/remove
        fields, and duplicate-appending failTag — so both paths are
        byte-identical for the same config."""
        from gohangout_spark.expr.conditions import compile_conditions

        spark = df.sparkSession
        vt = self._value_type()
        dict_df = spark.createDataFrame(
            [
                (str(k), str(v) if vt is None else v)
                for k, v in self.dictionary.items()
            ],
            schema=f"__translate_key string, __translate_val {vt or 'string'}",
        )
        src = field_col(self.source, df).cast("string")
        joined = df.join(
            F.broadcast(dict_df), src == F.col("__translate_key"), "left"
        )
        cond = compile_conditions(box.ifs, df, box.ts_field)
        hit = F.col("__translate_val").isNotNull()
        eff = F.coalesce(cond & hit, F.lit(False))
        failed = F.coalesce(cond & ~hit, F.lit(False))
        out = FilterBox._project(
            joined,
            {self.target: F.col("__translate_val")},
            {},
            eff,
            extra={FilterBox._EFF: eff, FilterBox._FAILED: failed},
        )
        return out.drop("__translate_key", "__translate_val")
