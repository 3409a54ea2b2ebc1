"""LLM-data-pipeline text operators as YAML-addressable filters.

The north-star ops (functions.text / functions.dedup) wrapped in the same
FilterBox contract as the reference-parity filters, so a training-data
curation pipeline is just another YAML config:

    filters:
    - LanguageId: {src: text, target: lang_pred}
    - TextQuality: {src: text, target: quality}
    - TokenCount: {src: text, target: n_tokens}
    - Fingerprint: {src: text, target: fp}
    - SimHash: {src: text, target: simhash}
    - Drop:
        if: ['EQ(lang_pred,"unknown")']
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect


class _TextOp(Filter):
    def __init__(self, src: str = "text", target: str | None = None):
        self.src = src
        self.target = target or self.default_target

    def build(self, df: DataFrame) -> FilterEffect:
        eff = FilterEffect()
        eff.assignments[self.target] = self.expr(field_col(self.src, df).cast("string"))
        return eff


class LanguageId(_TextOp):
    default_target = "lang_pred"

    def expr(self, col):
        from gohangout_spark.functions.text import language_id

        return language_id(col)


class TextQuality(_TextOp):
    default_target = "quality"

    def expr(self, col):
        from gohangout_spark.functions.text import quality_score

        return quality_score(col)


class TokenCount(_TextOp):
    default_target = "n_tokens"

    def expr(self, col):
        from gohangout_spark.functions.text import token_count

        return token_count(col).cast("long")


class Fingerprint(_TextOp):
    default_target = "fp"

    def expr(self, col):
        from gohangout_spark.functions.text import fingerprint

        return fingerprint(col)


class SimHash(_TextOp):
    default_target = "simhash"

    def expr(self, col):
        from gohangout_spark.functions.dedup import simhash_column

        return simhash_column(col)


class RedactPii(_TextOp):
    """Scrub emails/IPv4s/phones in place (``target`` defaults to ``src`` —
    redaction replaces the field, matching how a log pipeline uses it)."""

    default_target = None

    def __init__(self, src: str = "message", target: str | None = None):
        self.src = src
        self.target = target or src

    def expr(self, col):
        from gohangout_spark.functions.curation import redact_pii

        return redact_pii(col)
