from gohangout_spark.functions import (
    curation,
    dedup,
    joins,
    layout,
    multimodal,
    packing,
    sampling,
    similarity,
    skew,
    text,
)

__all__ = [
    "curation",
    "dedup",
    "joins",
    "layout",
    "multimodal",
    "packing",
    "sampling",
    "similarity",
    "skew",
    "text",
]
