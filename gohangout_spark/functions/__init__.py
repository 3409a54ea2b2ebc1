from gohangout_spark.functions import (
    curation,
    dedup,
    joins,
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
    "multimodal",
    "packing",
    "sampling",
    "similarity",
    "skew",
    "text",
]
