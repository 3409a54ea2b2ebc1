from gohangout_spark.functions import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
