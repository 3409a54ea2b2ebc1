"""gohangout-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of childe/gohangout (Logstash-class streaming
ETL), re-expressed Spark-first.

Reference semantics: /root/reference (childe/gohangout). This is NOT a port —
the YAML pipeline compiles to a declarative DataFrame plan (Catalyst optimizes
it), streaming inputs map to Structured Streaming, and the windowed metric
filters map to watermarked window aggregations.
"""

from gohangout_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
