from gohangout_spark.streaming.dedup_stream import start_dedup_stream
from gohangout_spark.streaming.stateful import cumulative_link_metric_stream

__all__ = ["cumulative_link_metric_stream", "start_dedup_stream"]
