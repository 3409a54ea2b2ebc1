from gohangout_spark.streaming.stateful import cumulative_link_metric_stream

__all__ = ["cumulative_link_metric_stream"]
