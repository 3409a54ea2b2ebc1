from gohangout_spark.sinks.sinks import (
    SINK_REGISTRY,
    ClickHouseSink,
    DotSink,
    ElasticsearchSink,
    FileSink,
    InfluxdbSink,
    KafkaSink,
    MemorySink,
    StdoutSink,
)

__all__ = [
    "SINK_REGISTRY",
    "ClickHouseSink",
    "DotSink",
    "ElasticsearchSink",
    "FileSink",
    "InfluxdbSink",
    "KafkaSink",
    "MemorySink",
    "StdoutSink",
]
