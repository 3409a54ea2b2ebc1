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
    TCPSink,
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
    "TCPSink",
]


def register_sink(name: str, cls) -> None:
    """Third-party output registration (output/output.go:46-67 analogue)."""
    SINK_REGISTRY[name] = cls
