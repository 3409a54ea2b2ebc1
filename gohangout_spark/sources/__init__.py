from gohangout_spark.sources.sources import (
    SOURCE_REGISTRY,
    FileSource,
    KafkaSource,
    RandomSource,
    SocketSource,
    StdinSource,
    apply_codec,
)

__all__ = [
    "SOURCE_REGISTRY",
    "FileSource",
    "KafkaSource",
    "RandomSource",
    "SocketSource",
    "StdinSource",
    "apply_codec",
]
