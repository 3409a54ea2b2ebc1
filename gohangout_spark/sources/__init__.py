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


def register_source(name: str, cls) -> None:
    """Third-party input registration (input/input.go:40-59 analogue)."""
    SOURCE_REGISTRY[name] = cls
