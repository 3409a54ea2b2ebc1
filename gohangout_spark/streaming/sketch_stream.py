"""Continuous frequency sketching for an event STREAM.

The streaming twin of functions.sketch's Count-Min path: each micro-batch
is reduced to its own bounded (depth, bucket, cnt) partial sketch, and the
partial is written to a per-epoch partition of a persistent sketch store.
Because Count-Min merges by ELEMENTWISE SUM (tested in
tests/test_functions.py::TestCountMin::test_merge_is_elementwise_sum), the
store never needs read-modify-write: the queryable sketch is simply the
sum of every epoch partial on read. Per-batch cost is O(batch) reduced to
≤ depth×width rows; the store grows by ≤ depth×width rows per epoch
regardless of traffic, and an offline compaction (sum and rewrite) is a
pure optimization, never a correctness step.

Why foreachBatch and not applyInPandasWithState: the sketch is a global
table, not per-group session state, and it must survive as a queryable
store (the batch path reads the same layout). Idempotency under epoch
replay is structural: each epoch OVERWRITES its own ``epoch=<id>``
partition directory, so a replayed epoch rewrites identical rows instead
of double-counting (foreachBatch alone is at-least-once on retry;
dedup_stream.py documents the same seam and resolves it with
dedupe-on-read — here the epoch key makes the write itself idempotent,
pinned by TestCountminStream's replayed-epoch test).

Reference parity note: gohangout counts via windowed LinkMetric
aggregations; a mergeable any-key frequency sketch has no analogue there
— this is an LLM-pipeline extension (SURVEY §7 phase 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gohangout_spark.functions.sketch import countmin_table


def start_countmin_stream(
    stream: DataFrame,
    sketch_path: str,
    col: str,
    *,
    depth: int = 4,
    width: int = 256,
    checkpoint: str | None = None,
    query_name: str = "countmin_stream",
):
    """Wire a streaming DataFrame into a persistent Count-Min store:
    every micro-batch appends its bounded partial sketch as the
    ``epoch=<id>`` partition of ``sketch_path`` (overwrite-on-replay —
    see module docstring). Query the live sketch any time with
    :func:`load_countmin_sketch`; its estimates converge to the one-shot
    batch sketch the moment the stream drains (hash-gated end to end by
    ``countmin_stream_replay``)."""

    def _merge(batch: DataFrame, epoch_id: int) -> None:
        partial = countmin_table(batch, col, depth=depth, width=width)
        # static partition overwrite: a replayed epoch rewrites itself
        partial.write.mode("overwrite").parquet(
            f"{sketch_path}/epoch={epoch_id}"
        )

    writer = stream.writeStream.queryName(query_name).foreachBatch(_merge)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def load_countmin_sketch(spark: SparkSession, sketch_path: str) -> DataFrame:
    """The queryable sketch: elementwise sum of every epoch partial.
    Returns the same (depth, bucket, cnt) schema as
    :func:`functions.sketch.countmin_table`, so
    :func:`functions.sketch.countmin_estimate` probes it unchanged."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
