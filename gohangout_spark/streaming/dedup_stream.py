"""Continuous near-duplicate suppression for a document STREAM.

The production continuous-ingest shape (the streaming twin of
functions.dedup's incremental batch path): each micro-batch is compared
against the persistent MinHash index (new-vs-old) and itself (new-vs-new),
near-dups are dropped, and the SURVIVORS' signatures are appended to the
index — so batch N+1 never re-reads any historical text. Per-batch cost is
O(batch), not O(corpus): the index carries ~300 bytes/doc of signatures
(functions/dedup.py:minhash_index) and both join legs are band-key
equi-joins.

Why foreachBatch and not applyInPandasWithState: the dedup state is a
corpus-wide index keyed by LSH band — not per-group session state — and it
must survive as a queryable table (the batch path reads the same index).
foreachBatch gives each micro-batch a full batch-plan against the parquet
index with exactly-once semantics per epoch; the append is idempotent under
task replay because the whole foreachBatch body re-runs per epoch and the
index append is the LAST action (a replayed epoch re-appends the same
survivor rows — dedupe on read via dropDuplicates(doc_id) or compact the
index offline, both documented below).

Reference parity note: gohangout suppresses repeats via per-key filters in
a linear chain; corpus-level near-dup suppression has no analogue there —
this is an LLM-pipeline extension (SURVEY §7 phase 5).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _index_exists(spark, path: str) -> bool:
    """Probe the index through the Hadoop FileSystem API — a driver-local
    os.path check silently reports 'no index' for hdfs://, s3a:// and every
    other non-local scheme, which would turn cross-batch dedup off."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def start_dedup_stream(
    stream: DataFrame,
    index_path: str,
    sink: Callable[[DataFrame, int], None],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    checkpoint: str | None = None,
    query_name: str = "dedup_stream",
):
    """Wire a streaming DataFrame through continuous near-dup suppression.

    Per micro-batch: drop every doc whose signature-estimated Jaccard
    against the index OR a lower-id batch sibling is ≥ ``threshold``; hand
    survivors (original columns) to ``sink(batch_df, batch_id)``; append
    survivors' signatures to the parquet index at ``index_path``.

    Returns the started StreamingQuery. The id column must be globally
    monotonic across batches (the incremental contract,
    functions/dedup.py:minhash_lsh_candidates_incremental). Empty-text docs
    carry no signature and always survive (they are not meaningful
    near-dups), matching the batch path.
    """
    from gohangout_spark.functions.dedup import (
        minhash_index,
        minhash_lsh_candidates_incremental,
    )

    kw = dict(num_hashes=num_hashes, bands=bands, shingle_n=shingle_n)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        # the batch is consumed by candidates + survivors + index append:
        # one small persist per epoch, released before the epoch ends
        batch_df = batch_df.persist()
        try:
            if _index_exists(spark, index_path):
                index = spark.read.parquet(index_path)
                cands = minhash_lsh_candidates_incremental(
                    batch_df, index, text_col, id_col, **kw
                )
            else:
                index = None
                empty_idx = minhash_index(
                    batch_df.limit(0), text_col, id_col, **kw
                )
                cands = minhash_lsh_candidates_incremental(
                    batch_df, empty_idx, text_col, id_col, **kw
                )
            dup_ids = (
                cands.where(F.col("est_jaccard") >= threshold)
                .select(F.col("id_b").alias(id_col))
                .distinct()
            )
            survivors = batch_df.join(dup_ids, [id_col], "left_anti").persist()
            try:
                sink(survivors, batch_id)
                # index append LAST: a replayed epoch re-runs sink+append
                # with identical rows; readers dedupe on doc_id
                minhash_index(survivors, text_col, id_col, **kw).write.mode(
                    "append"
                ).parquet(index_path)
            finally:
                # unpersist in finally: a flaky sink must not leak cache
                # blocks on a long-running stream
                survivors.unpersist()
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(process).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
