"""Continuous near-dup suppression across micro-batches
(streaming.start_dedup_stream): a doc near-duplicating one from an EARLIER
micro-batch must be dropped without re-reading historical text, and the
persistent index must grow by survivors only."""

import datetime

from pyspark.sql import Row

from gohangout_spark.streaming import start_dedup_stream

A = "the quick brown fox jumps over the lazy dog again and again today"
B = "completely different words about spark streaming state and dedup"
C = "third unique document mentioning warehouses pipelines and parquet"


def _chunk(spark, path, rows):
    spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    # batch 1: two unique docs; batch 2: exact dup of A (cross-batch),
    # a new unique doc, and an in-batch dup pair (ids 4 < 5)
    _chunk(spark, src, [Row(doc_id=1, text=A), Row(doc_id=2, text=B)])
    _chunk(spark, src, [Row(doc_id=3, text=A), Row(doc_id=4, text=C),
                        Row(doc_id=5, text=C)])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    seen: dict[int, list[int]] = {}

    def sink(df, batch_id):
        seen[batch_id] = sorted(r["doc_id"] for r in df.collect())

    q = start_dedup_stream(
        stream, idx, sink, threshold=0.9,
        checkpoint=str(tmp_path / "ckpt"), query_name="dedup_t1",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    survivors = sorted(x for v in seen.values() for x in v)
    # 3 dropped (dup of historical 1), 5 dropped (in-batch dup of 4)
    assert survivors == [1, 2, 4]
    # index holds exactly the survivors' signatures
    idx_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(idx).collect()
    )
    assert idx_ids == [1, 2, 4]


def test_batches_arriving_later_still_checked(spark, tmp_path):
    """A third batch started as a NEW query run (fresh stream, same index)
    still sees the history — the index, not query state, is the memory."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    _chunk(spark, src, [Row(doc_id=1, text=A)])
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    got = {}
    q = start_dedup_stream(
        stream, idx, lambda df, b: got.setdefault(b, df.count()),
        threshold=0.9, query_name="dedup_t2a",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    src2 = str(tmp_path / "src2")
    _chunk(spark, src2, [Row(doc_id=9, text=A), Row(doc_id=10, text=B)])
    stream2 = (
        spark.readStream.schema("doc_id long, text string").parquet(src2)
    )
    out = {}
    q2 = start_dedup_stream(
        stream2, idx, lambda df, b: out.setdefault(
            b, sorted(r["doc_id"] for r in df.collect())
        ),
        threshold=0.9, query_name="dedup_t2b",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert list(out.values()) == [[10]]  # 9 deduped against the index


def test_checkpoint_restart_processes_only_new_batches(spark, tmp_path):
    """Same checkpoint + same index across a query restart: the restarted
    query must process only the NEW file (offsets from the checkpoint) and
    still dedupe it against the index built before the restart."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _chunk(spark, src, [Row(doc_id=1, text=A), Row(doc_id=2, text=B)])

    seen = []

    def sink(df, batch_id):
        seen.append((batch_id, sorted(r["doc_id"] for r in df.collect())))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_dedup_stream(stream, idx, sink, threshold=0.9,
                           checkpoint=ckpt, query_name="dedup_rs1")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first_run = list(seen)
    assert [ids for _, ids in first_run] == [[1, 2]]

    # new data lands while the query is DOWN; dup of doc 1 + one new doc
    _chunk(spark, src, [Row(doc_id=7, text=A), Row(doc_id=8, text=C)])
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q2 = start_dedup_stream(stream2, idx, sink, threshold=0.9,
                            checkpoint=ckpt, query_name="dedup_rs2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    new = seen[len(first_run):]
    # only the new file was processed (no re-delivery of batch 0), and 7
    # was deduped against the pre-restart index
    assert [ids for _, ids in new] == [[8]]
    idx_ids = sorted(r["doc_id"] for r in spark.read.parquet(idx).collect())
    assert idx_ids == [1, 2, 8]


class TestCountminStream:
    """Streaming Count-Min store (streaming/sketch_stream.py): drained
    stream == one-shot sketch, and epoch-partition overwrite makes batch
    replay idempotent (no double-counting)."""

    def test_stream_equals_oneshot_and_replay_idempotent(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from gohangout_spark.functions.sketch import countmin_table
        from gohangout_spark.streaming.sketch_stream import (
            load_countmin_sketch,
            start_countmin_stream,
        )

        rows = [(i, f"u{i % 7}") for i in range(60)]
        df = spark.createDataFrame(rows, "event_id long, k string")
        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)
        for half, name in ((df.where("event_id < 30"), "a"),
                           (df.where("event_id >= 30"), "b")):
            half.coalesce(1).write.parquet(str(tmp_path / f"tmp_{name}"))
            import glob
            import shutil

            (part,) = glob.glob(str(tmp_path / f"tmp_{name}" / "part-*.parquet"))
            shutil.move(part, f"{in_dir}/{name}.parquet")

        sk_path = str(tmp_path / "sketch")
        stream = (
            spark.readStream.schema("event_id long, k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = start_countmin_stream(
            stream, sk_path, "k", depth=3, width=16,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        as_set = lambda d: {(r.depth, r.bucket, r.cnt) for r in d.collect()}
        oneshot = as_set(countmin_table(df, "k", depth=3, width=16))
        assert as_set(load_countmin_sketch(spark, sk_path)) == oneshot
        epochs = sorted(p for p in os.listdir(sk_path) if p.startswith("epoch="))
        assert len(epochs) == 2

        # replay epoch 0: overwriting its partition with the same partial
        # (what foreachBatch does on a retried epoch) changes nothing
        partial0 = countmin_table(
            df.where("event_id < 30"), "k", depth=3, width=16
        )
        partial0.write.mode("overwrite").parquet(f"{sk_path}/{epochs[0]}")
        assert as_set(load_countmin_sketch(spark, sk_path)) == oneshot


class TestLogbucketStream:
    """Streaming log-bucket quantile store (streaming/sketch_stream.py):
    drained stream == one-shot histogram, and epoch-partition overwrite
    makes batch replay idempotent — the countmin-store protocol applied
    to the quantile member of the sketch family."""

    def test_stream_equals_oneshot_and_replay_idempotent(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from gohangout_spark.functions.sketch import logbucket_table
        from gohangout_spark.streaming.sketch_stream import (
            load_logbucket_hist,
            start_logbucket_stream,
        )

        rows = [(i, "g%d" % (i % 2), float(1 + (i * 37) % 900)) for i in range(80)]
        df = spark.createDataFrame(rows, "event_id long, g string, value double")
        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)
        for half, name in ((df.where("event_id < 40"), "a"),
                           (df.where("event_id >= 40"), "b")):
            half.coalesce(1).write.parquet(str(tmp_path / f"tmp_{name}"))
            (part,) = glob.glob(str(tmp_path / f"tmp_{name}" / "part-*.parquet"))
            shutil.move(part, f"{in_dir}/{name}.parquet")

        hist_path = str(tmp_path / "hist")
        stream = (
            spark.readStream.schema("event_id long, g string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = start_logbucket_stream(
            stream, hist_path, "value", ["g"], scale=10,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        as_set = lambda d: {(r.g, r.idx, r.cnt) for r in d.collect()}
        oneshot = as_set(logbucket_table(df, "value", ["g"], scale=10))
        assert as_set(load_logbucket_hist(spark, hist_path, ["g"])) == oneshot
        epochs = sorted(p for p in os.listdir(hist_path) if p.startswith("epoch="))
        assert len(epochs) == 2

        # replayed epoch overwrites itself: nothing double-counts
        partial0 = logbucket_table(
            df.where("event_id < 40"), "value", ["g"], scale=10
        )
        partial0.write.mode("overwrite").parquet(f"{hist_path}/{epochs[0]}")
        assert as_set(load_logbucket_hist(spark, hist_path, ["g"])) == oneshot


class TestKmvStream:
    """Streaming KMV store (streaming/sketch_stream.py): the third merge
    discipline — partials combine by RE-SKETCHING (bottom-k of the
    union), not cnt-sum. Drained stream == one-shot synopsis, and a
    replayed epoch is idempotent because bottom-k ignores multiplicity."""

    def test_stream_equals_oneshot_and_replay_idempotent(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from gohangout_spark.functions.sketch import kmv_table
        from gohangout_spark.streaming.sketch_stream import (
            load_kmv_sketch,
            start_kmv_stream,
        )

        rows = [(i, "g%d" % (i % 2), "u%d" % (i % 23)) for i in range(80)]
        df = spark.createDataFrame(rows, "event_id long, g string, k string")
        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)
        for half, name in ((df.where("event_id < 40"), "a"),
                           (df.where("event_id >= 40"), "b")):
            half.coalesce(1).write.parquet(str(tmp_path / f"tmp_{name}"))
            (part,) = glob.glob(str(tmp_path / f"tmp_{name}" / "part-*.parquet"))
            shutil.move(part, f"{in_dir}/{name}.parquet")

        sk_path = str(tmp_path / "sketch")
        stream = (
            spark.readStream.schema("event_id long, g string, k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = start_kmv_stream(
            stream, sk_path, "k", ["g"], k=8,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        as_set = lambda d: {(r.g, r.h) for r in d.collect()}
        oneshot = as_set(kmv_table(df, "k", ["g"], k=8))
        loaded = load_kmv_sketch(spark, sk_path, ["g"], k=8)
        # schema contract: exactly (group..., h) — the parquet read's
        # nondeterministic `epoch` partition column must NOT leak (it
        # breaks kmv_union composition; review finding)
        assert loaded.columns == ["g", "h"]
        assert as_set(loaded) == oneshot
        epochs = sorted(p for p in os.listdir(sk_path) if p.startswith("epoch="))
        assert len(epochs) == 2

        # replayed epoch overwrites itself with the same bottom-k partial:
        # the loaded union re-sketch is unchanged
        partial0 = kmv_table(df.where("event_id < 40"), "k", ["g"], k=8)
        partial0.write.mode("overwrite").parquet(f"{sk_path}/{epochs[0]}")
        assert as_set(load_kmv_sketch(spark, sk_path, ["g"], k=8)) == oneshot


class TestHllStream:
    """Streaming HLL store (streaming/sketch_stream.py): register-max
    merging makes union-of-epoch-partials EXACTLY equal the one-shot
    sketch, and epoch-partition overwrite makes batch replay idempotent."""

    def test_stream_equals_oneshot_and_replay_idempotent(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from pyspark.sql import functions as F

        from gohangout_spark.streaming.sketch_stream import (
            load_hll_estimates,
            start_hll_stream,
        )

        rows = [(i, f"g{i % 3}", i % 17) for i in range(90)]
        df = spark.createDataFrame(rows, "event_id long, g string, v long")
        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)
        for i, (half, name) in enumerate(((df.where("event_id < 45"), "a"),
                                          (df.where("event_id >= 45"), "b"))):
            half.coalesce(1).write.parquet(str(tmp_path / f"tmp_{name}"))
            (part,) = glob.glob(str(tmp_path / f"tmp_{name}" / "part-*.parquet"))
            shutil.move(part, f"{in_dir}/{name}.parquet")
            # pin mtimes so epoch=0 is deterministically file a (the
            # replay step below overwrites epoch 0 with a's partial)
            os.utime(f"{in_dir}/{name}.parquet", (1_000_000 + i, 1_000_000 + i))

        sk_path = str(tmp_path / "sketch")
        stream = (
            spark.readStream.schema("event_id long, g string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = start_hll_stream(
            stream, sk_path, "v", ["g"], lg_k=12,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

        got = {
            r["g"]: r["approx_distinct"]
            for r in load_hll_estimates(spark, sk_path, ["g"]).collect()
        }
        # direct sketch is a valid reference HERE because 17 distinct
        # values stays in exact coupon mode (HIP == composite); past
        # coupon mode compare union-built references only — see
        # start_hll_stream's estimator caveat and hll_stream_replay
        oneshot = {
            r["g"]: r["one"]
            for r in df.groupBy("g")
            .agg(F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("one"))
            .collect()
        }
        assert got == oneshot
        # 17 distinct values per group, lg_k=12: sketch is exact here
        assert all(v == 17 for v in got.values()), got
        epochs = sorted(p for p in os.listdir(sk_path) if p.startswith("epoch="))
        assert len(epochs) == 2

        # replayed epoch: rewriting epoch 0 with the same partial (what a
        # retried foreachBatch does) changes nothing — register max is
        # idempotent
        partial0 = df.where("event_id < 45").groupBy("g").agg(
            F.hll_sketch_agg("v", F.lit(12)).alias("sk")
        )
        partial0.write.mode("overwrite").parquet(f"{sk_path}/{epochs[0]}")
        got2 = {
            r["g"]: r["approx_distinct"]
            for r in load_hll_estimates(spark, sk_path, ["g"]).collect()
        }
        assert got2 == oneshot
