"""Scale-mechanics tests: salting equivalence, bucketed co-located joins,
streaming checkpoint restart — the behaviors that matter at 100 TB,
asserted on small data via plan inspection and state continuity."""

import pytest
from pyspark.sql import functions as F

from gohangout_spark.functions.skew import salted_agg
from gohangout_spark.io import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestSalting:
    def test_salted_agg_equals_plain(self, spark):
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        plain = {
            (r["event_type"],): (r["n"], r["s"], r["mn"])
            for r in ev.groupBy("event_type")
            .agg(F.count("value").alias("n"), F.round(F.sum("value"), 4).alias("s"),
                 F.min("value").alias("mn"))
            .collect()
        }
        salted = {
            (r["event_type"],): (r["n"], round(r["s"], 4), r["mn"])
            for r in salted_agg(
                ev,
                ["event_type"],
                {"n": ("count", "value"), "s": ("sum", "value"), "mn": ("min", "value")},
                salt_buckets=16,
            ).withColumn("s", F.round("s", 4)).collect()
        }
        assert plain == salted

    def test_salted_avg(self, spark):
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        got = salted_agg(ev, ["event_type"], {"m": ("avg", "value")}).collect()
        want = {r["event_type"]: r["m"] for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()}
        for r in got:
            assert r["m"] == pytest.approx(want[r["event_type"]])

    def test_non_algebraic_rejected(self, spark):
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        with pytest.raises(ValueError, match="non-algebraic"):
            salted_agg(ev, ["event_type"], {"x": ("median", "value")})


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """Pre-bucketing both sides on the join key removes the Exchange —
        the co-located join strategy for repeated fact-fact joins."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            from gohangout_spark.io import write_bucketed

            orders = load_table(spark, "/root/testdata/sf0.001", "orders")
            li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")
            write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = plan_of(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan  # co-located: zero shuffle
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestCheckpointRestart:
    def test_stream_resumes_without_double_count(self, spark, tmp_path):
        """Stop a windowed-count stream, drop more data, restart from the
        SAME checkpoint: state resumes, totals don't double-count — the
        durability story the reference lacks (SURVEY §3.1 step 5)."""
        import datetime

        from pyspark.sql import Row

        BASE = datetime.datetime(2024, 1, 1)
        src = str(tmp_path / "src")
        ck = str(tmp_path / "ck")

        def drop(n):
            rows = [Row(k="g", ts=BASE) for _ in range(n)]
            spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)

        out_dir = str(tmp_path / "out")

        def start():
            stream = spark.readStream.schema("k string, ts timestamp").parquet(src)
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour"), "k")
                .count()
            )

            def sink(batch_df, epoch_id):
                batch_df.select("k", "count").write.mode("append").parquet(out_dir)

            # memory sink can't recover from checkpoints; foreachBatch can
            return (
                agg.writeStream.foreachBatch(sink)
                .outputMode("update").option("checkpointLocation", ck).start()
            )

        def max_count():
            return spark.read.parquet(out_dir).agg(F.max("count")).first()[0]

        drop(30)
        q = start()
        q.processAllAvailable()
        first = max_count()
        q.stop()

        drop(12)
        q2 = start()
        q2.processAllAvailable()
        second = max_count()
        q2.stop()

        assert first == 30
        assert second == 42  # resumed state + new rows, no double count


class TestZorderLayout:
    def test_zorder_tightens_all_column_ranges(self, spark, tmp_path):
        """Quantified file-skipping proxy: per-file min-max spans must be
        tight on BOTH columns under Z-order, vs a linear sort that only
        serves its leading column."""
        import pyarrow.parquet as pq

        from gohangout_spark.functions.layout import zorder_layout

        n = 4096
        df = spark.range(n).select(
            (F.col("id") % 64).alias("x"),
            F.floor(F.col("id") / 64).alias("y"),
            F.col("id").alias("payload"),
        )

        zpath = str(tmp_path / "zorder")
        lpath = str(tmp_path / "linear")
        zorder_layout(df, ["x", "y"], n_partitions=16).write.parquet(zpath)
        df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.parquet(
            lpath
        )

        import glob
        import os

        def spans(path, col):
            out = []
            for f in glob.glob(os.path.join(path, "*.parquet")):
                md = pq.ParquetFile(f).metadata
                idx = md.schema.names.index(col)
                mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
                mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
                out.append(mx - mn)
            return sum(out) / len(out)

        # linear layout: x tight, y spans nearly the full 0..63 range per file
        assert spans(lpath, "y") > 32
        # z-order: BOTH columns' per-file spans stay small hypercube-sized
        zx, zy = spans(zpath, "x"), spans(zpath, "y")
        assert zx < 32 and zy < 32, (zx, zy)

        # layout is a re-ordering, never a data change
        back = spark.read.parquet(zpath)
        assert back.count() == n
        assert back.agg(F.sum("payload")).first()[0] == n * (n - 1) // 2

    def test_zorder_validation(self, spark):
        from gohangout_spark.functions.layout import zorder_layout

        df = spark.range(4).select(F.col("id").alias("a"))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            zorder_layout(df, [])
        with _pytest.raises(ValueError):
            zorder_layout(df, ["a"] * 5, bits=16)
