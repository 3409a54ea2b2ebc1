"""Runnable tour of the write-path layout tools over the test tables.

    PYTHONPATH=. python examples/data_layout.py [sf_dir]

At 100 TB the read cost of a table is decided WHEN IT IS WRITTEN:

1. Z-order (zorder_layout / FileSink zorder_by): min-max row-group pruning
   works on EVERY zordered column, not just a leading sort key.
2. Parquet bloom filters (FileSink bloom_filter_columns): point-lookup
   skipping on high-cardinality columns where min-max can't help.
3. Bucketing (write_bucketed): repeated fact-fact joins pay ZERO shuffle.

This script writes the events table three ways and prints the evidence:
per-file column spans, file sizes, and the bucketed join's plan.
"""

from __future__ import annotations

import glob
import os
import sys

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.functions.layout import zorder_layout
from gohangout_spark.io import load_table, write_bucketed


def file_spans(path: str, col: str) -> float:
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        i = md.schema.names.index(col)
        st = md.row_group(0).column(i).statistics
        spans.append(float(st.max - st.min))
    return sum(spans) / len(spans)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("data-layout-example")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    # 1. Z-order vs linear sort
    lin, zo = "/tmp/layout_linear", "/tmp/layout_zorder"
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id") \
        .write.mode("overwrite").parquet(lin)
    zorder_layout(ev, ["user_id", "value"], n_partitions=8) \
        .write.mode("overwrite").parquet(zo)
    print(f"per-file span of `value`: linear-by-user {file_spans(lin, 'value'):.1f}"
          f" vs zorder {file_spans(zo, 'value'):.1f} (lower = more pruning)")

    # 2. bloom filters for point lookups on a hash column
    plain, bloom = "/tmp/layout_plain", "/tmp/layout_bloom"
    hashed = ev.withColumn("h", F.md5(F.col("event_id").cast("string"))).coalesce(1)
    hashed.write.mode("overwrite").parquet(plain)
    hashed.write.mode("overwrite") \
        .option("parquet.bloom.filter.enabled#h", "true") \
        .option("parquet.bloom.filter.expected.ndv#h", "100000") \
        .parquet(bloom)
    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(p + "/*.parquet"))
    print(f"bloom filter footprint: +{(size(bloom) - size(plain)) // 1024} KiB "
          "buys point-lookup file skipping on `h`")

    # 3. bucketed co-located join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS ex_orders")
    spark.sql("DROP TABLE IF EXISTS ex_lineitem")
    write_bucketed(orders, "ex_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    write_bucketed(li, "ex_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
    j = spark.table("ex_lineitem").join(
        spark.table("ex_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    print("bucketed fact-fact join:",
          "ZERO Exchange" if "Exchange" not in plan else "exchange present!?",
          f"({j.count()} rows)")
    spark.sql("DROP TABLE IF EXISTS ex_orders")
    spark.sql("DROP TABLE IF EXISTS ex_lineitem")


if __name__ == "__main__":
    main()
