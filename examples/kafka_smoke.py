"""Kafka end-to-end smoke — the FIRST ACTION on a machine with a broker
(docs/COVERAGE.md "Explicit test waivers": this container has no broker,
no client wheel, and no network egress, so the Kafka rows are the one §2
surface without an end-to-end run here).

    PYTHONPATH=. python examples/kafka_smoke.py <bootstrap.servers> [topic]

Requires: a reachable Kafka broker and the spark-sql-kafka connector jar
on the Spark classpath, e.g.

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark_version> \
        examples/kafka_smoke.py localhost:9092 smoke-topic

What it asserts (the waiver's promised checks):
  1. produce N JSON events to the topic through the engine's KafkaSink
     encode path (json encoder, rendered key);
  2. read them back BATCH via KafkaSource(subscribe, from.beginning,
     decorate_events) — at-least-once: every produced event_id present;
  3. the @metadata.kafka struct carries real topic/partition/offset
     (topic matches, offsets unique per partition);
  4. the decoded events survive a Grok + Convert FilterBox chain (the
     reference's canonical kafka -> filters -> output pipeline,
     input/kafka_input.go:54-146 -> filter/grok.go) with zero failtags.

Reference behaviors exercised for real: subscribe + consumer_settings
passthrough, from.beginning -> earliest, decorate_events metadata
(input/kafka_input.go:127-146), sink-side json encode + key rendering
(output/kafka_output.go).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from gohangout_spark import get_spark
from gohangout_spark.operators import Convert, FilterBox, Grok
from gohangout_spark.sinks.sinks import KafkaSink
from gohangout_spark.sources.sources import KafkaSource


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    bootstrap = sys.argv[1]
    topic = sys.argv[2] if len(sys.argv) > 2 else f"smoke-{int(time.time())}"
    n = 100

    spark = get_spark("kafka-smoke", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("WARN")

    # 1. produce through the engine's sink encode path
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("GET /item/"), F.col("id").cast("string"), F.lit(" 200"))
        .alias("message"),
        (F.col("id") % 7).cast("string").alias("shard"),
    )
    sink = KafkaSink(
        {"topic": topic, "brokers": bootstrap, "key": "%{shard}"}
    )
    sink.write_batch(events)
    print(f"produced {n} events to {topic}")

    # 2. read back through KafkaSource with the reference's option surface
    src = KafkaSource(
        {
            "topic": {topic: 1},
            "codec": "json",
            "decorate_events": True,
            "consumer_settings": {
                "bootstrap.servers": bootstrap,
                "group.id": "gohangout-smoke",
                "from.beginning": "true",
            },
        }
    )
    df = src.batch(spark)
    rows = df.collect()
    got_ids = sorted(r["event_id"] for r in rows)
    assert got_ids == list(range(n)), (
        f"at-least-once violated: missing {set(range(n)) - set(got_ids)}"
    )
    print(f"read back {len(rows)} events (at-least-once OK)")

    # 3. decorate_events metadata is real broker metadata
    metas = [r["@metadata"]["kafka"] for r in rows]
    assert all(m["topic"] == topic for m in metas)
    per_part = {}
    for m in metas:
        per_part.setdefault(m["partition"], []).append(m["offset"])
    for p, offs in per_part.items():
        assert len(offs) == len(set(offs)), f"duplicate offsets in partition {p}"
    print(f"@metadata.kafka OK across {len(per_part)} partition(s)")

    # 4. the canonical kafka -> filters pipeline parses cleanly
    chain = FilterBox(
        Grok(
            src="message",
            match=[r"%{WORD:verb} /item/%{NUMBER:item_id} %{NUMBER:status}"],
        ),
        fail_tag="grokfail",
    ).apply(df)
    chain = FilterBox(
        Convert({"item_id": {"to": "int"}, "status": {"to": "int"}}),
        fail_tag="convertfail",
    ).apply(chain)
    bad = chain.where(F.size(F.coalesce(F.col("tags"), F.array())) > 0).count()
    ok = chain.where(F.col("status") == 200).count()
    assert bad == 0 and ok == n, f"pipeline: {bad} failtagged, {ok}/{n} parsed"
    print(f"grok+convert chain parsed {ok}/{n} events, 0 failtags")
    print("KAFKA SMOKE: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
