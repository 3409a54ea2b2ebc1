"""Runnable Kafka demo with NO broker and NO connector jar: the
in-repo v0 wire-protocol tier (sources/kafka_wire.py).

Spins the in-process broker fake (real TCP, real Kafka v0 bytes),
produces JSON events through KafkaSink's encode path with murmur2
keyed partitioning, reads them back via KafkaSource(dev_wire) with
decorate_events, and runs the decoded events through a FilterBox
chain — the same end-to-end shape examples/kafka_smoke.py runs
against a live cluster.

    PYTHONPATH=. python examples/kafka_dev_wire.py
"""

import json

from gohangout_spark import get_spark
from gohangout_spark.operators import Add, Convert, FilterBox
from gohangout_spark.sinks.sinks import KafkaSink
from gohangout_spark.sources.kafka_wire import FakeKafkaBroker, KafkaWireClient
from gohangout_spark.sources.sources import KafkaSource


def main():
    spark = get_spark("kafka-dev-wire", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    with FakeKafkaBroker(num_partitions=3) as broker:
        # seed the input topic over the raw wire client
        with KafkaWireClient(broker.bootstrap) as c:
            for part in range(3):
                c.produce(
                    "web-in",
                    part,
                    [
                        (
                            None,
                            json.dumps({"user": f"u{part}-{i}", "ms": str(10 * i)}).encode(),
                            1_700_000_000_000 + i,
                        )
                        for i in range(4)
                    ],
                )

        src = KafkaSource(
            {
                "topic": {"web-in": 1},
                "consumer_settings": {
                    "bootstrap.servers": broker.bootstrap,
                    "from.beginning": "true",
                },
                "decorate_events": True,
                "dev_wire": True,
                "codec": "json",
                "schema": "user string, ms string",
            }
        )
        events = src.batch(spark)
        print(f"read {events.count()} events with @metadata.kafka offsets:")
        events.select("user", "ms", "@metadata").show(5, False)

        chain = FilterBox(
            Add({"pipeline": "dev-wire-demo"}), ts_field="@timestamp"
        ).apply(events)
        chain = FilterBox(
            Convert({"ms": {"to": "int"}}), ts_field="@timestamp"
        ).apply(chain)

        KafkaSink(
            {
                "topic": "web-out",
                "brokers": broker.bootstrap,
                "key": "%{user}",
                "dev_wire": True,
            }
        ).write_batch(chain.select("user", "ms", "pipeline"))

        with KafkaWireClient(broker.bootstrap) as c:
            total = sum(len(c.fetch_all("web-out", p)) for p in c.metadata(["web-out"])["web-out"])
        print(f"round-tripped {total} events through topic web-out")
        assert total == 12


if __name__ == "__main__":
    main()
