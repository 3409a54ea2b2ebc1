"""The §3 lifecycle composed over the round-8/9 wire tiers (VERDICT r8
#8): one weblog-style YAML config (examples/wire_to_es.yml) running

    Kafka dev-wire source (v2 RecordBatches over real TCP, CRC32C)
      -> Grok / Convert / Translate / Drop filter chain
      -> Elasticsearch sink through its REAL urllib transport
         against the in-process ES HTTP fake (gzipped _bulk NDJSON)

with both service addresses injected via $ENV expansion, the same
mechanism the reference's yaml_config_parser.go uses. No external
services, no connector jar — every byte still crosses real sockets.

    PYTHONPATH=. python examples/wire_to_es.py

Returns (and prints) the documents the ES fake RECEIVED, so the pytest
wrapper asserts the wire-visible outcome, not internal state.
"""

import os

from gohangout_spark import get_spark
from gohangout_spark.pipeline import Pipeline
from gohangout_spark.sinks.es_dev import FakeElasticsearchHTTP
from gohangout_spark.sources.kafka_wire import FakeKafkaBroker, KafkaWireClient

LINES = [
    b"alice auth 200 12",
    b"bob cart 503 340",
    b"carol search 200 5",
    b"dave health 200 1",      # dropped by HasPrefix(endpoint,"health")
    b"eve auth 404 77",
    b"mallory payments 200 9",  # endpoint not in dictionary -> no team -> no ES
    b"NOT A WEBLOG LINE",       # grok failure -> failTag -> Stdout leg only
]


def run(spark=None):
    own_spark = spark is None
    if own_spark:
        spark = get_spark("wire-to-es", master="local[4]", shuffle_partitions=4)
        spark.sparkContext.setLogLevel("ERROR")
    with FakeKafkaBroker(num_partitions=2) as broker, \
            FakeElasticsearchHTTP() as es:
        # seed the topic over the modern framing (one batch per partition)
        with KafkaWireClient(broker.bootstrap, message_format="v2") as c:
            for part in (0, 1):
                c.produce(
                    "weblog", part,
                    [(None, line, 1_700_000_000_000 + i)
                     for i, line in enumerate(LINES) if i % 2 == part],
                )
        os.environ["WIRE_BOOTSTRAP"] = broker.bootstrap
        os.environ["WIRE_ES_URL"] = es.url
        cfg = os.path.join(os.path.dirname(__file__), "wire_to_es.yml")
        Pipeline.from_config(cfg).run_batch(spark)
        docs = es.bulk_docs()
    return docs


def main():
    docs = run()
    print(f"ES fake received {len(docs)} documents over the wire:")
    for d in sorted(docs, key=lambda d: d.get("user") or ""):
        print(f"  {d.get('user')}: endpoint={d.get('endpoint')} "
              f"team={d.get('team')} status={d.get('status')} ms={d.get('ms')}")
    teams = sorted({d.get("team") for d in docs})
    assert teams == ["commerce", "discovery", "platform"], teams
    print("OK: every routed doc carries a team; drops and grok failures stayed out")


if __name__ == "__main__":
    main()
