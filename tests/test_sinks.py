"""Sink tests: ES bulk-line encoding + retry, ClickHouse coercion
projection, Influx line protocol, Kafka payload shape."""

import datetime
import json

import pytest
from pyspark.sql import Row

from gohangout_spark.sinks import (
    ClickHouseSink,
    ElasticsearchSink,
    InfluxdbSink,
    KafkaSink,
)

TS = datetime.datetime(2024, 5, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            Row(appid="web1", msg="hello", n=1, ts=TS),
            Row(appid="web2", msg="bye", n=2, ts=TS),
        ]
    ).withColumnRenamed("ts", "@timestamp")


class TestElasticsearch:
    def test_bulk_lines_rendered_index(self, df):
        sink = ElasticsearchSink(
            {"index": "log-%{appid}-%{+2006.01.02}", "id": "[msg]", "index_type": "doc"}
        )
        lines = [r["line"] for r in sink.bulk_lines(df).collect()]
        metas = {json.loads(l.split("\n")[0])["index"]["_index"] for l in lines}
        assert metas == {"log-web1-2024.05.01", "log-web2-2024.05.01"}
        meta0 = json.loads(lines[0].split("\n")[0])["index"]
        assert meta0["_type"] == "doc" and meta0["_id"] in ("hello", "bye")
        src = json.loads(lines[0].split("\n")[1])
        assert src["n"] in (1, 2) and "appid" in src

    def test_write_batch_via_fake_transport(self, df, tmp_path):
        # transport runs on executor processes — capture via files
        cap = str(tmp_path / "calls")
        import os

        os.makedirs(cap, exist_ok=True)

        def transport(url, payload, _cap=cap):
            import os
            import uuid

            with open(os.path.join(_cap, uuid.uuid4().hex), "w") as f:
                f.write(url + "\n" + payload.decode())
            return 200, '{"errors":false}'

        sink = ElasticsearchSink(
            {"hosts": ["http://es1:9200"], "index": "fixed", "bulk_actions": 1, "compress": False},
            transport=transport,
        )
        sink.write_batch(df)
        files = os.listdir(cap)
        assert len(files) == 2  # bulk_actions=1 → one request per doc
        contents = [open(os.path.join(cap, f)).read() for f in files]
        assert all(c.startswith("http://es1:9200/_bulk\n") for c in contents)

    def test_retry_then_fail(self, df, tmp_path):
        cap = str(tmp_path / "attempts")
        import os

        os.makedirs(cap, exist_ok=True)

        def transport(url, payload, _cap=cap):
            import os
            import uuid

            open(os.path.join(_cap, uuid.uuid4().hex), "w").close()
            return 503, "unavailable"

        sink = ElasticsearchSink(
            {"hosts": ["http://es1:9200"], "index": "x", "retry": 2, "compress": False}, transport=transport
        )
        with pytest.raises(Exception, match="ES bulk failed"):
            sink.write_batch(df.coalesce(1))
        assert len(os.listdir(cap)) == 3  # initial + 2 retries


class TestClickHouse:
    def test_coercion_projection(self, spark):
        df = spark.createDataFrame([Row(a="12", b=None, extra="x"), Row(a="oops", b=3.5, extra="y")])
        sink = ClickHouseSink(
            {"table": "t"},
            table_schema={"a": "Int64", "b": "Float64", "c": "String", "d": "Nullable(Int32)"},
        )
        out = sink.projection(df)
        assert out.columns == ["a", "b", "c", "d"]
        rows = out.collect()
        byid = {r["b"]: r for r in rows}
        ok = byid[0.0]  # b null -> default 0.0
        assert ok["a"] == 12 and ok["c"] == "" and ok["d"] is None
        bad = byid[3.5]
        assert bad["a"] == 0  # failed cast -> non-nullable default

    def test_write_without_jdbc_raises(self, spark):
        df = spark.createDataFrame([Row(a=1)])
        sink = ClickHouseSink({"table": "t"}, table_schema={"a": "Int64"})
        with pytest.raises(NotImplementedError):
            sink.write_batch(df)


class TestInflux:
    def test_line_protocol(self, df):
        sink = InfluxdbSink(
            {"measurement": "events", "tags": ["appid"], "fields": ["n"]}
        )
        lines = sorted(r["line"] for r in sink.lines(df).collect())
        assert lines[0] == f"events,appid=web1 n=1i {int(TS.timestamp()*1e9)}"


class TestKafkaPayload:
    def test_json_value_and_key(self, df):
        sink = KafkaSink({"brokers": "b:9092", "topic": "t", "key": "[appid]"})
        rows = sink.payload(df).collect()
        assert {r["key"] for r in rows} == {"web1", "web2"}
        v = json.loads(rows[0]["value"])
        assert set(v) >= {"appid", "msg", "n"}


    def test_gzip_payload(self, df, tmp_path):
        import gzip as _gzip
        import os

        cap = str(tmp_path / "gz")
        os.makedirs(cap, exist_ok=True)

        def transport(url, payload, _cap=cap):
            import os, uuid

            with open(os.path.join(_cap, uuid.uuid4().hex), "wb") as f:
                f.write(payload)
            return 200, '{"errors":false}'

        sink = ElasticsearchSink({"hosts": ["http://es:9200"], "index": "x"}, transport=transport)
        sink.write_batch(df.coalesce(1))
        files = os.listdir(cap)
        raw = open(os.path.join(cap, files[0]), "rb").read()
        assert raw[:2] == b"\x1f\x8b"  # gzip by default, like the reference
        assert b'"_index":"x"' in _gzip.decompress(raw)


class TestTCP:
    def test_tcp_sink_json_lines(self, spark):
        """Replicates the itest-tcp shape: events over a socket, counted
        at the server (test/itest-tcp.sh expects exact line counts)."""
        import json as _json
        import socket
        import socketserver
        import threading

        received = []

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for line in self.rfile:
                    received.append(line.decode().strip())

        server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        server.daemon_threads = True
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            from gohangout_spark.sinks import TCPSink

            df = spark.range(200).selectExpr("id", "CAST(id AS STRING) AS msg")
            TCPSink({"host": "127.0.0.1", "port": port}).write_batch(df)
            import time

            deadline = time.time() + 10
            while time.time() < deadline and len(received) < 200:
                time.sleep(0.2)
        finally:
            server.shutdown()
            server.server_close()
        assert len(received) == 200
        parsed = _json.loads(received[0])
        assert set(parsed) == {"id", "msg"}
