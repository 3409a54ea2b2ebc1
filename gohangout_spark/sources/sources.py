"""Input sources — the reference's input plugins re-expressed as Spark
sources (batch + Structured Streaming through the unified DataFrame API).

| reference input (file:line)              | here |
|---|---|
| Kafka  (input/kafka_input.go:54-146)     | KafkaSource — format("kafka"), subscribe/assign, decorate_events from the source's topic/partition/offset metadata columns |
| Stdin  (input/stdin_input.go:33-66)      | StdinSource — batch read of stdin lines (dev tier) |
| TCP    (input/tcp_input.go:43-110)       | SocketSource — format("socket") (dev tier; production uses Kafka/files) |
| Random (input/random_input.go:27-63)     | RandomSource — spark.range / rate source + rand() |
| (files — no reference analogue)          | FileSource — parquet/json/csv/text, the batch backbone |

Codec application mirrors codec/plain_decoder.go:8-13 and
codec/json_decoder.go:12-29 (JSON parse with @timestamp injection and
fall-back-to-plain on malformed input).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_codec(df: DataFrame, codec: str = "plain", schema: str | None = None,
                value_col: str = "value") -> DataFrame:
    """Decode a raw value column into the event shape.

    plain (codec/plain_decoder.go): {@timestamp: now(), message: raw}
    json  (codec/json_decoder.go): parse; inject @timestamp if absent; on
    parse failure fall back to plain semantics (raw kept in message).
    """
    raw = F.col(value_col).cast("string")
    if codec == "plain":
        out = df.select(
            F.current_timestamp().alias("@timestamp"),
            raw.alias("message"),
            *[c for c in df.columns if c != value_col],
        )
        return out
    if codec == "json":
        if schema:
            # PERMISSIVE from_json yields an all-null struct (not NULL) on
            # malformed input — route the raw line through _corrupt_record to
            # implement the decoder's fall-back-to-plain rule
            parsed = F.from_json(
                raw,
                schema + ", _corrupt_record string",
                {"columnNameOfCorruptRecord": "_corrupt_record"},
            )
            out = df.select(
                F.current_timestamp().alias("@timestamp"),
                parsed.alias("__parsed"),
                parsed.getItem("_corrupt_record").alias("message"),
                *[c for c in df.columns if c != value_col],
            )
            # flatten parsed struct fields to top level
            from pyspark.sql.types import StructType

            for fld in StructType.fromDDL(schema).fields:
                out = out.withColumn(fld.name, F.col("__parsed").getItem(fld.name))
            return out.drop("__parsed")
        # schema-less: event payload as a map<string,string> column named
        # `event` — a fixed schema cannot flatten unknown keys to the top
        # level like json_decoder.go does; provide `schema` for flat typed
        # columns, or address payload fields as [event][key]
        parsed = F.from_json(raw, "map<string,string>")
        return df.select(
            F.current_timestamp().alias("@timestamp"),
            parsed.alias("event"),
            F.when(parsed.isNull(), raw).alias("message"),
            *[c for c in df.columns if c != value_col],
        )
    raise ValueError(f"unknown codec {codec!r}")


class Source:
    def __init__(self, conf: dict):
        self.conf = conf or {}

    def batch(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def stream(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError("source has no streaming mode")

    def _decode(self, df: DataFrame) -> DataFrame:
        return apply_codec(
            df, self.conf.get("codec", "plain"), self.conf.get("schema"),
        )


class FileSource(Source):
    """path/format/options; typed formats (parquet) skip the codec —
    columns are already the event fields."""

    def _reader(self, spark, streaming: bool):
        fmt = self.conf.get("format", "parquet")
        r = spark.readStream if streaming else spark.read
        r = r.format(fmt)
        # for text sources the `schema` conf describes the CODEC's payload
        # (the reader schema is always `value string`)
        if self.conf.get("schema") and fmt != "text":
            r = r.schema(self.conf["schema"])
        for k, v in (self.conf.get("options") or {}).items():
            r = r.option(k, v)
        return r

    def batch(self, spark):
        fmt = self.conf.get("format", "parquet")
        if fmt == "parquet":
            df = self._load_parquet(spark)
        else:
            df = self._reader(spark, False).load(self.conf["path"])
        if fmt == "text":
            return self._decode(df)
        return df

    def _load_parquet(self, spark):
        """Parquet with TIMESTAMP(NANOS) tolerance (see io.load_table)."""
        from gohangout_spark.io import _nanos_columns

        path = self.conf["path"]
        try:
            nanos = _nanos_columns(path)
        except Exception:
            nanos = []
        if nanos:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self._reader(spark, False).load(path)
        for c in nanos:
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        return df

    def stream(self, spark):
        r = self._reader(spark, True)
        if not self.conf.get("schema"):
            # streaming file sources require a schema: infer once from the
            # existing files (footer read, driver-side, no data scan)
            static = self._reader(spark, False).load(self.conf["path"])
            r = r.schema(static.schema)
        df = r.load(self.conf["path"])
        if self.conf.get("format", "parquet") == "text":
            return self._decode(df)
        return df


class RandomSource(Source):
    """Random ints in [from, to] as stringified message
    (input/random_input.go:27-63)."""

    def batch(self, spark):
        lo, hi = int(self.conf.get("from", 0)), int(self.conf.get("to", 100))
        n = int(self.conf.get("max_messages", 1000))
        df = spark.range(n).select(
            (F.floor(F.rand() * (hi - lo + 1)) + lo).cast("long").cast("string").alias("value")
        )
        return self._decode(df)

    def stream(self, spark):
        lo, hi = int(self.conf.get("from", 0)), int(self.conf.get("to", 100))
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.conf.get("rows_per_second", 100)))
            .load()
        )
        df = rate.select(
            (F.floor(F.rand() * (hi - lo + 1)) + lo).cast("long").cast("string").alias("value")
        )
        return self._decode(df)


class StdinSource(Source):
    def batch(self, spark):
        lines = [(line.rstrip("\n"),) for line in sys.stdin]
        df = spark.createDataFrame(lines, "value string")
        return self._decode(df)


class SocketSource(Source):
    def stream(self, spark):
        df = (
            spark.readStream.format("socket")
            .option("host", self.conf.get("host", "localhost"))
            .option("port", str(self.conf.get("port", 9999)))
            .load()
        )
        return self._decode(df)


class UDPSource(Source):
    """UDP datagram input (input/udp_input.go:32-116) — dev tier, like the
    socket source. Spark has no native UDP source (SURVEY §2.1), so a
    driver-side listener thread receives datagrams (``max_length`` cap,
    :80-84) and spools them as JSON lines into a directory that a text
    file-stream tails (batch mode reads the same spool);
    ``add_remote_addr`` (:45-47,108-110) adds the sender IP as a field.
    Datagrams flush to the spool per ``spool_batch`` messages or on a
    200 ms idle gap; files appear atomically (write-then-rename) so the
    file stream never reads partial batches."""

    def __init__(self, conf):
        super().__init__(conf)
        if not self.conf.get("address"):
            raise ValueError("address must be set in UDP input")
        ml = self.conf.get("max_length", 65535)
        if not isinstance(ml, int) or ml <= 0:
            raise ValueError("max_length must be bigger than zero")
        self.max_length = ml
        import os
        import tempfile

        self.spool_dir = self.conf.get("spool_dir") or tempfile.mkdtemp(
            prefix="gohangout_udp_"
        )
        os.makedirs(self.spool_dir, exist_ok=True)
        self._sock = None
        self._thread = None
        self._stop = False

    @property
    def port(self) -> int:
        """Actual bound port (useful with address '...:0' in tests)."""
        return self._sock.getsockname()[1]

    def start_listener(self) -> "UDPSource":
        import json
        import os
        import socket
        import threading
        import uuid

        host, _, port = self.conf["address"].rpartition(":")
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host or "0.0.0.0", int(port)))
        self._sock.settimeout(0.2)
        flush_every = int(self.conf.get("spool_batch", 100))

        def loop():
            buf: list[str] = []

            def flush():
                if not buf:
                    return
                p = os.path.join(self.spool_dir, uuid.uuid4().hex + ".jsonl")
                with open(p + ".tmp", "w") as f:
                    f.write("\n".join(buf) + "\n")
                os.rename(p + ".tmp", p)
                buf.clear()

            while not self._stop:
                try:
                    data, addr = self._sock.recvfrom(self.max_length)
                    buf.append(
                        json.dumps(
                            {"value": data.decode("utf-8", "replace"), "addr": addr[0]}
                        )
                    )
                    if len(buf) >= flush_every:
                        flush()
                except socket.timeout:
                    flush()
                except OSError:
                    break
            flush()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop_listener(self) -> None:
        self._stop = True
        if self._thread is not None:
            self._thread.join(2.0)
        if self._sock is not None:
            self._sock.close()

    def _frame(self, df: DataFrame) -> DataFrame:
        parsed = F.from_json(
            F.col("value").cast("string"), "value string, addr string"
        )
        df = df.select(
            parsed.getItem("value").alias("value"),
            parsed.getItem("addr").alias("__udp_addr"),
        )
        out = self._decode(df)
        target = self.conf.get("add_remote_addr")
        if target:
            out = out.withColumn(target, F.col("__udp_addr"))
        return out.drop("__udp_addr")

    def batch(self, spark):
        # a pipeline-built source must receive without an explicit
        # start_listener() call — bind lazily and idempotently here
        if self._thread is None:
            self.start_listener()
        return self._frame(spark.read.text(self.spool_dir))

    def stream(self, spark):
        if self._thread is None:
            self.start_listener()
        return self._frame(spark.readStream.format("text").load(self.spool_dir))


class KafkaSource(Source):
    """subscribe (topic map) XOR assign (partition map), mirroring
    input/kafka_input.go:54-123; decorate_events adds the
    [@metadata][kafka]{topic,partition,offset} struct from the Kafka source's
    metadata columns (:127-146).

    Tiers: production is Spark's `format("kafka")` (connector jar + real
    broker). With ``dev_wire: true`` the batch path instead drains the
    topic through the in-repo v0 wire-protocol client
    (sources/kafka_wire.py) and builds a DataFrame with the SAME
    key/value/topic/partition/offset/timestamp columns the connector
    emits, so `_finish` (codec + decorate_events) is byte-identical
    across tiers. The dev BATCH path is driver-side and bounded (it
    drains to the high watermark once); the dev STREAMING path
    (``stream()`` with dev_wire) runs a continuous driver-side poll
    loop spooling to a tailed file stream — see start_consumer() —
    the same doctrine as the Stdin/TCP/UDP dev tiers."""

    def __init__(self, conf):
        super().__init__(conf)
        import os
        import tempfile

        self.spool_dir = self.conf.get("spool_dir") or tempfile.mkdtemp(
            prefix="gohangout_kafka_"
        )
        os.makedirs(self.spool_dir, exist_ok=True)
        self._consumer_thread = None
        self._consumer_stop = False

    def _options(self) -> dict[str, str]:
        conf = self.conf
        settings = dict(conf.get("consumer_settings") or {})
        opts = {}
        if "bootstrap.servers" in settings:
            opts["kafka.bootstrap.servers"] = settings.pop("bootstrap.servers")
        if settings.pop("from.beginning", "false") in ("true", True):
            opts["startingOffsets"] = "earliest"
        if "group.id" in settings:
            opts["kafka.group.id"] = settings.pop("group.id")
        # SASL: the reference accepts both the nested `sasl:` map and flat
        # sasl.* keys (gohangout README / gohangout_test.go:36-39); the
        # connector tier gets the public jaas-config mapping, the dev wire
        # tier reads the creds via _sasl_creds()
        nested_sasl = settings.pop("sasl", None) or {}
        mech = settings.pop("sasl.mechanism", nested_sasl.get("mechanism"))
        sasl_user = settings.pop("sasl.user", nested_sasl.get("user"))
        sasl_pw = settings.pop("sasl.password", nested_sasl.get("password"))
        if sasl_user is not None and mech not in (None, "PLAIN"):
            raise ValueError(f"sasl.mechanism: only PLAIN is supported, got {mech!r}")
        if mech:
            opts["kafka.sasl.mechanism"] = str(mech)
        if sasl_user is not None:
            opts["kafka.sasl.jaas.config"] = (
                "org.apache.kafka.common.security.plain.PlainLoginModule "
                f'required username="{sasl_user}" password="{sasl_pw}";'
            )
        for k, v in settings.items():
            opts[f"kafka.{k}"] = str(v)
        topic, assign = conf.get("topic"), conf.get("assign")
        if topic and assign:
            raise ValueError("Kafka: topic and assign are mutually exclusive")
        if topic:
            opts["subscribe"] = ",".join(topic) if isinstance(topic, dict) else str(topic)
        elif assign:
            import json as _json

            opts["assign"] = _json.dumps(assign)
        else:
            raise ValueError("Kafka: need topic or assign")
        return opts

    def _finish(self, df: DataFrame) -> DataFrame:
        out = self._decode(df)
        if self.conf.get("decorate_events"):
            out = out.withColumn(
                "@metadata",
                F.struct(
                    F.struct(
                        F.col("topic"), F.col("partition"), F.col("offset")
                    ).alias("kafka")
                ),
            )
        return out.drop("key", "topic", "partition", "offset", "timestamp", "timestampType")

    def _topics_and_assignments(self, opts: dict[str, str], client):
        """-> list of (topic, partition) to drain, from subscribe (all
        partitions via Metadata) or assign (explicit map)."""
        if "subscribe" in opts:
            topics = opts["subscribe"].split(",")
            meta = client.metadata(topics)
            return [(t, p) for t in topics for p in meta.get(t, [])]
        import json as _json

        assign = _json.loads(opts["assign"])
        return [(t, p) for t, parts in assign.items() for p in parts]

    def _sasl_creds(self) -> tuple[str | None, str | None]:
        settings = self.conf.get("consumer_settings") or {}
        nested = settings.get("sasl") or {}
        return (
            settings.get("sasl.user", nested.get("user")),
            settings.get("sasl.password", nested.get("password")),
        )

    def _batch_dev_wire(self, spark):
        from gohangout_spark.sources.kafka_wire import ClusterWireClient

        opts = self._options()
        if "kafka.group.id" in opts and "subscribe" in opts:
            return self._batch_dev_wire_group(spark, opts)
        rows = []
        sasl_user, sasl_pw = self._sasl_creds()
        # leader-routing client: bootstrap may list several brokers and
        # fetches survive a node death via metadata refresh + retry
        with ClusterWireClient(
            opts["kafka.bootstrap.servers"],
            message_format=self.conf.get("wire_format", "v0"),
            sasl_user=sasl_user, sasl_password=sasl_pw,
        ) as client:
            for topic, part in self._topics_and_assignments(opts, client):
                # batch semantics = earliest -> high watermark (the
                # connector's default startingOffsets for batch reads,
                # regardless of from.beginning, which only moves the
                # STREAMING start point)
                for offset, ts, key, value in client.fetch_all(topic, part, 0):
                    rows.append(
                        (
                            key,
                            value,
                            topic,
                            part,
                            offset,
                            ts,
                            1,  # CreateTime, what magic-1 carries
                        )
                    )
        df = spark.createDataFrame(
            rows,
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp_ms long, timestampType int",
        ).withColumn("timestamp", F.timestamp_millis(F.col("timestamp_ms"))).drop(
            "timestamp_ms"
        )
        return self._finish(df)

    def _batch_dev_wire_group(self, spark, opts):
        """group.id tier: join the consumer group, drain the OWNED
        partitions from the group's COMMITTED offsets to the high
        watermark, commit, leave — the at-least-once resume contract the
        reference gets from healer's GroupConsumer
        (input/kafka_input.go:87-95,150-156). A second batch() against
        the same group therefore sees only records appended since the
        previous drain, unlike the group-less dev tier's
        earliest->hw-every-time semantics."""
        from gohangout_spark.sources.kafka_wire import GroupConsumer

        sasl_user, sasl_pw = self._sasl_creds()
        # the reference's thread model: the topic map's VALUE is the
        # number of GroupConsumers spawned for that topic, all sharing
        # group.id (input/kafka_input.go:89-91 — one NewGroupConsumer
        # per (topic, i < threadCount)). One spec per consumer:
        topic_conf = self.conf.get("topic")
        if isinstance(topic_conf, dict):
            specs = [t for t, n in topic_conf.items() for _ in range(max(1, int(n)))]
        else:
            specs = opts["subscribe"].split(",")
        mk = lambda topic: GroupConsumer(  # noqa: E731
            opts["kafka.bootstrap.servers"],
            opts["kafka.group.id"],
            [topic],
            message_format=self.conf.get("wire_format", "v0"),
            sasl_user=sasl_user, sasl_password=sasl_pw,
        )
        if len(specs) == 1:
            consumer = mk(specs[0])
            rows = []
            try:
                consumer.join()
                for topic, part, offset, ts, key, value in consumer.poll():
                    rows.append((key, value, topic, part, offset, ts, 1))
                consumer.commit()
            finally:
                consumer.close()
        else:
            rows = self._drain_group_threads([mk(t) for t in specs])
        df = spark.createDataFrame(
            rows,
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp_ms long, timestampType int",
        ).withColumn("timestamp", F.timestamp_millis(F.col("timestamp_ms"))).drop(
            "timestamp_ms"
        )
        return self._finish(df)

    @staticmethod
    def _drain_group_threads(consumers):
        """N GroupConsumers sharing one group.id, the reference's
        consumer_threads model. Joins race — the first registrant can
        complete a one-member generation before the rest arrive — so
        after the initial concurrent join, any generation disagreement
        sends EVERY consumer back through a concurrent rejoin (the
        coordinator blocks each JoinGroup until all current members
        re-register, so one round converges to a single generation
        with the RangeAssignor's disjoint split). Only then does anyone
        fetch, so the sync-up can never double-consume."""
        from concurrent.futures import ThreadPoolExecutor

        n = len(consumers)
        rows = []
        try:
            with ThreadPoolExecutor(n) as ex:
                list(ex.map(lambda c: c.join(), consumers))
                for _ in range(5):
                    if len({c.generation for c in consumers}) == 1:
                        break
                    list(ex.map(lambda c: c.join(), consumers))
                else:
                    raise TimeoutError(
                        "group consumers never converged on one generation"
                    )

                def drain(c):
                    out = c.poll()
                    c.commit()
                    return out

                for recs in ex.map(drain, consumers):
                    for topic, part, offset, ts, key, value in recs:
                        rows.append((key, value, topic, part, offset, ts, 1))
        finally:
            for c in consumers:
                # LeaveGroup like the reference's Close() — nobody polls
                # after this, so the departures cost nothing, and the
                # NEXT batch's joins start from an Empty group instead
                # of waiting out dead members' session expiry
                c.close(leave=True)
        return rows

    def batch(self, spark):
        if self.conf.get("dev_wire"):
            return self._batch_dev_wire(spark)
        r = spark.read.format("kafka")
        for k, v in self._options().items():
            r = r.option(k, v)
        return self._finish(r.load())

    # -- streaming dev tier ------------------------------------------------

    def start_consumer(self) -> "KafkaSource":
        """Dev-tier CONTINUOUS consumption — the reference's actual
        operating mode (kafka_input feeds a channel from its
        GroupConsumers for the life of the process). A driver-side
        thread polls the group (heartbeat + fetch + commit per pass —
        at-least-once, spool-then-commit ordering) and spools records
        as JSON lines that a text file-stream tails, the same pattern
        as UDPSource; `_finish` then applies the IDENTICAL
        codec/decorate_events path as the connector tier. Without
        group.id, positions start at earliest and live only in-process
        (the connector's own default for an unmanaged stream).

        The spool hop is JSON text: keys/values are utf-8 decoded with
        replacement, which is lossless for every codec payload this
        engine produces (plain/json are utf-8 by construction) but NOT
        for arbitrary binary values — those belong on the batch tier
        or the real connector, which keep bytes end to end."""
        if self._consumer_thread is not None:
            return self
        import json as _json
        import os
        import threading
        import uuid

        from gohangout_spark.sources.kafka_wire import ClusterWireClient, GroupConsumer

        opts = self._options()
        sasl_user, sasl_pw = self._sasl_creds()
        fmt = self.conf.get("wire_format", "v0")
        poll_s = float(self.conf.get("poll_interval_s", 0.2))

        group = opts.get("kafka.group.id")
        if group:
            consumer = GroupConsumer(
                opts["kafka.bootstrap.servers"], group,
                opts["subscribe"].split(","), message_format=fmt,
                sasl_user=sasl_user, sasl_password=sasl_pw,
            )
            consumer.join()
        else:
            consumer = None
            client = ClusterWireClient(
                opts["kafka.bootstrap.servers"], message_format=fmt,
                sasl_user=sasl_user, sasl_password=sasl_pw,
            )
            tps = self._topics_and_assignments(opts, client)
            positions = {tp: 0 for tp in tps}

        def spool(records) -> None:
            if not records:
                return
            lines = [
                _json.dumps(
                    {
                        "key": None if k is None else k.decode("utf-8", "replace"),
                        "value": None if v is None else v.decode("utf-8", "replace"),
                        "topic": t,
                        "partition": p,
                        "offset": o,
                        "timestamp_ms": ts,
                    }
                )
                for t, p, o, ts, k, v in records
            ]
            path = os.path.join(self.spool_dir, uuid.uuid4().hex + ".jsonl")
            with open(path + ".tmp", "w") as f:
                f.write("\n".join(lines) + "\n")
            os.rename(path + ".tmp", path)

        def loop():
            try:
                while not self._consumer_stop:
                    if consumer is not None:
                        recs = consumer.poll()
                        spool(recs)
                        if recs:
                            # spool first, commit second: a crash between
                            # re-reads, never loses — at-least-once
                            consumer.commit()
                    else:
                        out = []
                        for t, p in tps:
                            hw, recs = client.fetch(t, p, positions[(t, p)])
                            for off, ts, k, v in recs:
                                out.append((t, p, off, ts, k, v))
                            if recs:
                                positions[(t, p)] = recs[-1][0] + 1
                        spool(out)
                    self._consumer_stop_ev.wait(poll_s)
            finally:
                if consumer is not None:
                    consumer.close()
                else:
                    client.close()

        self._consumer_stop = False
        self._consumer_stop_ev = threading.Event()
        self._consumer_thread = threading.Thread(target=loop, daemon=True)
        self._consumer_thread.start()
        return self

    def stop_consumer(self) -> None:
        if self._consumer_thread is None:
            return
        self._consumer_stop = True
        self._consumer_stop_ev.set()
        self._consumer_thread.join(10.0)
        self._consumer_thread = None

    def _stream_dev_wire(self, spark):
        self.start_consumer()
        raw = spark.readStream.format("text").load(self.spool_dir)
        parsed = F.from_json(
            F.col("value").cast("string"),
            "key string, value string, topic string, partition int, "
            "offset long, timestamp_ms long",
        )
        df = raw.select(
            parsed.getItem("key").cast("binary").alias("key"),
            parsed.getItem("value").cast("binary").alias("value"),
            parsed.getItem("topic").alias("topic"),
            parsed.getItem("partition").alias("partition"),
            parsed.getItem("offset").alias("offset"),
            F.timestamp_millis(parsed.getItem("timestamp_ms")).alias("timestamp"),
            F.lit(1).alias("timestampType"),
        )
        return self._finish(df)

    def stream(self, spark):
        if self.conf.get("dev_wire"):
            return self._stream_dev_wire(spark)
        r = spark.readStream.format("kafka")
        for k, v in self._options().items():
            r = r.option(k, v)
        return self._finish(r.load())


SOURCE_REGISTRY = {
    "File": FileSource,
    "Random": RandomSource,
    "Stdin": StdinSource,
    "TCP": SocketSource,
    "Socket": SocketSource,
    "UDP": UDPSource,
    "Kafka": KafkaSource,
}
