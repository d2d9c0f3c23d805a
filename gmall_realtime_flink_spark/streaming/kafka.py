"""Kafka source/sink builders (SURVEY §2.1 S1/S2/S3/S4).

The reference's Kafka layer (RT/utils/MyKafkaUtil.java):
- S1 string source (:23-29)  -> `kafka_source`
- S2 fixed-topic sink (:31-36) -> `kafka_sink(topic=...)`
- S3 dynamic-topic sink (:38-45, topic from each record's
  `sink_table`) -> `kafka_sink()` with a `topic` column — Spark's
  Kafka sink honors a per-row `topic` column natively
- S4 SQL source with json format + watermark (:55-63) ->
  `kafka_json_source`

Kafka-in-the-loop smoke: attempted round 5 and confirmed impossible
in this container — (a) no broker/redpanda binary exists anywhere on
the filesystem, (b) the pyspark 4.1.2 install ships 287 jars and
`spark-sql-kafka-0-10`/`kafka-clients` are not among them, so even a
vendored broker could not be read without the forbidden network
fetch of the connector. The file-based source/sinks (source.py /
sinks.py) therefore carry the same pipeline code in tests. The
builders here are the production wiring: swap `stream_events` for
`kafka_json_source` and the rest of a pipeline is unchanged. Each
raises a clear error if the connector is absent.

Delivery semantics: checkpointed offsets + state give exactly-once
*state*; the Kafka sink itself is at-least-once (the reference's
EXACTLY_ONCE txn producer has no Spark equivalent — documented
deviation, see README).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONNECTOR_HINT = (
    "the spark-sql-kafka connector is not on the classpath; submit with "
    "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
)


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: value-as-string Kafka stream (SimpleStringSchema analogue)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def parse_json_value(
    raw: DataFrame, schema: T.StructType, ts_col: str, watermark: str
) -> DataFrame:
    """The value-side of S4, factored off the connector so the Kafka
    wire shape (binary `value` among key/topic/partition/offset
    metadata columns) is testable without a broker: cast → from_json →
    flatten → watermark. `kafka_json_source` is exactly this applied
    to a real Kafka stream."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")
    return parsed.withWatermark(ts_col, watermark)


def kafka_json_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: T.StructType,
    ts_col: str,
    watermark: str = "2 seconds",
) -> DataFrame:
    """S4: Kafka DDL source — json parse + event-time watermark
    (ProvinceStatsSqlApp.java:45-50, KeywordStatsApp.java:56-64)."""
    raw = kafka_source(spark, brokers, topic)
    return parse_json_value(raw, schema, ts_col, watermark)


def kafka_envelope(df: DataFrame, topic_col: str | None = None) -> DataFrame:
    """The record projection the Kafka sink writes (P3 + S3): every
    payload column folded into a `to_json(struct(...))` value, plus a
    per-row `topic` column when routing dynamically. Factored off the
    connector write so the envelope is testable without a broker
    (tests/test_functions.py::test_kafka_envelope_roundtrip)."""
    return df.select(
        F.to_json(F.struct(*[c for c in df.columns if c != topic_col])).alias(
            "value"
        ),
        *([F.col(topic_col).alias("topic")] if topic_col else []),
    )


def kafka_sink(
    df: DataFrame,
    brokers: str,
    checkpoint: str,
    topic: str | None = None,
    topic_col: str | None = None,
):
    """S2 (fixed topic) / S3 (dynamic per-record topic).

    For S3, pass `topic_col` — the column is renamed to `topic`, which
    the Kafka sink reads per record (the built-in equivalent of the
    reference's KafkaSerializationSchema topic routing,
    BaseDBApp.java:96-113).
    """
    if topic is None and topic_col is None:
        raise ValueError("either topic or topic_col is required")
    out = kafka_envelope(df, topic_col)
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer


def socket_sink(
    stream_df: DataFrame,
    routes: dict[str, tuple[str, int]],
    checkpoint: str,
    topic: str | None = None,
    topic_col: str | None = None,
):
    """The network-executable analogue of `kafka_sink` — the sink-side
    twin of the socket SOURCE transport (tests/test_transport.py): the
    IDENTICAL `kafka_envelope` projection (`to_json(struct(*))` value
    + optional per-row topic), sent as JSON lines over real TCP to one
    server per topic, from a checkpointed foreachBatch. Exercises the
    full wire path the Kafka connector would take — envelope, per-row
    S3 topic routing, executor-side network writes (foreachPartition,
    one connection per partition per topic, never a driver collect) —
    leaving only the connector binary itself untested in this env.

    `routes` maps topic -> (host, port). Returns the DataStreamWriter
    (caller starts it), mirroring `kafka_sink`'s contract.

    Delivery is AT-LEAST-ONCE per topic: a task failure mid-partition
    (including an unroutable topic discovered partway through) retries
    the whole partition, re-sending rows already delivered to other
    topics in that attempt — same contract as the Kafka producer sink
    without transactions. Downstream consumers must dedup or tolerate
    replays (the parquet layer sinks use idempotent batch_id overwrite
    for exactly this reason, streaming/topology.py).
    """
    if topic is None and topic_col is None:
        raise ValueError("either topic or topic_col is required")
    if topic is not None and topic not in routes:
        # fixed-topic coverage is checkable up front, before any row
        # is sent anywhere
        raise ValueError(
            f"socket_sink: fixed topic {topic!r} has no route; "
            f"known topics: {sorted(routes)}"
        )

    def write_batch(batch_df: DataFrame, _bid: int) -> None:
        env = kafka_envelope(batch_df, topic_col)
        fixed = topic

        def send(rows) -> None:
            import socket as _socket

            conns: dict[str, _socket.socket] = {}
            try:
                for r in rows:
                    tp = r["topic"] if fixed is None else fixed
                    conn = conns.get(tp)
                    if conn is None:
                        if tp not in routes:
                            raise ValueError(
                                f"socket_sink: row topic {tp!r} has no "
                                f"route; known topics: {sorted(routes)} "
                                f"(rows already sent in this partition "
                                f"attempt will be re-sent on retry — "
                                f"at-least-once)"
                            )
                        conn = _socket.create_connection(routes[tp], timeout=30)
                        conns[tp] = conn
                    conn.sendall((r["value"] + "\n").encode())
            finally:
                for conn in conns.values():
                    conn.close()

        env.foreachPartition(send)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
