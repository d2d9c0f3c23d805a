"""Unit tests for scalar/tokenizer helpers (X8, X11) and the Kafka
builder gating (S1-S4 — no broker in this container, so only the
builder-level contract is testable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.functions.compat import (
    rename_snake_to_camel,
    snake_to_camel,
)
from gmall_realtime_flink_spark.operators.dedup import tokenize_mixed


def test_snake_to_camel():
    assert snake_to_camel("sink_table") == "sinkTable"
    assert snake_to_camel("source_table_name") == "sourceTableName"
    assert snake_to_camel("id") == "id"


def test_rename_snake_to_camel(spark):
    df = spark.createDataFrame([(1, "x")], ["order_id", "sku_name"])
    assert rename_snake_to_camel(df).columns == ["orderId", "skuName"]


def test_tokenize_mixed_cjk(spark):
    df = spark.createDataFrame(
        [("iPhone11 手机 Apple 苹果",), ("plain ascii only",)], ["text"]
    )
    got = [r[0] for r in df.select(tokenize_mixed(F.col("text"))).collect()]
    assert got[0] == ["iphone", "手", "机", "apple", "苹", "果"]
    assert got[1] == ["plain", "ascii", "only"]


def test_kafka_sink_requires_topic(spark):
    from gmall_realtime_flink_spark.streaming.kafka import kafka_sink

    df = spark.createDataFrame([(1, "a")], ["id", "sink_table"])
    with pytest.raises(ValueError):
        kafka_sink(df, brokers="b:9092", checkpoint="/tmp/x")


def test_kafka_source_needs_connector(spark):
    """Without the kafka connector jar, building the source raises the
    standard missing-data-source error (documented in kafka.py)."""
    from gmall_realtime_flink_spark.streaming.kafka import kafka_source

    try:
        kafka_source(spark, "b:9092", "t")
        has_connector = True
    except Exception as e:  # noqa: BLE001
        has_connector = False
        assert "kafka" in str(e).lower()
    if has_connector:
        pytest.skip("connector present; builder returned a plan")
