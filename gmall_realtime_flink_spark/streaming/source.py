"""Streaming sources (SURVEY §2.1 S1/S4).

The reference consumes Kafka topics (RT/utils/MyKafkaUtil.java:23-29);
the engine's source abstraction is format-agnostic: the same pipeline
code accepts a Kafka stream (`spark.readStream.format("kafka")` +
`from_json`) or — for tests and the driver testdata — a *file* stream
over the parquet tables. A bounded file stream is the Structured
Streaming analogue of a replayed topic: files arrive in listing order,
`maxFilesPerTrigger=1` forces multi-micro-batch execution, and the
event-time watermark governs state eviction exactly as it would on
Kafka.

`events.parquet` has two observed physical layouts across driver
testdata generations: TIMESTAMP(NANOS) — surfaced as a nanosecond long
under `spark.sql.legacy.parquet.nanosAsLong` and truncated to µs — and
TIMESTAMP(MICROS) with isAdjustedToUTC=false (TIMESTAMP_NTZ under
Spark 4 inference). The file stream needs an explicit schema, so we
probe the footer with a one-off batch read (metadata only, no data
scan) and normalize `ts` to a session-UTC TIMESTAMP either way —
identical to the batch path in catalog.load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_events(
    spark: SparkSession,
    path: str,
    watermark: str = "0 seconds",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S4: event stream from a parquet file/dir with an event-time
    watermark (W1-W5: the reference uses 0-3 s bounded delays).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(raw_schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    ts_type = raw_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.withWatermark("ts", watermark)
