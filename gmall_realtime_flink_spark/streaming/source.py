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

`events.parquet` is written as parquet TIMESTAMP(NANOS); under
`spark.sql.legacy.parquet.nanosAsLong` (set by session.get_spark and
defensively by catalog.load) it surfaces as a nanosecond long, which we
truncate to a microsecond timestamp — identical to the batch path in
catalog.load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events schema as the file stream sees it (ts = raw nanos long)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


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
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withWatermark("ts", watermark)
