"""Bounded streaming-job runners.

Each runner starts a Structured Streaming query over the testdata
event stream with `availableNow` (process everything, then stop) and
returns the collected result as a batch DataFrame — the streaming
analogue of running the batch operator, used by both the driver
correctness gate and the parity tests.

A stream, by definition, never ends — so ST3's event-time timers for
the final pending event per key would never fire on bounded input.
`events_with_sentinel` appends one far-future event (user_id = -1) so
the watermark passes every real timer; the sentinel's own pending
state is filtered from the result. Spark's no-data micro-batch
(`spark.sql.streaming.noDataMicroBatches.enabled`, default on) then
fires the timers before the query stops.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.streaming.source import stream_events
from gmall_realtime_flink_spark.streaming.state import (
    jump_detect_stream,
    repair_is_new_stream,
    uv_dedup_stream,
)


def run_bounded(stream_df: DataFrame, spark: SparkSession) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def events_path(sf_dir: str) -> str:
    """Stage the events table as a streaming input *directory* (the file
    source requires one); the parquet file is symlinked, not copied."""
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(tmp, "part-000.parquet"),
    )
    return tmp


def events_with_sentinel(
    spark: SparkSession, sf_dir: str, gap_ms: int
) -> str:
    """Stage an input dir = events.parquet (symlinked) + one sentinel
    event 2×gap past the max event time, so every real ST3 timer fires.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    max_ns = pq.read_table(src, columns=["ts"])["ts"].cast("int64")
    max_ns = max(max_ns.to_pylist())
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(tmp, "part-000.parquet"))
    sentinel = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([max_ns + 2 * gap_ms * 1_000_000], pa.int64()),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["sentinel"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([None], pa.string()),
        }
    )
    pq.write_table(sentinel, os.path.join(tmp, "part-001-sentinel.parquet"))
    return tmp


def streaming_visitor_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 under Structured Streaming (rows-equal to the batch form)."""
    events = stream_events(spark, events_path(sf_dir))
    return run_bounded(repair_is_new_stream(events, key="user_id"), spark)


def streaming_unique_visit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 under Structured Streaming."""
    events = stream_events(spark, events_path(sf_dir))
    return run_bounded(uv_dedup_stream(events, key="user_id"), spark)


def streaming_user_jump(
    spark: SparkSession, sf_dir: str, gap_ms: int = 600_000
) -> DataFrame:
    """ST3 under Structured Streaming (event-time timeout CEP)."""
    path = events_with_sentinel(spark, sf_dir, gap_ms)
    events = stream_events(spark, path)
    out = run_bounded(
        jump_detect_stream(events, key="user_id", gap_ms=gap_ms), spark
    )
    return out.filter(F.col("user_id") >= 0)
