"""Batch/streaming parity for the stateful trio (ST1/ST2/ST3).

The promise in operators/stateful.py: the applyInPandasWithState
streaming form equals the batch window-function form on bounded input.
Asserted two ways:

1. single micro-batch (whole events table in one trigger);
2. three chronological micro-batches (`maxFilesPerTrigger=1` over a
   time-split of the table) — state must survive and compose across
   batches, which is where naive implementations break.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.operators.stateful import (
    jump_detect,
    repair_is_new,
    uv_dedup,
)
from gmall_realtime_flink_spark.streaming import jobs
from gmall_realtime_flink_spark.streaming.source import stream_events
from gmall_realtime_flink_spark.streaming.state import (
    jump_detect_stream,
    repair_is_new_stream,
    uv_dedup_stream,
)

GAP_MS = 600_000


def rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def split_events_dir(sf_dir):
    """events table sorted by ts, split into 3 chronological parquet
    files + a far-future sentinel, so maxFilesPerTrigger=1 yields 4
    micro-batches with strictly advancing watermark."""
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast("int64")
    )
    t = t.sort_by("ts")
    tmp = tempfile.mkdtemp(prefix="events_split_")
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), os.path.join(tmp, f"part-{i:03d}.parquet"))
    max_ns = max(t["ts"].to_pylist())
    sentinel = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([max_ns + 2 * GAP_MS * 1_000_000], pa.int64()),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["sentinel"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([None], pa.string()),
        }
    )
    pq.write_table(sentinel, os.path.join(tmp, "part-999-sentinel.parquet"))
    return tmp


# -- single micro-batch parity ------------------------------------------------


def test_repair_parity(spark, sf_dir):
    got = jobs.streaming_visitor_repair(spark, sf_dir)
    events = load(spark, sf_dir, "events")
    want = repair_is_new(events, key="user_id", ts_col="ts").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("visit_date"),
        "is_new",
    )
    cols = ["event_id", "user_id", "visit_date", "is_new"]
    assert rows(got, cols) == rows(want, cols)


def test_uv_parity(spark, sf_dir):
    got = jobs.streaming_unique_visit(spark, sf_dir)
    events = load(spark, sf_dir, "events")
    want = uv_dedup(events, key="user_id", ts_col="ts").select(
        "user_id", "visit_date", "first_ts"
    )
    cols = ["user_id", "visit_date", "first_ts"]
    assert rows(got, cols) == rows(want, cols)


def test_jump_parity(spark, sf_dir):
    got = jobs.streaming_user_jump(spark, sf_dir, gap_ms=GAP_MS)
    events = load(spark, sf_dir, "events")
    want = jump_detect(events, key="user_id", ts_col="ts", gap_ms=GAP_MS).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("jump_ts"),
    )
    cols = ["event_id", "user_id", "jump_ts"]
    assert rows(got, cols) == rows(want, cols)


# -- multi-micro-batch parity (state survives across triggers) ----------------


def test_repair_parity_multibatch(spark, sf_dir, split_events_dir):
    events = stream_events(spark, split_events_dir, max_files_per_trigger=1)
    got = jobs.run_bounded(
        repair_is_new_stream(events, key="user_id"), spark
    ).filter(F.col("user_id") >= 0)
    batch = load(spark, sf_dir, "events")
    want = repair_is_new(batch, key="user_id", ts_col="ts").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("visit_date"),
        "is_new",
    )
    cols = ["event_id", "user_id", "visit_date", "is_new"]
    assert rows(got, cols) == rows(want, cols)


def test_uv_parity_multibatch(spark, sf_dir, split_events_dir):
    events = stream_events(spark, split_events_dir, max_files_per_trigger=1)
    got = jobs.run_bounded(uv_dedup_stream(events, key="user_id"), spark).filter(
        F.col("user_id") >= 0
    )
    batch = load(spark, sf_dir, "events")
    want = uv_dedup(batch, key="user_id", ts_col="ts").select(
        "user_id", "visit_date", "first_ts"
    )
    cols = ["user_id", "visit_date", "first_ts"]
    assert rows(got, cols) == rows(want, cols)


def test_windowed_agg_streaming_parity(spark, sf_dir, split_events_dir):
    """A1/A2/W3 under streaming: watermark + append-mode tumbling window
    equals the batch window agg once every window is closed (the
    sentinel pushes the watermark past all real windows)."""
    from gmall_realtime_flink_spark.operators.windows import tumble_agg

    events = stream_events(spark, split_events_dir, max_files_per_trigger=1)
    agg = tumble_agg(
        events,
        ts_col="ts",
        duration="10 seconds",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("pv_ct")],
    )
    got = jobs.run_bounded(agg, spark).filter(F.col("event_type") != "sentinel")
    batch = load(spark, sf_dir, "events")
    want = tumble_agg(
        batch,
        ts_col="ts",
        duration="10 seconds",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("pv_ct")],
    )
    cols = ["stt", "edt", "event_type", "pv_ct"]
    assert rows(got, cols) == rows(want, cols)


def test_jump_parity_multibatch(spark, sf_dir, split_events_dir):
    events = stream_events(spark, split_events_dir, max_files_per_trigger=1)
    got = jobs.run_bounded(
        jump_detect_stream(events, key="user_id", gap_ms=GAP_MS), spark
    ).filter(F.col("user_id") >= 0)
    batch = load(spark, sf_dir, "events")
    want = jump_detect(batch, key="user_id", ts_col="ts", gap_ms=GAP_MS).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("jump_ts"),
    )
    cols = ["event_id", "user_id", "jump_ts"]
    assert rows(got, cols) == rows(want, cols)
