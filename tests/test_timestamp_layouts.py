"""Both observed physical timestamp layouts of the driver testdata must
load to identical session-UTC TIMESTAMP values.

The per-round driver has regenerated `events.parquet` across rounds in
two layouts: parquet TIMESTAMP(NANOS) (readable only as a nanosecond
long under `spark.sql.legacy.parquet.nanosAsLong`) and
TIMESTAMP(MICROS) with isAdjustedToUTC=false (TIMESTAMP_NTZ under
Spark 4's NTZ inference — which rejects `unix_millis` et al. and broke
user_jump/session_entry in CORRECTNESS_r03). catalog.load and the
streaming file source both normalize to TIMESTAMP; these tests pin
that for every layout, batch and stream.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.operators.stateful import (
    jump_detect,
    session_entry,
)

ROWS = {
    "event_id": [1, 2, 3, 4],
    "user_id": [7, 7, 7, 9],
    "event_type": ["view", "click", "view", "view"],
    "value": [1.0, 2.0, 3.0, 4.0],
    "props": ['{"k": 1}'] * 4,
}
# 2024-01-01 00:00:00, +1s, +20min, and a second user — exercises both
# the within-gap and the beyond-gap branch of the lag/lead operators
TS_US = [
    1_704_067_200_000_000,
    1_704_067_201_000_000,
    1_704_068_400_000_000,
    1_704_067_200_000_000,
]


def _write_events(dir_path: str, layout: str, event_types=None) -> str:
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, "events.parquet")
    if layout == "ntz_micros":
        ts = pa.array(TS_US, pa.timestamp("us"))
    elif layout == "nanos":
        ts = pa.array([t * 1000 for t in TS_US], pa.timestamp("ns"))
    else:
        raise ValueError(layout)
    table = pa.table(
        {
            "event_id": pa.array(ROWS["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pa.array(ROWS["user_id"], pa.int64()),
            "event_type": pa.array(
                event_types or ROWS["event_type"], pa.string()
            ),
            "value": pa.array(ROWS["value"], pa.float64()),
            "props": pa.array(ROWS["props"], pa.string()),
        }
    )
    pq.write_table(table, path)
    return dir_path


@pytest.mark.parametrize("layout", ["ntz_micros", "nanos"])
def test_catalog_load_normalizes_each_layout(spark, tmp_path, layout):
    sf_dir = _write_events(str(tmp_path / layout), layout)
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r[0]
        for r in df.selectExpr("unix_millis(ts) AS ms")
        .orderBy("event_id")
        .collect()
    ]
    assert got == [t // 1000 for t in TS_US]


@pytest.mark.parametrize("layout", ["ntz_micros", "nanos"])
def test_stateful_ops_run_on_each_layout(spark, tmp_path, layout):
    """session_entry/jump_detect were the CORRECTNESS_r03 casualties:
    unix_millis rejects TIMESTAMP_NTZ. Both must plan and agree on
    row counts for either physical layout."""
    sf_dir = _write_events(str(tmp_path / layout), layout)
    events = load(spark, sf_dir, "events")
    # user 7: entry at t0 (prev null), t0+20min (> 10min gap); user 9: entry
    assert session_entry(events).count() == 3
    # user 7: jumps at t0+1s?  gap to +20min > 10min → jump; last event
    # jump (lead null); user 9 single event → jump
    assert jump_detect(events).count() == 3


@pytest.mark.parametrize("layout", ["ntz_micros", "nanos"])
def test_stream_source_normalizes_each_layout(spark, tmp_path, layout):
    from gmall_realtime_flink_spark.streaming.source import stream_events

    sf_dir = _write_events(str(tmp_path / layout), layout)
    stream = stream_events(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("layout", ["ntz_micros", "nanos"])
def test_purchase_dim_temporal_stream_on_each_layout(
    spark, tmp_path, layout
):
    """The stream-static temporal join reads events TWICE — streamed
    (normalized by stream_events) and static (must go through
    catalog.load: a raw read leaves bigint nanos under the legacy
    layout and the TIMESTAMP >= BIGINT band predicate fails to
    resolve). user 7: signup@t0, purchase@t0+1s and @t0+20min — both
    purchases land in the t0-opened version."""
    from gmall_realtime_flink_spark.streaming.jobs import (
        streaming_purchase_dim_temporal,
    )

    sf_dir = _write_events(
        str(tmp_path / layout),
        layout,
        event_types=["signup", "purchase", "purchase", "view"],
    )
    out = streaming_purchase_dim_temporal(spark, sf_dir)
    rows = out.orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [2, 3]
    assert all(r["version_event"] == 1 for r in rows)
