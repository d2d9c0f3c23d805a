"""Sink layer (S2/S3/S5/S7, R1 multi-sink half).

- route_writer: one-pass partitionBy multi-sink — the file analogue of
  the dynamic-topic Kafka sink; every routed group lands under its own
  directory from a single scan.
- parquet_upsert / dim_upsert_writer: MERGE-keyed-on-pk semantics
  (Phoenix DimSink analogue): new pks insert, existing pks update,
  last writer wins.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.operators.routing import route
from gmall_realtime_flink_spark.streaming import jobs
from gmall_realtime_flink_spark.streaming.sinks import (
    append_writer,
    dim_upsert_writer,
    idempotent_batch_writer,
    parquet_upsert,
    route_writer,
)
from gmall_realtime_flink_spark.streaming.source import stream_events

ROUTING = {
    "view": "dwd_page_log",
    "click": "dwd_display_log",
    "signup": "dwd_start_log",
    "purchase": "dwd_order_info",
}


def test_route_writer_splits_one_scan(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="route_sink_")
    events = load(spark, sf_dir, "events")
    routed = route(events, routing=ROUTING, key_col="event_type")
    route_writer(base)(routed, 0)
    written = spark.read.parquet(base)
    assert written.count() == events.count()
    by_sink = {
        r["sink_table"]: r["n"]
        for r in written.groupBy("sink_table").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["sink_table"]: r["n"]
        for r in routed.groupBy("sink_table").agg(F.count("*").alias("n")).collect()
    }
    assert by_sink == want
    assert set(os.listdir(base)) >= {
        f"sink_table={s}" for s in set(ROUTING.values())
    }


def test_streaming_foreach_batch_route(spark, sf_dir):
    """R1 end-to-end: stream -> foreachBatch -> per-route directories."""
    base = tempfile.mkdtemp(prefix="route_stream_")
    events = stream_events(spark, jobs.events_path(sf_dir))
    routed = route(events, routing=ROUTING, key_col="event_type")
    q = (
        routed.writeStream.foreachBatch(route_writer(base))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch = load(spark, sf_dir, "events")
    assert spark.read.parquet(base).count() == batch.count()


def test_parquet_upsert_merge_semantics(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="dim_"), "dim_user")
    base = spark.createDataFrame(
        [(1, "alice", "v1"), (2, "bob", "v1")], ["id", "name", "ver"]
    )
    parquet_upsert(spark, path, base, pk=["id"])
    upd = spark.createDataFrame(
        [(2, "bob2", "v2"), (3, "carol", "v2")], ["id", "name", "ver"]
    )
    parquet_upsert(spark, path, upd, pk=["id"])
    got = {
        r["id"]: (r["name"], r["ver"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("alice", "v1"), 2: ("bob2", "v2"), 3: ("carol", "v2")}


def test_dim_upsert_writer_routes_tables(spark):
    base = tempfile.mkdtemp(prefix="dims_")
    batch = spark.createDataFrame(
        [
            (1, "a", "DIM_USER"),
            (2, "b", "DIM_USER"),
            (1, "x", "DIM_SKU"),
        ],
        ["id", "val", "sink_table"],
    )
    dim_upsert_writer(spark, base, pk=["id"])(batch, 0)
    batch2 = spark.createDataFrame(
        [(2, "b2", "DIM_USER")], ["id", "val", "sink_table"]
    )
    dim_upsert_writer(spark, base, pk=["id"])(batch2, 1)
    users = {
        r["id"]: r["val"]
        for r in spark.read.parquet(os.path.join(base, "DIM_USER")).collect()
    }
    skus = {
        r["id"]: r["val"]
        for r in spark.read.parquet(os.path.join(base, "DIM_SKU")).collect()
    }
    assert users == {1: "a", 2: "b2"}
    assert skus == {1: "x"}


def test_append_writer(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="ads_"), "visitor_stats")
    events = load(spark, sf_dir, "events").limit(10)
    append_writer(path)(events, 0)
    append_writer(path)(events, 1)
    assert spark.read.parquet(path).count() == 20


def test_checkpoint_recovery_exactly_once(spark, sf_dir):
    """EOS across a mid-stream stop/restart: a checkpointed query with
    an idempotent per-batch-id writer loses nothing and duplicates
    nothing — the sum of all batch directories is exactly the source,
    no matter where the first run was interrupted."""
    import glob
    import time

    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="events_split_eos_")
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    n = t.num_rows
    for i, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        pq.write_table(t.slice(lo, hi - lo), os.path.join(src, f"p{i}.parquet"))

    sink = tempfile.mkdtemp(prefix="eos_sink_")
    ckpt = tempfile.mkdtemp(prefix="eos_ckpt_")
    writer = idempotent_batch_writer(sink)

    def start():
        events = stream_events(spark, src, max_files_per_trigger=1)
        return (
            events.select("event_id", "user_id", "event_type")
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # run 1: stop as soon as at least one batch has committed
    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and not glob.glob(
        os.path.join(sink, "batch_id=*")
    ):
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert glob.glob(os.path.join(sink, "batch_id=*")), "no batch committed"

    # run 2: restart from the same checkpoint, drain the rest
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and any(
        [q.status["isDataAvailable"], not q.status["isTriggerActive"]]
    ) and len(glob.glob(os.path.join(sink, "batch_id=*"))) < 3:
        time.sleep(0.3)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    got = spark.read.parquet(sink)
    assert got.count() == n, "rows lost or duplicated across restart"
    assert got.select("event_id").distinct().count() == n

    # idempotence directly: replaying a committed batch is a no-op
    some_batch = int(
        os.path.basename(glob.glob(os.path.join(sink, "batch_id=*"))[0]).split("=")[1]
    )
    replay_pdf = (
        spark.read.parquet(os.path.join(sink, f"batch_id={some_batch}"))
        .select("event_id", "user_id", "event_type")
        .toPandas()  # materialize: the writer overwrites the dir it was read from
    )
    writer(spark.createDataFrame(replay_pdf), some_batch)
    assert spark.read.parquet(sink).count() == n


def test_scd2_upsert_writer_keeps_history(spark, tmp_path):
    """S5 type-2 extension: each micro-batch closes the changed pks'
    current versions (end-stamped with the new version's event time)
    and appends the new version open-ended; unchanged pks keep their
    open version. Three chained micro-batches -> full version chain."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.streaming.sinks import scd2_upsert_writer

    t = lambda d: dt.datetime(2024, 1, d)
    batches = [
        [(1, "alice", "bronze", t(1)), (2, "bob", "bronze", t(1))],
        [(1, "alice", "silver", t(5))],
        [(1, "alice", "gold", t(9))],
    ]
    src = str(tmp_path / "cdc")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"part-{i:03d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "name": pa.array([r[1] for r in rows], pa.string()),
                    "tier": pa.array([r[2] for r in rows], pa.string()),
                    "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i * 10,) * 2)

    dim = str(tmp_path / "dim_user")
    stream = (
        spark.readStream.schema("user_id long, name string, tier string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            scd2_upsert_writer(spark, dim, pk=["user_id"], ts_col="ts")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(dim)
        .select(
            "user_id",
            "tier",
            F.date_format("__start", "yyyy-MM-dd").alias("s"),
            F.date_format("__end", "yyyy-MM-dd").alias("e"),
            "__current",
        )
        .collect()
    )
    assert got == sorted(
        [
            (1, "bronze", "2024-01-01", "2024-01-05", False),
            (1, "silver", "2024-01-05", "2024-01-09", False),
            (1, "gold", "2024-01-09", None, True),
            (2, "bronze", "2024-01-01", None, True),
        ]
    )


def test_scd2_upsert_drops_out_of_order_cross_batch_updates(spark, tmp_path):
    """An update landing in a LATER batch with an event time OLDER than
    the open version's __start must be dropped, not applied — applying
    it would stamp __end < __start on the current row and promote the
    stale record to 'current'."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.streaming.sinks import scd2_upsert

    t = lambda d: dt.datetime(2024, 1, d)
    dim = str(tmp_path / "dim")
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id long, tier string, ts timestamp"
    )
    scd2_upsert(spark, dim, mk([(1, "silver", t(5))]), ["user_id"], "ts")
    # late arrival: older than the open version — must be a no-op
    scd2_upsert(spark, dim, mk([(1, "bronze", t(2))]), ["user_id"], "ts")
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(dim)
        .select(
            "tier",
            F.date_format("__start", "yyyy-MM-dd").alias("s"),
            F.date_format("__end", "yyyy-MM-dd").alias("e"),
            "__current",
        )
        .collect()
    )
    assert got == [("silver", "2024-01-05", None, True)]
    # an in-order successor still applies normally afterwards
    scd2_upsert(spark, dim, mk([(1, "gold", t(9))]), ["user_id"], "ts")
    cur = (
        spark.read.parquet(dim)
        .filter("__current")
        .select("tier")
        .collect()
    )
    assert [r["tier"] for r in cur] == ["gold"]
    hist = spark.read.parquet(dim).filter(
        F.col("__end") < F.col("__start")
    )
    assert hist.count() == 0
