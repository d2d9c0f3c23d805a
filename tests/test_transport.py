"""Network-transport integration: the socket source through a DWS agg.

The Kafka connector cannot execute in this environment (no broker
binary — streaming/kafka.py:12-17), so this is the nearest executable
wire-run: an in-process TCP server replays the events fixture as JSON
lines, Spark consumes it with readStream.format("socket") +
from_json (streaming/source.stream_events_socket — the exact pipeline
shape of the Kafka source), and the visitor-stats tumble aggregate
over the NETWORK transport must equal the same aggregate over the
file transport. Passing documents that only the connector, not the
DAG, remains untested against real Kafka.
"""

from __future__ import annotations

import json
import socket
import threading
import time

from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.streaming.source import stream_events_socket


def _serve(lines: list[str], sock: socket.socket, done: threading.Event):
    conn, _ = sock.accept()
    try:
        conn.sendall(("\n".join(lines) + "\n").encode())
        # hold the connection open until the query is stopped — the
        # socket source treats a closed peer as a stream failure
        done.wait(timeout=180)
    finally:
        conn.close()
        sock.close()


def test_socket_transport_matches_file_transport(spark, sf_dir):
    from gmall_realtime_flink_spark.operators.windows import (
        distinct_count_col,
        tumble_agg,
    )
    from gmall_realtime_flink_spark.streaming.jobs import (
        SENTINEL_CUTOFF,
        streaming_visitor_stats,
    )

    events = load(spark, sf_dir, "events")
    rows = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).collect()
    lines = [json.dumps(r.asDict()) for r in rows]
    # far-future sentinel per event type (same watermark-advancing
    # pattern as the file source's sentinel file)
    for i, et in enumerate(["view", "click", "signup", "purchase", "error"]):
        lines.append(
            json.dumps(
                {
                    "event_id": -(i + 1),
                    "ts": "2030-01-01 00:00:00.000",
                    "user_id": -1,
                    "event_type": et,
                    "value": 0.0,
                    "props": '{"k": -1}',
                }
            )
        )

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.listen(1)
    done = threading.Event()
    server = threading.Thread(target=_serve, args=(lines, sock, done))
    server.start()

    stream = stream_events_socket(spark, port=port)
    agg = tumble_agg(
        stream,
        ts_col="ts",
        duration="10 seconds",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("pv_ct"),
            distinct_count_col("user_id", "exact").alias("uv_ct"),
        ],
    ).select("stt", "edt", "event_type", "pv_ct", "uv_ct")
    q = (
        agg.writeStream.format("memory")
        .queryName("socket_vs")
        .outputMode("append")
        .start()
    )
    try:
        # the file-transport truth (pv/uv per 10 s window per type)
        want_df = streaming_visitor_stats(spark, sf_dir)
        want = sorted(
            (r["stt"], r["edt"], r["event_type"], r["pv_ct"], r["uv_ct"])
            for r in want_df.collect()
        )
        deadline = time.time() + 150
        expect = len(want)
        while time.time() < deadline:
            got_rows = spark.sql(
                f"SELECT * FROM socket_vs WHERE stt < '{SENTINEL_CUTOFF}'"
            ).collect()
            if len(got_rows) >= expect:
                break
            time.sleep(2)
    finally:
        q.stop()
        done.set()
        server.join(timeout=30)
    got = sorted(
        (r["stt"], r["edt"], r["event_type"], r["pv_ct"], r["uv_ct"])
        for r in got_rows
    )
    assert got == want
