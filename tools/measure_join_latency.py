"""Round-9: stream-stream join latency A/B under state-store configs.

VERIFY_SF1_CHAINED_LATENCY_r08 showed the two dwm join layers at
p95 139-163 s/batch, dominated by RocksDB maintenance on ~0.5 GB of
join state. VERDICT r8 item 4 asks for a measured p95 reduction with
hash-identical outputs under:
  - changelog checkpointing (upload the per-batch delta instead of
    snapshotting full SSTs every batch),
  - state-store-aware shuffle-partition sizing (fewer partitions =
    fewer RocksDB instances to maintain/upload per batch),
  - bounded memtables (writeBufferSizeMB / maxWriteBufferNumber).

This tool isolates exactly the two join jobs (the [0, 30d] order_wide
band and the [-7d, +90d] payment_wide band) over time-ordered staged
input replayed as a sequence of micro-batches (monotone event time —
the live-Kafka contract — so watermark-driven state eviction runs
exactly as it would in production), and runs one CONFIG per child
process (RocksDB confs are read at state-store open; a shared JVM
would leak the previous config).

Output identity across configs is checked with an order-independent
checksum (sum of per-row xxhash64 in DECIMAL(38,0) — no driver-side
row materialization at sf1's 6M-row join output).

Two state regimes, both hash-identical on the time-ordered replay:
  - lean (watermark delay 0s): eviction keeps join state at ~band
    width of rows — the healthy live-stream posture;
  - fat (watermark delay 365d): eviction lags a year behind, so the
    stores hold ~1M rows (the ~0.5 GB regime the r08 chained run
    exposed) and per-batch snapshot/upload of large SSTs is the cost
    the changelog configs exist to cut. Larger delay on monotone
    input retains MORE state but drops no rows, so outputs stay
    byte-identical across regimes AND configs — the checksum pins it.

Usage:
  python tools/measure_join_latency.py [sf_dir] [json_out]
  python tools/measure_join_latency.py --child <config> <regime> <sf_dir> <out>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 8  # staged time-ordered files per source -> ~N micro-batches

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "changelog": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
    },
    # changelog + fewer state-store instances: 32 shuffle partitions
    # means 32 RocksDB instances per stateful operator, each paying
    # per-batch fixed maintenance; 8 keeps per-instance state at
    # ~tens of MB at sf1 while quartering the fixed costs
    "changelog_sp8": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
        "spark.sql.shuffle.partitions": "8",
    },
    # + bounded memtables: flush at 16 MB instead of the 64 MB
    # default so the working set stays resident-bounded per instance
    "changelog_sp8_memtable": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            "true",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "16",
        "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "2",
    },
}


def _stage_sorted(spark, sf_dir: str, table: str, ts_col: str, mutate) -> str:
    """Write `table` as N_FILES time-ordered parquet files (+ one
    far-future sentinel last) so availableNow + maxFilesPerTrigger=1
    replays a realistic monotone-event-time batch sequence."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    src = os.path.join(sf_dir, f"{table}.parquet")
    out = tempfile.mkdtemp(prefix=f"{table}_latency_")
    df = spark.read.parquet(src)
    n = df.count()
    per = (n + N_FILES - 1) // N_FILES
    # ntile-free deterministic time slicing: row_number over ts order
    # via a single sort, written slice by slice (sf1 = 6M rows; the
    # one-time sort is the staging cost, not the measured cost)
    from pyspark.sql import Window

    w = Window.orderBy(F.col(ts_col), F.monotonically_increasing_id())
    ranked = df.withColumn("_rn", F.row_number().over(w))
    for k in range(N_FILES):
        (
            ranked.filter(
                (F.col("_rn") > k * per) & (F.col("_rn") <= (k + 1) * per)
            )
            .drop("_rn")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"slice={k:03d}"))
        )
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    # far-future sentinel row (flushes outer/timer state at the end)
    pf = pq.ParquetFile(src)
    row = pf.read_row_group(0).slice(0, 1).to_pandas()
    mutate(row)
    sent_dir = os.path.join(out, "slice=999")
    os.makedirs(sent_dir)
    pq.write_table(
        pa.Table.from_pandas(row, schema=pf.schema_arrow,
                             preserve_index=False),
        os.path.join(sent_dir, "part-sentinel.parquet"),
    )
    return out


REGIMES = {"lean": "0 seconds", "fat": "365 days"}


def _child(config: str, regime: str, sf_dir: str, json_out: str) -> int:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    import pandas as pd

    from gmall_realtime_flink_spark.session import get_spark
    from gmall_realtime_flink_spark.streaming.jobs import (
        interval_join_stream,
        ts_as_timestamp,
        warehouse_stream_schema,
    )
    from gmall_realtime_flink_spark.streaming.topology import (
        _BatchLatencyListener,
        _percentiles,
    )

    spark = get_spark(
        app_name=f"join-latency-{config}",
        extra_conf=CONFIGS[config],
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders_schema = warehouse_stream_schema(spark, sf_dir, "orders")
    lineitem_schema = warehouse_stream_schema(spark, sf_dir, "lineitem")
    far = pd.Timestamp("2030-01-01")

    def _far_for(schema: T.StructType, name: str):
        if isinstance(schema[name].dataType, T.LongType):
            return int(far.value)
        return far

    def _mut_o(row) -> None:
        row["o_orderkey"] = -1
        row["o_orderdate"] = _far_for(orders_schema, "o_orderdate")

    def _mut_l(row) -> None:
        row["l_orderkey"] = -1
        row["l_shipdate"] = _far_for(lineitem_schema, "l_shipdate")

    o_dir = _stage_sorted(spark, sf_dir, "orders", "o_orderdate", _mut_o)
    l_dir = _stage_sorted(spark, sf_dir, "lineitem", "l_shipdate", _mut_l)
    base = tempfile.mkdtemp(prefix=f"join_latency_{config}_")

    delay = REGIMES[regime]

    def fact(schema, path, ts_src, alias):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
            .withColumn(f"{alias}_ts", ts_as_timestamp(schema, ts_src))
            .withWatermark(f"{alias}_ts", delay)
            .alias(alias)
        )

    jobs = {
        "order_wide": ("0 seconds", "30 days"),
        "payment_wide": ("-7 days", "90 days"),
    }
    listener = _BatchLatencyListener()
    listener.attach(spark)
    batch_ms: dict[str, dict] = {}
    job_sec: dict[str, float] = {}
    checksums: dict[str, dict] = {}
    try:
        for job, (lower, upper) in jobs.items():
            o = fact(orders_schema, o_dir, "o_orderdate", "o")
            l = fact(lineitem_schema, l_dir, "l_shipdate", "l")
            wide = interval_join_stream(
                o, l,
                on=F.col("o.o_orderkey") == F.col("l.l_orderkey"),
                left_ts=F.col("o_ts"),
                right_ts=F.col("l_ts"),
                lower=lower,
                upper=upper,
            ).select(
                "o.o_orderkey",
                "l.l_linenumber",
                F.date_format("o_ts", "yyyy-MM-dd").alias("order_date"),
                F.date_format("l_ts", "yyyy-MM-dd").alias("ship_date"),
                F.round("o.o_totalprice", 2).alias("total_amount"),
                F.round("l.l_extendedprice", 2).alias("split_amount"),
            )
            out_dir = os.path.join(base, job)
            t0 = time.time()
            q = (
                wide.writeStream.foreachBatch(
                    lambda b, bid, d=out_dir: b.write.mode("append")
                    .parquet(d)
                )
                .queryName(job)
                .option("checkpointLocation", os.path.join(base, "ckpt", job))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            job_sec[job] = round(time.time() - t0, 1)
            res = spark.read.parquet(out_dir)
            row = res.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(*sorted(res.columns)).cast("decimal(38,0)")
                ).cast("string").alias("checksum"),
            ).collect()[0]
            checksums[job] = {"rows": row["n"], "checksum": row["checksum"]}
    finally:
        listener.detach_into(spark, batch_ms)

    with open(json_out, "w") as f:
        json.dump({
            "config": config,
            "regime": regime,
            "watermark_delay": delay,
            "confs": CONFIGS[config],
            "n_files": N_FILES,
            "job_sec": job_sec,
            "batch_ms": batch_ms,
            "checksums": checksums,
        }, f, indent=1)
    for d in (o_dir, l_dir, base):
        shutil.rmtree(d, ignore_errors=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return _child(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf1"
    json_out = sys.argv[2] if len(sys.argv) > 2 else "JOIN_LATENCY_r09.json"
    combined: dict[str, dict] = {}
    t_all = time.time()
    for regime in REGIMES:
        for config in CONFIGS:
            key = f"{regime}/{config}"
            child_out = f".local/join_latency_{regime}_{config}.json"
            t0 = time.time()
            rc = subprocess.call([
                sys.executable, os.path.abspath(__file__),
                "--child", config, regime, sf_dir, child_out,
            ])
            if rc != 0:
                combined[key] = {"error": f"child exit {rc}"}
                continue
            with open(child_out) as f:
                combined[key] = json.load(f)
            combined[key]["wall_sec"] = round(time.time() - t0, 1)
            with open(json_out, "w") as f:
                json.dump({
                    "sf_dir": sf_dir,
                    "results": combined,
                    "total_sec": round(time.time() - t_all, 1),
                }, f, indent=1)
            print(key, "done", combined[key].get("job_sec"), flush=True)
    # identity assert: every (regime, config) run must produce the
    # same checksums — regimes only change retention, never output
    base_ck = combined.get("lean/baseline", {}).get("checksums")
    mismatches = [
        k for k, r in combined.items()
        if r.get("checksums") != base_ck
    ]
    with open(json_out, "w") as f:
        json.dump({
            "sf_dir": sf_dir,
            "results": combined,
            "hash_identical_across_configs": not mismatches,
            "mismatched_configs": mismatches,
            "total_sec": round(time.time() - t_all, 1),
        }, f, indent=1)
    print("TOTAL", round(time.time() - t_all, 1), "mismatches:", mismatches)
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
