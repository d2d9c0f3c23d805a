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
from pyspark.sql import types as T

from gmall_realtime_flink_spark.streaming.source import stream_events
from gmall_realtime_flink_spark.streaming.state import (
    jump_detect_stream,
    repair_is_new_stream,
    uv_dedup_stream,
)


def run_bounded(
    stream_df: DataFrame, spark: SparkSession, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink.

    `output_mode="complete"` is for unwatermarked streaming aggregates
    (e.g. the incremental dedup state), where the final emission IS the
    full result."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
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
    # abspath: the symlink lives under /tmp, so a relative sf_dir
    # would otherwise dangle (resolved against the link's dir)
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(tmp, "part-000.parquet"),
    )
    return tmp


# one sentinel row per type ANY branch filters on — including the
# reference-faithful 'cart'/'comment' union branches that are
# data-bounded empty (their pushed-down scans would otherwise never
# observe an event time and the min-policy global watermark would
# stall at zero)
SENTINEL_TYPES = (
    "view", "click", "signup", "cart", "purchase", "error", "comment",
    "sentinel",
)


def write_sentinel_file(path: str, ts_ns: int, ts_type=None) -> None:
    """Write the watermark-advancing sentinel rows (user_id = -1), one
    per real event type plus a 'sentinel' marker.

    The sentinel must survive EVERY predicate the query pushes below
    the EventTimeWatermark operator into the parquet scan, or the
    watermark never passes the final open window (found the hard way;
    see tests/test_streaming.py). Two pushdown classes bite:
    - explicit event-type filters → one sentinel row per type;
    - join-key null-rejection INFERRED by Catalyst (an inner join on
      get_json_object(props, '$.k') implies `props IS NOT NULL` at the
      scan) → props carries a valid JSON object with a key that can
      never join ({"k": -1}), not NULL.
    Downstream queries already drop sentinel *output* via the
    far-future stt cutoff, so the non-null props are inert there.

    `ts_type`: the SOURCE file's physical ts type (pyarrow) — the
    sentinel must match it exactly (int64 nanos for the legacy
    TIMESTAMP(NANOS) layout, timestamp[us] for the current one) or the
    file stream's single fixed schema rejects one of the two files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(SENTINEL_TYPES)
    if ts_type is not None and pa.types.is_timestamp(ts_type):
        unit_div = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[ts_type.unit]
        ts_arr = pa.array([ts_ns // unit_div] * n, ts_type)
    else:
        ts_arr = pa.array([ts_ns] * n, pa.int64())
    sentinel = pa.table(
        {
            "event_id": pa.array([-(i + 1) for i in range(n)], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([-1] * n, pa.int64()),
            "event_type": pa.array(list(SENTINEL_TYPES), pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
            "props": pa.array(['{"k": -1}'] * n, pa.string()),
        }
    )
    pq.write_table(sentinel, path)


# fixed far-future sentinel event time (testdata is all 2024): lets any
# downstream query separate real windows with `stt < SENTINEL_CUTOFF`
SENTINEL_TS_NS = 1_893_456_000_000_000_000  # 2030-01-01 UTC
SENTINEL_CUTOFF = "2029-01-01"


def events_with_sentinel(
    spark: SparkSession, sf_dir: str, gap_ms: int
) -> str:
    """Stage an input dir = events.parquet (symlinked) + sentinel events
    far past the max event time, so every real ST3 timer fires and
    every real window closes.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    ts_col = pq.read_table(src, columns=["ts"])["ts"]
    ts_type = ts_col.type
    # empty source: no real event time to exceed — the fixed far-future
    # sentinel alone still advances the watermark so the (empty) run
    # terminates instead of crashing on max() of nothing
    raw_max = max(ts_col.cast("int64").to_pylist(), default=0)
    if pa.types.is_timestamp(ts_type):
        unit_mul = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[ts_type.unit]
        max_ns = raw_max * unit_mul
    else:
        max_ns = raw_max  # legacy layout: already nanos
    tmp = tempfile.mkdtemp(prefix="events_stream_")
    # Steady-flow replay (topology latency measurement): stage the
    # table as K TIME-ORDERED slices instead of one file, so a
    # file-per-trigger consumer sees the arrival pattern a live topic
    # gives — monotone event time across batches, which is the
    # contract the 0-second watermarks encode. events.parquet is
    # ts-sorted by construction, so row-slices are time-slices.
    # mtimes are spaced so the file source's oldest-first order equals
    # slice order even on coarse filesystem clocks.
    slices = int(os.environ.get("SPARK_GRAFT_TOPOLOGY_EVENT_SLICES", "0"))
    if slices > 1:
        import time as _time

        tbl = pq.read_table(src)
        n = tbl.num_rows
        now = _time.time()
        for i in range(slices):
            lo = i * n // slices
            hi = (i + 1) * n // slices
            p = os.path.join(tmp, f"part-{i:03d}.parquet")
            pq.write_table(tbl.slice(lo, hi - lo), p)
            os.utime(p, (now - 2 * (slices - i) - 2,) * 2)
        last = slices
    else:
        os.symlink(src, os.path.join(tmp, "part-000.parquet"))
        last = 1
    write_sentinel_file(
        os.path.join(tmp, f"part-{last:03d}-sentinel.parquet"),
        max(max_ns + 2 * gap_ms * 1_000_000, SENTINEL_TS_NS),
        ts_type=ts_type,
    )
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
    # drop ONLY the sentinel key (-1). A plain `>= 0` also swallows
    # NULL user_ids (NULL comparison -> NULL -> filtered), silently
    # deleting the null-key group the stateful operator correctly
    # processed — caught by the adversarial-corpus gate (r8).
    return out.filter(~F.col("user_id").eqNullSafe(-1))


def warehouse_stream_schema(
    spark: SparkSession, sf_dir: str, table: str
) -> T.StructType:
    """readStream needs an explicit schema; probe the real footer
    (metadata-only batch read) instead of hardcoding one, so whichever
    physical timestamp layout the testdata generation used is the one
    declared — a hardcoded TimestampNTZ schema breaks the day the
    generator flips back to nanos or adjusted-UTC micros (exactly how
    the events source broke in round 4)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).schema


def ts_as_timestamp(raw_schema: T.StructType, name: str):
    """Session-UTC TIMESTAMP expression for a probed ts-ish column:
    nanos long → truncate to µs; NTZ / DATE / TIMESTAMP → plain cast
    (identical to the batch normalization in catalog.load)."""
    if isinstance(raw_schema[name].dataType, T.LongType):
        return F.timestamp_micros(F.expr(f"{name} div 1000"))
    return F.col(name).cast("timestamp")


def stage_table_dir(sf_dir: str, table: str) -> str:
    """Symlink one parquet table into a fresh streaming input dir."""
    tmp = tempfile.mkdtemp(prefix=f"{table}_stream_")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, f"{table}.parquet")),
        os.path.join(tmp, "part-000.parquet"),
    )
    return tmp


def stage_table_with_sentinel(sf_dir: str, table: str, mutate) -> str:
    """stage_table_dir + one far-future sentinel row (schema-identical
    to the source file) so outer-join / timer state flushes before the
    bounded stream stops. `mutate(df)` stamps the sentinel's keys/ts on
    a one-row pandas copy of the first source row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = stage_table_dir(sf_dir, table)
    src = os.path.join(sf_dir, f"{table}.parquet")
    # read ONE row group, not the table — the sentinel needs a single
    # schema-true row, and lineitem at real SFs is GBs of Arrow
    pf = pq.ParquetFile(src)
    first = pf.read_row_group(0).slice(0, 1)
    row = first.to_pandas()
    mutate(row)
    pq.write_table(
        pa.Table.from_pandas(row, schema=pf.schema_arrow, preserve_index=False),
        os.path.join(tmp, "part-001-sentinel.parquet"),
    )
    return tmp


def stage_table_sorted_split(
    sf_dir: str, table: str, ts_col: str, n_files: int, mutate
) -> str:
    """stage_table_with_sentinel's ORDERED form: the table is written
    as `n_files` event-time-sorted parquet slices (strictly increasing
    mtimes, so the file source consumes them in time order) plus the
    far-future sentinel last. This is the monotone-event-time contract
    a per-key-ordered Kafka topic provides; JOIN_LATENCY_r09 measured
    it as the 23x per-batch-p95 lever for the stream-stream join
    layers (watermark advances every batch -> state evicts
    continuously instead of ballooning toward the whole corpus).

    Slice/sentinel ordering is enforced with EXPLICIT os.utime stamps
    (strictly increasing whole seconds, all in the past), not write
    timing: on filesystems with coarse (1 s) mtime granularity,
    back-to-back writes can tie and replay out of order, silently
    voiding the monotone-event-time contract (ADVICE r9)."""
    import time as _time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{table}.parquet")
    out = tempfile.mkdtemp(prefix=f"{table}_ordered_")
    t = pq.read_table(src)
    t = t.take(pc.sort_indices(t, sort_keys=[(ts_col, "ascending")]))
    n = t.num_rows
    per = (n + n_files - 1) // n_files
    base = _time.time() - n_files - 10  # past, 1 s apart, sentinel last
    for k in range(n_files):
        sl = t.slice(k * per, per)
        if sl.num_rows == 0:
            break
        p = os.path.join(out, f"part-{k:03d}.parquet")
        pq.write_table(sl, p)
        os.utime(p, (base + k,) * 2)
    pf = pq.ParquetFile(src)
    row = pf.read_row_group(0).slice(0, 1).to_pandas()
    mutate(row)
    sp = os.path.join(out, "part-999-sentinel.parquet")
    pq.write_table(
        pa.Table.from_pandas(row, schema=pf.schema_arrow,
                             preserve_index=False),
        sp,
    )
    os.utime(sp, (base + n_files + 1,) * 2)
    return out


def streaming_order_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/ST4 on the real warehouse tables: orders ⋈ lineitem as two
    file streams, equi-key + [0, 30d] event-time band — the streaming
    form of the batch `order_wide` query (same oracle)."""
    orders_schema = warehouse_stream_schema(spark, sf_dir, "orders")
    lineitem_schema = warehouse_stream_schema(spark, sf_dir, "lineitem")
    o = (
        spark.readStream.schema(orders_schema)
        .parquet(stage_table_dir(sf_dir, "orders"))
        .withColumn("o_ts", ts_as_timestamp(orders_schema, "o_orderdate"))
        .withWatermark("o_ts", "0 seconds")
        .alias("o")
    )
    l = (
        spark.readStream.schema(lineitem_schema)
        .parquet(stage_table_dir(sf_dir, "lineitem"))
        .withColumn("l_ts", ts_as_timestamp(lineitem_schema, "l_shipdate"))
        .withWatermark("l_ts", "0 seconds")
        .alias("l")
    )
    joined = interval_join_stream(
        o,
        l,
        on=F.col("o.o_orderkey") == F.col("l.l_orderkey"),
        left_ts=F.col("o_ts"),
        right_ts=F.col("l_ts"),
        lower="0 seconds",
        upper="30 days",
    )
    return run_bounded(
        joined.select(
            "o.o_orderkey",
            "l.l_linenumber",
            "l.l_partkey",
            F.date_format("o_ts", "yyyy-MM-dd").alias("order_date"),
            F.date_format("l_ts", "yyyy-MM-dd").alias("ship_date"),
            F.round("o.o_totalprice", 2).alias("total_amount"),
            F.round("l.l_extendedprice", 2).alias("split_amount"),
        ),
        spark,
    )


def streaming_cdc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+R2+P6 under streaming WITH the S3/R1 sink in the loop
    (RT/app/dwd/BaseDBApp.java:76-113): CDC stream -> ETL filter ->
    bootstrap-insert normalize -> broadcast config-table routing ->
    foreachBatch route_writer (one partitioned write fans out every
    sink_table, the dynamic-topic analogue). The returned frame is the
    fact layer READ BACK from disk — the oracle checks the roundtrip
    through the sink, not just the routing expression."""
    from gmall_realtime_flink_spark.operators.routing import (
        etl_filter,
        normalize_cdc_type,
        route_with_config,
    )
    from gmall_realtime_flink_spark.streaming.sinks import route_writer

    config = spark.createDataFrame(
        [
            ("view", "insert", "dwd_page_log", "k"),
            ("click", "insert", "dwd_display_log", "k"),
            ("signup", "update", "dim_user_info", ""),
            ("purchase", "insert", "dwd_order_info", "k"),
        ],
        ["source_table", "operate_type", "sink_table", "sink_columns"],
    )
    events = stream_events(spark, events_path(sf_dir))
    src = etl_filter(
        events, required=["props"], min_len_col="props", min_len=3
    ).withColumn(
        "op",
        F.when(F.col("event_type") == "view", "insert")
        .when(F.col("event_type") == "click", "bootstrap-insert")
        .when(F.col("event_type") == "signup", "update")
        .when(F.col("event_type") == "purchase", "insert")
        .otherwise("delete"),
    )
    routed = route_with_config(
        normalize_cdc_type(src, type_col="op"),
        config,
        source_col="event_type",
        type_col="op",
    ).select(
        "event_id",
        "event_type",
        F.col("op").alias("cdc_type"),
        "sink_table",
    )
    fact_dir = os.path.join(tempfile.mkdtemp(prefix="cdc_route_"), "facts")
    q = (
        routed.filter(~F.col("sink_table").startswith("dim_"))
        .writeStream.foreachBatch(route_writer(fact_dir))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # empty input -> route_writer never fired -> no parquet to infer a
    # schema from; an empty route run is still a valid (empty) result
    if not any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(fact_dir)
        for f in fs
    ):
        return spark.createDataFrame(
            [],
            "event_id long, event_type string, cdc_type string, "
            "sink_table string",
        )
    return spark.read.parquet(fact_dir).select(
        "event_id", "event_type", "cdc_type", "sink_table"
    )


def streaming_payment_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/ST4 streaming: the PaymentWideApp asymmetric-band interval
    join (RT/app/dwm/PaymentWideApp.java:116-131, ±30 min there;
    [-7d, +90d] on the warehouse tables) as a stream-stream join —
    the streaming form of the batch `payment_wide` query (same
    oracle). The negative lower bound means the right stream buffers
    events up to 7 days *before* a matching left event; Spark sizes
    both sides' join state from the band automatically."""
    orders_schema = warehouse_stream_schema(spark, sf_dir, "orders")
    lineitem_schema = warehouse_stream_schema(spark, sf_dir, "lineitem")
    o = (
        spark.readStream.schema(orders_schema)
        .parquet(stage_table_dir(sf_dir, "orders"))
        .withColumn("o_ts", ts_as_timestamp(orders_schema, "o_orderdate"))
        .withWatermark("o_ts", "0 seconds")
        .alias("o")
    )
    l = (
        spark.readStream.schema(lineitem_schema)
        .parquet(stage_table_dir(sf_dir, "lineitem"))
        .withColumn("l_ts", ts_as_timestamp(lineitem_schema, "l_shipdate"))
        .withWatermark("l_ts", "0 seconds")
        .alias("l")
    )
    joined = interval_join_stream(
        o,
        l,
        on=F.col("o.o_orderkey") == F.col("l.l_orderkey"),
        left_ts=F.col("o_ts"),
        right_ts=F.col("l_ts"),
        lower="-7 days",
        upper="90 days",
    )
    from gmall_realtime_flink_spark.functions.compat import dec_round

    return run_bounded(
        joined.select(
            "o.o_orderkey",
            "l.l_linenumber",
            F.date_format("l_ts", "yyyy-MM-dd").alias("callback_date"),
            dec_round(
                F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")), 2
            ).alias("payment_amount"),
        ),
        spark,
    )


def streaming_product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 under Structured Streaming: the full ProductStats union
    pipeline on a watermarked stream, run bounded. Equals the batch
    `product_stats_union` query (same oracle)."""
    from gmall_realtime_flink_spark.plans.gmall import product_stats_union_core

    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    out = run_bounded(product_stats_union_core(events), spark)
    # sentinel rows land only in far-future windows — the stt cutoff
    # alone removes them; real NULL-sku groups (props without '$.k')
    # must survive, matching the oracle's NULL-group semantics
    return out.filter(F.col("stt") < SENTINEL_CUTOFF)


def streaming_product_stats_enriched(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """J4 under streaming: broadcast dim enrichment AFTER the streaming
    window aggregation — the reference joins dims onto the aggregated
    ProductStats stream (RT/app/dws/ProductStatsApp.java:318-397), the
    cheap ordering (|groups| rows hit the join, not |events|). In
    Spark this is a stream-static join downstream of the streaming agg,
    in the same query."""
    from gmall_realtime_flink_spark.plans.gmall import product_stats_union_core

    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    agg = product_stats_union_core(events)
    dim = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).select(
        F.col("s_suppkey"), F.col("s_name")
    )
    enriched = agg.join(
        F.broadcast(dim), agg["sku_id"] == dim["s_suppkey"], "left"
    ).select(
        "stt", "edt", "sku_id",
        F.col("s_name").alias("sku_name"),
        "click_ct", "order_ct", "order_amount",
    )
    out = run_bounded(enriched, spark)
    # stt cutoff alone: keeps real NULL-sku groups (oracle keeps them too)
    return out.filter(F.col("stt") < SENTINEL_CUTOFF)


def streaming_visitor_stats(
    spark: SparkSession, sf_dir: str, distinct_mode: str = "exact"
) -> DataFrame:
    """A1/A2/A3 under Structured Streaming: keyed 10 s tumble with a
    switchable distinct-count strategy (operators/windows.
    distinct_count_col): "exact" (collect_set — the oracle-gated
    default; exact countDistinct is unsupported on streaming aggs,
    SURVEY §7.3) or "approx" (HLL++ sketch, constant state per window
    key — the hot-key 100 TB posture; accuracy pinned by
    test_streaming_distinct_modes_agree)."""
    from gmall_realtime_flink_spark.operators.windows import (
        distinct_count_col,
        tumble_agg,
    )

    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    agg = tumble_agg(
        events,
        ts_col="ts",
        duration="10 seconds",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("pv_ct"),
            distinct_count_col("user_id", distinct_mode).alias("uv_ct"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,4)")), 2
            ).cast("double").alias("dur_sum"),
        ],
    )
    out = run_bounded(agg, spark)
    return out.filter(F.col("stt") < SENTINEL_CUTOFF).select(
        "stt", "edt", "event_type", "pv_ct", "uv_ct", "dur_sum"
    )


def streaming_visitor_stats_sliding(
    spark: SparkSession, sf_dir: str, distinct_mode: str = "exact"
) -> DataFrame:
    """Hopping windows under Structured Streaming: window(ts, 30s,
    slide 10s) keyed by event_type — every event contributes to 3
    overlapping windows; state = open windows only, closed by
    watermark passage exactly as tumble windows. Distinct strategy is
    flag-switchable like every streaming distinct site (A3):
    "exact" collect_set (oracle-gated default) or "approx" HLL++
    (constant state per open window — 3× the open-window count here,
    the hot-key posture for overlapping windows)."""
    from gmall_realtime_flink_spark.operators.windows import (
        distinct_count_col,
    )

    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    agg = (
        events.groupBy(
            F.window("ts", "30 seconds", "10 seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            distinct_count_col("user_id", distinct_mode).alias("uv_ct"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_type",
            "pv_ct",
            "uv_ct",
        )
    )
    out = run_bounded(agg, spark)
    return out.filter(F.col("stt") < SENTINEL_CUTOFF)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts,
    right_ts,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """J1/J2 + ST4: stream-stream interval join.

    Identical predicate shape to operators.joins.interval_join — the
    equi-key carries the shuffle, the band is a residual predicate.
    Under streaming, both sides must carry watermarks; Spark bounds the
    join state to watermark + band width (the Flink intervalJoin's
    keyed buffering state, OrderWideApp.java:144-152, for free).

    how="left_outer" is a capability Flink's intervalJoin does NOT
    have (inner-only; the reference would need a coProcess + timer):
    unmatched left rows emit null-padded once the watermark passes
    left_ts + upper, i.e. once no in-band match can still arrive.
    """
    band = (right_ts >= left_ts + F.expr(f"INTERVAL {lower}")) & (
        right_ts <= left_ts + F.expr(f"INTERVAL {upper}")
    )
    return left.join(right, on & band, how)


def streaming_view_click_join(
    spark: SparkSession, sf_dir: str, window: str = "2 days"
) -> DataFrame:
    """ST4 under Structured Streaming: per-user view⋈click pairs where
    the click lands within `window` after the view (the OrderWideApp
    order⋈detail shape on the events table)."""
    path = events_path(sf_dir)
    views = (
        stream_events(spark, path)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    clicks = (
        stream_events(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = interval_join_stream(
        views,
        clicks,
        on=F.col("v_user") == F.col("c_user"),
        left_ts=F.col("v_ts"),
        right_ts=F.col("c_ts"),
        lower="0 seconds",
        upper=window,
    )
    out = run_bounded(
        joined.select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "click_id",
            F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        ),
        spark,
    )
    return out


def streaming_stats_sql(
    spark: SparkSession, sf_dir: str, distinct_mode: str = "exact"
) -> DataFrame:
    """S4+A4/A5 under streaming: the Flink-SQL-app shape
    (RT/app/dws/ProvinceStatsSqlApp.java:45-61, KeywordStatsApp.java:56-88)
    — a watermarked stream registered as a temp view, aggregated by a
    spark.sql TUMBLE with a flag-switchable streaming-safe distinct
    (A3): "exact" size(collect_set) — COUNT(DISTINCT) is unsupported
    on streaming aggs — or "approx" approx_count_distinct (HLL++,
    constant per-window-key state, the hot-key posture). The 2 s
    watermark is W5's bounded SQL delay. The SQL text is just another
    front-end: Catalyst compiles it to the same streaming physical
    plan as the DataFrame form."""
    if distinct_mode == "exact":
        uv_expr = "size(collect_set(user_id))"
    elif distinct_mode == "approx":
        uv_expr = "approx_count_distinct(user_id, 0.05)"
    else:
        raise ValueError(
            f"distinct mode must be exact|approx, got {distinct_mode!r}"
        )
    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path, watermark="2 seconds")
    events.createOrReplaceTempView("events_stream")
    agg = spark.sql(
        f"""
        SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS stt,
               date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS edt,
               event_type,
               count(*) AS pv_ct,
               {uv_expr} AS uv_ct,
               CAST(round(sum(CAST(value AS DECIMAL(28,4))), 2) AS DOUBLE)
                 AS amount
        FROM events_stream
        GROUP BY window(ts, '10 seconds'), event_type
        """
    )
    out = run_bounded(agg, spark)
    return out.filter(F.col("stt") < SENTINEL_CUTOFF)


def streaming_keyword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeywordStatsApp under streaming (A5+F2 with the UDTF in the
    stream): view events stream-static-broadcast-joined to the
    documents text, tokenizer explode ON THE STREAM, then a 10 s
    tumble count per keyword — the full search-keyword DWS path
    (RT/app/dws/KeywordStatsApp.java:56-88) with the explode running
    inside the streaming micro-batch plan."""
    from gmall_realtime_flink_spark.operators.windows import tumble_agg

    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    views = events.filter(F.col("event_type") == "view").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    joined = views.join(F.broadcast(docs), views["k"] == docs["doc_id"])
    words = joined.select(
        "ts",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("keyword"),
    ).filter(F.length("keyword") >= 2)
    agg = tumble_agg(
        words,
        ts_col="ts",
        duration="10 seconds",
        keys=["keyword"],
        aggs=[F.count(F.lit(1)).alias("ct")],
    )
    out = run_bounded(agg, spark)
    return out.filter(F.col("stt") < SENTINEL_CUTOFF).select(
        "stt", "edt", "keyword", "ct", F.lit("SEARCH").alias("source")
    )


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under Structured Streaming: per-user 10-minute
    inactivity-gap sessions via session_window + watermark. Sessions
    are the dynamic-gap window family tumble can't express; state =
    open sessions only, closed by watermark passage (the same eviction
    bound as tumble windows). Equals the batch `user_sessions` query
    on bounded input."""
    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    agg = (
        events.groupBy(
            "user_id", F.session_window("ts", "10 minutes").alias("w")
        )
        .agg(F.count("*").alias("event_ct"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("edt"),
            "event_ct",
        )
    )
    out = run_bounded(agg, spark)
    # sentinel rows (user_id = -1) all land in one far-future session —
    # the stt cutoff drops exactly that
    return out.filter(F.col("stt") < SENTINEL_CUTOFF)


def streaming_uv_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 via the built-in streaming dedup operator: dropDuplicates on
    (user_id, visit_date) — the idiomatic Spark form SURVEY §2.8 names
    next to the exact-TTL applyInPandasWithState version
    (`state.uv_dedup_stream`). Output is the distinct key set (which
    physical row is kept is arrival-order-dependent, so only the keys
    are emitted — deterministic under any partitioning). State
    eviction note: built-in dedup state evicts only when the
    watermarked event-time column is part of the key; the exact-TTL
    variant is the production path for day-bucketed keys."""
    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path)
    pairs = events.withColumn("visit_date", F.date_format("ts", "yyyy-MM-dd"))
    dedup = pairs.dropDuplicates(["user_id", "visit_date"]).select(
        "user_id", "visit_date"
    )
    out = run_bounded(dedup, spark)
    return out.filter(F.col("visit_date") < SENTINEL_CUTOFF)


def streaming_uv_dropdup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 via dropDuplicatesWithinWatermark (Spark 3.5+): dedup state
    is bounded by the watermark delay even though the event-time column
    is NOT part of the key — the missing piece that makes built-in
    streaming dedup production-safe for unbounded keys (state for a
    user evicts `delay` after their last event, i.e. the reference's
    1-day TTL ValueState, RT/app/dwm/UniqueVisitApp.java:60-78,
    expressed as a built-in operator instead of hand-rolled state).
    The delay (2 days) exceeds the bounded input's span, so no key
    re-emits and the output equals batch DISTINCT — on an unbounded
    stream a key CAN legitimately re-emit after eviction, which is
    exactly the daily-UV re-count semantics."""
    path = events_with_sentinel(spark, sf_dir, gap_ms=0)
    events = stream_events(spark, path, watermark="2 days")
    dedup = events.dropDuplicatesWithinWatermark(["user_id"]).select(
        "user_id"
    )
    out = run_bounded(dedup, spark)
    # null-safe sentinel drop: NULL is a real dedup key (one NULL-user
    # row emits, matching batch DISTINCT); `>= 0` would swallow it
    return out.filter(~F.col("user_id").eqNullSafe(-1))


def streaming_order_wide_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 as a stream-stream LEFT OUTER interval join — beyond the
    reference: Flink's intervalJoin is inner-only (OrderWideApp would
    need a CoProcessFunction + timer to emit unmatched orders); Spark
    emits the null-padded left rows natively once the watermark passes
    `o_ts + upper`, bounding state the same way. A far-future sentinel
    row per stream pushes the final watermark past every real order so
    the last unmatched rows flush on bounded input (the outer-join
    analogue of the ST3 timer sentinel)."""
    import pandas as pd

    orders_schema = warehouse_stream_schema(spark, sf_dir, "orders")
    lineitem_schema = warehouse_stream_schema(spark, sf_dir, "lineitem")
    far = pd.Timestamp("2030-01-01")

    def _far_for(schema, name):
        # match the SOURCE's physical type: the legacy nanos layout
        # stores the ts column as int64 ns, so the sentinel must too
        if isinstance(schema[name].dataType, T.LongType):
            return int(far.value)
        return far

    def _mut_o(row):
        row["o_orderkey"] = -1
        row["o_orderdate"] = _far_for(orders_schema, "o_orderdate")

    def _mut_l(row):
        row["l_orderkey"] = -2
        row["l_shipdate"] = _far_for(lineitem_schema, "l_shipdate")

    o = (
        spark.readStream.schema(orders_schema)
        .parquet(stage_table_with_sentinel(sf_dir, "orders", _mut_o))
        .withColumn("o_ts", ts_as_timestamp(orders_schema, "o_orderdate"))
        .withWatermark("o_ts", "0 seconds")
        .alias("o")
    )
    l = (
        spark.readStream.schema(lineitem_schema)
        .parquet(stage_table_with_sentinel(sf_dir, "lineitem", _mut_l))
        .withColumn("l_ts", ts_as_timestamp(lineitem_schema, "l_shipdate"))
        .withWatermark("l_ts", "0 seconds")
        .alias("l")
    )
    joined = interval_join_stream(
        o,
        l,
        on=F.col("o.o_orderkey") == F.col("l.l_orderkey"),
        left_ts=F.col("o_ts"),
        right_ts=F.col("l_ts"),
        lower="0 seconds",
        upper="30 days",
        how="left_outer",
    )
    out = run_bounded(
        joined.select(
            "o.o_orderkey",
            "l.l_linenumber",
            "l.l_partkey",
            F.date_format("o_ts", "yyyy-MM-dd").alias("order_date"),
            F.date_format("l_ts", "yyyy-MM-dd").alias("ship_date"),
            F.round("o.o_totalprice", 2).alias("total_amount"),
            F.round("l.l_extendedprice", 2).alias("split_amount"),
        ),
        spark,
    )
    return out.filter(F.col("o_orderkey") >= 0)


def streaming_token_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as STREAMING STATE: the token stream's d×w
    counter grid is a streaming groupBy (r, bucket) — exactly the
    constant-memory accumulation CM was designed for (state is at
    most d·w counters no matter how long the stream runs, vs
    |vocabulary| keys for an exact streaming count). The grid runs to
    completion on the bounded stream (complete mode, counters merge
    across micro-batches because sums are associative), then the
    top-10 probe estimates read the finished grid exactly like the
    batch `token_countmin` — same oracle: the grid's final counts are
    batch-identical under any batch slicing.
    """
    from gmall_realtime_flink_spark.operators.dedup import tokenize
    from gmall_realtime_flink_spark.operators.sketches import (
        countmin_cells,
        countmin_probe,
    )

    docs_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_table_dir(sf_dir, "documents"))
    )
    toks = stream.select(F.explode(tokenize(F.col("text"))).alias("item"))
    cells = run_bounded(
        countmin_cells(toks, item_col="item"), spark, output_mode="complete"
    )
    # probe selection + truth: the batch accuracy audit over the same
    # corpus (production drops this — the grid IS the answer); shares
    # countmin_probe with the batch entry so salt format and
    # tie-breaks can never drift from the common oracle
    batch_toks = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select(F.explode(tokenize(F.col("text"))).alias("item"))
    return countmin_probe(cells, batch_toks, item_col="item")


# Crash-injection seam for the admission sink, same contract as
# topology.FAULT_AFTER_WRITE: when set, called with (out_dir,
# batch_id) AFTER the batch's parquet commit and BEFORE foreachBatch
# returns — the at-least-once window where data is durable but the
# source offset is not. Never set outside tests.
ADMISSION_FAULT = None


def streaming_dedup_minhash(
    spark: SparkSession, sf_dir: str, base: str | None = None
) -> DataFrame:
    """Incremental NEAR-dup admission under Structured Streaming: new
    documents (source = src0) arrive as a file stream; each
    micro-batch is MinHash-banded against the STATIC corpus
    (stream-static shape, same operator body as the batch
    `dedup_incremental_minhash`: lsh_candidates_cross + exact-Jaccard
    verify at J >= 0.5), and admitted doc_ids append to the sink.

    No cross-batch state is needed — admission is new-doc × corpus
    only, so the bounded result equals the batch query under ANY
    batch slicing (each doc's verdict depends only on itself and the
    static corpus). At 100 TB the corpus band rows are a persisted
    band-hash-partitioned index re-probed per trigger; the corpus is
    signed once, never per batch.
    """
    from gmall_realtime_flink_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidates_cross,
        minhash_signatures,
    )

    docs_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    corpus = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("source") != "src0")
        .select("doc_id", "text")
        .persist()
    )
    # persist = the "signed once" claim: without it each foreachBatch
    # re-executes the md5-heavy signature lineage over the whole
    # corpus (N re-signings for N micro-batches)
    corpus_sigs = minhash_signatures(corpus).persist()
    # `base` (tests): stable out/checkpoint/staging dirs so a crashed
    # run can RESTART and resume from its committed offsets — the
    # crash-replay path the batch_id overwrite exists for. Default:
    # fresh dirs per call (a normal bounded run).
    if base is None:
        base = tempfile.mkdtemp(prefix="dedup_minhash_stream_")
    out_dir = os.path.join(base, "admitted")
    ckpt_dir = os.path.join(base, "ckpt")
    src_dir = os.path.join(base, "src")
    if not os.path.isdir(src_dir):
        os.makedirs(src_dir)
        os.symlink(
            os.path.abspath(os.path.join(sf_dir, "documents.parquet")),
            os.path.join(src_dir, "part-000.parquet"),
        )
    # pre-create so the final read succeeds (as typed-empty) even if
    # no micro-batch contained any src0 doc
    os.makedirs(out_dir, exist_ok=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.filter(F.col("source") == "src0")
        cand = lsh_candidates_cross(
            minhash_signatures(new), corpus_sigs
        ).select(
            F.col("new_id").alias("doc_a"), F.col("old_id").alias("doc_b")
        )
        docs_union = new.select("doc_id", "text").unionByName(
            corpus.select("doc_id", "text")
        )
        rejected = (
            jaccard_verify(cand, docs_union, threshold=0.5)
            .select(F.col("doc_a").alias("doc_id"))
            .distinct()
        )
        # Idempotent sink: partition by batch_id and dynamically
        # overwrite — a retried micro-batch replaces its OWN partition
        # instead of appending duplicates (foreachBatch is
        # at-least-once; this makes the sink effectively-once).
        new.select("doc_id").join(
            rejected, "doc_id", "left_anti"
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode(
            "overwrite"
        ).option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(
            "batch_id"
        ).parquet(
            out_dir
        )
        if ADMISSION_FAULT is not None:
            ADMISSION_FAULT(out_dir, batch_id)

    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        corpus_sigs.unpersist()
        corpus.unpersist()
    # Explicit schema (doc_id's type taken from the source table): if
    # no micro-batch contained src0 docs nothing was written, and
    # schema inference would fail — an empty typed result is the
    # correct answer in that case.
    out_schema = T.StructType(
        # LongType to match the lit().cast("long") on the write side:
        # foreachBatch epoch ids exceed 2^31 on long-lived streams, and
        # a bare lit(int) would silently flip Integer->Long mid-stream.
        [docs_schema["doc_id"], T.StructField("batch_id", T.LongType())]
    )
    return spark.read.schema(out_schema).parquet(out_dir).select("doc_id")


def streaming_dedup_semantic(
    spark: SparkSession, sf_dir: str, base: str | None = None
) -> DataFrame:
    """Semantic (SemDeDup) admission under Structured Streaming — the
    embedding-space member of the streaming dedup family (exact /
    MinHash / substring): new vectors (the top decile by vec_id, the
    dedup_incremental id-split convention) arrive as a file stream;
    each micro-batch is assigned to FROZEN prefix-trained centroids
    (a pure broadcast-K scan) and verdicted against the prefix's
    stored SURVIVORS only.

    Verdict = same-cell survivor with cosine >= threshold — new×new
    batch pairs are deliberately out of scope so the verdict depends
    only on (vector, static state) and the bounded result equals the
    batch oracle under ANY micro-batch slicing (the same
    slicing-invariance contract as streaming_dedup_substring; own-
    batch pairs are the batch layer's `dedup_semantic_incremental`).

    At 100 TB the admission state (K×dim centroids + the survivor
    table, cell-partitioned) is built ONCE and persisted — per-trigger
    cost is |batch|·K cosines plus the batch's survivor-cell pairs;
    the stored corpus is never re-verdicted
    (operators/similarity.semantic_admission_state / semantic_admit).
    """
    from gmall_realtime_flink_spark.operators.similarity import (
        semantic_admission_state,
        semantic_admit,
    )

    emb_schema = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).schema
    full = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    split, cent, surv = semantic_admission_state(
        full, threshold=0.4, split_frac=0.9
    )
    # persist = the "state built once" claim: without it each
    # foreachBatch re-runs the whole prefix kmeans + survivor verdict.
    # Materialize EAGERLY (count) before the stream starts: lazily,
    # the first micro-batch pays the whole prefix kmeans + survivor
    # build inside its trigger (measured at skew-sf1/8 slices: 25 s
    # first trigger vs 0.9 s steady-state p50 — SEMANTIC_LATENCY) and
    # the latency SLA story starts with an outlier that isn't
    # admission cost at all.
    cent = cent.persist()
    surv = surv.persist()
    cent.count()
    surv.count()

    if base is None:
        base = tempfile.mkdtemp(prefix="dedup_semantic_stream_")
    out_dir = os.path.join(base, "verdicts")
    ckpt_dir = os.path.join(base, "ckpt")
    src_dir = os.path.join(base, "src")
    if not os.path.isdir(src_dir):
        os.makedirs(src_dir)
        os.symlink(
            os.path.abspath(os.path.join(sf_dir, "embeddings.parquet")),
            os.path.join(src_dir, "part-000.parquet"),
        )
    os.makedirs(out_dir, exist_ok=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.filter(F.col("vec_id") >= F.lit(split))
        verdicts = semantic_admit(
            new, cent, surv, threshold=0.4, own_batch=False
        )
        # idempotent sink: a retried micro-batch replaces its OWN
        # partition (foreachBatch is at-least-once)
        verdicts.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(out_dir)

    stream = (
        spark.readStream.schema(emb_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        cent.unpersist()
        surv.unpersist()
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.LongType()),
        T.StructField("max_lower_sim", T.DoubleType()),
        T.StructField("kept", T.BooleanType()),
        T.StructField("batch_id", T.LongType()),
    ])
    return (
        spark.read.schema(out_schema)
        .parquet(out_dir)
        .select("vec_id", "cell", "max_lower_sim", "kept")
    )


def streaming_dedup_substring(
    spark: SparkSession, sf_dir: str, base: str | None = None, k: int = 8
) -> DataFrame:
    """Exact-substring admission marking under Structured Streaming:
    new documents (source = src0) arrive as a file stream; each
    micro-batch's k-gram occurrences are probed (LEFT SEMI) against
    the STATIC corpus's distinct gram-digest index, and the covered
    positions merge into maximal spans (operators/dedup
    spans_from_hits) appended per batch.

    Verdict = new-doc grams PRESENT IN THE STATIC CORPUS only —
    batch-internal (new x new) repeats are deliberately out of scope
    here so the verdict depends only on (doc, static corpus) and the
    bounded result equals the batch oracle under ANY micro-batch
    slicing (the same slicing-invariance contract as
    streaming_dedup_minhash; new x new repeats are the batch layer's
    `dedup_substring_incremental`). Islands are computable per batch
    because a file-stream row (one whole document) never splits
    across micro-batches.

    At 100 TB the corpus gram index is built ONCE (persisted here;
    a gh-partitioned table in production) — per-trigger cost is the
    batch's grams + one semi-join probe, proportional to ingest, not
    corpus."""
    from gmall_realtime_flink_spark.operators.dedup import (
        spans_from_hits,
        substring_gram_occurrences,
    )

    docs_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    corpus = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("source") != "src0")
        .select("doc_id", "text")
    )
    corpus_ghs = (
        substring_gram_occurrences(corpus, k=k).select("gh").distinct()
        .persist()
    )
    if base is None:
        base = tempfile.mkdtemp(prefix="dedup_substring_stream_")
    out_dir = os.path.join(base, "spans")
    ckpt_dir = os.path.join(base, "ckpt")
    src_dir = os.path.join(base, "src")
    if not os.path.isdir(src_dir):
        os.makedirs(src_dir)
        os.symlink(
            os.path.abspath(os.path.join(sf_dir, "documents.parquet")),
            os.path.join(src_dir, "part-000.parquet"),
        )
    os.makedirs(out_dir, exist_ok=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.filter(F.col("source") == "src0")
        occ = substring_gram_occurrences(new, k=k)
        hits = occ.join(corpus_ghs, "gh", "left_semi").select(
            "doc_id", "pos"
        )
        spans_from_hits(hits, k).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(out_dir)

    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        corpus_ghs.unpersist()
    out_schema = T.StructType([
        docs_schema["doc_id"],
        T.StructField("span_start", T.LongType()),
        T.StructField("span_end", T.LongType()),
        T.StructField("span_len", T.LongType()),
        T.StructField("batch_id", T.LongType()),
    ])
    return (
        spark.read.schema(out_schema).parquet(out_dir)
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup under Structured Streaming — the incremental-ingest
    form of the batch `dedup_exact`: documents arrive as a file stream
    and a streaming groupBy on the content hash maintains
    (keep_doc_id = min, dup_ct = count) state across micro-batches.
    min() rather than dropDuplicates keeps the representative
    deterministic regardless of arrival/partition order, so the
    bounded result is bit-identical to the batch query. State is the
    distinct-hash set — at 100 TB this runs keyed on a uniform
    128-bit hash (skew-free) with RocksDB state off-heap.
    """
    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_table_dir(sf_dir, "documents"))
    )
    agg = stream.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("dup_ct"),
    )
    return run_bounded(agg, spark, output_mode="complete")


def streaming_route_config_reload(
    spark: SparkSession,
    events_dir: str,
    config_path: str,
    out_dir: str,
    after_batch=None,
) -> None:
    """S8's *dynamic* half — Flink's BroadcastProcessFunction keeps the
    routing config as broadcast state that an operator can update
    mid-stream (the reference polls MySQL table_process every 5 s,
    RT/app/func/TableProcessFunction.java:43-64). Spark analogue: the
    config table is re-read INSIDE foreachBatch, so each micro-batch
    joins the config as of its own processing time — update the config
    parquet between batches and later events route by the new rules.
    `maxFilesPerTrigger=1` makes file := micro-batch, and
    `after_batch(batch_id)` (called once a batch's write commits) is
    where a test swaps the config — the next batch then observes it,
    exactly like Flink's broadcast-state update between elements.
    """
    from gmall_realtime_flink_spark.operators.routing import (
        route_with_config,
    )

    events = stream_events(spark, events_dir, max_files_per_trigger=1)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        config = spark.read.parquet(config_path)
        routed = route_with_config(
            batch_df.withColumn("op", F.lit("insert")),
            config,
            source_col="event_type",
            type_col="op",
        ).select("event_id", "event_type", "sink_table")
        routed.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_dir)
        if after_batch is not None:
            after_batch(batch_id)

    q = (
        events.writeStream.foreachBatch(write)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_multimodal_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multimodal feature extraction under Structured Streaming: the
    documents arrive as a file stream, the binary payload is attached
    and features are extracted by the SAME Arrow-batched mapInPandas
    as the batch `multimodal_features` (one transform body, two
    engines) — the continuous-ingest form of the media pipeline. The
    stateless mapInPandas runs inside each micro-batch plan; no state,
    no watermark needed."""
    from gmall_realtime_flink_spark.operators.multimodal import (
        attach_payload,
        extract_features,
    )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_table_dir(sf_dir, "documents"))
    )
    return run_bounded(extract_features(attach_payload(stream)), spark)


def streaming_multimodal_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL media decode under Structured Streaming: documents arrive
    as a file stream, per-doc PNG payloads are staged and decoded by
    the SAME Arrow-batched mapInPandas kernels as the batch
    `multimodal_decode_png` (attach_png_payload -> decode_media_stats
    — one codec body, two engines). Stateless inside each
    micro-batch; the decode is a narrow transform so continuous
    ingest decodes at file-arrival parallelism with no shuffle."""
    from gmall_realtime_flink_spark.operators.multimodal import (
        attach_png_payload,
        decode_media_stats,
    )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_table_dir(sf_dir, "documents"))
    )
    return run_bounded(
        decode_media_stats(attach_png_payload(stream)), spark
    )


def streaming_purchase_dim_temporal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temporal (point-in-time) dim enrichment ON A STREAM: the
    purchase stream joins the STATIC SCD2 dim with the validity band
    as a residual predicate — Spark's native stream-static join, so
    each micro-batch sees the dim version that was valid at each
    event's event time (Flink's FOR SYSTEM_TIME AS OF processing-time
    analogue, but event-time-correct and replay-stable). Oracle = the
    batch purchase_dim_temporal_join SQL."""
    from pyspark.sql import Window

    events = stream_events(spark, events_path(sf_dir))
    # Load the static side through the catalog, which normalizes BOTH
    # observed physical layouts of events.ts (TIMESTAMP(NANOS)-as-long
    # and TIMESTAMP_NTZ micros) to session TIMESTAMP — a raw
    # spark.read.parquet would leave bigint nanos under the legacy
    # layout and the band predicate would fail to resolve.
    from gmall_realtime_flink_spark import catalog

    batch_events = catalog.load(spark, sf_dir, "events")
    signup = batch_events.filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scd = signup.select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.col("event_id").alias("version_event"),
    )
    p = events.filter(F.col("event_type") == "purchase")
    joined = p.join(
        F.broadcast(scd),
        (p["user_id"] == scd["s_user"])
        & (p["ts"] >= scd["valid_from"])
        & (scd["valid_to"].isNull() | (p["ts"] < scd["valid_to"])),
    ).select(
        "event_id",
        "user_id",
        "version_event",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
            "version_from"
        ),
    )
    return run_bounded(joined, spark)


def streaming_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction under Structured Streaming: docs
    arrive as a file stream, pages are staged and block-classified by
    the SAME Arrow mapInPandas kernels as the batch doc_html_extract
    (attach_html_payload -> extract_main_text — one parser body, two
    engines). Stateless inside each micro-batch and slicing-invariant
    by construction: per-doc verdicts depend only on that doc's page,
    so continuous ingest extracts at file-arrival parallelism with no
    shuffle and no state."""
    from gmall_realtime_flink_spark.operators.html import (
        attach_html_payload,
        extract_main_text,
    )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_table_dir(sf_dir, "documents"))
    )
    return run_bounded(
        extract_main_text(attach_html_payload(stream)), spark
    )
