"""SparkSession factory with engine-wide configuration.

Single place where execution knobs are set so tests, bench, and the
driver contract all run under identical semantics.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast demotion/promotion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is a local-mode default only; at
  cluster scale AQE's ``advisoryPartitionSizeInBytes`` governs the
  post-shuffle layout, so the static number matters little.
- Arrow enabled: every pandas-UDF boundary (dedup sketches, stateful
  ops, multimodal decode) moves columnar batches, not pickled rows.
- Session timezone pinned to UTC so event-time windows, date_format
  and the DuckDB oracle (UTC-naive timestamps) agree bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

STATE_STORE_PROVIDERS = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "gmall_realtime_flink_spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Mirrors the reference's per-job env setup (e.g. the
    ``StreamExecutionEnvironment`` + ``setParallelism(4)`` preamble in
    gmall-realtime BaseLogAPP.java:43-45) as one shared factory.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # default = cpu count (right for the driver's sf0.1 gate); the
        # env override exists for scale-tier runs (sf100: 600M-row
        # shuffles at 32 partitions are ~1 GB/partition hash-agg state
        # — start at 256 and let AQE coalesce DOWN, mirroring how a
        # cluster sets initialPartitionNum high and lets
        # advisoryPartitionSizeInBytes govern)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g, not larger: an oversized heap in single-JVM local mode
        # produced multi-second G1 pauses that dwarfed sub-second plans
        # (measured: product_stats 2s steady at 16g, 3-17s jitter at 48g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate synthesizes `size(e)>0 AND
        # isnotnull(e)` for every explode and pushes it below the
        # projections, SUBSTITUTING the generator's full expression
        # tree into the filter. When e is a computed array (tokenize /
        # shingles / banding — higher-order functions outside
        # whole-stage codegen), the pushed filter re-evaluates the
        # whole pipeline per row before the projection computes it
        # again: measured 3x on the shingle kernel (explode 6.1 s ->
        # 0.44 s at sf0.1; dedup_jaccard_complete_capped 7.4 s ->
        # 1.25 s). The inferred filter is redundant by construction —
        # Generate drops empty/null inputs itself — so excluding the
        # rule cannot change results, only plans; its only upside
        # (early pruning of plain stored-column arrays below a join)
        # doesn't occur in this engine, where every hot explode is
        # over a computed array.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
        # default; read as long once here (catalog.load truncates ns → µs)
        # instead of mutating session conf inside a loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # streaming state: RocksDB provider (default) keeps large keyed
        # state (UV dedup at 100 TB scale) off-heap and spillable;
        # SPARK_GRAFT_STATE_STORE=hdfs flips to the in-memory
        # HDFS-backed default provider (both pass the checkpoint
        # recovery suite — tests/test_streaming.py parametrizes over
        # the two).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS[
                os.environ.get("SPARK_GRAFT_STATE_STORE", "rocksdb")
            ],
        )
    )
    # Generic env-gated conf for scale-tier runs, ';'-separated k=v.
    # Motivating case: a multi-query sf100 bench in ONE JVM accumulates
    # every query's shuffle files until the driver GCs the shuffle
    # dependencies — spark.cleaner.periodicGC.interval defaults to
    # 30min, longer than the whole run, so ~50 GB of dead shuffle data
    # piled up and the 11th query died spilling ("No space left on
    # device"). SPARK_GRAFT_CONF="spark.cleaner.periodicGC.interval=60s"
    # bounds that to one query's working set. Never set by the driver's
    # sf0.1 gate.
    # (values containing ';' cannot be expressed in this format)
    for pair in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, sep, v = pair.partition("=")
        if not sep:
            raise ValueError(
                f"SPARK_GRAFT_CONF pair {pair!r} has no '='; "
                "expected ';'-separated key=value pairs"
            )
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
