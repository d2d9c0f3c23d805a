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
        return normalize_timestamps(df)
    return normalize_timestamps(spark.read.parquet(table_path(sf_dir, name)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
