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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy scan, schema from footer).

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    rejects by default; `get_spark` sets the legacy nanos-as-long conf,
    so we read it as long here and truncate ns → µs, matching DuckDB's
    TIMESTAMP_NS → TIMESTAMP semantics so both engines see identical
    microsecond values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
