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

# dims small enough to broadcast at any realistic scale factor
# (region=5, nation=25 rows fixed; customer/supplier/part grow with SF
#  but stay << fact tables — still broadcastable at sf<=1, bucketed
#  co-partitioned join beyond that; see SCALE.md)
BROADCAST_DIMS = ("region", "nation", "customer", "supplier", "part")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (lazy scan, schema from footer).

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    rejects by default; we read it as long (legacy conf, runtime-safe)
    and truncate ns → µs, matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    semantics so both engines see identical microsecond values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql` queries."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
