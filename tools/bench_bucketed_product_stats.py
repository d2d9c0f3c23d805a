"""Measure the bucketed-table fix for product_stats' sf100 profile.

product_stats at sf100 runs 319 s because its grain (part x
ship-month, ~503M groups from 600M rows) defeats partial
aggregation: the exchange carries nearly the whole fact table, and
the exact countDistinct Expand doubles it. SCALE.md's design note
says the 100 TB answer is to PRE-BUCKET the fact table by part so
the aggregate is exchange-free. This tool proves that claim on real
data:

  1. writes lineitem as a Hive-bucketed table (bucketBy l_partkey,
     saveAsTable into spark-warehouse)
  2. runs the identical aggregate over the plain parquet and the
     bucketed table
  3. asserts the bucketed plan contains NO Exchange (HashPartitioning
     on l_partkey satisfies ClusteredDistribution(l_partkey,
     ship_month): a partitioning on a SUBSET of the grouping keys
     co-locates every group — including the two-phase distinct)
  4. prints min-of-N timings for both + the one-time bucketing cost

The trade it quantifies: one up-front shuffle at ingest (the
bucketed write) buys EVERY downstream part-grained aggregate and
join for free — the standard warehouse layout decision at 100 TB.

Usage: python tools/bench_bucketed_product_stats.py [sf_dir] [json_out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from gmall_realtime_flink_spark.catalog import load  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402

REPS = 3
TABLE = "lineitem_bucketed_bench"


def agg(l: DataFrame) -> DataFrame:
    # the product_stats aggregate (plans/gmall.py), minus the
    # broadcast dim join (identical in both variants, not the
    # object of measurement)
    l2 = l.select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        "l_orderkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
         + F.lit(0.5)).cast("long").cast("decimal(18,0)").alias("rev_c4"),
    )
    return l2.groupBy("l_partkey", "ship_month").agg(
        F.countDistinct("l_orderkey").alias("order_ct"),
        F.round(F.sum("l_quantity"), 2).alias("quantity"),
        F.round(F.sum("rev_c4") / 10000, 2).cast("double").alias("revenue"),
    )


def timed(df: DataFrame) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf1"
    json_out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="bucketed-product-stats")
    spark.sparkContext.setLogLevel("ERROR")

    plain = load(spark, sf_dir, "lineitem")
    n_buckets = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))

    t0 = time.perf_counter()
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    # DROP only clears this session's catalog; a previous run's
    # warehouse directory survives (fresh derby each session) and
    # blocks saveAsTable with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(os.path.join(wh, TABLE), ignore_errors=True)
    (
        plain.write.bucketBy(n_buckets, "l_partkey")
        .sortBy("l_partkey")
        .mode("overwrite")
        .saveAsTable(TABLE)
    )
    bucketing_sec = round(time.perf_counter() - t0, 3)

    bucketed = spark.table(TABLE)
    plan_plain = agg(plain)._jdf.queryExecution().executedPlan().toString()
    plan_bucketed = (
        agg(bucketed)._jdf.queryExecution().executedPlan().toString()
    )
    # AQE hasn't run yet on these strings; count Exchange nodes in the
    # initial physical plan — bucketing removes them STATICALLY
    ex_plain = plan_plain.count("Exchange hashpartitioning")
    ex_bucketed = plan_bucketed.count("Exchange hashpartitioning")

    sec_plain = timed(agg(plain))
    sec_bucketed = timed(agg(bucketed))

    out = {
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "exchanges_plain": ex_plain,
        "exchanges_bucketed": ex_bucketed,
        "agg_sec_plain": sec_plain,
        "agg_sec_bucketed": sec_bucketed,
        "speedup": round(sec_plain / sec_bucketed, 2),
        "one_time_bucketing_sec": bucketing_sec,
        "reps": REPS,
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    assert ex_bucketed == 0, (
        f"bucketed agg still has {ex_bucketed} exchange(s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
