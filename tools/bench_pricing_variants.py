"""One-off: benchmark pricing_summary decimal-cast variants at sf0.1
and hash-check each against the DuckDB oracle at sf0.01.

Variants:
  v0_current   — per-row cast to DECIMAL(28,4) inside agg (round-6 fix)
  v1_cents     — per-row long cents (round(x*1e4) cast long), long sums
  v2_cents_dec — long cents cast DECIMAL(18,0), decimal sums (long fast path)
  v3_dec18     — per-row cast DECIMAL(18,4), decimal sums
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from gmall_realtime_flink_spark.plans.gmall import load, pricing_summary  # noqa: E402
from gmall_realtime_flink_spark.plans import REGISTRY  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402

MONEY = "decimal(28,4)"


def base(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )


def v0_current(spark, sf_dir):
    return pricing_summary(spark, sf_dir)


def _finish(cents_sum_expr_scale4_as_money):
    pass


def v1_cents(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 10000, 0).cast("long").alias("ep_c"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("disc_c"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
        ).cast("long").alias("dp_c"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_c")
    disc = F.sum("disc_c")
    dp = F.sum("dp_c")

    def money(c):
        # exact: unscaled long -> DECIMAL(38,4) -> round 2 -> double
        return F.round(c.cast("decimal(38,0)") / 10000, 2).cast("double")

    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money(ep).alias("sum_base_price"),
        money(dp).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round((ep.cast("double") / 10000) / cnt, 4).alias("avg_price"),
        F.round((disc.cast("double") / 10000) / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def v2_cents_dec(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 10000, 0)
        .cast("long").cast("decimal(18,0)").alias("ep_c"),
        F.round(F.col("l_discount") * 10000, 0)
        .cast("long").cast("decimal(18,0)").alias("disc_c"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
        ).cast("long").cast("decimal(18,0)").alias("dp_c"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_c")
    disc = F.sum("disc_c")
    dp = F.sum("dp_c")

    def money(c):
        return F.round(c / 10000, 2).cast("double")

    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money(ep).alias("sum_base_price"),
        money(dp).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(ep.cast("double") / 10000 / cnt, 4).alias("avg_price"),
        F.round(disc.cast("double") / 10000 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def v3_dec18(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.col("l_extendedprice").cast("decimal(18,4)").alias("ep_d"),
        F.col("l_discount").cast("decimal(18,4)").alias("disc_d"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)").alias("dp_d"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_d")
    disc = F.sum("disc_d")
    dp = F.sum("dp_d")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(ep, 2).cast("double").alias("sum_base_price"),
        F.round(dp, 2).cast("double").alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(ep.cast("double") / cnt, 4).alias("avg_price"),
        F.round(disc.cast("double") / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def value_hash(df: DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    rows.sort(key=lambda t: tuple(str(x) for x in t))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def oracle_hash(sf_dir: str) -> str:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    sql = REGISTRY["pricing_summary"].oracle
    out = con.execute(sql).fetchdf()
    cols = sorted(out.columns)
    rows = [tuple(row[c] for c in cols) for _, row in out.iterrows()]
    rows.sort(key=lambda t: tuple(str(x) for x in t))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def main():
    spark = get_spark("bench_pricing_variants")
    variants = {
        "v0_current": v0_current,
        "v1_cents": v1_cents,
        "v2_cents_dec": v2_cents_dec,
        "v3_dec18": v3_dec18,
    }
    # correctness at sf0.01 vs duckdb
    sf001 = "/root/testdata/sf0.01"
    oh = oracle_hash(sf001)
    print(f"oracle hash sf0.01: {oh[:16]}")
    for name, fn in variants.items():
        vh = value_hash(fn(spark, sf001))
        print(f"  {name}: {'MATCH' if vh == oh else 'MISMATCH ' + vh[:16]}")
    # timing at sf0.1, noop write, min of 3
    sf01 = "/root/testdata/sf0.1"
    # warm
    base(spark, sf01).count()
    for name, fn in variants.items():
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf01).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"  {name}: min={min(times):.3f}s all={[round(t,3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()


def _cents(col):
    # half-up for positive values without BigDecimal: x*1e4 is within
    # ~1e-6 of an integer (source data has <=4dp), +0.5 then truncate
    return (col * 10000 + F.lit(0.5)).cast("long")


def v4_cents_floor(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        _cents(F.col("l_extendedprice")).alias("ep_c"),
        _cents(F.col("l_discount")).alias("disc_c"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("dp_c"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_c")
    disc = F.sum("disc_c")
    dp = F.sum("dp_c")

    def money(c):
        return F.round(c.cast("decimal(38,0)") / 10000, 2).cast("double")

    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money(ep).alias("sum_base_price"),
        money(dp).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(ep.cast("double") / 10000 / cnt, 4).alias("avg_price"),
        F.round(disc.cast("double") / 10000 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def v5_cents_floor_dec(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        _cents(F.col("l_extendedprice")).cast("decimal(18,0)").alias("ep_c"),
        _cents(F.col("l_discount")).cast("decimal(18,0)").alias("disc_c"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,0)").alias("dp_c"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_c")
    disc = F.sum("disc_c")
    dp = F.sum("dp_c")

    def money(c):
        return F.round(c / 10000, 2).cast("double")

    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        money(ep).alias("sum_base_price"),
        money(dp).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(ep.cast("double") / 10000 / cnt, 4).alias("avg_price"),
        F.round(disc.cast("double") / 10000 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def main2():
    spark = get_spark("bench_pricing_variants2")
    variants = {
        "v0_current": v0_current,
        "v4_cents_floor": v4_cents_floor,
        "v5_cents_floor_dec": v5_cents_floor_dec,
    }
    sf001 = "/root/testdata/sf0.01"
    oh = oracle_hash(sf001)
    for name, fn in variants.items():
        vh = value_hash(fn(spark, sf001))
        print(f"  {name}: {'MATCH' if vh == oh else 'MISMATCH ' + vh[:16]}")
    sf01 = "/root/testdata/sf0.1"
    base(spark, sf01).count()
    for name, fn in variants.items():
        times = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf01).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"  {name}: min={min(times):.3f}s all={[round(t,3) for t in times]}")
    spark.stop()


def v6_mixed(spark, sf_dir):
    l = base(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("ep_c2"),
        (F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("disc_c2"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5))
        .cast("long").cast("decimal(18,0)").alias("dp_c4"),
    )
    cnt = F.count(F.lit(1))
    ep = F.sum("ep_c2")
    disc = F.sum("disc_c2")
    dp = F.sum("dp_c4")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(ep.cast("decimal(38,0)") / 100, 2).cast("double").alias("sum_base_price"),
        F.round(dp / 10000, 2).cast("double").alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(ep.cast("double") / 100 / cnt, 4).alias("avg_price"),
        F.round(disc.cast("double") / 100 / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def main3():
    spark = get_spark("bench_pricing_variants3")
    variants = {
        "v0_current": v0_current,
        "v4_cents_floor": v4_cents_floor,
        "v6_mixed": v6_mixed,
    }
    sf001 = "/root/testdata/sf0.01"
    oh = oracle_hash(sf001)
    for name, fn in variants.items():
        vh = value_hash(fn(spark, sf001))
        print(f"  {name}: {'MATCH' if vh == oh else 'MISMATCH ' + vh[:16]}")
    sf01 = "/root/testdata/sf0.1"
    base(spark, sf01).count()
    for name, fn in variants.items():
        times = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf01).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(f"  {name}: min={min(times):.3f}s all={[round(t,3) for t in times]}")
    spark.stop()
