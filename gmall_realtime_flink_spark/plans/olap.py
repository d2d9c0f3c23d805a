"""Remaining TPC-H plan shapes (Q8/Q9/Q11/Q13/Q15/Q17/Q19/Q21).

Each query exists for its *physical plan shape*, not its business
meaning — together they cover the Catalyst patterns the earlier
batches didn't: two-level conditional share (Q8), all-broadcast
star join (Q9), scalar-threshold re-aggregation (Q11), outer-join
fan-out histogram (Q13), scalar-max filter (Q15), correlated-average
predicate as a pre-aggregated join (Q17), disjunctive OR-of-ANDs
pushdown (Q19), and semi+anti self-joins on one fact (Q21).

Testdata deviations from canonical TPC-H are documented per query
(no partsupp / commitdate / receiptdate columns; p_retailprice is
the cost proxy).

Parity: every measure follows the registry rules — exact DECIMAL(28,4)
aggregation, round-then-cast, ``::BIGINT`` counts, threshold
comparisons in exact decimal so both engines classify identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.catalog import load
from gmall_realtime_flink_spark.functions.compat import MONEY, dec_sum
from gmall_realtime_flink_spark.plans.registry import register


def _rev(price: str = "l_extendedprice", disc: str = "l_discount") -> F.Column:
    """Row-level revenue in exact money decimal (cast AFTER the double
    multiply, same as the DuckDB oracle's CAST — both engines round the
    identical IEEE double, so the decimal is bit-identical)."""
    return (F.col(price) * (1 - F.col(disc))).cast(MONEY)


@register(
    "market_share",
    oracle="""
    SELECT yr,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                               ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT strftime(l.l_shipdate, '%Y') AS yr,
             ns.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4)) AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    )
    GROUP BY yr
    """,
    doc="TPC-H Q8 shape (national market share): within ASIA-customer "
    "trade, NATION_7-supplied revenue share per year. Two exact-decimal "
    "sums → one double division (IEEE-identical cross-engine). Plan: "
    "the only shuffle is lineitem⋈orders on orderkey; customer/nation/"
    "region/supplier all broadcast; conditional numerator folds into "
    "the same partial agg as the denominator.",
    tags=("join", "olap", "tpch"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").alias("l")
    o = load(spark, sf_dir, "orders").alias("o")
    c = load(spark, sf_dir, "customer").alias("c")
    nc = load(spark, sf_dir, "nation").alias("nc")
    ns = load(spark, sf_dir, "nation").alias("ns")
    r = load(spark, sf_dir, "region").alias("r")
    s = load(spark, sf_dir, "supplier").alias("s")
    j = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(F.broadcast(c), F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(F.broadcast(nc), F.col("c.c_nationkey") == F.col("nc.n_nationkey"))
        .join(
            F.broadcast(r),
            (F.col("nc.n_regionkey") == F.col("r.r_regionkey"))
            & (F.col("r.r_name") == "ASIA"),
        )
        .join(F.broadcast(s), F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .join(F.broadcast(ns), F.col("s.s_nationkey") == F.col("ns.n_nationkey"))
    )
    rev = _rev()
    zero = F.lit(0).cast(MONEY)
    num = F.when(F.col("ns.n_name") == "NATION_7", rev).otherwise(zero)
    return (
        j.groupBy(F.date_format("l.l_shipdate", "yyyy").alias("yr"))
        .agg(
            F.round(
                F.sum(num).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@register(
    "product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           strftime(l.l_shipdate, '%Y') AS yr,
           round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                          - p.p_retailprice * l.l_quantity
                     AS DECIMAL(28,4))), 2)::DOUBLE AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit by nation/year; testdata "
    "has no partsupp, so cost = p_retailprice×quantity, and no "
    "o_orderdate needed — shipdate year). Plan: ZERO shuffle joins — "
    "part/supplier/nation all broadcast against the lineitem scan, the "
    "LIKE filter prunes part before broadcast; single exchange at the "
    "final group agg. The all-broadcast star is the Q9 scale strategy.",
    tags=("join", "olap", "tpch"),
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").alias("l")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .alias("p")
    )
    s = load(spark, sf_dir, "supplier").alias("s")
    n = load(spark, sf_dir, "nation").alias("n")
    j = (
        l.join(F.broadcast(p), F.col("l.l_partkey") == F.col("p.p_partkey"))
        .join(F.broadcast(s), F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .join(F.broadcast(n), F.col("s.s_nationkey") == F.col("n.n_nationkey"))
    )
    profit = (
        F.col("l.l_extendedprice") * (1 - F.col("l.l_discount"))
        - F.col("p.p_retailprice") * F.col("l.l_quantity")
    )
    return (
        j.groupBy(
            F.col("n.n_name").alias("nation"),
            F.date_format("l.l_shipdate", "yyyy").alias("yr"),
        )
        .agg(dec_sum(profit).alias("profit"))
    )


@register(
    "important_parts",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(28,4))) AS val
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, round(val, 2)::DOUBLE AS part_value
    FROM per_part
    WHERE val * 1000 > (SELECT sum(val) FROM per_part)
    """,
    doc="TPC-H Q11 shape (important stock: parts whose traded value "
    "exceeds 0.1% of the total; testdata has no partsupp so value = "
    "lineitem revenue). Plan: ONE fact scan → per-part partial+final "
    "agg; the global total is a re-aggregation of the |parts|-sized "
    "result (never a second fact scan), broadcast back as a scalar. "
    "The threshold compare is exact decimal ×1000 (scale shift), so "
    "both engines keep identical parts.",
    tags=("agg", "olap", "tpch"),
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(F.sum(_rev()).alias("val"))
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") * 1000 > F.col("total"))
        .select(
            "l_partkey",
            F.round(F.col("val"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "customer_distribution",
    oracle="""
    SELECT o_ct, count(*)::BIGINT AS cust_ct
    FROM (
      SELECT c.c_custkey,
             count(o.o_orderkey)::BIGINT AS o_ct
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderdate >= DATE '1996-01-01'
      GROUP BY 1
    )
    GROUP BY 1
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "join so zero-order customers survive as o_ct=0 (the date filter "
    "keeps the outer side non-vacuous — every testdata customer has "
    "≥1 lifetime order), count(non-null) per customer, then a second "
    "tiny agg over the counts. Plan: one shuffle on custkey for the "
    "join+first agg; the histogram agg re-shuffles only |customers| "
    "rows.",
    tags=("join", "agg", "olap", "tpch"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").alias("c")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1996-01-01")
        .alias("o")
    )
    per_cust = (
        c.join(o, F.col("c.c_custkey") == F.col("o.o_custkey"), "left")
        .groupBy("c.c_custkey")
        .agg(F.count("o.o_orderkey").alias("o_ct"))
    )
    return per_cust.groupBy("o_ct").agg(F.count("*").alias("cust_ct"))


@register(
    "top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(28,4))) AS total
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           round(r.total, 2)::DOUBLE AS total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly per-supplier "
    "revenue, keep the max (scalar-subquery filter). Plan: pushed-down "
    "shipdate range on the scan, one agg on suppkey, the scalar max is "
    "a re-agg of the |suppliers| result broadcast back — no second "
    "fact scan. The max compare is on the EXACT decimal, so ties are "
    "cross-engine identical (all tied rows are kept, as in the spec).",
    tags=("agg", "olap", "tpch"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier").alias("s")
    rev = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total"))
    mx = rev.agg(F.max("total").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s.s_suppkey"))
        .select(
            "s.s_suppkey",
            "s.s_name",
            F.round(F.col("total"), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "small_qty_revenue",
    oracle="""
    WITH agg AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(28,4))) AS sum_qty,
             count(*)::BIGINT AS n
      FROM lineitem GROUP BY 1
    )
    SELECT count(*)::BIGINT AS line_ct,
           round(sum(CAST(l.l_extendedprice AS DECIMAL(28,4))), 2)::DOUBLE
             AS total_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#12'
    JOIN agg a  ON l.l_partkey = a.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(28,4)) * 5 * a.n < a.sum_qty
    """,
    doc="TPC-H Q17 shape (small-quantity orders): the correlated "
    "per-part AVG subquery re-expressed as a pre-aggregated join — "
    "`qty < 0.2*avg(qty)` becomes the exact-decimal cross-multiplied "
    "`5*qty*n < sum_qty`, so no float division decides membership. "
    "Plan: per-part agg shuffles once on partkey, the probe join "
    "reuses the same key (AQE can reuse the exchange), brand filter "
    "prunes part before its broadcast.",
    tags=("join", "agg", "olap", "tpch"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .alias("p")
    )
    agg = (
        l.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(MONEY)).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .withColumnRenamed("l_partkey", "a_partkey")
    )
    probe = l.alias("l").join(
        F.broadcast(p), F.col("l.l_partkey") == F.col("p.p_partkey")
    )
    j = probe.join(agg, F.col("l.l_partkey") == F.col("a_partkey")).filter(
        F.col("l.l_quantity").cast(MONEY) * 5 * F.col("n") < F.col("sum_qty")
    )
    return j.agg(
        F.count("*").alias("line_ct"),
        dec_sum(F.col("l.l_extendedprice")).alias("total_price"),
    )


@register(
    "bracket_revenue",
    oracle="""
    SELECT round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(28,4))), 2)::DOUBLE AS revenue,
           count(*)::BIGINT AS line_ct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive brackets): "
    "OR-of-AND predicate spanning both join sides. Plan: Catalyst "
    "derives the single-side implications — the part scan keeps "
    "`brand IN (...) AND size BETWEEN 1 AND 50`, the lineitem scan "
    "keeps `quantity BETWEEN 1 AND 40` (both visible as PushedFilters) "
    "— and evaluates the full disjunction as the join residual; part "
    "is broadcast so the OR never forces a shuffle.",
    tags=("join", "olap", "tpch"),
)
def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").alias("l")
    p = load(spark, sf_dir, "part").alias("p")
    j = l.join(F.broadcast(p), F.col("l.l_partkey") == F.col("p.p_partkey"))
    b1 = (
        (F.col("p.p_brand") == "Brand#12")
        & F.col("p.p_size").between(1, 15)
        & F.col("l.l_quantity").between(1, 21)
    )
    b2 = (
        (F.col("p.p_brand") == "Brand#23")
        & F.col("p.p_size").between(10, 30)
        & F.col("l.l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p.p_brand") == "Brand#3")
        & F.col("p.p_size").between(20, 50)
        & F.col("l.l_quantity").between(20, 40)
    )
    return j.filter(b1 | b2 | b3).agg(
        dec_sum(_rev()).alias("revenue"),
        F.count("*").alias("line_ct"),
    )


@register(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM lineitem l1
    JOIN orders o   ON l1.l_orderkey = o.o_orderkey
                   AND o.o_orderstatus = 'F'
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAYS)
    GROUP BY 1
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting: sole late "
    "shipper on a multi-supplier finished order; testdata lateness = "
    "shipped >60d after order date, no receipt/commit columns). Plan: "
    "LEFT SEMI (another supplier exists on the order) then LEFT ANTI "
    "(no OTHER late supplier) — both self-joins equi-keyed on "
    "l_orderkey with the suppkey<> as residual, so the three lineitem "
    "legs co-shuffle on the same key (AQE exchange reuse) and nothing "
    "is quadratic; supplier broadcast last, onto |late lines| rows.",
    tags=("join", "olap", "tpch"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier").alias("s")

    late_lines = (
        lineitem.alias("l")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").alias("o"),
            F.col("l.l_orderkey") == F.col("o.o_orderkey"),
        )
        .filter(
            F.col("l.l_shipdate")
            > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
    )
    l1 = late_lines.select(
        F.col("l.l_orderkey").alias("l_orderkey"),
        F.col("l.l_suppkey").alias("l_suppkey"),
    )
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late_lines.select(
        F.col("l.l_orderkey").alias("o3_orderkey"),
        F.col("l.l_suppkey").alias("o3_suppkey"),
    )
    multi = l1.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole = multi.join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(F.col("s.s_name").alias("s_name"))
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "dominant_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(28,4))) AS supp_qty
      FROM lineitem GROUP BY 1, 2),
    tot AS (
      SELECT l_partkey, sum(supp_qty) AS total_qty
      FROM ps GROUP BY 1)
    SELECT s.s_suppkey, s.s_name,
           count(*)::BIGINT AS dominated_parts
    FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    WHERE ps.supp_qty * 2 > tot.total_qty
    GROUP BY 1, 2
    """,
    doc="TPC-H Q20 shape (excess-concentration suppliers; no partsupp "
    "in testdata, so 'excess stock' becomes 'ships >50% of a part's "
    "total volume'): per-(part,supplier) aggregate, then the per-part "
    "total as a window over that aggregate (ONE fact scan — a "
    "ps-join-total formulation would replan ps per consumer and scan "
    "twice; the window input is already |part,supplier| small) — with "
    "the share threshold as an exact-decimal cross-multiplication "
    "(supp_qty*2 > total, no float division decides membership), then "
    "the supplier dim broadcast onto |dominant pairs|.",
    tags=("agg", "join", "olap", "tpch"),
)
def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").alias("s")
    # the per-part total is a WINDOW over the (part, supplier) agg, not
    # a self-join back onto it: a ps⋈tot formulation replans the ps
    # subtree per consumer (their pruned schemas differ, so exchange
    # reuse can't fire) and scans the fact twice — the window keeps it
    # to ONE fact scan with an exchange on l_partkey
    from pyspark.sql import Window

    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(MONEY)).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dom = ps.withColumn("total_qty", F.sum("supp_qty").over(w)).filter(
        F.col("supp_qty") * 2 > F.col("total_qty")
    )
    return (
        dom.join(F.broadcast(s), F.col("l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(
            F.col("s.s_suppkey").alias("s_suppkey"),
            F.col("s.s_name").alias("s_name"),
        )
        .agg(F.count("*").alias("dominated_parts"))
    )


@register(
    "returned_revenue_customers",
    oracle="""
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(28,4))), 2)::DOUBLE AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate <  DATE '1995-07-01'
        AND l.l_returnflag = 'R'
      GROUP BY 1, 2, 3)
    SELECT c_custkey, c_name, n_name, revenue, rk FROM (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk
      FROM agg)
    WHERE rk <= 20
    """,
    doc="TPC-H Q10 shape (returned-item revenue report): top-20 "
    "customers by returned revenue in a half-year window. Plan: the "
    "returnflag + date predicates push to the two fact scans, the "
    "orderkey join is the only fact shuffle, customer/nation "
    "broadcast AFTER the per-customer aggregate, and the top-20 is "
    "TakeOrderedAndProject on (rounded revenue, custkey) — "
    "deterministic ties, never a global sort.",
    tags=("join", "olap", "tpch"),
)
def returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer").alias("c")
    n = load(spark, sf_dir, "nation").alias("n")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-07-01")
        )
        .alias("o")
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .alias("l")
    )
    per_cust = (
        o.join(l, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .groupBy(F.col("o.o_custkey").alias("cust"))
        .agg(dec_sum(_rev()).alias("revenue"))
    )
    named = per_cust.join(
        F.broadcast(c), F.col("cust") == F.col("c.c_custkey")
    ).join(F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey"))
    top = named.orderBy(
        F.col("revenue").desc(), F.col("c.c_custkey")
    ).limit(20)
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("revenue").desc(), F.col("c.c_custkey")
    )
    return top.withColumn("rk", F.row_number().over(w)).select(
        F.col("c.c_custkey").alias("c_custkey"),
        F.col("c.c_name").alias("c_name"),
        F.col("n.n_name").alias("n_name"),
        "revenue",
        "rk",
    )


@register(
    "parts_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#12'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship; testdata has no "
    "partsupp — lineitem is the part↔supplier relation — and no "
    "comment column, so 'complaint' suppliers = negative acctbal): "
    "negated dim predicates + IN-list, a NOT IN anti-join against the "
    "excluded-supplier set, then count(DISTINCT supplier) per part "
    "group. Plan: part predicates prune the broadcast build side, the "
    "exclusion set broadcasts as LEFT ANTI (acctbal has no NULLs, so "
    "NOT IN == anti-join), and the distinct-count expands in-group "
    "after ONE shuffle on the group key.",
    tags=("join", "agg", "olap", "tpch"),
)
def parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").alias("l")
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#12")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .alias("p")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    j = (
        l.join(F.broadcast(p), F.col("l.l_partkey") == F.col("p.p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l.l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
    )
    return j.groupBy(
        F.col("p.p_brand").alias("p_brand"),
        F.col("p.p_type").alias("p_type"),
        F.col("p.p_size").alias("p_size"),
    ).agg(F.countDistinct("l.l_suppkey").alias("supplier_cnt"))


@register(
    "brand_price_iqr_udaf",
    oracle="""
    SELECT p_brand,
           round(quantile_cont(p_retailprice, 0.75)
                 - quantile_cont(p_retailprice, 0.25), 4) AS price_iqr,
           count(*)::BIGINT AS n
    FROM part GROUP BY p_brand
    """,
    doc="Grouped-aggregate pandas UDF (the UDAF surface of SURVEY "
    "§2.11, alongside scalar pandas UDFs, the UDTF, and "
    "applyInPandasWithState): per-brand interquartile range of part "
    "prices, computed by an Arrow-batched numpy kernel with the same "
    "linear interpolation as quantile_cont. Built-in percentile covers "
    "this exact query (price_quantiles) — the point here is the "
    "GROUPED_AGG pandas UDF machinery under the oracle gate: partial "
    "batches stream per group through Arrow, no row-at-a-time Python. "
    "At 100 TB: one shuffle on the group key, group payloads bounded "
    "by group size (use the built-in sketch for heavy groups).",
    tags=("udaf", "pandas-udf", "quantile"),
)
def brand_price_iqr_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # kernels live in functions/udaf.py (type-hint pandas_udf form);
    # pairing the custom kernel with a second pandas aggregate keeps
    # this a single-pass, single-shuffle aggregation — a built-in
    # count() can't share the agg (INVALID_PANDAS_UDF_PLACEMENT)
    from gmall_realtime_flink_spark.functions.udaf import (
        group_count,
        price_iqr,
    )

    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        price_iqr("p_retailprice").alias("price_iqr"),
        group_count("p_retailprice").alias("n"),
    )


@register(
    "basket_part_pairs",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, count(*)::BIGINT AS together_ct
    FROM pairs GROUP BY part_a, part_b
    HAVING count(*) >= 2
    """,
    doc="Market-basket co-occurrence: part pairs ordered together in "
    ">= 2 orders — the a-priori candidate-pair step. Plan: distinct "
    "(order, part) first (collapses line-level duplicates), then a "
    "self-equi-join ON THE ORDER KEY — pair fan-out is bounded by "
    "(parts-per-order choose 2) per order, never a global cross "
    "product; one shuffle on orderkey, one on the pair for the count. "
    "At 100 TB the HAVING floor is what keeps the output sparse.",
    tags=("olap", "join", "basket"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together_ct"))
        .filter(F.col("together_ct") >= 2)
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           count(*)::BIGINT AS transition_ct
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="User-journey transition matrix (the Markov-chain view of the "
    "event stream): per-user consecutive event-type pairs counted "
    "over the whole corpus — the input to funnel discovery and "
    "next-action models. Plan: one shuffle on user_id for the lead() "
    "window, then a tiny |types|^2 aggregate; the window never "
    "re-sorts more than one user's events per task.",
    tags=("olap", "window", "sequence"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transition_ct"))
    )
