"""Sketch-prefilter + exact-confirm operators.

The pattern: a bounded-state streaming sketch runs per-partition to
produce a small CANDIDATE set with a one-sided guarantee (no false
negatives), then an exact second pass confirms only the candidates —
so the result is exact, but no stage ever holds unbounded per-key
state. This is the scale posture for "frequent items over 100 TB of
tokens": a naive groupBy(token) shuffles one row per distinct token
(billions for web text); the two-pass form shuffles only candidate
rows, already map-side-combined to <= |candidates| per partition.

Beyond-reference component (the reference, gmall-realtime-flink, has
no frequent-items operator); the algorithm is the classic Misra-Gries
summary with the mergeable-summaries batch merge (Agarwal, Cormode,
Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12): merging
two summaries of capacity m preserves the global undercount bound
n/(m+1). Guarantee used here: any item with global count > n/(m+1)
has positive residual count in at least one partition's summary
(pigeonhole over partitions), so the union of per-partition summaries
is a superset of every item with frequency > 1/(m+1).

The sketch pass is the one deliberate Python stage (Arrow-batched
mapInPandas, vectorized pandas value_counts per batch — never
per-row Python); the confirm pass is pure JVM: broadcast semi-join +
map-side-combined count. Exactly TWO scans of the input total: the
stream's total count rides out of the sketch pass as one sentinel row
per partition, so no third counting scan is needed.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries (capacity counters each).

    Output: one row per retained item per partition with `__pn` null
    (duplicates across partitions possible — callers distinct() or
    semi-join), plus ONE sentinel row per partition (`item_col` null,
    `__pn` = the partition's item count) so downstream can recover the
    stream's total without re-scanning. Retains every item whose
    in-partition count exceeds n_p/(capacity+1); unioned over
    partitions that covers every item with global count >
    n/(capacity+1).
    """
    schema = f"{item_col} string, __pn long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf[item_col].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > capacity:
                # mergeable-summaries trim: subtract the (capacity+1)-th
                # largest count from everything, drop non-positives
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v - cut > 0
                }
        yield pd.DataFrame(
            {
                item_col: list(counters.keys()) + [None],
                "__pn": [None] * len(counters) + [n],
            }
        )

    return items.select(item_col).mapInPandas(summarize, schema)


def heavy_hitters_exact(
    items: DataFrame, item_col: str, phi: Fraction
) -> DataFrame:
    """Exact items with frequency > phi, without a full distinct-key
    shuffle: MG candidates (capacity ceil(1/phi) guarantees no false
    negatives for frequency > phi), then an exact count of candidate
    rows only. The threshold compare is integer arithmetic
    (cnt * q > n * p for phi = p/q) — no float boundary.

    The summary is collected driver-side ONCE — it is metadata-sized
    by construction (at most capacity+1 rows per partition, e.g.
    31k rows for 1000 partitions at phi=1/30) — which both derives
    the total item count from the sentinel rows and feeds the
    candidate set back as a broadcast, keeping the whole operator at
    exactly two scans of the input.

    Returns (item_col, cnt) for every item with cnt/n > phi.
    """
    capacity = -(-phi.denominator // phi.numerator)  # ceil(1/phi)
    summary = misra_gries_candidates(items, item_col, capacity).collect()
    total = sum(r["__pn"] for r in summary if r[item_col] is None)
    cand_rows = sorted({r[item_col] for r in summary if r[item_col] is not None})
    spark = items.sparkSession
    cands = spark.createDataFrame(
        [(c,) for c in cand_rows], f"{item_col} string"
    )
    confirmed = (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return confirmed.filter(
        F.col("cnt") * F.lit(phi.denominator)
        > F.lit(int(total)) * F.lit(phi.numerator)
    ).select(item_col, "cnt")


def countmin_estimates(
    items: DataFrame,
    item_col: str = "tok",
    depth: int = 4,
    width: int = 256,
    probe_top: int = 10,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) with a built-in
    accuracy probe: build the d×w counter grid over the item stream,
    then estimate the top-`probe_top` items (by exact count, ties on
    item) and report estimate vs truth.

    The sketch is THE constant-memory frequency structure for
    unbounded streams: the grid partial-aggregates map-side to at
    most d·w rows regardless of corpus size (vs |vocabulary| rows
    for an exact groupBy), and the estimate min-over-rows never
    underestimates — `overestimate` is provably >= 0, which the
    oracle-gated output exhibits per item. Bucket assignment is the
    first md5 byte of the salted item ('r|' || item), the one hash
    both engines produce bit-identically; all arithmetic is integer.
    At 100 TB: one map-side-combined agg to d·w cells, probes ride a
    broadcast — no shuffle carries more than d·w rows past the
    exact-count agg used here only to pick and truth-check probes.
    """
    byte = lambda col: (  # noqa: E731 — local expression helper
        F.conv(F.substring(F.md5(col), 1, 2), 16, 10).cast("long")
        % width
    )
    salted = [
        byte(F.concat(F.lit(f"{r}|"), F.col(item_col))).alias(f"b{r}")
        for r in range(depth)
    ]
    w = items.select(F.col(item_col).alias("item"), *[
        s for s in salted
    ])
    stack_expr = ", ".join(f"{r}, b{r}" for r in range(depth))
    cells = (
        w.selectExpr("item", f"stack({depth}, {stack_expr}) as (r, bucket)")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_ct"))
    )
    exact = (
        w.groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_ct"))
        .orderBy(F.col("exact_ct").desc(), "item")
        .limit(probe_top)
    )
    probes = exact.select(
        "item",
        "exact_ct",
        *[
            byte(F.concat(F.lit(f"{r}|"), F.col("item"))).alias(f"b{r}")
            for r in range(depth)
        ],
    ).selectExpr(
        "item", "exact_ct", f"stack({depth}, {stack_expr}) as (r, bucket)"
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("item", "exact_ct")
        .agg(F.min("cell_ct").alias("cm_estimate"))
        .select(
            "item",
            "exact_ct",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_ct")).alias("overestimate"),
        )
    )
