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
map-side-combined count.
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

    Output: one row per retained item per partition (duplicates across
    partitions possible — callers distinct() or semi-join). Retains
    every item whose in-partition count exceeds n_p/(capacity+1);
    unioned over partitions that covers every item with global count
    > n/(capacity+1).
    """
    schema = f"{item_col} string"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
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
        yield pd.DataFrame({item_col: list(counters.keys())})

    return items.select(item_col).mapInPandas(summarize, schema)


def heavy_hitters_exact(
    items: DataFrame, item_col: str, phi: Fraction
) -> DataFrame:
    """Exact items with frequency > phi, without a full distinct-key
    shuffle: MG candidates (capacity ceil(1/phi) guarantees no false
    negatives for frequency > phi), then an exact count of candidate
    rows only. The threshold compare is integer arithmetic
    (cnt * q > n * p for phi = p/q) — no float boundary.

    Returns (item_col, cnt) for every item with cnt/n > phi.
    """
    capacity = -(-phi.denominator // phi.numerator)  # ceil(1/phi)
    cands = misra_gries_candidates(items, item_col, capacity).distinct()
    total = items.agg(F.count(F.lit(1)).alias("__n"))
    confirmed = (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        confirmed.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt") * F.lit(phi.denominator)
            > F.col("__n") * F.lit(phi.numerator)
        )
        .select(item_col, "cnt")
    )
