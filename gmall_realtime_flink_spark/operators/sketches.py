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

    NULL items are dropped up front: a NULL would collide with the
    per-partition sentinel row, and pandas value_counts silently drops
    NaN — so without the filter a NULL item would inflate n (the
    undercount denominator) while never being a candidate.
    """
    items = items.filter(F.col(item_col).isNotNull())
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
    # Enforce the metadata-size bound instead of trusting the caller:
    # the driver collect is <= (capacity+1) rows per sketch partition,
    # so cap the number of sketch partitions at
    # max_summary_rows/(capacity+1). coalesce (no shuffle) widens each
    # partition — MG memory stays O(capacity) per task regardless, and
    # the mergeable-summaries guarantee is per-partition, so fewer,
    # larger partitions only TIGHTEN the candidate superset.
    max_summary_rows = 1_000_000
    max_parts = max(1, max_summary_rows // (capacity + 1))
    # Coalesce ONLY the frame fed to the sketch pass: coalesce
    # propagates upstream, so reusing the coalesced frame for the
    # confirm scan would throttle it (and the source scan) to
    # max_parts-way parallelism — e.g. ~9 tasks at phi=1/100000.
    # The confirm pass joins the ORIGINAL items at full parallelism.
    sketch_items = items
    if sketch_items.rdd.getNumPartitions() > max_parts:
        sketch_items = sketch_items.coalesce(max_parts)
    summary = misra_gries_candidates(sketch_items, item_col, capacity).collect()
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
    return countmin_probe(
        countmin_cells(items, item_col, depth, width),
        items,
        item_col,
        depth,
        width,
        probe_top,
    )


def _cm_bucket(col, r: int, width: int):
    """Row-r bucket of the salted item: first md5 byte of 'r|item' —
    the one hash every engine reproduces bit-identically. One byte
    spans 256 values, so width > 256 would leave buckets 256..width-1
    permanently empty and silently degrade the e/w error bound — fail
    loudly instead."""
    if width > 256 or width < 1:
        raise ValueError(
            f"width must be in 1..256 (one md5 byte), got {width}"
        )
    salted = F.concat(F.lit(f"{r}|"), col)
    return (
        F.conv(F.substring(F.md5(salted), 1, 2), 16, 10).cast("long") % width
    )


def _cm_stack(depth: int) -> str:
    return ", ".join(f"{r}, b{r}" for r in range(depth))


def countmin_cells(
    items: DataFrame, item_col: str = "tok", depth: int = 4, width: int = 256
) -> DataFrame:
    """The d×w counter grid as a (r, bucket, cell_ct) frame — works
    identically on a batch OR a streaming items frame (the groupBy
    becomes streaming state in the latter; counter sums merge across
    micro-batches because they are associative)."""
    w = items.select(
        F.col(item_col).alias("item"),
        *[
            _cm_bucket(F.col(item_col), r, width).alias(f"b{r}")
            for r in range(depth)
        ],
    )
    return (
        w.selectExpr(
            "item", f"stack({depth}, {_cm_stack(depth)}) as (r, bucket)"
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_ct"))
    )


def countmin_probe(
    cells: DataFrame,
    items: DataFrame,
    item_col: str = "tok",
    depth: int = 4,
    width: int = 256,
    probe_top: int = 10,
) -> DataFrame:
    """Estimate the top-`probe_top` items (by exact count, ties on
    item) from a prebuilt grid and report estimate vs truth — shared
    by the batch and streaming Count-Min entries so salt format and
    tie-breaks can never desynchronize from the common oracle."""
    exact = (
        items.select(F.col(item_col).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_ct"))
        .orderBy(F.col("exact_ct").desc(), "item")
        .limit(probe_top)
    )
    probes = exact.select(
        "item",
        "exact_ct",
        *[
            _cm_bucket(F.col("item"), r, width).alias(f"b{r}")
            for r in range(depth)
        ],
    ).selectExpr(
        "item", "exact_ct", f"stack({depth}, {_cm_stack(depth)}) as (r, bucket)"
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


def hll_cardinality(
    items: DataFrame,
    item_col: str = "item",
    m: int = 256,
) -> DataFrame:
    """HyperLogLog cardinality estimate (Flajolet et al. '07) with
    fully deterministic cross-engine arithmetic — the cardinality
    member of the sketch triad (Misra-Gries heavy hitters, Count-Min
    frequencies, HLL distinct counts).

    Register derivation is pure string/integer work on the md5 hex —
    no engine-specific 64-bit hash, no float until one final guarded
    step: bucket = first digest byte; rho = 1 + leading zero BITS of
    the next 15 hex chars (4·leading-zero-chars + a 16-way CASE on
    the first nonzero char, capped at 61). Registers max per bucket;
    EMPTY buckets materialize via a range join (they carry 2^0 terms
    and the small-range signal v_zero). The harmonic sum is EXACT
    integer: term = 2^(40 - min(M,40)) summed as BIGINT (<= 2^47, so
    the final int->double cast is exact), making the only float step
    alpha·m²·2^40 / sum — identical literals, one correctly-rounded
    division per engine. Output one row: (m, v_zero, raw_estimate,
    exact_distinct, rel_error). The linear-counting small-range
    correction (m·ln(m/v_zero) when raw < 2.5m and v_zero > 0) is
    deliberately left to the consumer: it is the only transcendental
    in HLL and would hang bit-parity on ln() ulps; v_zero is reported
    so it is a driver-side one-liner.

    At 100 TB: the register agg map-side-combines to <= m rows, the
    truth column (exact countDistinct, here for the accuracy probe)
    is the only corpus-scale shuffle — drop it in production and the
    sketch IS the constant-memory answer.
    """
    # leading zero bits of the first nonzero hex char (1-f -> 3..0)
    char_lz = (
        "CASE __fnz WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END"
    )
    if m > 256 or m < 1:
        # bucket comes from one md5 byte; m > 256 would leave buckets
        # 256..m-1 permanently zero, breaking the alpha formula's
        # uniform-bucket assumption — refuse rather than degrade.
        raise ValueError(f"m must be in 1..256 (one md5 byte), got {m}")
    h = F.md5(F.col("item").cast("string"))
    bucket = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    ).alias("bucket")
    sub = F.substring(h, 3, 15)
    lz_chars = F.length(F.regexp_extract(sub, "^0*", 0))
    first_nz = F.substring(
        F.regexp_replace(sub, "^0*", ""),
        1,
        1,
    )
    rho = (
        F.when(lz_chars == 15, F.lit(61))
        .otherwise(
            lz_chars * 4
            + F.expr(char_lz)
            + F.lit(1)
        )
        .alias("rho")
    )
    regs = (
        items.select(F.col(item_col).alias("item"))
        .select(bucket, first_nz.alias("__fnz"), F.col("item"))
        .select("bucket", rho, "item")
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )
    spark = items.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select("bucket", F.coalesce("M", F.lit(0)).alias("M"))
    )
    term = F.expr("shiftleft(cast(1 as bigint), 40 - least(M, 40))")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = full.agg(
        F.sum(term).cast("long").alias("__sum"),
        F.sum(F.when(F.col("M") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
    )
    truth = items.agg(
        F.countDistinct(item_col).cast("long").alias("exact_distinct")
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(2**40))
        / F.col("__sum").cast("double")
    )
    return (
        agg.crossJoin(F.broadcast(truth))
        .select(
            F.lit(m).cast("long").alias("m"),
            "v_zero",
            (F.round(raw, 4) + F.lit(0.0)).alias("raw_estimate"),
            "exact_distinct",
            (
                # try_divide: an empty corpus has exact_distinct 0 —
                # relative error is undefined -> NULL (DuckDB x/0)
                F.round(
                    F.try_divide(
                        raw - F.col("exact_distinct"),
                        F.col("exact_distinct"),
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("rel_error"),
        )
    )
