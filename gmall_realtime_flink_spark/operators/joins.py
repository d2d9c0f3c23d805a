"""Join operators (SURVEY §2.5 J1-J5).

- `interval_join`: the Flink event-time interval join
  (RT/app/dwm/OrderWideApp.java:140-152: equi-key + time band, both
  ends inclusive relative to the LEFT stream's time;
  PaymentWideApp.java:116-131 with a ±30 min band).
- `dim_enrich`: the async HBase/Phoenix+Redis dimension lookup chain
  (RT/app/func/DimAsyncFunction.java:26-79, used ×6 in
  OrderWideApp.java:156-281 and ×4 in ProductStatsApp.java:318-397)
  re-expressed as chained broadcast hash LEFT joins — the dim moves to
  the data, eliminating the per-record RPC + cache tier entirely.

Scale notes:
- The interval join is an equi-join on the key with the band as a
  post-join predicate, so Catalyst plans a shuffle hash / sort-merge
  join on the key — NOT a range cross-product. State in streaming mode
  is bounded by the watermark + band (§2.9).
- `dim_enrich` forces `F.broadcast` so the plan never sort-merges a
  100 TB fact against a MB-scale dim. Dims too big to broadcast
  (>~1 GB) should instead be bucketed on the join key at write time
  (see SCALE.md) — the call site chooses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: Column,
    right_ts: Column,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """J1/J2: equi-key join with an inclusive event-time band.

    Keeps (l, r) pairs where
    ``right_ts BETWEEN left_ts + lower AND left_ts + upper``
    (Flink `between(lower, upper)` semantics: inclusive both ends,
    band relative to the left element's time —
    RT/app/dwm/OrderWideApp.java:146).

    lower/upper are SQL interval strings, e.g. ``"-5 milliseconds"``,
    ``"30 minutes"``.
    """
    band = (right_ts >= left_ts + F.expr(f"INTERVAL {lower}")) & (
        right_ts <= left_ts + F.expr(f"INTERVAL {upper}")
    )
    return left.join(right, on & band, how)


def dim_enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column]],
    how: str = "left",
) -> DataFrame:
    """J3/J4: chained broadcast hash left joins against dim tables.

    `dims` is a sequence of (dim_df, join_condition). Replaces the
    reference's Redis-cached async Phoenix point lookups
    (RT/utils/DimUtil.java:69-126) — a broadcast snapshot per batch is
    both fresher and free of per-row latency.
    """
    out = fact
    for dim_df, cond in dims:
        out = out.join(F.broadcast(dim_df), cond, how)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """As-of (backward, inclusive) join: attach to each left row the
    latest right row with ``right_ts <= left_ts`` for the same key —
    the temporal lookup a naive ``ON l.key = r.key AND r.ts <= l.ts``
    join turns into a per-key cross product (every left row matches
    ALL earlier right rows before the argmax). DuckDB expresses this
    natively as ``ASOF JOIN``; Spark has no built-in, so this is the
    scalable merge formulation:

    tag both sides, union them, and take per key (ONE shuffle, no join
    multiplicity) the running ``last(right_payload, ignorenulls=True)``
    over (ts, side) order — right rows sort before left rows at equal
    ts, which makes the match inclusive. State per key is the sort
    buffer only; output is |left|.

    Determinism: callers must ensure at most one right row per
    (key, right_ts) (pre-aggregate with max_by) — ties at the same
    instant are otherwise engine-arbitrary in any as-of
    implementation, DuckDB's included.

    `how`: 'left' keeps unmatched left rows (null payload), 'inner'
    drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload
            ) + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{left.schema[c].dataType.simpleString()}"
                for c in left.columns
            ) + ">"
        ).alias("__l"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)
    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{payload[0]}").isNotNull())
    return out


def range_bin_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Range (band) join without a nested loop: ``fact.value ∈
    [range.lo, range.hi)`` joins as an EQUI-join on a shared bin.

    Spark plans a raw inequality-only join as BroadcastNestedLoop (or
    a cartesian) — O(|facts| x |ranges|) comparisons. Binning makes it
    hash-partitionable: facts get ``bin = floor(value / w)``; each
    range explodes to every bin it overlaps (ceil(span/w) rows — pick
    `bin_width` near the typical range span so the fan-out is small);
    the bin equi-join carries the shuffle and the exact inequality
    runs as a residual on bin-colliding pairs only. Both sides
    partition by bin, so skew follows the value distribution, not the
    range count — the same bucket-the-continuum trick as the
    sign-bucket ANN cells.

    `closed`: 'left' = [lo, hi), 'both' = [lo, hi].
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left'|'both', got {closed!r}")
    w = F.lit(bin_width)
    f = facts.withColumn("__bin", F.floor(F.col(value_col) / w))
    r = ranges.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    upper = (
        F.col(value_col) < F.col(hi_col)
        if closed == "left"
        else F.col(value_col) <= F.col(hi_col)
    )
    return (
        f.join(r, "__bin")
        .filter((F.col(value_col) >= F.col(lo_col)) & upper)
        .drop("__bin")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join for a hot-keyed big side against a
    small-but-not-broadcastable side (SCALE.md §Joins: the flash-sale
    sku case AQE's size-based splitting can miss).

    The big side's shard is a deterministic content hash mod `salt` —
    not rand(), which breaks on task retry (a re-executed task must
    re-salt identically or rows are lost/duplicated). The small side
    is replicated `salt`× via explode(sequence(...)); the join key
    becomes (key, shard), spreading each hot key over `salt` reducers.

    Result equals the unsalted join exactly (shard is a function of
    the big row only, and every small row exists in all shards) — for
    inner/left only: with right/full, an unmatched small-side row was
    replicated `salt`× and would be emitted `salt` times with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "unmatched small-side rows are replicated by the salt fan-out"
        )
    big_s = big.withColumn(
        "_shard",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)),
    )
    small_s = small.withColumn(
        "_shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_shard", F.col("_shard").cast("long"))
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key])
        & (big_s["_shard"] == small_s["_shard"]),
        how,
    )
    return out.drop("_shard")
