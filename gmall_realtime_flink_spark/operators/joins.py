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

from pyspark.sql import Column, DataFrame
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
