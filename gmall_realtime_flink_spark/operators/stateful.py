"""Batch analogues of the reference's keyed-state operators (§2.8).

Each of the Flink RichFunction/CEP stateful operators has an exact
batch formulation as a window function over event time; these are the
oracle-checkable forms. The streaming `applyInPandasWithState`
versions live in `gmall_realtime_flink_spark/streaming/state.py` and
are asserted equal to these on bounded input.

Scale notes: all three are a single hash shuffle on the entity key
(mid/user_id) followed by a per-partition sort — the same data
movement Flink's keyBy does, but with whole-stage-codegen'd window
functions instead of per-record Java state access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repair_is_new(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """ST1: new/old-visitor repair (RT/app/dwd/BaseLogAPP.java:74-130).

    The reference keeps per-mid ValueState of the first visit date and
    rewrites a client-claimed ``is_new=1`` to 0 when the stored date
    differs from the event date. Batch-exact equivalent: an event is
    "new" iff its date equals the key's min event date.
    """
    w = Window.partitionBy(key)
    first_date = F.min(F.to_date(ts_col)).over(w)
    return df.withColumn(
        "is_new",
        F.when(F.to_date(ts_col) == first_date, F.lit(1)).otherwise(F.lit(0)),
    )


def uv_dedup(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """ST2: daily unique-visitor dedup (RT/app/dwm/UniqueVisitApp.java:66-124).

    Per (key, day) keep the first event. The reference's 1-day state
    TTL (StateTtlConfig, :85-89) is the day-bucketing made explicit:
    keying state by (mid, date) bounds it identically.

    Deterministic first-event tie-break: (ts, then all-column min via
    the caller's natural key) — here min(ts) per group, plus counts.
    """
    day = F.date_format(ts_col, "yyyy-MM-dd").alias("visit_date")
    return df.groupBy(key, day).agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.count(F.lit(1)).alias("visit_ct"),
    )


def session_entry(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_ms: int = 600_000,
) -> DataFrame:
    """P5: entry-event detection — the `last_page_id is null` filter
    (RT/app/dwm/UniqueVisitApp.java:95-101, VisitorStatsApp.java:106-125).

    The testdata has no page-chain column, so "entry" is derived the
    way sessionizers do: an event opens a session iff no prior event
    for the key within `gap_ms` (lag-based; the mirror image of
    jump_detect's lead-based timeout).
    """
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    with_prev = df.withColumn("__prev", F.lag(ts_col).over(w))
    # cast: unix_millis rejects TIMESTAMP_NTZ; the diff cancels any tz
    gap = F.unix_millis(F.col(ts_col).cast("timestamp")) - F.unix_millis(
        F.col("__prev").cast("timestamp")
    )
    return with_prev.filter(
        F.col("__prev").isNull() | (gap > gap_ms)
    ).drop("__prev")


def jump_detect(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_ms: int = 600_000,
) -> DataFrame:
    """ST3: CEP bounce/jump detection (RT/app/dwm/UserJumpApp.java:88-158).

    The reference CEP pattern emits a "jump" when an entry event is NOT
    followed by another event within 10 s (timeout side-output).
    Batch-exact form: ``lead(ts)`` per key in event order; jump iff
    lead is NULL or the gap exceeds the window. (The batch oracle
    formulation is the one SURVEY §2.8/ST3 derives.)
    """
    w = Window.partitionBy(key).orderBy(ts_col, *order_cols)
    with_next = df.withColumn("next_ts", F.lead(ts_col).over(w))
    # cast: unix_millis rejects TIMESTAMP_NTZ; the diff cancels any tz
    gap = F.unix_millis(F.col("next_ts").cast("timestamp")) - F.unix_millis(
        F.col(ts_col).cast("timestamp")
    )
    return with_next.filter(F.col("next_ts").isNull() | (gap > gap_ms)).drop(
        "next_ts"
    )
