"""Keyed-state streaming operators (SURVEY §2.8 ST1/ST2/ST3).

`applyInPandasWithState` re-expressions of the reference's Flink
RichFunction/CEP operators. Each has a batch-exact window-function
analogue in operators/stateful.py; tests/test_streaming.py asserts the
two produce identical results on bounded input (the equality the
reference never tests — SURVEY §5).

Scale notes:
- grouping key = the entity id (user/mid), so state is hash-partitioned
  exactly like Flink's keyBy; the RocksDB state-store provider
  (session.py) keeps it off-heap and spillable at 100 TB key counts;
- per-key state is O(1): a first-visit date (ST1), a bounded set of
  visit dates (ST2 — the reference's 1-day TTL bounds it to ~1 entry;
  eviction of dates older than the watermark keeps it bounded here),
  one pending event (ST3);
- rows cross the Python boundary as Arrow batches (vectorized), not
  pickled rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TS_FMT = "%Y-%m-%d %H:%M:%S"


def _concat_sorted(pdfs: Iterator[pd.DataFrame], by: list[str]) -> pd.DataFrame:
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True).sort_values(by, kind="mergesort")


# ---------------------------------------------------------------------------
# ST1: new/old-visitor repair (RT/app/dwd/BaseLogAPP.java:74-130)
# ---------------------------------------------------------------------------

REPAIR_OUT = "event_id long, user_id long, visit_date string, is_new int"
REPAIR_STATE = "first_date string"


def _repair_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = _concat_sorted(pdfs, by=["ts", "event_id"])
    if rows.empty:
        return
    dates = rows["ts"].dt.strftime("%Y-%m-%d")
    if state.exists:
        (first,) = state.get
    else:
        # reference: state empty -> store this visit's date
        # (BaseLogAPP.java:115-124)
        first = dates.iloc[0]
        state.update((first,))
    yield pd.DataFrame(
        {
            "event_id": rows["event_id"],
            "user_id": rows["user_id"],
            "visit_date": dates,
            "is_new": (dates == first).astype("int32"),
        }
    )


def repair_is_new_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST1 streaming form; parity target = operators.stateful.repair_is_new."""
    return events.groupBy(key).applyInPandasWithState(
        _repair_fn,
        outputStructType=REPAIR_OUT,
        stateStructType=REPAIR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# ST2: daily UV dedup (RT/app/dwm/UniqueVisitApp.java:66-124)
# ---------------------------------------------------------------------------

UV_OUT = "user_id long, visit_date string, first_ts string"
UV_STATE = "seen_dates array<string>"


def _uv_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = _concat_sorted(pdfs, by=["ts", "event_id"])
    if rows.empty:
        return
    seen: set[str] = set(state.get[0]) if state.exists else set()
    keep: list[bool] = []
    for d in rows["ts"].dt.strftime("%Y-%m-%d"):
        fresh = d not in seen
        keep.append(fresh)
        if fresh:
            seen.add(d)
    out = rows[pd.Series(keep, index=rows.index)]
    # TTL eviction (the reference's 1-day StateTtlConfig, :85-89): once
    # the key's event time has advanced past a date by more than a day,
    # that date can never be claimed again by in-watermark data — drop
    # it so per-key state stays O(1) instead of O(distinct days)
    horizon = max(seen)  # latest date seen for this key
    cutoff = (pd.Timestamp(horizon) - pd.Timedelta(days=1)).strftime(
        "%Y-%m-%d"
    )
    state.update((sorted(d for d in seen if d >= cutoff),))
    yield pd.DataFrame(
        {
            "user_id": out["user_id"],
            "visit_date": out["ts"].dt.strftime("%Y-%m-%d"),
            "first_ts": out["ts"].dt.strftime(TS_FMT),
        }
    )


def uv_dedup_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST2 streaming form; parity target = first event per (key, day)."""
    return events.groupBy(key).applyInPandasWithState(
        _uv_fn,
        outputStructType=UV_OUT,
        stateStructType=UV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# ST3: CEP bounce detection w/ event-time timeout
# (RT/app/dwm/UserJumpApp.java:88-158)
# ---------------------------------------------------------------------------

JUMP_OUT = "event_id long, user_id long, jump_ts string"
JUMP_STATE = "pending_micros long, pending_event_id long"


def make_jump_fn(gap_ms: int):
    """The CEP pattern `begin(entry).next(any).within(gap)` with the
    timeout side-output as the *match*: an event is a jump iff no
    follow-up event for the same key arrives within `gap_ms`.

    State = the key's latest undecided event. Decided either by the
    next event in sequence (gap compare) or by the event-time timer
    firing when the watermark passes ts+gap — exactly Flink CEP's
    `within` timeout (UserJumpApp.java:137-156).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = _concat_sorted(pdfs, by=["ts", "event_id"])
        if rows.empty:
            # timer fired: the pending event was never followed -> jump
            if state.hasTimedOut and state.exists:
                micros, event_id = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "event_id": [event_id],
                        "user_id": [user_id],
                        "jump_ts": [
                            pd.Timestamp(micros, unit="us").strftime(TS_FMT)
                        ],
                    }
                )
            return
        seq = list(
            zip(
                rows["ts"].astype("datetime64[us]").astype("int64"),
                rows["event_id"],
            )
        )
        if state.exists:
            seq.insert(0, tuple(state.get))
        # compare at millisecond precision: the batch form
        # (operators/stateful.py unix_millis diff) and the DuckDB oracle
        # (date_diff('millisecond')) both truncate to ms before the gap
        # test — sub-ms components near the boundary must not diverge
        jumps = [
            (eid, user_id, pd.Timestamp(us, unit="us").strftime(TS_FMT))
            for (us, eid), (nxt_us, _) in zip(seq, seq[1:])
            if (nxt_us // 1000) - (us // 1000) > gap_ms
        ]
        last_us, last_eid = seq[-1]
        state.update((int(last_us), int(last_eid)))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        if jumps:
            yield pd.DataFrame(
                jumps, columns=["event_id", "user_id", "jump_ts"]
            )

    return fn


def jump_detect_stream(
    events: DataFrame, key: str = "user_id", gap_ms: int = 600_000
) -> DataFrame:
    """ST3 streaming form; parity target = operators.stateful.jump_detect.

    Requires a watermark on the input (event-time timers fire when the
    watermark passes pending_ts + gap). On a bounded stream the last
    pending event per key only times out if something advances the
    watermark past it — tests append a far-future sentinel event file
    for exactly that purpose (a stream, by definition, never ends).
    """
    return events.groupBy(key).applyInPandasWithState(
        make_jump_fn(gap_ms),
        outputStructType=JUMP_OUT,
        stateStructType=JUMP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming sequence packing (beyond-reference: continuous-ingest
# training-batch construction; batch analogue operators/packing.py)
# ---------------------------------------------------------------------------

PACK_OUT = "doc_id long, bucket int, n_tokens int, pack_id long"
PACK_STATE = "next_pack long, tokens_used long"


def _pack_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Greedy packing with bucket-keyed state: (current pack ordinal,
    tokens already in it) survives micro-batches, so a pack keeps
    filling across arrivals. Within a batch rows are ordered by the
    content-stable sort key for determinism; ACROSS batches order is
    arrival order — streaming packing is an online algorithm, so its
    assignment legitimately differs from the batch operator's
    global-hash-order packing (budget semantics are identical and
    pytest-pinned; no SQL oracle is claimed)."""
    rows = _concat_sorted(pdfs, by=["sort_key", "doc_id"])
    if rows.empty:
        return
    if state.exists:
        next_pack, used = state.get
    else:
        next_pack, used = 0, 0
    budget = int(rows["budget"].iloc[0])
    out_pack = []
    for n in rows["n_tokens"]:
        n = int(n)
        if used > 0 and used + n > budget:
            next_pack += 1
            used = 0
        out_pack.append(next_pack)
        used += n
    state.update((int(next_pack), int(used)))
    yield pd.DataFrame(
        {
            "doc_id": rows["doc_id"],
            "bucket": rows["bucket"].astype("int32"),
            "n_tokens": rows["n_tokens"].astype("int32"),
            "pack_id": out_pack,
        }
    )


def pack_stream(
    docs: DataFrame,
    budget_tokens: int = 256,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming greedy sequence packing: documents are hash-bucketed
    (same deterministic bucket as the batch operator), and per-bucket
    state carries the open pack across micro-batches — the
    continuous-ingest form of operators/packing.pack_documents.

    Online vs batch: this is TRUE first-fit (a doc that would
    overflow the open pack closes it and starts the next), whereas
    the batch operator uses the cumulative-cut formulation — both
    respect the budget bound, and the streaming form never skips
    pack ids. At 100 TB: bucket = state partition key; state is two
    longs per bucket.
    """
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.operators.packing import _ws_tokens
    from gmall_realtime_flink_spark.operators.sampling import hash_bucket

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_buckets).cast("int").alias("bucket"),
        F.md5(F.col(id_col).cast("string")).alias("sort_key"),
        F.size(_ws_tokens(F.col(text_col))).alias("n_tokens"),
        F.lit(budget_tokens).alias("budget"),
    )
    return base.groupBy("bucket").applyInPandasWithState(
        _pack_fn,
        outputStructType=PACK_OUT,
        stateStructType=PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
