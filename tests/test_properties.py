"""Property-based operator tests (hypothesis) — SURVEY §5's answer to
the reference's missing test suite: operator invariants on generated
inputs, not just the fixed testdata.

Frames are generated driver-side and run through the real operators on
small local DataFrames; properties are semantic invariants that must
hold for ANY input.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gmall_realtime_flink_spark.operators.joins import interval_join
from gmall_realtime_flink_spark.operators.stateful import (
    jump_detect,
    session_entry,
    uv_dedup,
)

BASE = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=100_000),  # offset seconds
    ),
    min_size=1,
    max_size=30,
)


def mk_events(spark, rows):
    data = [
        (i, u, BASE + timedelta(seconds=s)) for i, (u, s) in enumerate(rows)
    ]
    return spark.createDataFrame(data, ["event_id", "user_id", "ts"])


@settings(max_examples=15, deadline=None)
@given(rows=events_strategy)
def test_jump_and_entry_partition_events(spark, rows):
    """Every event is either a session entry, a jump, both, or neither —
    but jumps ∪ followed == all events, and per (user, gap) the jump
    set is exactly the events with no successor within the gap."""
    df = mk_events(spark, rows)
    gap_ms = 600_000
    jumps = {
        r["event_id"]
        for r in jump_detect(df, key="user_id", ts_col="ts", gap_ms=gap_ms).collect()
    }
    # oracle recomputation in python
    by_user: dict[int, list[tuple[datetime, int]]] = {}
    for i, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((BASE + timedelta(seconds=s), i))
    want = set()
    for u, evs in by_user.items():
        evs.sort()
        for k, (ts, eid) in enumerate(evs):
            nxt = evs[k + 1][0] if k + 1 < len(evs) else None
            if nxt is None or (nxt - ts).total_seconds() * 1000 > gap_ms:
                want.add(eid)
    assert jumps == want


@settings(max_examples=15, deadline=None)
@given(rows=events_strategy)
def test_session_entry_first_event_always_entry(spark, rows):
    """Each user's chronologically first event is always an entry, and
    entry count per user == 1 + number of >gap gaps."""
    df = mk_events(spark, rows)
    gap_ms = 600_000
    entries = session_entry(df, key="user_id", ts_col="ts", gap_ms=gap_ms)
    got = {}
    for r in entries.collect():
        got.setdefault(r["user_id"], set()).add(r["event_id"])
    by_user: dict[int, list[tuple[datetime, int]]] = {}
    for i, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((BASE + timedelta(seconds=s), i))
    for u, evs in by_user.items():
        evs.sort()
        gaps = sum(
            1
            for a, b in zip(evs, evs[1:])
            if (b[0] - a[0]).total_seconds() * 1000 > gap_ms
        )
        assert len(got.get(u, set())) == 1 + gaps
        assert evs[0][1] in got[u]  # first event is an entry


@settings(max_examples=10, deadline=None)
@given(rows=events_strategy)
def test_uv_dedup_one_row_per_user_day(spark, rows):
    df = mk_events(spark, rows)
    out = uv_dedup(df, key="user_id", ts_col="ts").collect()
    keys = [(r["user_id"], r["visit_date"]) for r in out]
    assert len(keys) == len(set(keys))  # exactly one row per (user, day)
    want = {
        (u, (BASE + timedelta(seconds=s)).strftime("%Y-%m-%d"))
        for u, s in rows
    }
    assert set(keys) == want


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    rights=st.lists(st.integers(0, 50), min_size=1, max_size=15),
)
def test_interval_join_band_inclusive(spark, lefts, rights):
    """Flink `between(lower, upper)` semantics: both ends inclusive,
    band relative to the left timestamp."""
    ldf = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(lefts)],
        ["l_id", "l_ts"],
    ).withColumn("k", F.lit(1))
    rdf = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(rights)],
        ["r_id", "r_ts"],
    ).withColumn("k", F.lit(1))
    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(
            ldf,
            rdf,
            on=ldf["k"] == rdf["k"],
            left_ts=ldf["l_ts"],
            right_ts=rdf["r_ts"],
            lower="-5 seconds",
            upper="10 seconds",
        ).collect()
    }
    want = {
        (i, j)
        for i, ls in enumerate(lefts)
        for j, rs in enumerate(rights)
        if ls - 5 <= rs <= ls + 10
    }
    assert got == want
