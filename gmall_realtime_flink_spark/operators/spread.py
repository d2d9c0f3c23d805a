"""Conditional round-robin spread for unsplittable small scans.

One shared home for the probe-and-repartition pattern (guide §2.5
"input skew: one huge unsplittable file ... repartition immediately
after the read" / §2.6 idle capacity): at the bench scale factors the
documents/events parquet files arrive as a SINGLE row-group split, so
any per-row-heavy pipeline planned directly over the scan (Python
codecs, shingle/md5 explodes, JSON round-trips, per-pair dot folds)
runs in ONE task while the other cores idle.

The spread is scale-adaptive twice over: the target partition count is
``defaultParallelism`` (the cluster's core count, never a constant),
and the exchange is SKIPPED whenever the scan already yields at least
that many splits — a production-sized table pays nothing. Only narrow
driver columns should be passed in (project before calling — guide
§2.3); heavy payloads belong AFTER the exchange.

The probe reads ``df.rdd.getNumPartitions()``, which forces one
physical-plan compile of the subtree and uses the RDD API (unavailable
under Spark Connect). That is acceptable here — the frames probed are
single-scan projections, and local mode has no Connect — but it is the
one thing a Connect port must replace (e.g. with the datasource's
reported split count); keeping every call site on this helper means
that fix lands in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cores(df: DataFrame) -> DataFrame:
    """Round-robin ``repartition(defaultParallelism)`` of ``df`` when
    its plan yields fewer partitions than the cluster has cores;
    passthrough otherwise (and always for streaming frames, whose
    micro-batch sources have no partition probe)."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
