"""Multi-stream union operators (SURVEY §2.6 U1/U2, §2.2 P8).

The reference's biggest app unions 7 homogeneous event streams into one
ProductStats stream (RT/app/dws/ProductStatsApp.java:241-248) after
projecting each source to a common wide-stats shape whose unused
measure slots are 0/1 literals (the "skeleton" projections,
RT/app/dws/ProductStatsApp.java:143-238); VisitorStatsApp does the
4-way version (RT/app/dws/VisitorStatsApp.java:80-141).

Spark-first design: each source is a `select` onto the shared skeleton
(`project_to_skeleton`), then one `unionByName` chain
(`union_streams`). Union in Spark is a zero-shuffle plan node — the
partitions of every input are concatenated, so at 100 TB the union
itself moves no data; the single downstream windowed aggregation does
one shuffle on (window, keys), identical to what one combined stream
would cost. Filters that define each source stream are pushed to the
parquet scan by Catalyst (one scan per branch; at scale, a persisted
common source + `.filter` branches shares one scan via exchange reuse).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame


def project_to_skeleton(df: DataFrame, skeleton: Mapping[str, Column]) -> DataFrame:
    """P8: project one source stream onto the shared stats shape.

    `skeleton` maps output column name → expression; unused measure
    slots are `F.lit(0)` exactly as the reference's per-source
    constructors seed them (ProductStatsApp.java:186,202,217).
    """
    return df.select(*[expr.alias(name) for name, expr in skeleton.items()])


def union_streams(dfs: Iterable[DataFrame]) -> DataFrame:
    """U1/U2: union homogeneous streams by column name."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
