"""Grouped-aggregate pandas UDFs (the UDAF surface of SURVEY §2.11).

The reference's aggregate surface is Flink's built-in windowed
aggregations; the engine's extension point for CUSTOM aggregates is
the grouped-agg pandas UDF: Arrow batches one group's column into a
`pd.Series`, the kernel returns one scalar, Spark plans it as a full
shuffle-keyed aggregation (no collect, no row-at-a-time Python).

NOTE: this module deliberately does NOT use
`from __future__ import annotations` — pandas_udf's modern type-hint
inference (`pd.Series -> float`) reads the live annotations; the
stringified form defeats it, which is what previously forced the
deprecated `PandasUDFType.GROUPED_AGG` enum here.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def price_iqr(v: pd.Series) -> float:
    """Interquartile range with quantile_cont's linear interpolation
    (numpy kernel, one Arrow batch per group partial)."""
    a = np.sort(v.to_numpy(dtype="float64"))

    def q(p: float) -> float:
        pos = (len(a) - 1) * p
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        return float(a[lo] + (a[hi] - a[lo]) * (pos - lo))

    return float(round(q(0.75) - q(0.25), 4))


@pandas_udf("long")
def group_count(v: pd.Series) -> int:
    """Group size as a grouped-agg pandas UDF. Exists because a
    GROUPED_AGG UDF cannot share an aggregation with built-in
    aggregates (INVALID_PANDAS_UDF_PLACEMENT) — pairing the custom
    kernel with a second pandas aggregate keeps the whole thing ONE
    single-pass, single-shuffle aggregation instead of a sibling
    groupBy + join (two scans)."""
    return len(v)
