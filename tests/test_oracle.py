"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from gmall_realtime_flink_spark.oracle import compare_query
from gmall_realtime_flink_spark.plans import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, REGISTRY[name], sf_dir)
    assert res.ok, f"{name}: {res.detail}"
