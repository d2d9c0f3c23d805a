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


def test_product_stats_oracle_rewrite_equivalence(sf_dir):
    """The sf100 tier's spill-friendly rewrite of the product_stats
    oracle (tools/verify_agg_scale.ORACLE_REWRITES: count(DISTINCT)
    -> two-level GROUP BY, exact DECIMAL re-association) must be
    ROW-EXACT against the registry oracle — proven in DuckDB itself
    via symmetric EXCEPT. sf0.1 carries 503k result rows of real
    variety; the r12 session additionally ran this check at sf0.1
    standalone before first use."""
    import duckdb

    from tools.verify_agg_scale import ORACLE_REWRITES

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    orig = REGISTRY["product_stats"].oracle
    rw = ORACLE_REWRITES["product_stats"]
    assert con.execute(
        f"SELECT count(*) FROM (({orig}) EXCEPT ({rw}))"
    ).fetchone()[0] == 0
    assert con.execute(
        f"SELECT count(*) FROM (({rw}) EXCEPT ({orig}))"
    ).fetchone()[0] == 0
