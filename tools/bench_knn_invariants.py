"""Solo scale bench + invariant gate for knn_graph /
contrastive_hard_negatives (VERDICT r11 item 6).

Both entries are excluded from the sf100 ORACLE tier because the
DuckDB side's per-cell pair join doesn't fit local disk (measured
86 GB at sf10) — but the ENGINE side had never executed at sf100
either. This tool runs the two Spark plans solo and gates structural
INVARIANTS in-engine (one aggregate row each, never a driver
collect):

- per-anchor edge count <= k and rank dense (max rk == count)
- no duplicate (anchor, neighbor) edges
- no self edges (knn) / no same-label... label disjointness is
  enforced by the join predicate; the self/dup checks catch a broken
  bucketing or ranking
- total rows <= k * |valid vectors|

Oracle parity stays at sf10 via tools/verify_knn_scale.py (anchor
restriction — exact per anchor).

Usage: python tools/bench_knn_invariants.py [sf_dir] [json_out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf100"
    json_out = sys.argv[2] if len(sys.argv) > 2 else "KNN_INVARIANTS.json"
    k = 3

    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        valid_embeddings,
    )
    from gmall_realtime_flink_spark.plans import REGISTRY
    from gmall_realtime_flink_spark.session import get_spark

    spark = get_spark("bench_knn_invariants")
    spark.sparkContext.setLogLevel("ERROR")

    n_valid = valid_embeddings(load(spark, sf_dir, "embeddings")).count()
    out: dict = {"sf_dir": sf_dir, "k": k, "n_valid_vectors": n_valid,
                 "entries": {}}
    all_ok = True
    COLS = {  # (anchor, neighbor) column names per entry
        "knn_graph": ("vec_a", "vec_b"),
        "contrastive_hard_negatives": ("anchor_id", "neg_id"),
    }
    for name in ("knn_graph", "contrastive_hard_negatives"):
        anchor, neigh = COLS[name]
        t0 = time.time()
        df = REGISTRY[name].builder(spark, sf_dir)
        per_anchor = df.groupBy(anchor).agg(
            F.count(F.lit(1)).alias("ct"),
            F.countDistinct(neigh).alias("nd"),
            F.max("rk").alias("max_rk"),
            F.max((F.col(anchor) == F.col(neigh)).cast("int")).alias(
                "self_edge"
            ),
        )
        row = per_anchor.agg(
            F.count(F.lit(1)).alias("anchors"),
            F.sum("ct").alias("edges"),
            F.max("ct").alias("max_per_anchor"),
            F.sum((F.col("ct") != F.col("nd")).cast("long")).alias(
                "dup_edge_anchors"
            ),
            F.sum((F.col("ct") != F.col("max_rk")).cast("long")).alias(
                "sparse_rank_anchors"
            ),
            F.sum("self_edge").alias("self_edges"),
        ).collect()[0].asDict()
        sec = round(time.time() - t0, 1)
        ok = (
            row["max_per_anchor"] <= k
            and row["dup_edge_anchors"] == 0
            and row["sparse_rank_anchors"] == 0
            and (row["self_edges"] or 0) == 0
            and row["edges"] <= k * n_valid
            and row["anchors"] <= n_valid
        )
        all_ok = all_ok and ok
        out["entries"][name] = {
            "ok": bool(ok), "spark_sec": sec,
            **{kk: int(v) if v is not None else 0 for kk, v in row.items()},
        }
        print(name, json.dumps(out["entries"][name]), flush=True)
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
