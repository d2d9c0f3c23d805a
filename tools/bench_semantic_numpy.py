"""Solo bench of the SemDeDup BLAS twin at a given SF (VERDICT r10
item 7: the sf100 EXCLUDED note promises "the twin carries sf100 as a
solo bench row").

The DuckDB oracle for dedup_semantic is infeasible at sf100 (11.7B
assignment cosines + 3.9B-row windows per Lloyd pass), so this tier
records the PRODUCTION twin's wall time plus value invariants the
sf10 moments gate already pinned cross-engine: row count == valid
vector count, verdict split (kept/dropped), cell count == auto_cells.

Usage: python tools/bench_semantic_numpy.py [sf_dir] [json_out]
Prints one JSON line and (if json_out given) writes it there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        auto_cells,
        semantic_dedup_numpy,
    )
    from gmall_realtime_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf100"
    json_out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("bench_semantic_numpy")
    spark.sparkContext.setLogLevel("ERROR")

    e = load(spark, sf_dir, "embeddings")
    n_raw = e.count()
    k = auto_cells(n_raw)
    t0 = time.time()
    agg = (
        semantic_dedup_numpy(e, threshold=0.4)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
            F.count_distinct("cell").alias("cells_used"),
        )
        .collect()[0]
    )
    sec = round(time.time() - t0, 1)
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_raw,
        "auto_cells": k,
        "sec": sec,
        "rows": agg.rows,
        "kept": int(agg.kept),
        "dropped": int(agg.rows - agg.kept),
        "cells_used": int(agg.cells_used),
    }
    print(json.dumps(out), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
