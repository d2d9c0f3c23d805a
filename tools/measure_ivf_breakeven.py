"""IVF amortized break-even vs brute force (VERDICT r11 item 8).

IVF_SKEW_r11 showed train+probe LOSING to one fused brute scan 14× at
probe-once scale, and the registry frames IVF as train-once/probe-many
— but no artifact measured the crossover. This tool sweeps query-batch
sizes (1/10/100/1000) over the skewed-emb sf10 corpus (200k vectors)
and records three walls per Q:

- brute_fused:  cosine_topk_batch — ONE corpus scan for all Q queries
- ivf_cold:     cosine_topk_ivf_batch building centroids + assignment
                inside the call (what a probe-once user pays)
- ivf_warm:     probe-only against a PRE-BUILT persisted index (what
                a served index pays per batch — the amortized path)

The crossover is where build_cost + Q·probe < Q·brute-per-query; with
the fused brute, it's where ivf_cold < brute_fused, plus the warm row
showing steady-state probe economics.

Usage: python tools/measure_ivf_breakeven.py [sf_dir] [json_out]
(defaults: .local/skewemb_sf10, IVF_BREAKEVEN.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/skewemb_sf10"
    json_out = sys.argv[2] if len(sys.argv) > 2 else "IVF_BREAKEVEN.json"

    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        DOT,
        _semantic_assign,
        auto_cells,
        cosine_topk_batch,
        cosine_topk_ivf_batch,
        kmeans_centroids,
        valid_embeddings,
    )
    from gmall_realtime_flink_spark.session import get_spark

    spark = get_spark("measure_ivf_breakeven")
    spark.sparkContext.setLogLevel("ERROR")

    e = load(spark, sf_dir, "embeddings")
    n = valid_embeddings(e).count()
    n_cells = auto_cells(n)

    # pre-built index for the warm rows (what a served IVF amortizes):
    # centroids + full cell assignment, persisted and materialized
    t0 = time.time()
    cent = kmeans_centroids(e, n_cells=n_cells, iters=2).persist()
    cent_n = cent.withColumn(
        "cvec_nrm", F.sqrt(F.expr(DOT.format(a="cvec", b="cvec")))
    )
    assigned = _semantic_assign(e, cent_n).persist()
    assigned.count()
    build_sec = round(time.time() - t0, 1)

    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_cells": n_cells,
        "nprobe": 2,
        "k": 10,
        "index_build_sec": build_sec,
        "sweep": {},
    }
    for q_n in (1, 10, 100, 1000):
        row: dict = {}
        t0 = time.time()
        rows_b = cosine_topk_batch(e, n_queries=q_n, k=10).count()
        row["brute_fused_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        rows_c = cosine_topk_ivf_batch(e, n_queries=q_n, k=10).count()
        row["ivf_cold_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        rows_w = cosine_topk_ivf_batch(
            e, n_queries=q_n, k=10, centroids=cent, assigned=assigned
        ).count()
        row["ivf_warm_sec"] = round(time.time() - t0, 1)
        row["rows"] = {"brute": rows_b, "cold": rows_c, "warm": rows_w}
        out["sweep"][q_n] = row
        print(q_n, json.dumps(row), flush=True)
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
