"""IVF skew posture on the skewed-emb corpus (VERDICT r10 item 3's
second half: "SemDeDup/IVF wall measured at sf1" — the SemDeDup half
lives in measure_semdedup_skew.py / SEMDEDUP_SKEW_r11.json).

The driver corpora's i.i.d. embeddings give near-uniform IVF cells,
so the probe-cost story under a real clustered corpus was unmeasured.
On the Zipf-cluster corpus the top kmeans cell absorbs the hot
cluster (>20% of vectors), which is exactly the cell a query INSIDE
that cluster probes — the worst-case probe is the hot cell, and the
probe cost is bounded by the hot-cell size, not n/n_cells. This tool
records that: cell-size distribution at n_cells=32, brute-force vs
IVF probe wall, and the recall@10 curve over nprobe — at skew-sf1
(20k vectors) and skew-sf10 (200k).

Writes IVF_SKEW_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = ".local/skewemb_sf1"
SF10 = ".local/skewemb_sf10"
N_CELLS = 32
K = 10


def main() -> int:
    from pyspark.sql import functions as F

    from gmall_realtime_flink_spark.catalog import load
    from gmall_realtime_flink_spark.operators.similarity import (
        _semantic_assign,
        cosine_topk,
        cosine_topk_ivf,
        ivf_recall_curve,
        kmeans_centroids,
        valid_embeddings,
    )
    from gmall_realtime_flink_spark.session import get_spark

    json_out = sys.argv[1] if len(sys.argv) > 1 else "IVF_SKEW.json"
    spark = get_spark("measure_ivf_skew")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_cells": N_CELLS, "k": K, "corpus": {}, "runs": {}}
    for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
        out["corpus"][tag] = json.load(open(os.path.join(sf, "MANIFEST.json")))
        e = load(spark, sf, "embeddings")

        # IVF index cell-size distribution under Zipf clusters.
        # NOTE (r11 advice): this tool trains a FRESH index here for the
        # distribution stats; the probe timings below are therefore NOT
        # amortized against this build — they describe an independently
        # trained index. For the train-once/probe-many economics of ONE
        # shared index, see tools/measure_ivf_breakeven.py, which threads
        # a single pre-built centroids+assignment through the warm path.
        cent = kmeans_centroids(
            valid_embeddings(e), n_cells=N_CELLS, iters=2
        )
        sizes = (
            _semantic_assign(e, cent)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .toPandas()["n"]
            .sort_values()
        )
        run: dict = {
            "n_vectors": int(sizes.sum()),
            "cells_nonempty": int(sizes.size),
            "cell_min": int(sizes.min()),
            "cell_median": int(sizes.median()),
            "cell_max": int(sizes.max()),
            "cells_top5": sizes.tail(5).tolist()[::-1],
            "hot_cell_share": round(float(sizes.max()) / sizes.sum(), 4),
        }

        # brute-force wall (the exact baseline every probe competes with)
        t0 = time.time()
        cosine_topk(e, query_id=0, k=K).collect()
        run["brute_sec"] = round(time.time() - t0, 1)

        # IVF probe wall at the registry's nprobe=2. The measured
        # `cent` is THREADED IN (ADVICE r11): the probed index is now
        # exactly the one whose cell distribution was recorded above,
        # and the redundant second training pass is gone — the wall is
        # probe-only (build cost amortization: IVF_BREAKEVEN).
        t0 = time.time()
        cosine_topk_ivf(
            e, query_id=0, k=K, n_cells=N_CELLS, nprobe=2, centroids=cent
        ).collect()
        run["ivf_nprobe2_sec"] = round(time.time() - t0, 1)

        # recall@10 over nprobe — does Zipf clustering HURT recall?
        # (query 0 sits in a cluster; its true neighbors share the
        # cluster, hence usually ONE cell — skew helps recall here)
        t0 = time.time()
        curve = ivf_recall_curve(
            e, query_id=0, k=K, n_cells=N_CELLS, nprobes=(1, 2, 4, 8),
            centroids=cent,
        ).toPandas()
        run["recall_curve_sec"] = round(time.time() - t0, 1)
        run["recall_at_10"] = {
            int(r.nprobe): float(r.recall_at_k) for r in curve.itertuples()
        }
        out["runs"][tag] = run
        print(tag, json.dumps(run), flush=True)

    with open(json_out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
