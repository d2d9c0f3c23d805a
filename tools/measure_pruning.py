"""Measure PPJoin-filter and LSH-cap pruning on a documents corpus.

Round-5 measured the positional filter's 1.50M -> 0.67M candidate win
and the length prefilter's cost on the DRIVER corpus, whose 31-word
vocabulary is degenerate (every shingle hot). This tool re-measures on
any corpus — in particular the heavy-tailed Zipf corpus
(tools/gen_testdata.py --corpus zipf) — so the engine's default filter
settings are validated on realistic data, not an artifact of one
distribution.

Usage: python tools/measure_pruning.py <docs_dir> [<docs_dir> ...]
Each <docs_dir> must contain documents.parquet. Prints one JSON line
per corpus with candidate counts per filter combination, verified-pair
truth, LSH bucket stats, and wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_realtime_flink_spark.operators.dedup import (  # noqa: E402
    jaccard_verify,
    lsh_candidates,
    minhash_signatures,
    prefix_filter_candidates,
)
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402

T_PP = 0.8  # PPJoin threshold (the dedup_jaccard_complete setting)
T_LSH = 0.5  # LSH verify threshold (the dedup_minhash_lsh setting)


def timed_count(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.count()
    return n, round(time.perf_counter() - t0, 1)


def measure(spark, docs_dir: str) -> dict:
    docs = spark.read.parquet(
        os.path.join(docs_dir, "documents.parquet")
    ).select("doc_id", "text")
    out: dict = {"corpus": docs_dir, "n_docs": docs.count()}

    # --- PPJoin filter ablation (every variant is exactness-preserving
    # for the final verified set; they differ only in candidate volume
    # and wall time) -------------------------------------------------
    variants = {
        "prefix_only": dict(length_filter=False, positional_filter=False),
        "prefix_len": dict(length_filter=True, positional_filter=False),
        "prefix_len_pos": dict(length_filter=True, positional_filter=True),
    }
    pp = {}
    for name, kw in variants.items():
        cand = prefix_filter_candidates(docs, threshold=T_PP, **kw)
        n_cand, t_cand = timed_count(cand)
        n_ver, t_ver = timed_count(jaccard_verify(cand, docs, threshold=T_PP))
        pp[name] = {
            "candidates": n_cand,
            "verified": n_ver,
            "t_cand_s": t_cand,
            "t_total_s": round(t_cand + t_ver, 1),
        }
    out["ppjoin_t0.8"] = pp

    # --- LSH hot-bucket cap (xxhash64 production path) ---------------
    sigs = minhash_signatures(docs, hash_impl="xxhash64").persist()
    sigs.count()
    lsh = {}
    for cap in (None, 200, 50):
        cand = lsh_candidates(sigs, hash_impl="xxhash64", max_bucket=cap)
        n_cand, t_cand = timed_count(cand)
        n_ver, _ = timed_count(
            jaccard_verify(
                cand.select(
                    F.col("doc_a"), F.col("doc_b")
                ),
                docs,
                threshold=T_LSH,
            )
        )
        lsh[f"cap_{cap}"] = {
            "candidates": n_cand,
            "verified": n_ver,
            "t_cand_s": t_cand,
        }
    sigs.unpersist()
    out["lsh_xxh"] = lsh
    return out


def main() -> None:
    spark = get_spark(app_name="measure_pruning")
    for d in sys.argv[1:]:
        print(json.dumps(measure(spark, d)), flush=True)


if __name__ == "__main__":
    main()
