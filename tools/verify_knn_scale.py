"""Scale-tier oracle for knn_graph / contrastive_hard_negatives.

The registry oracles are exact but materialize the per-cell pair join
(pairs x 64-double vectors) inside DuckDB's window sort — measured
86 GB / OOM at sf10 (200k vectors, 78M in-cell pairs). Oracle-side
cost only; the Spark result is 600k rows.

This tier uses ANCHOR RESTRICTION, which is exact per anchor: a
vector's top-k depends only on its own cell's members, so for any
anchor sample S the engine rows with vec_a in S must equal the
oracle's top-k computed for S-anchors against the FULL corpus —
precision and recall for every sampled anchor, |S| x cell-size work
instead of all-pairs. The sample is md5-ordered (deterministic,
engine-independent) and sized so the DuckDB side stays in memory.

Usage: python tools/verify_knn_scale.py [sf_dir] [n_anchors] [json_out]
Exit 0 iff both entries' restrictions match exactly.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def bits_for(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    if n <= 1024:
        return 4
    return max(4, min(16, math.ceil(math.log2(n / 1024.0))))


ORACLE = {
    "knn_graph": """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             list_sum(list_transform(range(1, {bits} + 1),
               i -> CASE WHEN embedding[i] >= 0
                    THEN (1 << (i - 1)) ELSE 0 END))::INT AS bucket
      FROM embeddings),
    anchors AS (
      SELECT * FROM e WHERE vec_id IN (SELECT vec_id FROM sample_ids))
    SELECT vec_a, vec_b, cos_sim, rk FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(a.v, b.v), 6) + 0.0 AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                        b.vec_id) AS rk
      FROM anchors a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
    WHERE rk <= 3
    """,
    "contrastive_hard_negatives": """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             list_sum(list_transform(range(1, {bits} + 1),
               i -> CASE WHEN embedding[i] >= 0
                    THEN (1 << (i - 1)) ELSE 0 END))::INT AS bucket
      FROM embeddings),
    anchors AS (
      SELECT * FROM e WHERE vec_id IN (SELECT vec_id FROM sample_ids))
    SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim, rk
    FROM (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS neg_id, b.label AS neg_label,
             round(list_cosine_similarity(a.v, b.v), 6) + 0.0 AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                        b.vec_id) AS rk
      FROM anchors a JOIN e b ON a.bucket = b.bucket AND a.label <> b.label)
    WHERE rk <= 3
    """,
}
ANCHOR_COL = {"knn_graph": "vec_a", "contrastive_hard_negatives": "anchor_id"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.local/sf10"
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    json_out = sys.argv[3] if len(sys.argv) > 3 else None

    from gmall_realtime_flink_spark.plans import REGISTRY
    from gmall_realtime_flink_spark.session import get_spark

    spark = get_spark("knn-scale")
    spark.sparkContext.setLogLevel("ERROR")
    bits = bits_for(sf_dir)

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    con.execute(
        "CREATE TEMP TABLE sample_ids AS SELECT vec_id FROM ("
        "SELECT vec_id FROM embeddings "
        f"ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {n_anchors})"
    )
    sample = {r[0] for r in con.execute("SELECT vec_id FROM sample_ids").fetchall()}

    report = {"sf_dir": sf_dir, "bits": bits, "n_anchors": n_anchors,
              "results": {}, "bad": []}
    for q in ("knn_graph", "contrastive_hard_negatives"):
        t0 = time.time()
        eng = REGISTRY[q].builder(spark, sf_dir).collect()
        spark_sec = round(time.time() - t0, 1)
        key = ANCHOR_COL[q]
        got = sorted(
            tuple(r[c] for c in sorted(r.asDict()))
            for r in eng if r[key] in sample
        )
        t1 = time.time()
        ora = con.execute(ORACLE[q].format(bits=bits)).fetchdf()
        want = sorted(
            tuple(row[c] for c in sorted(ora.columns))
            for _, row in ora.iterrows()
        )
        ok = got == want
        report["results"][q] = {
            "ok": ok,
            "engine_rows_total": len(eng),
            "sample_rows": len(got),
            "spark_sec": spark_sec,
            "oracle_sec": round(time.time() - t1, 1),
            "tier": "anchor restriction (md5 sample vs full corpus)",
        }
        if not ok:
            report["bad"].append(q)
        print(q, "OK" if ok else "BAD", f"spark={spark_sec}s", flush=True)
        if json_out:
            with open(json_out, "w") as f:
                json.dump(report, f, indent=1)
    return 1 if report["bad"] else 0


if __name__ == "__main__":
    sys.exit(main())
