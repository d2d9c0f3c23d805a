"""Scale-tier verification for dedup_jaccard_complete.

The driver-gate oracle is brute-force all-pairs (postings form) —
exact but quadratic-adjacent, fine at sf<=0.1, infeasible at sf1+
(50k docs => ~1.25B pairs in DuckDB). This tier uses the property
that COMPLETENESS IS HEREDITARY: the complete join restricted to any
document subset S must equal brute force computed within S (every
pair inside S with J >= t shares a prefix token globally iff it does
at all — prefix membership only depends on the pair's own sets and
the global token order, and recall 1.0 means no qualifying pair is
missing). So: run the engine on the FULL corpus, brute-force a
deterministic md5-ordered sample in DuckDB, and demand exact equality
on sample-internal pairs.

The sample always INCLUDES every doc the engine reported in a pair
(bounded: 2·|engine pairs| ids), so the restriction is never vacuous:
every claimed pair is re-verified brute-force (precision), and the
md5-random remainder probes for pairs the engine missed (recall).

Usage: python tools/verify_jaccard_scale.py [sf_dir] [sample_docs]
Exit 0 iff the restriction matches exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.local/sf1"
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from gmall_realtime_flink_spark.plans import REGISTRY
    from gmall_realtime_flink_spark.session import get_spark

    spark = get_spark("jac-scale", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    engine = REGISTRY["dedup_jaccard_complete"].builder(spark, sf_dir)
    engine_rows = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in engine.collect()
    }
    spark_sec = round(time.time() - t0, 1)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    t1 = time.time()
    pair_ids = sorted({i for p in engine_rows for i in p})
    con.execute("CREATE TEMP TABLE pair_ids (doc_id BIGINT)")
    if pair_ids:
        con.executemany(
            "INSERT INTO pair_ids VALUES (?)", [(i,) for i in pair_ids]
        )
    sample_sql = f"""
    WITH sids AS (
      SELECT doc_id FROM (
        SELECT doc_id FROM documents
        ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT {n_sample})
      UNION SELECT doc_id FROM pair_ids),
    samp AS (
      SELECT d.doc_id, d.text FROM documents d JOIN sids USING (doc_id)),
    d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                         x -> length(x) > 0) AS toks
      FROM samp),
    sets AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1])) AS sset
      FROM d WHERE len(toks) >= 3),
    sz AS (SELECT doc_id, len(sset)::BIGINT AS n FROM sets),
    post AS (SELECT doc_id, unnest(sset) AS sh FROM sets),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
      FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             round(i::DOUBLE / (x.n + y.n - i), 6) AS jaccard
      FROM inter JOIN sz x ON inter.doc_a = x.doc_id
                 JOIN sz y ON inter.doc_b = y.doc_id
    ) WHERE jaccard >= 0.8
    """
    oracle_pairs = {
        (int(a), int(b)): j for a, b, j in con.execute(sample_sql).fetchall()
    }
    sample_ids = {
        int(r[0])
        for r in con.execute(
            "SELECT doc_id FROM (SELECT doc_id FROM documents "
            "ORDER BY md5(doc_id::VARCHAR), doc_id "
            f"LIMIT {n_sample}) UNION SELECT doc_id FROM pair_ids"
        ).fetchall()
    }
    oracle_sec = round(time.time() - t1, 1)

    restricted = {
        p: j
        for p, j in engine_rows.items()
        if p[0] in sample_ids and p[1] in sample_ids
    }
    ok = restricted == oracle_pairs
    out = {
        "sf_dir": sf_dir,
        "sample_docs": n_sample,
        "engine_pairs_total": len(engine_rows),
        "sample_internal_pairs": len(restricted),
        "oracle_pairs": len(oracle_pairs),
        "ok": ok,
        "spark_sec": spark_sec,
        "oracle_sec": oracle_sec,
    }
    if not ok:
        missing = set(oracle_pairs) - set(restricted)
        extra = set(restricted) - set(oracle_pairs)
        out["missing_in_engine"] = sorted(missing)[:10]
        out["extra_in_engine"] = sorted(extra)[:10]
    print(json.dumps(out, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
