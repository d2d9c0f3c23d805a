"""Scale-tier oracle for `dedup_cluster`: union-find instead of SQL.

The registry oracle verifies connected components with a DuckDB
recursive CTE computing full transitive closure (`reach`), whose
memory is sum(|component|^2) — exact and fine at the driver's
sf0.01 gate, but the corpus distribution (31-word vocabulary at
every SF, measured from /root/testdata) makes minhash band
collisions dense at sf1: 50k docs collapse into ONE ~49.7k-node
component and the closure needs ~2.5e9 rows (~100 GB — measured,
it OOMs the box). That is an oracle-side scaling artifact, not an
engine defect; the engine's large-star/small-star contraction is
built exactly for giant components.

This tool is the sf1-tier replacement: same candidate-pair SQL in
DuckDB (linear in pairs), then an O(E α(V)) union-find in NumPy, and
an exact row-for-row comparison with the Spark result (cluster id =
min doc_id of the component, matching ops/dedup.py semantics). It
also checks `dedup_survivors` (whose registry oracle embeds the same
closure CTE): survivors must equal documents minus non-canonical
nodes, derived from the same union-find labels.

Usage: python tools/verify_cc_scale.py [sf_dir] [json_out]
Exit 0 iff the Spark result matches the union-find ground truth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

CAND_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> length(x) > 0) AS toks
  FROM read_parquet('{docs}')),
s AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1]) AS sh
  FROM d WHERE len(toks) >= 3),
mh AS (
  SELECT doc_id,
    list_aggregate(list_transform(sh, s -> md5('0|' || s)), 'min') AS h0,
    list_aggregate(list_transform(sh, s -> md5('1|' || s)), 'min') AS h1,
    list_aggregate(list_transform(sh, s -> md5('2|' || s)), 'min') AS h2,
    list_aggregate(list_transform(sh, s -> md5('3|' || s)), 'min') AS h3,
    list_aggregate(list_transform(sh, s -> md5('4|' || s)), 'min') AS h4,
    list_aggregate(list_transform(sh, s -> md5('5|' || s)), 'min') AS h5,
    list_aggregate(list_transform(sh, s -> md5('6|' || s)), 'min') AS h6,
    list_aggregate(list_transform(sh, s -> md5('7|' || s)), 'min') AS h7
  FROM s),
bands AS (
  SELECT doc_id, 0 AS band, md5(h0 || h1) AS bh FROM mh
  UNION ALL SELECT doc_id, 1, md5(h2 || h3) FROM mh
  UNION ALL SELECT doc_id, 2, md5(h4 || h5) FROM mh
  UNION ALL SELECT doc_id, 3, md5(h6 || h7) FROM mh)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


def union_find_min_label(doc_a, doc_b) -> dict[int, int]:
    """Min-doc_id label per component over the candidate edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(doc_a, doc_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        label[r] = min(label.get(r, x), x)
    return {x: label[find(x)] for x in parent}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf1"
    json_out = sys.argv[2] if len(sys.argv) > 2 else None

    t0 = time.time()
    con = duckdb.connect()
    pairs = con.execute(
        CAND_SQL.format(docs=os.path.join(sf_dir, "documents.parquet"))
    ).fetchnumpy()
    n_pairs = len(pairs["doc_a"])
    want = union_find_min_label(
        pairs["doc_a"].tolist(), pairs["doc_b"].tolist()
    )
    t_oracle = time.time() - t0

    from gmall_realtime_flink_spark.plans import REGISTRY
    from gmall_realtime_flink_spark.session import get_spark

    spark = get_spark("verify_cc_scale")
    t0 = time.time()
    got_rows = REGISTRY["dedup_cluster"].builder(spark, sf_dir).collect()
    t_spark = time.time() - t0

    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in got_rows}
    exp = {d: (c, d == c) for d, c in want.items()}
    ok = got == exp

    # dedup_survivors shares the fate of dedup_cluster (its registry
    # oracle embeds the same transitive-closure CTE): ground truth is
    # documents minus non-canonical nodes, directly from the labels.
    t0 = time.time()
    surv_rows = REGISTRY["dedup_survivors"].builder(spark, sf_dir).collect()
    t_surv = time.time() - t0
    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source"],
    ).to_pydict()
    non_canon = {d for d, c in want.items() if d != c}
    exp_surv = {
        (d, lang, src)
        for d, lang, src in zip(
            docs["doc_id"], docs["lang"], docs["source"]
        )
        if d not in non_canon
    }
    got_surv = {(r["doc_id"], r["lang"], r["source"]) for r in surv_rows}
    surv_ok = got_surv == exp_surv and len(surv_rows) == len(exp_surv)
    ok = ok and surv_ok
    comp_sizes: dict[int, int] = {}
    for c, _ in exp.values():
        comp_sizes[c] = comp_sizes.get(c, 0) + 1
    top = sorted(comp_sizes.values(), reverse=True)[:5]
    report = {
        "sf_dir": sf_dir,
        "ok": ok,
        "cand_pairs": n_pairs,
        "nodes": len(exp),
        "components": len(comp_sizes),
        "top_component_sizes": top,
        "oracle_sec": round(t_oracle, 1),
        "spark_sec": round(t_spark, 1),
        "survivors_ok": surv_ok,
        "survivors": len(exp_surv),
        "survivors_spark_sec": round(t_surv, 1),
    }
    print(json.dumps(report))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
