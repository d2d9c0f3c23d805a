"""Merge the two-part sf10 verification run into VERIFY_SF10_r06.json.

Part 1 = registry head up to the inline-collect limit hit by
dedup_minhash_lsh; part 2 = the relaunched remainder. The merged
artifact reclassifies entries that failed only the HARNESS (driver
collect of a ~400M-row result) and records the scale-tier artifacts
and exclusions with reasons, so `bad` means "engine wrong", not
"result too big to hash driver-side".
"""

from __future__ import annotations

import json
import sys

p1 = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_part1.json"))
p2 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "VERIFY_SF10_part2_r06.json"))

results = {**p1["results"], **p2["results"]}

# dedup_minhash_lsh: inline FAILED on spark.driver.maxResultSize
# (399,571,786-row result collected for hashing), then verified EXACT
# by the aggregate-moment tier — reclassify.
agg_lsh = json.load(open("VERIFY_AGG_SF10_minhash_lsh_r06.json"))
assert agg_lsh["ok"], agg_lsh
results["dedup_minhash_lsh"] = {
    "ok": True,
    "sec": agg_lsh["spark_sec"],
    "tier": "aggregate-moments (VERIFY_AGG_SF10_minhash_lsh_r06.json; "
    "inline collect exceeded driver maxResultSize at 399.6M rows)",
}
agg_ps = json.load(open("VERIFY_AGG_SF10_product_stats_r06.json"))
assert agg_ps["ok"], agg_ps
results["product_stats"] = {
    "ok": True,
    "sec": agg_ps["spark_sec"],
    "tier": "aggregate-moments (VERIFY_AGG_SF10_product_stats_r06.json; "
    "50.3M result rows)",
}

bad = sorted(n for n, r in results.items() if not r.get("ok"))
out = {
    "sf_dir": ".local/sf10 (tools/gen_testdata.py --sf 10, "
    "driver-identical schemas, 60M lineitem / 10M events / 500k docs)",
    "checked": len(results),
    "bad": bad,
    "notes": [
        "Two-part run (part 1 stopped after dedup_minhash_lsh hit the "
        "driver-collect limit; part 2 resumed the remainder).",
        "Scale-tier verified: product_stats and dedup_minhash_lsh by "
        "in-engine aggregate moments (results 50.3M / 399.6M rows — "
        "collecting them is a harness limit, not an engine one).",
        "Excluded at sf10 with sf1-green evidence, oracle-side cost "
        "being the blocker on the DEGENERATE 31-word corpus: "
        "dedup_simhamming/edit_distance/ngram_jaccard/knn_graph "
        "(quadratic pair volume ~100x sf1), dedup_cluster/survivors "
        "(DuckDB closure CTE ~2.5e11 rows), dedup_jaccard_complete[,_capped] "
        "(brute-force oracle), dedup_embedding_cosine/semantic_verify/"
        "contrastive_hard_negatives (fixed 16-cell sign buckets make the "
        "cell self-join quadratic at 200k vectors - the bits knob is the "
        "documented scale control; realistic-corpus scale evidence for "
        "the dedup family is the zipf sf1 measurement in BASELINE.md).",
        "chained_* topology entries: driver-gated at sf0.01 and "
        "verified at sf1 (VERIFY_SF1_CHAINED_r06.json); the 10-job "
        "streaming DAG at sf10 would serialize hours ahead of the "
        "registry pass.",
    ],
    "results": results,
}
with open("VERIFY_SF10_r06.json", "w") as f:
    json.dump(out, f, indent=1)
print("checked", out["checked"], "bad", bad)
