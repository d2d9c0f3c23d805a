"""Regenerate PLANS.md: AQE-final executed physical plans for the
headline queries plus hand-picked scale-critical ones.

Usage: python tools/gen_plans.py [sf_dir]

Each query is executed (noop write, so AQE finalizes every stage) and
the *executed* plan — not the initial static one — is captured from
``df._jdf.queryExecution().executedPlan()``, then abridged to the
operator skeleton (long field lists elided) so diffs stay readable.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime_flink_spark.plans import REGISTRY  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402

# scale-critical non-headline queries whose plan shape is cited in
# SCALE.md / docstrings
EXTRA = [
    "market_share",
    "important_parts",
    "waiting_suppliers",
    "bracket_revenue",
    "dominant_suppliers",
    "knn_graph",
    "doc_decontaminate",
    "span_dedup",
    "embedding_pq_codes",
    "similarity_topk_filtered",
    "doc_chunk",
    "corpus_shuffle",
    "doc_pack",
    "doc_chunk_pack",
    "dedup_pagerank",
    "dedup_incremental",
    "doc_common_token_score",
    "order_customer_salted",
    "user_sessions_native",
    "purchase_dim_temporal_join",
    "user_retention_cohorts",
    "daily_gmv_moving_7d",
    "repeat_buyer_intersect",
    "dedup_cluster",
    "brand_price_iqr_udaf",
    "dedup_minhash_lsh_capped",
    "similarity_recall_curve",
    "token_heavy_hitters",
    "doc_sample_token_budget",
    "corpus_mix_budget",
    "dedup_jaccard_complete",
    "contrastive_hard_negatives",
    "doc_lm_surprisal",
    "dedup_incremental_minhash",
    "doc_quality_tiers",
    "doc_novelty_score",
    "token_countmin",
    "doc_hll_cardinality",
    "dedup_jaccard_complete_capped",
    "dedup_simhash_hamming_wide",
    "dedup_pagerank_capped",
    # r12: the re-split + batch-ANN family (plan pins in
    # tests/test_plans.py cite these shapes)
    "dedup_semantic_resplit",
    "similarity_topk_batch",
    "similarity_topk_ivf_batch",
    # r13 session-2: retrieval/curation ops (plan pins in
    # tests/test_plans.py cite these shapes); the media-decode
    # entries are pinned Exchange-free there and add no skeleton
    # beyond a scan + mapInPandas
    "bm25_topk",
    "doc_dsir_select",
    "doc_winnow_fingerprint",
    "doc_gopher_rules",
    "doc_html_extract",
]


def abridge(plan: str, max_lines: int = 60) -> str:
    out = []
    for line in plan.splitlines():
        # elide long bracketed field lists but keep operator + keys
        line = re.sub(r"\[([^\]]{90,})\]", "[...]", line)
        line = line.rstrip()
        if len(line) > 150:
            line = line[:150]
        out.append(line)
        if len(out) >= max_lines:
            out.append("   ... (truncated)")
            break
    return "\n".join(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen_plans", cpus=8)
    names = [n for n, s in REGISTRY.items() if s.headline] + [
        n for n in EXTRA if n in REGISTRY
    ]
    sections = []
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        # collect() (not a noop write) so THIS DataFrame's own
        # QueryExecution is the one that runs — its executedPlan is
        # then the AQE-final plan, not the initial static one
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append(f"## {name}\n\n```\n{abridge(plan)}\n```\n")
        print(f"done: {name}", file=sys.stderr)

    header = (
        "# PLANS — executed physical plans (auto-generated, "
        f"{os.path.basename(sf_dir)}, AQE final)\n\n"
        "Evidence for the plan-shape claims in SCALE.md and the "
        "per-query docstrings: each section is the AQE-final executed "
        "plan (post-execution), abridged to the operator skeleton.\n"
        "Regenerate with `python tools/gen_plans.py`.\n\n"
    )
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(header + "\n".join(sections))


if __name__ == "__main__":
    main()
