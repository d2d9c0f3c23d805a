"""Standing adversarial-corpus gate (the round-8 hostile-row classes).

`tools/gen_adversarial.py` builds a schema-exact corpus whose rows
attack everything merely *habitually* true of the driver testdata —
nulls in every nullable non-key column, dangling FKs, tie-heavy
values, unicode/empty/newline texts, zero-norm / 1e-30 / 1e6
embeddings, a NULL embedding array and a NULL document text. The
first full-registry run against it failed 21 of 165 entries (ANSI
divide-by-zero, int64 overflow at magnitude outliers, null-event-time
window divergence, null-swallowing sentinel filters, float32
underflow ordering, kernels without NULL contracts —
ADVERSARIAL_r08.json / SCALE.md round-8 notes).

This module keeps exactly those 21 regression surfaces under the
DuckDB hash gate on every pytest run, against a corpus generated
fresh into tmp (deterministic, ~3 s). The FULL 166-entry adversarial
+ empty-corpus passes stay in `tools/verify_adversarial.py` (run
per-round; ~200 s each).
"""

from __future__ import annotations

import pytest

from gmall_realtime_flink_spark.oracle import compare_query
from gmall_realtime_flink_spark.plans import REGISTRY

# the entries the round-8 adversarial pass caught, grouped by failure
# class (see module docstring); each is a distinct fixed code path
ONCE_FAILING = [
    # ANSI /0 on zero-norm vectors / empty docs
    "similarity_topk",
    "similarity_topk_ivf",
    "similarity_recall_at_k",
    "similarity_recall_curve",
    "dedup_embedding_cosine",
    "doc_quality",
    "doc_curation_funnel",
    "embedding_quantize_int8",
    # invalid-vector exclusion + float32 underflow ordering
    "knn_graph",
    "contrastive_hard_negatives",
    # int64 overflow at 1e6-magnitude vectors
    "embedding_pq_codes",
    # null event time: window drop / RANGE frame / cumulative order
    "province_stats_sql",
    "daily_gmv_moving_7d",
    "segment_running_total",
    # NULL-payload kernel contracts
    "multimodal_features",
    "multimodal_frame_sample",
    "streaming_multimodal_features",
    # null-swallowing sentinel filters; streaming null event time
    "streaming_user_jump",
    "streaming_uv_dropdup_wm",
    "streaming_order_wide_left",
    "chained_province_stats",
]


@pytest.fixture(scope="session")
def adv_dir(tmp_path_factory) -> str:
    from tools.gen_adversarial import gen_adversarial

    out = str(tmp_path_factory.mktemp("adv"))
    gen_adversarial(out)
    return out


@pytest.mark.parametrize("name", ONCE_FAILING)
def test_once_failing_entry_stays_green_on_hostile_rows(spark, adv_dir, name):
    res = compare_query(spark, REGISTRY[name], adv_dir)
    assert res.ok, f"{name}: {res.detail}"
