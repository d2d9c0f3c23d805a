"""Profile the ordered-replay per-batch cost of the DWD jobs
(VERDICT r11 item 4).

VERIFY_CHAINED_SF10_ORDERED_r11 measured base_db_app at 200.3 s total
for 9 micro-batches (p50 24.4 s) vs 68.2 s unordered — ~15 s/batch of
apparent per-trigger FIXED cost. This tool isolates the two DWD jobs
(SPARK_GRAFT_TOPOLOGY_STOP_AFTER=base_db_app) under the ordered knobs
and records the StreamingQueryProgress durationMs component breakdown
(queryPlanning / addBatch / walCommit / latestOffset / commitOffsets /
getBatch) per batch — the split that says whether the cost is the
BATCH'S COMPUTE (addBatch: fix the plan) or the TRIGGER MACHINERY
(everything else: fewer/larger triggers or cached planning).

Usage: python tools/profile_base_db.py [sf_dir] [json_out] [slices]
(defaults: .local/sf1, PROFILE_BASE_DB.json, 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".local/sf1"
    json_out = sys.argv[2] if len(sys.argv) > 2 else "PROFILE_BASE_DB.json"
    slices = sys.argv[3] if len(sys.argv) > 3 else "8"

    os.environ["SPARK_GRAFT_TOPOLOGY_ORDERED_SLICES"] = slices
    os.environ["SPARK_GRAFT_TOPOLOGY_FILES_PER_TRIGGER"] = "1"
    os.environ["SPARK_GRAFT_TOPOLOGY_STOP_AFTER"] = "base_db_app"

    from gmall_realtime_flink_spark.session import get_spark
    from gmall_realtime_flink_spark.streaming import topology

    spark = get_spark("profile_base_db")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="profile_base_db_")
    t0 = time.time()
    try:
        topology.build_warehouse_layers(spark, sf_dir, base=base)
        wall = round(time.time() - t0, 1)
        out = {
            "sf_dir": sf_dir,
            "slices": int(slices),
            "wall_sec": wall,
            "layer_seconds": dict(topology.LAYER_SECONDS),
            "layer_batch_ms": topology.LAYER_BATCH_MS,
        }
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        for name, stats in topology.LAYER_BATCH_MS.items():
            comps = {
                k: v["p50_ms"]
                for k, v in stats.get("components", {}).items()
            }
            print(name, "n=%d p50=%dms" % (stats["n"], stats["p50_ms"]),
                  json.dumps(comps), flush=True)
        return 0
    finally:
        # the ODS staging (events/orders/lineitem slices) lives
        # OUTSIDE base — drop it via the manifest before the base
        manifest = os.path.join(base, "ods.json")
        if os.path.exists(manifest):
            for p in json.load(open(manifest)).values():
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                elif os.path.isfile(p):
                    os.remove(p)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
