"""Capture `.explain("formatted")` for named registry entries to
plans/<round>/<query>_<suffix>.txt (round dir from
$SPARK_GRAFT_PLANS_DIR, default plans/r14) — the optimization round's
before/after plan evidence (guide §1: measure first, §7.2: read the
plan).

Usage: python tools/capture_plans.py <suffix> <name> [<name> ...]
       python tools/capture_plans.py <suffix> --file names.txt

Builders that execute driver actions at build time (the BPE loop)
run them here too — plan capture is then slower but still faithful.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_realtime_flink_spark.plans import REGISTRY  # noqa: E402
from gmall_realtime_flink_spark.session import get_spark  # noqa: E402

OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    ),
)


def main() -> None:
    suffix = sys.argv[1]
    if sys.argv[2] == "--file":
        with open(sys.argv[3]) as f:
            names = [ln.strip() for ln in f if ln.strip()]
    else:
        names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
